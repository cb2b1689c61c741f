"""CTC-draft speculative decoding: verify K drafted tokens per device step.

ASR hands us what generic LLM serving never has — a nearly-correct draft of
the output before generation starts. The CTC head's greedy transcript (the
same text the reference computes for hotword recall and timestamps,
``nano_ctc.py:38-116``) predicts the LLM transcript almost verbatim, and
decode throughput is weight-bandwidth-bound: a :func:`qwen3_verify_step`
over K+1 tokens streams the same weight bytes as a single-token
:func:`qwen3_decode_step`. Accepting ``a`` draft tokens per step therefore
multiplies generation throughput by ≈ (1 + a) at equal HBM traffic.

Draft proposal is prompt-lookup style (Saxena's PLD, arXiv:2310.08461
applied to the CTC text instead of the prompt): find the bigram
``(last_token, pending)`` in the tokenized CTC transcript and propose the
K tokens that follow it; fall back to a unigram match, preferring matches
near a monotonically advancing cursor (ASR output tracks the audio in
order, unlike general text).

Acceptance is *distribution-preserving* (Leviathan et al., arXiv:2211.17192
with a deterministic draft):

* temperature == 0 — accept while draft == argmax; output is bit-identical
  to standard greedy decoding;
* temperature > 0 — accept draft d with probability p(d) under the exact
  llama.cpp-order sampling distribution (top-k → top-p → temperature,
  ``ops/sampling.py``); on rejection the next token is drawn from the
  residual distribution (p with d excluded). Every emitted token is an
  exact sample from the same distribution the standard loop uses.

Reference behaviors preserved (``core/decoder.py:53,101,106-114``): stop
tokens {151643, 151645} end generation uncounted; the repetition fuse
aborts when the last 30 counted tokens have ≤ 3 distinct values — checked
per emitted token, exactly like the one-token-at-a-time loop.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_residual, warped_candidates
from .config import Qwen3Config
from .generate import FUSE_DISTINCT, RING, GenState, _distinct_count
from .qwen3 import KVCache, embed_tokens, qwen3_verify_step

# plain int (not a jnp scalar): a module-level device constant would
# initialize the JAX backend at import time, which dials the remote TPU
# even for format-only CLI tools that merely import the package
NEG_BIG = 2 ** 30


class SpecState(NamedTuple):
    """Carry for speculative generation (cross-chunk persistent)."""
    kv: KVCache
    logits: jnp.ndarray        # [B, V] f32 — next-token logits
    forbid: jnp.ndarray        # [B] i32 — rejected draft id to exclude (-1: none)
    prompt_len: jnp.ndarray    # [B] i32
    valid_from: jnp.ndarray    # [B] i32
    slot_next: jnp.ndarray     # [B] i32 — next free KV slot
    pos_next: jnp.ndarray      # [B] i32 — rope position of the next token
    rng: jnp.ndarray
    ring: jnp.ndarray          # [B, RING] i32
    n_gen: jnp.ndarray         # [B] i32 — counted (non-stop) tokens
    done: jnp.ndarray          # [B] bool
    aborted: jnp.ndarray       # [B] bool
    last_tok: jnp.ndarray      # [B] i32 — last emitted token (-1 at start)
    cursor: jnp.ndarray        # [B] i32 — draft cursor (match tie-breaker)
    rounds: jnp.ndarray        # [B] i32 — verify rounds run (acceptance
                               # telemetry: emitted/rounds = 1 + avg accept)
    prompt_slots: int          # static: P


def spec_init(state: GenState) -> SpecState:
    """Adapt a :func:`generate.prefill_init` state for speculative decode."""
    b = state.logits.shape[0]
    return SpecState(
        kv=state.kv,
        logits=state.logits,
        forbid=state.forbid,     # normally -1; carries over a pending
        #   residual exclusion from a prior guardrail conversion
        prompt_len=state.prompt_len,
        valid_from=state.valid_from,
        slot_next=jnp.full((b,), state.prompt_slots, jnp.int32),
        # `+ 0`: a fresh buffer — prompt_len and pos_next must not alias,
        # the chunk program donates its state (same buffer twice otherwise)
        pos_next=state.prompt_len.astype(jnp.int32) + 0,
        rng=state.rng,
        ring=state.ring,
        n_gen=state.n_gen,
        done=state.done,
        aborted=state.aborted,
        last_tok=jnp.full((b,), -1, jnp.int32),
        cursor=jnp.zeros((b,), jnp.int32),
        rounds=jnp.zeros((b,), jnp.int32),
        prompt_slots=state.prompt_slots,
    )


def spec_to_gen(state: SpecState) -> GenState:
    """Convert a speculative carry back to the plain-decode carry.

    Used by the acceptance-rate guardrail: when drafting stops paying for
    its verify overhead, the engine abandons speculation mid-utterance and
    continues with :func:`generate.generate_chunk` from the same KV state.
    GenState tracks one global ``step`` scalar, so all rows must sit at
    the same slot — true for the single-stream decoder (B == 1), which is
    the only caller.
    """
    import numpy as np
    slot = np.asarray(state.slot_next)
    if not (slot == slot[0]).all():
        raise ValueError("spec_to_gen requires uniform row slots "
                         f"(got {slot.tolist()})")
    return GenState(
        kv=state.kv,
        logits=state.logits,
        prompt_len=state.prompt_len,
        valid_from=state.valid_from,
        step=jnp.asarray(int(slot[0]) - state.prompt_slots, jnp.int32),
        rng=state.rng,
        ring=state.ring,
        n_gen=state.n_gen,
        done=state.done,
        aborted=state.aborted,
        # a conversion mid-rejection hands the residual exclusion to the
        # plain chunk's first draw (generate_chunk consumes it exactly via
        # sample_residual) — so the guardrail never has to defer on a
        # pending forbid, which at T > 0 with low acceptance is pending at
        # essentially EVERY chunk boundary (each round ends rejected) and
        # used to postpone the auto-off indefinitely
        forbid=state.forbid,
        prompt_slots=state.prompt_slots,
    )


def _lookup_draft(draft, last_tok, pending, cursor, spec_k: int):
    """Prompt-lookup proposal: continuation of (last_tok, pending) in draft.

    draft [B, D] i32 (-1 padded). Returns (d_tok [B, K] i32 safe ids,
    d_valid [B, K] bool cumulative validity, start [B] i32, has [B] bool).
    Prefers the match closest to ``cursor`` (ASR text is monotonic).

    When neither the bigram nor the unigram matches (typically right
    after a draft hole — e.g. a CTC deletion — rejected the previous
    round), propose the monotonic continuation ``draft[cursor+1:]``
    anyway: the verify pass computes K+1 lanes either way, so a wrong
    proposal costs nothing, while a right one resumes acceptance one
    round earlier. Acceptance stays distribution-preserving regardless
    of proposal source.
    """
    b, d = draft.shape
    idx = jnp.arange(d - 1, dtype=jnp.int32)[None, :]

    # bigram: draft[i] == last_tok, draft[i+1] == pending → start = i + 2
    m2 = ((draft[:, :-1] == last_tok[:, None])
          & (draft[:, 1:] == pending[:, None])
          & (draft[:, :-1] >= 0))
    has2 = jnp.any(m2, axis=1)
    score2 = jnp.where(m2, -jnp.abs(idx - cursor[:, None]), -NEG_BIG)
    best2 = jnp.argmax(score2, axis=1).astype(jnp.int32) + 2

    # unigram fallback: draft[i] == pending → start = i + 1
    idx1 = jnp.arange(d, dtype=jnp.int32)[None, :]
    m1 = (draft == pending[:, None]) & (draft >= 0)
    has1 = jnp.any(m1, axis=1)
    score1 = jnp.where(m1, -jnp.abs(idx1 - cursor[:, None]), -NEG_BIG)
    best1 = jnp.argmax(score1, axis=1).astype(jnp.int32) + 1

    has = has2 | has1
    # no match → monotonic-cursor continuation (start just past the
    # position the previous round consumed up to)
    start = jnp.where(has2, best2, jnp.where(has1, best1, cursor + 1))

    cols = start[:, None] + jnp.arange(spec_k, dtype=jnp.int32)[None, :]
    in_range = (cols < d) & (cols >= 0)
    gathered = jnp.take_along_axis(draft, jnp.clip(cols, 0, d - 1), axis=1)
    valid = in_range & (gathered >= 0)
    # validity is a prefix property: a hole kills everything after it
    d_valid = jnp.cumprod(valid.astype(jnp.int32), axis=1).astype(bool)
    d_tok = jnp.where(d_valid, gathered, 0)
    return d_tok, d_valid, start, has


@partial(jax.jit, static_argnames=("cfg", "chunk_len", "top_k", "spec_k",
                                   "stop_tokens", "fuse_enabled",
                                   "greedy"),
         donate_argnames=("state",))
def spec_generate_chunk(params, state: SpecState, draft_ids,
                        cfg: Qwen3Config, temperature, top_p,
                        top_k: int = 50, spec_k: int = 8,
                        chunk_len: int = 64,
                        stop_tokens: Tuple[int, ...] = (151643, 151645),
                        fuse_enabled: bool = True,
                        limit=None, greedy=None
                        ) -> Tuple[SpecState, jnp.ndarray]:
    """Generate up to ``limit`` (≤ chunk_len) tokens with CTC-draft
    speculation, entirely on device.

    draft_ids: [B, D] i32, -1-padded tokenization of the CTC transcript.
    Returns (state, tokens [B, chunk_len]) — emitted ids in order, -1
    elsewhere. Per verify round a row emits between 1 and 1 + spec_k
    tokens; acceptance is truncated at the ``limit`` budget, so the host
    sees every token the device consumed (n_predict stays an exact cap).

    The KV cache must have ``spec_k + 1`` slots of headroom beyond
    prompt + n_predict: every round writes K+1 entries starting at the
    row's next free slot, and rejected entries stay (invisible) until the
    next round overwrites them.
    """
    b = state.logits.shape[0]
    buf_len = chunk_len
    tokens_buf = jnp.full((b, buf_len + 1), -1, jnp.int32)  # +1 = sink col
    sink = buf_len
    if limit is None:
        limit = chunk_len
    # per-row budgets: scalar (same cap every row) or [B] (batched decode —
    # rows consume the spec budget at different rates across chunks)
    limit = jnp.broadcast_to(
        jnp.minimum(jnp.asarray(limit, jnp.int32), chunk_len), (b,))
    rows = jnp.arange(b, dtype=jnp.int32)

    # Candidate cache (static greedy/sampled modes): the pending token's
    # distribution is a pure function of the current logits, and the verify
    # pass already computes warped candidates for every lane — so carry the
    # selected lane's (probs, idx) and draw the next pending from those 50
    # candidates instead of re-running a full-vocab top-k. Measured on v5e:
    # sample_residual over [1, 152k] costs 2.6 ms on the serial path per
    # round (more than the verify forward itself); the K+1-lane warped
    # computation costs 0.8 ms total. Chunk entry recomputes the cache from
    # state.logits (once per chunk — state crosses chunk boundaries).
    # The traced-cond mode (greedy=None) keeps the original per-round
    # sample_residual path.
    use_cache = greedy is not None
    if greedy is True:
        cand0 = jnp.argmax(state.logits, axis=-1).astype(jnp.int32)
    elif greedy is False:
        p0, i0 = warped_candidates(state.logits, temperature, top_p, top_k)
        cand0 = (p0, i0.astype(jnp.int32))
    else:
        cand0 = jnp.zeros((b,), jnp.int32)      # unused placeholder

    def _pending_from_cache(cand, forbid, r_pend):
        """Draw the pending token from cached candidates (exactly
        sample_residual's distribution: categorical is shift-invariant, so
        log(warped probs) with the forbidden id at -inf equals the
        masked/temperature logits draw, key-for-key)."""
        if greedy is True:
            # greedy rejection only happens when draft != argmax, so the
            # exclusion can never remove the argmax (ops/sampling.py)
            return cand
        probs, idx = cand
        logp = jnp.where((idx == forbid[:, None]) | (probs <= 0.0),
                         -jnp.inf, jnp.log(jnp.maximum(probs, 1e-38)))
        choice = jax.random.categorical(r_pend, logp, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    def cond(carry):
        t_next, state, _, _ = carry
        return jnp.any(~state.done & (t_next < limit))

    def body(carry):
        t_next, state, buf, cand = carry
        active = ~state.done & (t_next < limit)
        rng, r_pend, r_acc = jax.random.split(state.rng, 3)

        # 1. pending token: the sample the standard loop would draw now
        #    (from the residual distribution if a draft was just rejected)
        if use_cache:
            pending = _pending_from_cache(cand, state.forbid, r_pend)
        else:
            pending = sample_residual(state.logits, r_pend, temperature,
                                      top_p, top_k, state.forbid,
                                      greedy=greedy)
        pend_stop = jnp.zeros((b,), bool)
        for s in stop_tokens:
            pend_stop |= pending == s

        # 2. draft proposal
        d_tok, d_valid, start, has = _lookup_draft(
            draft_ids, state.last_tok, pending, state.cursor, spec_k)
        # no speculation past a stop or for inactive rows; a draft token
        # that *is* a stop id is rejected here (the model is free to sample
        # the stop itself next round — non-probabilistic rejection)
        d_valid &= (active & ~pend_stop)[:, None]
        for s in stop_tokens:
            d_valid &= jnp.cumprod((d_tok != s).astype(jnp.int32),
                                   axis=1).astype(bool)
        # budget truncation: accepting draft i would emit at t_next + i
        d_valid &= (t_next[:, None]
                    + jnp.arange(1, spec_k + 1, dtype=jnp.int32)[None, :]
                    ) < limit[:, None]

        # 3. one verify pass over [pending, d_1..d_K]
        tok_seq = jnp.concatenate([pending[:, None], d_tok], axis=1)
        emb = embed_tokens(params, jnp.where(tok_seq >= 0, tok_seq, 0)
                           ).astype(state.kv.act_dtype)
        positions = state.pos_next[:, None] + jnp.arange(
            spec_k + 1, dtype=jnp.int32)[None, :]
        logits_v, kv = qwen3_verify_step(
            params, state.kv, emb, state.slot_next, positions,
            state.valid_from, cfg)                       # [B, K+1, V]

        # 4. acceptance per drafted token (cumulative prefix). In cache
        # mode the full K+1 lanes are processed so lane `a`'s candidates
        # double as the next round's pending-draw distribution.
        score_logits = logits_v[:, :spec_k, :]           # dist after tok i
        cand_all = None

        def acc_sampled(_):
            probs, idx = warped_candidates(score_logits, temperature,
                                           top_p, top_k)
            hit = idx == d_tok[:, :, None]
            p_d = jnp.sum(jnp.where(hit, probs, 0.0), axis=-1)   # [B, K]
            u = jax.random.uniform(r_acc, p_d.shape)
            return u < p_d

        def acc_greedy(_):
            return jnp.argmax(score_logits, axis=-1) == d_tok

        if greedy is None:    # traced cond: a scheduling barrier on TPU —
            # callers that know the mode should pass static greedy
            acc = jax.lax.cond(temperature > 0, acc_sampled, acc_greedy,
                               operand=None)
        elif greedy:
            am_all = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)
            cand_all = am_all                            # [B, K+1]
            acc = am_all[:, :spec_k] == d_tok
        else:
            probs_all, idx_all = warped_candidates(logits_v, temperature,
                                                   top_p, top_k)
            cand_all = (probs_all, idx_all.astype(jnp.int32))  # [B,K+1,k]
            hit = idx_all[:, :spec_k, :] == d_tok[:, :, None]
            p_d = jnp.sum(jnp.where(hit, probs_all[:, :spec_k, :], 0.0),
                          axis=-1)                       # [B, K]
            u = jax.random.uniform(r_acc, p_d.shape)
            acc = u < p_d
        acc &= d_valid
        acc_prefix = jnp.cumprod(acc.astype(jnp.int32), axis=1)   # [B, K]
        a = jnp.sum(acc_prefix, axis=1).astype(jnp.int32)         # [B]

        # probabilistic rejection → exclude that id from the next draw;
        # validity/budget rejections resample unconstrained
        if spec_k == 0:
            # no drafting at all (the batched guardrail's fallback mode:
            # one pending token per round = plain decode with per-row KV
            # slots); an inbound exclusion is consumed by the pending draw
            forbid = jnp.where(active, -1, state.forbid)
        else:
            rej_i = jnp.clip(a, 0, spec_k - 1)
            rej_was_valid = jnp.take_along_axis(
                d_valid, rej_i[:, None], axis=1)[:, 0] & (a < spec_k)
            forbid = jnp.where(
                active,
                jnp.where(rej_was_valid & (temperature > 0),
                          jnp.take_along_axis(d_tok, rej_i[:, None],
                                              axis=1)[:, 0], -1),
                state.forbid)  # paused rows keep their pending exclusion

        # 5. next-round logits = after the last consumed token (index a);
        # in cache mode also select that lane's candidates for the next
        # pending draw (paused rows keep their previous cache)
        new_logits = jnp.take_along_axis(
            logits_v, a[:, None, None], axis=1)[:, 0, :]
        new_logits = jnp.where(active[:, None], new_logits, state.logits)
        if greedy is True:
            new_cand = jnp.where(
                active,
                jnp.take_along_axis(cand_all, a[:, None], axis=1)[:, 0],
                cand)
        elif greedy is False:
            sel_p = jnp.take_along_axis(
                cand_all[0], a[:, None, None], axis=1)[:, 0, :]
            sel_i = jnp.take_along_axis(
                cand_all[1], a[:, None, None], axis=1)[:, 0, :]
            new_cand = (jnp.where(active[:, None], sel_p, cand[0]),
                        jnp.where(active[:, None], sel_i, cand[1]))
        else:
            new_cand = cand

        # 6. emit pending + accepted drafts into the buffer
        n_emit = jnp.where(active, 1 + a, 0)
        emit_i = jnp.arange(spec_k + 1, dtype=jnp.int32)[None, :]
        emit_mask = active[:, None] & (emit_i < n_emit[:, None])
        out_cols = jnp.where(emit_mask, t_next[:, None] + emit_i, sink)
        buf = buf.at[rows[:, None], out_cols].set(
            jnp.where(emit_mask, tok_seq, buf[rows[:, None], out_cols]))
        buf = buf.at[:, sink].set(-1)

        # 7. ring/fuse + counters, per emitted token (reference checks the
        #    fuse after every token, core/decoder.py:106-114)
        def ring_step(i, st):
            ring, n_gen, fused = st
            tok = tok_seq[:, i]
            is_stop = jnp.zeros((b,), bool)
            for s in stop_tokens:
                is_stop |= tok == s
            counted = emit_mask[:, i] & ~is_stop
            pos = n_gen % RING
            ring = ring.at[rows, pos].set(
                jnp.where(counted, tok, ring[rows, pos]))
            n_gen = n_gen + counted.astype(jnp.int32)
            if fuse_enabled:
                fused |= counted & (n_gen > RING) & \
                    (_distinct_count(ring) <= FUSE_DISTINCT)
            return ring, n_gen, fused

        ring, n_gen, fused = jax.lax.fori_loop(
            0, spec_k + 1, ring_step,
            (state.ring, state.n_gen, jnp.zeros((b,), bool)))

        newly_stopped = active & pend_stop
        done = state.done | newly_stopped | fused
        aborted = state.aborted | fused

        # 8. advance per-row counters (pending + accepted all entered KV)
        consumed = jnp.where(active, 1 + a, 0)
        slot_next = state.slot_next + consumed
        pos_next = state.pos_next + consumed
        t_new = t_next + n_emit
        last_idx = jnp.clip(n_emit - 1, 0, spec_k)
        last_tok = jnp.where(
            active & (n_emit > 0),
            jnp.take_along_axis(tok_seq, last_idx[:, None], axis=1)[:, 0],
            state.last_tok)
        # cursor advances for fallback proposals too (monotone position
        # tracking past holes); match-driven rounds behave as before
        cursor = jnp.where(active, start + a, state.cursor)

        new_state = SpecState(
            kv=kv, logits=new_logits, forbid=forbid,
            prompt_len=state.prompt_len, valid_from=state.valid_from,
            slot_next=slot_next, pos_next=pos_next, rng=rng, ring=ring,
            n_gen=n_gen, done=done, aborted=aborted, last_tok=last_tok,
            cursor=cursor, rounds=state.rounds + active.astype(jnp.int32),
            prompt_slots=state.prompt_slots)
        return t_new, new_state, buf, new_cand

    t0 = jnp.zeros((b,), jnp.int32)
    _, state, tokens_buf, _ = jax.lax.while_loop(
        cond, body, (t0, state, tokens_buf, cand0))
    return state, tokens_buf[:, :buf_len]

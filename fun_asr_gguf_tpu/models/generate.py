"""Autoregressive generation: the whole decode loop as on-device XLA.

The reference's generation loop does one host→C++ call per token
(``core/decoder.py:91-114``: sample → llama_decode → python stop checks).
Here the loop body — embed lookup, 28-layer forward with KV-cache update,
sampling, stop-token detection and the repetition fuse — is a single
``lax.while_loop`` inside one jitted program, so N tokens cost zero host
round-trips. Chunked mode (``chunk_len < n_predict``) trades a handful of
host syncs for streaming output; the carry state (KV cache included) stays
on device between chunks.

Reference behaviors reproduced:
* stop tokens {151643, 151645} end generation and are not counted
  (``core/decoder.py:53,101``);
* the infinite-repetition fuse aborts when the last 30 generated tokens
  have ≤ 3 distinct values (``core/decoder.py:106-114``); retry-with-
  hotter-temperature stays host-side in the engine (``:201-211``).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import sample_residual, sample_token
from .config import Qwen3Config
from .qwen3 import (KVCache, embed_tokens, qwen3_decode_step, qwen3_prefill)

RING = 30          # fuse window (core/decoder.py:112)
FUSE_DISTINCT = 3  # fuse threshold


class GenState(NamedTuple):
    kv: KVCache
    logits: jnp.ndarray        # [B, V] f32 — next-token logits
    prompt_len: jnp.ndarray    # [B] i32
    valid_from: jnp.ndarray    # [B] i32 — first valid KV slot
    step: jnp.ndarray          # [] i32 — tokens generated so far (global)
    rng: jnp.ndarray
    ring: jnp.ndarray          # [B, RING] i32 — last generated ids
    n_gen: jnp.ndarray         # [B] i32 — counted (non-stop) tokens
    done: jnp.ndarray          # [B] bool
    aborted: jnp.ndarray       # [B] bool
    forbid: jnp.ndarray        # [B] i32 — token id excluded from the NEXT
    #   draw only (-1: none). Set by spec_to_gen when the speculation
    #   guardrail converts mid-rejection: the abandoned verify round's
    #   residual exclusion (Leviathan et al.) must be honored by the
    #   first plain draw or the output distribution is biased.
    prompt_slots: int          # static: P

    @property
    def all_done(self):
        return jnp.all(self.done)


@partial(jax.jit, static_argnames=("cfg", "max_len", "kv_int8"))
def prefill_init(params, embeds, attn_mask, rng, cfg: Qwen3Config,
                 max_len: int, kv_int8: bool = False) -> GenState:
    """Run embedding-injection prefill and build the generation state.

    embeds [B, P, hidden] left-padded, attn_mask [B, P]; max_len is the KV
    capacity (>= P + n_predict); ``kv_int8`` stores the cache int8.
    """
    b, p, _ = embeds.shape
    if "q8_mega" in params and b == 1 and not kv_int8:
        # the all-layers megakernel decodes from a HEAD-MAJOR cache
        # [L, kh, S, D] whose S must chunk into 128-multiples
        max_len = max_len + (-max_len % 256)
        logits, kv = qwen3_prefill(params, embeds, attn_mask, cfg,
                                   kv_max_len=max_len, kv_int8=False)
        kv = KVCache(k=jnp.transpose(kv.k[:, 0], (0, 2, 1, 3)),
                     v=jnp.transpose(kv.v[:, 0], (0, 2, 1, 3)))
    else:
        logits, kv = qwen3_prefill(params, embeds, attn_mask, cfg,
                                   kv_max_len=max_len, kv_int8=kv_int8)
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    return GenState(
        kv=kv,
        logits=logits,
        prompt_len=prompt_len,
        valid_from=(p - prompt_len).astype(jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        rng=rng,
        ring=jnp.full((b, RING), -1, jnp.int32),
        n_gen=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool),
        aborted=jnp.zeros((b,), bool),
        forbid=jnp.full((b,), -1, jnp.int32),
        prompt_slots=p,
    )


def _distinct_count(ring):
    """Number of distinct values per row of [B, RING]."""
    s = jnp.sort(ring, axis=1)
    return 1 + jnp.sum(s[:, 1:] != s[:, :-1], axis=1)


@partial(jax.jit, static_argnames=("cfg", "chunk_len", "top_k",
                                   "stop_tokens", "fuse_enabled",
                                   "greedy"),
         donate_argnames=("state",))
def generate_chunk(params, state: GenState, cfg: Qwen3Config,
                   temperature, top_p, top_k: int = 50,
                   chunk_len: int = 64,
                   stop_tokens: Tuple[int, ...] = (151643, 151645),
                   fuse_enabled: bool = True,
                   limit=None, greedy=None) -> Tuple[GenState, jnp.ndarray]:
    """Generate up to ``chunk_len`` tokens entirely on device.

    Returns (new_state, tokens [B, chunk_len] i32). Slots for rows that were
    already done (or positions after a stop) hold -1. ``limit`` is an
    optional *traced* cap (< chunk_len) letting one compiled program serve
    several lengths (used by bench.py on the slow-compile tunnel).
    ``greedy`` (static True/False) specializes the sampling branch at
    compile time — see ops/sampling.sample_token.
    """
    b = state.logits.shape[0]
    p = state.prompt_slots
    tokens_buf = jnp.full((b, chunk_len), -1, jnp.int32)
    if limit is None:
        limit = chunk_len

    def cond(carry):
        t, state, _ = carry
        return (t < chunk_len) & (t < limit) & ~state.all_done

    def body(carry):
        t, state, buf = carry
        rng, sub = jax.random.split(state.rng)
        # sample_residual == sample_token when forbid is -1 (the steady
        # state); a pending exclusion from a guardrail conversion is
        # consumed by exactly one draw
        token = sample_residual(state.logits, sub, temperature, top_p,
                                top_k, state.forbid, greedy=greedy)

        active = ~state.done
        is_stop = jnp.zeros((b,), bool)
        for s in stop_tokens:
            is_stop |= token == s
        newly_stopped = active & is_stop
        counted = active & ~is_stop

        buf = buf.at[:, t].set(jnp.where(active, token, -1))

        ring = state.ring.at[jnp.arange(b), state.n_gen % RING].set(
            jnp.where(counted, token, state.ring[jnp.arange(b),
                                                 state.n_gen % RING]))
        n_gen = state.n_gen + counted.astype(jnp.int32)
        if fuse_enabled:
            fused = counted & (n_gen > RING) & \
                (_distinct_count(ring) <= FUSE_DISTINCT)
        else:
            fused = jnp.zeros((b,), bool)
        done = state.done | newly_stopped | fused
        aborted = state.aborted | fused

        # feed the sampled token (the reference feeds even the stop token;
        # rows already done feed a dummy — their logits are never used)
        emb = embed_tokens(params, jnp.where(active, token, 0)).astype(
            state.kv.act_dtype)
        slot = p + state.step
        position = state.prompt_len + state.step
        logits, kv = qwen3_decode_step(
            params, state.kv, emb, slot, position, state.valid_from, cfg)

        new_state = GenState(
            kv=kv, logits=logits, prompt_len=state.prompt_len,
            valid_from=state.valid_from, step=state.step + 1, rng=rng,
            ring=ring, n_gen=n_gen, done=done, aborted=aborted,
            forbid=jnp.full((b,), -1, jnp.int32), prompt_slots=p)
        return t + 1, new_state, buf

    _, state, tokens_buf = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), state, tokens_buf))
    return state, tokens_buf

"""Speculative decoding tests: verify-step parity, greedy equivalence,
distribution preservation of the rejection sampler, budget/stop semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (embed_tokens, init_qwen3_params,
                                           qwen3_decode_step,
                                           qwen3_prefill, qwen3_verify_step)
from fun_asr_gguf_tpu.models.speculative import (_lookup_draft,
                                                 spec_generate_chunk,
                                                 spec_init)
from fun_asr_gguf_tpu.ops.sampling import (sample_residual, sample_token,
                                           warped_candidates)

CFG = Qwen3Config.tiny(vocab_size=97)
PARAMS = init_qwen3_params(jax.random.PRNGKey(0), CFG)
STOPS = (96,)


_SUBPROC_ENV = "FUNASR_SPEC_SUBPROC"


def make_prompt(rng, b, p, lengths):
    embeds = rng.normal(size=(b, p, CFG.hidden)).astype(np.float32) * 0.05
    mask = np.zeros((b, p), np.float32)
    for i, l in enumerate(lengths):
        mask[i, p - l:] = 1.0
        embeds[i, :p - l] = 0.0
    return jnp.asarray(embeds), jnp.asarray(mask)


def init_state(rng_np, p=6, lengths=(6,), seed=0, max_extra=64):
    e, m = make_prompt(rng_np, len(lengths), p, list(lengths))
    return prefill_init(PARAMS, e, m, jax.random.PRNGKey(seed), CFG,
                        max_len=p + max_extra)


def pad_draft(ids, d=48, b=1):
    buf = np.full((b, d), -1, np.int32)
    buf[:, :min(len(ids), d)] = np.asarray(ids[:d], np.int32)
    return jnp.asarray(buf)


def greedy_reference(state, n):
    """Standard greedy generation for comparison."""
    st, toks = generate_chunk(PARAMS, st := state, CFG, jnp.asarray(0.0),
                              jnp.asarray(1.0), 50, chunk_len=n,
                              stop_tokens=STOPS)
    out = [int(t) for t in np.asarray(toks)[0] if t >= 0]
    return st, out


class TestVerifyStep:
    def test_matches_sequential_decode_steps(self):
        """Feeding T tokens through one verify step must produce the same
        logits (and cache) as T single-token decode steps."""
        rng = np.random.default_rng(0)
        p, t = 6, 5
        e, m = make_prompt(rng, 1, p, [p])
        _, kv_a = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p + t + 2)
        _, kv_b = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p + t + 2)

        toks = rng.integers(0, CFG.vocab_size - 1, size=t).astype(np.int32)
        seq_logits = []
        for i, tok in enumerate(toks):
            emb = embed_tokens(PARAMS, jnp.asarray([tok]))
            lg, kv_a = qwen3_decode_step(
                PARAMS, kv_a, emb, jnp.asarray(p + i, jnp.int32),
                jnp.asarray([p + i], jnp.int32), jnp.asarray([0], jnp.int32),
                CFG)
            seq_logits.append(np.asarray(lg)[0])

        embs = embed_tokens(PARAMS, jnp.asarray(toks)[None, :])
        positions = jnp.asarray(np.arange(p, p + t, dtype=np.int32))[None, :]
        v_logits, kv_b = qwen3_verify_step(
            PARAMS, kv_b, embs, jnp.asarray([p], jnp.int32), positions,
            jnp.asarray([0], jnp.int32), CFG)
        np.testing.assert_allclose(np.asarray(v_logits)[0],
                                   np.stack(seq_logits),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(kv_b.k)[:, :, :p + t],
                                   np.asarray(kv_a.k)[:, :, :p + t],
                                   rtol=2e-4, atol=2e-4)

    def test_left_padded_rows(self):
        """Per-row valid_from/positions: a left-padded row must match its
        unpadded twin."""
        rng = np.random.default_rng(1)
        p, t = 8, 3
        valid = 5
        e, m = make_prompt(rng, 1, p, [valid])
        _, kv = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p + t)
        toks = rng.integers(0, CFG.vocab_size - 1, size=t).astype(np.int32)
        embs = embed_tokens(PARAMS, jnp.asarray(toks)[None, :])
        positions = (valid + jnp.arange(t, dtype=jnp.int32))[None, :]
        lg_pad, _ = qwen3_verify_step(
            PARAMS, kv, embs, jnp.asarray([p], jnp.int32), positions,
            jnp.asarray([p - valid], jnp.int32), CFG)

        e2 = e[:, p - valid:, :]
        m2 = jnp.ones((1, valid), jnp.float32)
        _, kv2 = qwen3_prefill(PARAMS, e2, m2, CFG, kv_max_len=valid + t)
        lg_nop, _ = qwen3_verify_step(
            PARAMS, kv2, embs, jnp.asarray([valid], jnp.int32), positions,
            jnp.asarray([0], jnp.int32), CFG)
        np.testing.assert_allclose(np.asarray(lg_pad), np.asarray(lg_nop),
                                   rtol=2e-4, atol=2e-4)


class TestDraftLookup:
    def test_bigram_preferred_and_cursor_tiebreak(self):
        draft = pad_draft([10, 20, 30, 40, 10, 20, 50, 60])
        d_tok, d_valid, start, has = _lookup_draft(
            draft, jnp.asarray([10], jnp.int32), jnp.asarray([20], jnp.int32),
            jnp.asarray([0], jnp.int32), 4)
        assert bool(has[0])
        # cursor 0 → the first (10,20) bigram wins → continuation 30,40,10,20
        np.testing.assert_array_equal(np.asarray(d_tok)[0], [30, 40, 10, 20])
        assert bool(np.all(np.asarray(d_valid)[0]))
        # cursor near the second occurrence → continuation 50,60,pad,pad
        d_tok2, d_valid2, _, _ = _lookup_draft(
            draft, jnp.asarray([10], jnp.int32), jnp.asarray([20], jnp.int32),
            jnp.asarray([4], jnp.int32), 4)
        np.testing.assert_array_equal(np.asarray(d_tok2)[0, :2], [50, 60])
        assert list(np.asarray(d_valid2)[0]) == [True, True, False, False]

    def test_unigram_fallback_and_no_match(self):
        draft = pad_draft([7, 8, 9])
        d_tok, d_valid, _, has = _lookup_draft(
            draft, jnp.asarray([-1], jnp.int32), jnp.asarray([8], jnp.int32),
            jnp.asarray([0], jnp.int32), 2)
        assert bool(has[0])
        np.testing.assert_array_equal(np.asarray(d_tok)[0], [9, 0])
        assert list(np.asarray(d_valid)[0]) == [True, False]

        # no match → monotonic-cursor fallback: propose draft[cursor+1:]
        # (the verify lanes are free; a wrong proposal is just rejected)
        d_tok2, d_valid2, start2, has2 = _lookup_draft(
            draft, jnp.asarray([-1], jnp.int32), jnp.asarray([55], jnp.int32),
            jnp.asarray([0], jnp.int32), 2)
        assert not bool(has2[0])
        assert int(start2[0]) == 1
        np.testing.assert_array_equal(np.asarray(d_tok2)[0], [8, 9])
        assert list(np.asarray(d_valid2)[0]) == [True, True]


class TestSpecGreedyEquivalence:
    """At temperature 0 speculative output must be bit-identical to the
    standard loop, for any draft quality."""

    def _spec_tokens(self, draft_ids, n=24, seed=3, chunk=None):
        rng = np.random.default_rng(2)
        st = spec_init(init_state(rng, seed=seed))
        chunk = chunk or n
        out = []
        while len(out) < n:
            todo = min(chunk, n - len(out))
            st, toks = spec_generate_chunk(
                PARAMS, st, draft_ids, CFG, jnp.asarray(0.0),
                jnp.asarray(1.0), 50, spec_k=4, chunk_len=chunk,
                stop_tokens=STOPS, limit=jnp.asarray(todo, jnp.int32))
            got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
            out.extend(got)
            if bool(np.asarray(st.done)[0]) or not got:
                break
        return st, out

    def test_perfect_draft(self):
        """Draft = the model's own greedy output → high acceptance, same
        tokens."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft(ref)
        _, out = self._spec_tokens(draft, n=24)
        assert out == ref

    def test_static_greedy_specialization_identical(self):
        """greedy=True/False (the engine's static call shape) must emit
        the same tokens seed-for-seed as the traced-cond default."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 20)
        draft = pad_draft(ref)

        def run(temp, greedy):
            rng = np.random.default_rng(2)
            st = spec_init(init_state(rng, seed=3))
            st, toks = spec_generate_chunk(
                PARAMS, st, draft, CFG, jnp.asarray(temp),
                jnp.asarray(1.0), 50, spec_k=4, chunk_len=20,
                stop_tokens=STOPS, greedy=greedy)
            return [int(t) for t in np.asarray(toks)[0] if t >= 0]

        assert run(0.0, True) == run(0.0, None)
        assert run(0.6, False) == run(0.6, None)

    def test_garbage_draft(self):
        """A draft unrelated to the model's output must change nothing."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft([5, 5, 5, 11, 13, 17, 19, 23])
        _, out = self._spec_tokens(draft, n=24)
        assert out == ref

    def test_empty_draft(self):
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft([])
        _, out = self._spec_tokens(draft, n=24)
        assert out == ref

    def test_partial_draft(self):
        """Draft that matches the true output for a while then diverges."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        mangled = list(ref[:10]) + [3, 1, 4, 1, 5] + list(ref[10:18])
        draft = pad_draft(mangled)
        _, out = self._spec_tokens(draft, n=24)
        assert out == ref

    def test_chunk_boundaries_preserved(self):
        """Chunked speculative decode must equal single-shot."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft(ref)
        _, out = self._spec_tokens(draft, n=24, chunk=7)
        assert out == ref

    def test_acceptance_actually_happens(self):
        """With a perfect draft the verify loop must consume multiple
        tokens per round — i.e. n_gen advances beyond the round count."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft(ref)
        rng = np.random.default_rng(2)
        st = spec_init(init_state(rng, seed=3))
        st, toks = spec_generate_chunk(
            PARAMS, st, draft, CFG, jnp.asarray(0.0), jnp.asarray(1.0), 50,
            spec_k=4, chunk_len=24, stop_tokens=STOPS)
        got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
        # slot_next counts consumed tokens; with zero acceptance it would
        # take 24 rounds (slots == tokens). Require real speculation: the
        # KV slots consumed equal tokens emitted, and tokens match ref.
        assert got == ref[:len(got)] and len(got) >= 20

    def test_n_predict_budget_exact(self):
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        draft = pad_draft(ref)
        _, out = self._spec_tokens(draft, n=9)
        assert out == ref[:9]

    def test_spec_k0_is_plain_decode(self):
        """spec_k=0 (the batched guardrail's fallback mode) emits exactly
        the standard greedy transcript: one pending token per verify
        round, no drafting."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 16)
        rng = np.random.default_rng(2)
        st = spec_init(init_state(rng, seed=3))
        out = []
        while len(out) < 16:
            st, toks = spec_generate_chunk(
                PARAMS, st, pad_draft([]), CFG, jnp.asarray(0.0),
                jnp.asarray(1.0), 50, spec_k=0, chunk_len=8,
                stop_tokens=STOPS,
                limit=jnp.asarray(min(8, 16 - len(out)), jnp.int32))
            got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
            out.extend(got)
            if bool(np.asarray(st.done)[0]) or not got:
                break
        assert out == ref[:len(out)] and len(out) >= 8
        # every round consumed exactly one KV slot (no draft writes)
        st_np = np.asarray(st.rounds)[0]
        assert int(np.asarray(st.slot_next)[0]) - st.prompt_slots == \
            int(st_np)

    def test_mid_stream_k0_fallback_keeps_transcript(self):
        """The batched guardrail's conversion — continue the SAME SpecState
        with spec_k=0 and a holes draft — must preserve the greedy
        transcript across the switch point."""
        rng = np.random.default_rng(2)
        _, ref = greedy_reference(init_state(rng, seed=3), 24)
        rng = np.random.default_rng(2)
        st = spec_init(init_state(rng, seed=3))
        draft = pad_draft([5, 5, 5, 11, 13])     # garbage → low acceptance
        st, toks = spec_generate_chunk(
            PARAMS, st, draft, CFG, jnp.asarray(0.0), jnp.asarray(1.0),
            50, spec_k=4, chunk_len=8, stop_tokens=STOPS,
            limit=jnp.asarray(8, jnp.int32))
        out = [int(t) for t in np.asarray(toks)[0] if t >= 0]
        holes = jnp.full_like(draft, -1)
        while len(out) < 24:
            st, toks = spec_generate_chunk(
                PARAMS, st, holes, CFG, jnp.asarray(0.0), jnp.asarray(1.0),
                50, spec_k=0, chunk_len=8, stop_tokens=STOPS,
                limit=jnp.asarray(min(8, 24 - len(out)), jnp.int32))
            got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
            out.extend(got)
            if bool(np.asarray(st.done)[0]) or not got:
                break
        assert out == ref[:len(out)] and len(out) >= 16


class TestSpecSampledEquivalence:
    """Temperature > 0: outputs are samples from the same distribution.
    With a PERFECT match seed-for-seed isn't possible (different draw
    counts), so check distribution preservation at the single-step level
    and basic integrity end-to-end."""

    def test_runs_and_respects_stops(self):
        rng = np.random.default_rng(4)
        st = spec_init(init_state(rng, seed=7))
        draft = pad_draft([1, 2, 3, 4, 5, 6, 7, 8])
        st, toks = spec_generate_chunk(
            PARAMS, st, draft, CFG, jnp.asarray(0.8), jnp.asarray(0.95), 20,
            spec_k=4, chunk_len=16, stop_tokens=STOPS)
        toks = np.asarray(toks)[0]
        got = [int(t) for t in toks if t >= 0]
        assert all(0 <= t < CFG.vocab_size for t in got)
        # tokens fill the buffer densely from position 0
        n = len(got)
        assert np.all(toks[:n] >= 0) and np.all(toks[n:] == -1)

    def test_rejection_sampling_preserves_distribution(self):
        """accept d w.p. p(d), else draw from residual ⇒ exact target
        distribution. Checked empirically on a tiny vocab."""
        v = 8
        logits = jnp.asarray(
            np.log(np.asarray([.30, .22, .15, .12, .09, .06, .04, .02]))
        )[None, :]
        temperature = jnp.asarray(0.9)
        top_p = jnp.asarray(0.97)
        top_k = 6
        probs, idx = warped_candidates(logits, temperature, top_p, top_k)
        p_full = np.zeros(v)
        for pr, i in zip(np.asarray(probs)[0], np.asarray(idx)[0]):
            p_full[i] += pr
        draft = 1                       # a mid-probability draft token

        n = 20000
        counts = np.zeros(v)
        key = jax.random.PRNGKey(0)
        p_d = float(p_full[draft])
        keys = jax.random.split(key, n)
        us = np.asarray(jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, 1)))(keys))
        forbid = jnp.asarray([draft], jnp.int32)
        # batch the residual draws in one vmapped call
        res = np.asarray(jax.vmap(
            lambda k: sample_residual(logits, k, temperature, top_p, top_k,
                                      forbid)[0])(keys))
        for i in range(n):
            if us[i] < p_d:
                counts[draft] += 1
            else:
                counts[res[i]] += 1
        emp = counts / n
        np.testing.assert_allclose(emp, p_full, atol=0.015)

    def test_sample_residual_no_forbid_matches_sample_token(self):
        """forbid=-1 must reproduce sample_token draw-for-draw."""
        logits = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, CFG.vocab_size)) * 2.0
        ).astype(jnp.float32)
        for seed in range(5):
            k = jax.random.PRNGKey(seed)
            a = sample_token(logits, k, jnp.asarray(0.7), jnp.asarray(0.9),
                             top_k=17)
            b = sample_residual(logits, k, jnp.asarray(0.7),
                                jnp.asarray(0.9), 17,
                                jnp.asarray([-1, -1, -1], jnp.int32))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_warped_candidates_matches_sample_token_support(self):
        """warped_candidates' support == what sample_token can draw."""
        logits = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 50)) * 3.0
        ).astype(jnp.float32)
        probs, idx = warped_candidates(logits, jnp.asarray(0.5),
                                       jnp.asarray(0.8), 10)
        support = set(np.asarray(idx)[0][np.asarray(probs)[0] > 0].tolist())
        seen = set()
        for seed in range(300):
            t = sample_token(logits, jax.random.PRNGKey(seed),
                             jnp.asarray(0.5), jnp.asarray(0.8), 10)
            seen.add(int(t[0]))
        assert seen <= support
        np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, rtol=1e-5)


class TestSpecBatchRows:
    def test_rows_independent_and_done_isolation(self):
        """Two rows with different prompts: each must match its own
        single-row greedy run (incl. per-row slots/acceptance)."""
        rng = np.random.default_rng(9)
        p = 8
        e, m = make_prompt(rng, 2, p, [8, 5])
        st2 = prefill_init(PARAMS, e, m, jax.random.PRNGKey(11), CFG,
                           max_len=p + 64)

        refs = []
        for row in range(2):
            er, mr = e[row:row + 1], m[row:row + 1]
            str_ = prefill_init(PARAMS, er, mr, jax.random.PRNGKey(11), CFG,
                                max_len=p + 64)
            _, out = greedy_reference(str_, 16)
            refs.append(out)

        draft = jnp.concatenate([pad_draft(refs[0]), pad_draft(refs[1])],
                                axis=0)
        st, toks = spec_generate_chunk(
            PARAMS, spec_init(st2), draft, CFG, jnp.asarray(0.0),
            jnp.asarray(1.0), 50, spec_k=4, chunk_len=16, stop_tokens=STOPS)
        toks = np.asarray(toks)
        for row in range(2):
            got = [int(t) for t in toks[row] if t >= 0]
            assert got == refs[row][:len(got)]
            assert len(got) == len(refs[row])


class TestSpecToGen:
    """Acceptance-rate guardrail plumbing: converting a speculative carry
    back to the plain-decode carry must continue the exact same greedy
    sequence (the engine abandons drafting mid-utterance when the
    emitted-tokens-per-round rate drops below break-even)."""

    @pytest.mark.slow   # gate-trim: the guardrail-engine E2E covers conversion
    def test_mid_stream_conversion_matches_pure_greedy(self):
        # XLA:CPU segfaults (rc=139/134) compiling THIS test's programs
        # late in a long suite — at three different crash sites across
        # runs (cache deserialize, cache serialize, raw
        # backend_compile_and_load), while the module alone always
        # passes; a 512 MiB pre-exec stack and disabling the persistent
        # cache did not help. Run the body in a fresh interpreter: the
        # coverage is identical and a compiler crash becomes a test
        # failure instead of killing the whole suite.
        import os
        import subprocess
        import sys
        if os.environ.get(_SUBPROC_ENV) != "1":
            test_id = (os.path.abspath(__file__)
                       + "::TestSpecToGen"
                       + "::test_mid_stream_conversion_matches_pure_greedy")
            # the child must NOT share the parent's persistent compile
            # cache: conftest's unclean-shutdown sentinel would make the
            # child wipe the live cache dir out from under the parent
            # (and then clear the sentinel the parent still needs)
            r = subprocess.run(
                [sys.executable, "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", test_id],
                env={**os.environ, _SUBPROC_ENV: "1",
                     "FUNASR_TEST_CACHE": os.environ.get(
                         "FUNASR_TEST_CACHE",
                         "/tmp/funasr_test_xla_cache") + "_sub"},
                capture_output=True, text=True, timeout=900)
            assert r.returncode == 0, \
                f"subprocess rc={r.returncode}\n{r.stdout}\n{r.stderr}"
            return
        from fun_asr_gguf_tpu.models.speculative import spec_to_gen
        rng = np.random.default_rng(11)
        n_total = 24

        # pure greedy reference from an identical prefill
        st_ref = init_state(rng, seed=3, max_extra=n_total + 16)
        _, ref = greedy_reference(st_ref, n_total)

        # spec with a garbage draft for a few rounds, then convert
        rng = np.random.default_rng(11)
        st = init_state(rng, seed=3, max_extra=n_total + 16)
        sst = spec_init(st)
        draft = pad_draft([5, 7, 11, 13, 17, 19, 23, 29])
        sst, toks = spec_generate_chunk(
            PARAMS, sst, draft, CFG, jnp.asarray(0.0), jnp.asarray(1.0),
            50, spec_k=4, chunk_len=8, stop_tokens=STOPS, greedy=True)
        got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
        assert int(np.asarray(sst.rounds)[0]) >= 1

        gst = spec_to_gen(sst)
        assert int(np.asarray(gst.step)) == len(got)
        while len(got) < n_total and not bool(np.asarray(gst.done)[0]):
            gst, toks = generate_chunk(
                PARAMS, gst, CFG, jnp.asarray(0.0), jnp.asarray(1.0), 50,
                chunk_len=8, stop_tokens=STOPS,
                limit=jnp.asarray(min(8, n_total - len(got)), jnp.int32))
            got.extend(int(t) for t in np.asarray(toks)[0] if t >= 0)
        assert got == ref[:len(got)] and len(got) >= n_total - 1

    def test_rounds_counter_tracks_verify_rounds(self):
        rng = np.random.default_rng(12)
        st = init_state(rng, seed=5, max_extra=40)
        sst = spec_init(st)
        # empty draft: every round emits exactly 1 token
        sst, toks = spec_generate_chunk(
            PARAMS, sst, pad_draft([]), CFG, jnp.asarray(0.0),
            jnp.asarray(1.0), 50, spec_k=4, chunk_len=6, stop_tokens=STOPS,
            greedy=True)
        n = len([t for t in np.asarray(toks)[0] if t >= 0])
        assert int(np.asarray(sst.rounds)[0]) == n


class TestGuardrailEngine:
    def test_forced_guardrail_keeps_greedy_transcript(self, tmp_path):
        """spec_min_accept set impossibly high forces the auto-off after 8
        rounds; the greedy transcript must equal the plain engine's."""
        import base64
        import os
        from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
        from fun_asr_gguf_tpu.models.config import HybridConfig
        from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint
        from fun_asr_gguf_tpu.audio import write_wav

        ckpt = str(tmp_path / "ckpt")
        cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=0)
        lines = []
        for i in range(cfg.ctc.vocab_size):
            ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
            lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
        with open(os.path.join(ckpt, "tokens.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        wav = str(tmp_path / "g.wav")
        write_wav(wav, np.random.default_rng(0).normal(size=24000) * 0.05,
                  16000)

        from fun_asr_gguf_tpu import create_asr_engine
        texts = {}
        for name, kwargs in [
                ("forced_off", dict(speculative=True,
                                    spec_min_accept=99.0)),
                ("plain", dict(speculative=False))]:
            reset_hotword_manager()
            eng = create_asr_engine(
                checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
                segment_pad_seconds=2.0, n_predict=24, prefill_buckets=(64,),
                **kwargs)
            try:
                texts[name] = eng.transcribe(
                    wav, verbose=False, temperature=0.0).text
            finally:
                eng.cleanup()
                reset_hotword_manager()
        assert texts["forced_off"] == texts["plain"]

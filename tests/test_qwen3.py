"""Qwen3 decoder tests: prefill/decode parity, generation semantics, sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.generate import (GenState, generate_chunk,
                                              prefill_init)
from fun_asr_gguf_tpu.models.qwen3 import (embed_tokens, init_qwen3_params,
                                           qwen3_decode_step,
                                           qwen3_forward_logits,
                                           qwen3_prefill, qwen3_verify_step)
from fun_asr_gguf_tpu.ops.sampling import sample_token

CFG = Qwen3Config.tiny(vocab_size=97)
PARAMS = init_qwen3_params(jax.random.PRNGKey(0), CFG)


def make_prompt(rng, b, p, lengths):
    """Left-padded random embeddings + mask."""
    embeds = rng.normal(size=(b, p, CFG.hidden)).astype(np.float32) * 0.05
    mask = np.zeros((b, p), np.float32)
    for i, l in enumerate(lengths):
        mask[i, p - l:] = 1.0
        embeds[i, :p - l] = 0.0
    return jnp.asarray(embeds), jnp.asarray(mask)


class TestPrefillDecodeParity:
    def test_incremental_matches_full(self):
        """Prefill of N+2 tokens must equal prefill of N + 2 decode steps."""
        rng = np.random.default_rng(0)
        p = 8
        full_e, full_m = make_prompt(rng, 1, p + 2, [p + 2])
        ref_logits, _ = qwen3_prefill(PARAMS, full_e, full_m, CFG)

        pre_e, pre_m = full_e[:, :p], jnp.ones((1, p), jnp.float32)
        logits, kv = qwen3_prefill(PARAMS, pre_e, pre_m, CFG, kv_max_len=p + 2)
        for t in range(2):
            emb = full_e[:, p + t, :]
            logits, kv = qwen3_decode_step(
                PARAMS, kv, emb,
                jnp.asarray(p + t, jnp.int32),
                jnp.asarray([p + t], jnp.int32),
                jnp.asarray([0], jnp.int32), CFG)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-4)

    def test_left_padding_invariance(self):
        """Logits must not depend on how much left padding the prompt has."""
        rng = np.random.default_rng(1)
        valid = 6
        e1, m1 = make_prompt(rng, 1, valid, [valid])
        core = np.asarray(e1)[0, -valid:]
        out1, _ = qwen3_prefill(PARAMS, e1, m1, CFG)

        p2 = 12
        e2 = np.zeros((1, p2, CFG.hidden), np.float32)
        e2[0, p2 - valid:] = core
        e2[0, :p2 - valid] = rng.normal(size=(p2 - valid, CFG.hidden)) * 9.0
        m2 = np.zeros((1, p2), np.float32)
        m2[0, p2 - valid:] = 1.0
        out2, _ = qwen3_prefill(PARAMS, jnp.asarray(e2), jnp.asarray(m2), CFG)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=2e-4, atol=2e-4)

    def test_forward_logits_matches_prefill_last(self):
        rng = np.random.default_rng(2)
        e, m = make_prompt(rng, 2, 7, [7, 4])
        last, _ = qwen3_prefill(PARAMS, e, m, CFG)
        allpos = qwen3_forward_logits(PARAMS, e, m, CFG)
        np.testing.assert_allclose(np.asarray(allpos)[:, -1], np.asarray(last),
                                   rtol=2e-4, atol=2e-4)


class TestSampling:
    def test_greedy_at_zero_temperature(self):
        logits = jnp.asarray(np.random.default_rng(3).normal(size=(2, 50)),
                             dtype=jnp.float32)
        tok = sample_token(logits, jax.random.PRNGKey(0),
                           jnp.asarray(0.0), jnp.asarray(1.0), 10)
        np.testing.assert_array_equal(np.asarray(tok),
                                      np.asarray(jnp.argmax(logits, -1)))

    def test_top_k_restricts_support(self):
        rng = np.random.default_rng(4)
        logits = jnp.asarray(rng.normal(size=(1, 100)), dtype=jnp.float32)
        top5 = set(np.asarray(jax.lax.top_k(logits, 5)[1])[0].tolist())
        seen = set()
        for i in range(50):
            tok = sample_token(logits, jax.random.PRNGKey(i),
                               jnp.asarray(2.0), jnp.asarray(1.0), 5)
            seen.add(int(tok[0]))
        assert seen <= top5

    def test_topk_large_exact_vs_lax(self):
        """Two-stage pruned top-k must equal lax.top_k bit-for-bit,
        including index tie-breaking, on long rows."""
        from fun_asr_gguf_tpu.ops.sampling import topk_large
        rng = np.random.default_rng(9)
        for v in (151936, 151937, 9000, 131072):
            x = rng.normal(size=(3, v)).astype(np.float32)
            # adversarial ties: repeat one high value at many positions,
            # spread over many blocks, incl. several inside one block
            x[0, 5] = x[0, 77] = x[0, 130] = x[0, 4000] = x[0, v - 1] = 7.5
            x[1, :200] = 9.0                      # 200-way tie at the top
            xj = jnp.asarray(x)
            for k in (1, 50, 63):
                rv, ri = jax.lax.top_k(xj, k)
                tv, ti = topk_large(xj, k)
                np.testing.assert_array_equal(np.asarray(rv),
                                              np.asarray(tv), err_msg=f"{v},{k}")
                np.testing.assert_array_equal(np.asarray(ri),
                                              np.asarray(ti), err_msg=f"{v},{k}")

    def test_top_p_keeps_argmax_when_tiny(self):
        logits = jnp.asarray([[0.0, 10.0, 0.0, 0.0]], dtype=jnp.float32)
        for i in range(20):
            tok = sample_token(logits, jax.random.PRNGKey(i),
                               jnp.asarray(1.0), jnp.asarray(1e-9), 4)
            assert int(tok[0]) == 1  # min_keep=1 → always the argmax


class TestGenerate:
    def _init_state(self, rng_np, p=6, lengths=(6,), seed=0, max_extra=40):
        e, m = make_prompt(rng_np, len(lengths), p, list(lengths))
        return prefill_init(PARAMS, e, m, jax.random.PRNGKey(seed), CFG,
                            max_len=p + max_extra)

    def test_greedy_deterministic(self):
        rng = np.random.default_rng(5)
        st1 = self._init_state(rng)
        rng = np.random.default_rng(5)
        st2 = self._init_state(rng)
        _, t1 = generate_chunk(PARAMS, st1, CFG, jnp.asarray(0.0),
                               jnp.asarray(1.0), 50, chunk_len=10,
                               stop_tokens=(96,))
        _, t2 = generate_chunk(PARAMS, st2, CFG, jnp.asarray(0.0),
                               jnp.asarray(1.0), 50, chunk_len=10,
                               stop_tokens=(96,))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_static_greedy_specialization_identical(self):
        """greedy=True/False (static branch, the engine's call shape) must
        produce the same tokens seed-for-seed as greedy=None (traced
        lax.cond) at the matching temperature."""
        def run(temp, greedy):
            rng = np.random.default_rng(7)
            st = self._init_state(rng, seed=2)
            _, t = generate_chunk(PARAMS, st, CFG, jnp.asarray(temp),
                                  jnp.asarray(1.0), 50, chunk_len=10,
                                  stop_tokens=(96,), greedy=greedy)
            return np.asarray(t)

        np.testing.assert_array_equal(run(0.0, None), run(0.0, True))
        np.testing.assert_array_equal(run(0.7, None), run(0.7, False))

    def test_chunked_equals_single_shot(self):
        rng = np.random.default_rng(6)
        st = self._init_state(rng, seed=1)
        stA, tA = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                 jnp.asarray(1.0), 50, chunk_len=12,
                                 stop_tokens=(96,))
        rng = np.random.default_rng(6)
        st = self._init_state(rng, seed=1)
        stB, t1 = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                 jnp.asarray(1.0), 50, chunk_len=6,
                                 stop_tokens=(96,))
        stB, t2 = generate_chunk(PARAMS, stB, CFG, jnp.asarray(0.0),
                                 jnp.asarray(1.0), 50, chunk_len=6,
                                 stop_tokens=(96,))
        tB = np.concatenate([np.asarray(t1), np.asarray(t2)], axis=1)
        np.testing.assert_array_equal(np.asarray(tA), tB)
        assert int(stA.n_gen[0]) == int(stB.n_gen[0])

    def test_stop_token_halts_and_not_counted(self):
        """Force the model to emit a stop token via a rigged embed table."""
        rng = np.random.default_rng(7)
        st = self._init_state(rng, seed=2)
        # every token is a stop token → generation ends at step 1, n_gen 0
        all_stops = tuple(range(CFG.vocab_size))
        st2, toks = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                   jnp.asarray(1.0), 50, chunk_len=8,
                                   stop_tokens=all_stops[:16] or (0,))
        toks = np.asarray(toks)
        if int(toks[0, 0]) < 16:
            assert bool(st2.done[0])
            assert int(st2.n_gen[0]) == 0
            assert np.all(toks[0, 1:] == -1)

    def test_repetition_fuse(self):
        """A model rigged to repeat must trip the fuse and set aborted."""
        rng = np.random.default_rng(8)
        st = self._init_state(rng, seed=3, max_extra=80)
        # greedy with a tiny vocab of 97 and random weights often repeats;
        # force it by zero temperature and no stop tokens
        st2, toks = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                   jnp.asarray(1.0), 50, chunk_len=80,
                                   stop_tokens=(10_000,))
        toks = np.asarray(toks)[0]
        gen = toks[toks >= 0]
        if bool(st2.aborted[0]):
            # fuse fired: the last 30 counted tokens have <= 3 distinct values
            assert len(set(gen[-30:].tolist())) <= 3
            assert bool(st2.done[0])
        else:
            # model didn't degenerate — fuse must not have fired spuriously
            assert len(gen) == 80

    @pytest.mark.slow  # 16s; batched-row isolation also covered by test_batch + spec batch rows
    def test_batched_generation_rows_independent(self):
        rng = np.random.default_rng(9)
        st = self._init_state(rng, p=8, lengths=(8, 5), seed=4)
        st2, toks = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                   jnp.asarray(1.0), 50, chunk_len=6,
                                   stop_tokens=(96,))
        assert np.asarray(toks).shape == (2, 6)

        # row 1 solo must match row 1 of the batch (greedy)
        rng = np.random.default_rng(9)
        e, m = make_prompt(rng, 2, 8, [8, 5])
        st_solo = prefill_init(PARAMS, e[1:], m[1:], jax.random.PRNGKey(4),
                               CFG, max_len=8 + 40)
        _, toks_solo = generate_chunk(PARAMS, st_solo, CFG, jnp.asarray(0.0),
                                      jnp.asarray(1.0), 50, chunk_len=6,
                                      stop_tokens=(96,))
        np.testing.assert_array_equal(np.asarray(toks)[1],
                                      np.asarray(toks_solo)[0])


class TestPackedLayout:
    """pack_qwen3_params fuses qkv and gate/up; outputs must match."""

    def test_packed_prefill_matches_unpacked(self):
        from fun_asr_gguf_tpu.models.qwen3 import pack_qwen3_params
        rng = np.random.default_rng(11)
        e, m = make_prompt(rng, 1, 10, [7])
        ref, ref_kv = qwen3_prefill(PARAMS, e, m, CFG)
        packed = pack_qwen3_params(PARAMS)
        assert "qkv_w" in packed["layers"]
        assert "q_w" not in packed["layers"]
        out, kv = qwen3_prefill(packed, e, m, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(kv.k), np.asarray(ref_kv.k),
                                   rtol=1e-4, atol=1e-4)

    def test_packed_greedy_generation_identical(self):
        from fun_asr_gguf_tpu.models.qwen3 import pack_qwen3_params
        rng = np.random.default_rng(12)
        e, m = make_prompt(rng, 1, 8, [8])
        packed = pack_qwen3_params(PARAMS)
        outs = []
        for p in (PARAMS, packed):
            st = prefill_init(p, e, m, jax.random.PRNGKey(0), CFG,
                              max_len=8 + 16)
            _, toks = generate_chunk(p, st, CFG, jnp.asarray(0.0),
                                     jnp.asarray(1.0), 50, chunk_len=12,
                                     stop_tokens=(96,))
            outs.append(np.asarray(toks))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_pack_idempotent(self):
        from fun_asr_gguf_tpu.models.qwen3 import pack_qwen3_params
        packed = pack_qwen3_params(PARAMS)
        assert pack_qwen3_params(packed) is packed

    def test_quantize_pack_commutes_exactly(self):
        """q8_0 rows are independent → quantize∘pack == pack∘quantize."""
        from fun_asr_gguf_tpu.models.qwen3 import (pack_qwen3_params,
                                                   quantize_qwen3_params)
        a = pack_qwen3_params(quantize_qwen3_params(PARAMS))
        b = quantize_qwen3_params(pack_qwen3_params(PARAMS))
        for key in ("qkv_w", "gate_up_w", "o_w", "down_w"):
            np.testing.assert_array_equal(
                np.asarray(a["layers"][key].q), np.asarray(b["layers"][key].q))
            np.testing.assert_array_equal(
                np.asarray(a["layers"][key].d), np.asarray(b["layers"][key].d))


class TestQuantizedLMHead:
    def test_logits_close_to_dense(self):
        from fun_asr_gguf_tpu.models.qwen3 import quantize_lm_head
        rng = np.random.default_rng(13)
        e, m = make_prompt(rng, 1, 8, [8])
        ref, _ = qwen3_prefill(PARAMS, e, m, CFG)
        qp = quantize_lm_head(PARAMS, CFG)
        assert "lm_head_q" in qp
        out, _ = qwen3_prefill(qp, e, m, CFG)
        # q8_0 head: small quantization error, argmax should agree
        assert np.argmax(np.asarray(out)) == np.argmax(np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.05 * scale

    def test_idempotent(self):
        from fun_asr_gguf_tpu.models.qwen3 import quantize_lm_head
        qp = quantize_lm_head(PARAMS, CFG)
        assert quantize_lm_head(qp, CFG) is qp


class TestPerChannelLMHead:
    def test_logits_close_and_argmax_agrees(self):
        from fun_asr_gguf_tpu.models.qwen3 import quantize_lm_head_per_channel
        rng = np.random.default_rng(21)
        e, m = make_prompt(rng, 1, 8, [8])
        ref, _ = qwen3_prefill(PARAMS, e, m, CFG)
        qp = quantize_lm_head_per_channel(PARAMS, CFG)
        assert "lm_head_i8" in qp
        out, _ = qwen3_prefill(qp, e, m, CFG)
        assert np.argmax(np.asarray(out)) == np.argmax(np.asarray(ref))
        scale = np.abs(np.asarray(ref)).max()
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.08 * scale

    def test_idempotent_and_yields_to_q8_head(self):
        from fun_asr_gguf_tpu.models.qwen3 import (quantize_lm_head,
                                                   quantize_lm_head_per_channel)
        qp = quantize_lm_head_per_channel(PARAMS, CFG)
        assert quantize_lm_head_per_channel(qp, CFG) is qp
        q8 = quantize_lm_head(PARAMS, CFG)
        assert quantize_lm_head_per_channel(q8, CFG) is q8

    def test_generation_runs_with_i8_head(self):
        from fun_asr_gguf_tpu.models.qwen3 import quantize_lm_head_per_channel
        rng = np.random.default_rng(22)
        e, m = make_prompt(rng, 1, 8, [8])
        qp = quantize_lm_head_per_channel(PARAMS, CFG)
        st = prefill_init(qp, e, m, jax.random.PRNGKey(0), CFG, max_len=8 + 12)
        _, toks = generate_chunk(qp, st, CFG, jnp.asarray(0.0),
                                 jnp.asarray(1.0), 50, chunk_len=8,
                                 stop_tokens=(96,))
        assert np.asarray(toks).shape == (1, 8)


class TestInt8Weights:
    def test_logits_close_and_greedy_matches(self):
        from fun_asr_gguf_tpu.models.qwen3 import (pack_qwen3_params,
                                                   quantize_qwen3_params_int8)
        rng = np.random.default_rng(31)
        e, m = make_prompt(rng, 1, 8, [8])
        packed = pack_qwen3_params(PARAMS)
        ref, _ = qwen3_prefill(packed, e, m, CFG)
        qp = quantize_qwen3_params_int8(packed)
        from fun_asr_gguf_tpu.models.qwen3 import Int8Weight
        assert isinstance(qp["layers"]["qkv_w"], Int8Weight)
        out, _ = qwen3_prefill(qp, e, m, CFG)
        scale = np.abs(np.asarray(ref)).max()
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 0.12 * scale

        # greedy generation agrees on an unambiguous tiny model
        for p in (packed, qp):
            st = prefill_init(p, e, m, jax.random.PRNGKey(0), CFG,
                              max_len=8 + 10)
            _, toks = generate_chunk(p, st, CFG, jnp.asarray(0.0),
                                     jnp.asarray(1.0), 50, chunk_len=6,
                                     stop_tokens=(96,))
            assert np.asarray(toks).shape == (1, 6)

    def test_idempotent_and_unpacked_layout(self):
        from fun_asr_gguf_tpu.models.qwen3 import (Int8Weight,
                                                   quantize_qwen3_params_int8)
        qp = quantize_qwen3_params_int8(PARAMS)     # unpacked layout
        assert isinstance(qp["layers"]["q_w"], Int8Weight)
        qp2 = quantize_qwen3_params_int8(qp)
        assert qp2["layers"]["q_w"] is qp["layers"]["q_w"]

    def test_pack_after_int8(self):
        from fun_asr_gguf_tpu.models.qwen3 import (Int8Weight,
                                                   pack_qwen3_params,
                                                   quantize_qwen3_params_int8)
        rng = np.random.default_rng(32)
        e, m = make_prompt(rng, 1, 6, [6])
        a = pack_qwen3_params(quantize_qwen3_params_int8(PARAMS))
        assert isinstance(a["layers"]["qkv_w"], Int8Weight)
        out_a, _ = qwen3_prefill(a, e, m, CFG)
        b = quantize_qwen3_params_int8(pack_qwen3_params(PARAMS))
        out_b, _ = qwen3_prefill(b, e, m, CFG)
        # same quantization either way (per-channel scales are per output
        # column, unaffected by concatenation order)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=2e-2, atol=1e-3)


class TestInt4Weights:
    """Experimental w4a16 decode format (Int4Weight: packed nibbles +
    group-32 scales, in-graph dequant fused into the dots)."""

    def test_pack_unpack_dequant_exact(self):
        from fun_asr_gguf_tpu.models.qwen3 import (int4_dequantize,
                                                   int4_quantize_weight)
        rng = np.random.default_rng(40)
        w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
        q = int4_quantize_weight(w)
        assert q.packed.shape == (32, 48) and q.scale.shape == (2, 48)
        dense = np.asarray(int4_dequantize(q, jnp.float32))
        # manual reference reconstruction
        g = np.asarray(w).reshape(2, 32, 48)
        s = np.abs(g).max(axis=1, keepdims=True) / 7.0
        ref = (np.clip(np.round(g / s), -8, 7)
               * np.float32(np.asarray(q.scale, np.float32))[:, None, :])
        np.testing.assert_allclose(dense, ref.reshape(64, 48),
                                   rtol=1e-2, atol=1e-3)
        # round-trip error bounded by half a step per group
        assert np.abs(dense - np.asarray(w)).max() <= (
            np.abs(np.asarray(w)).max() / 7.0) * 0.5001 + 1e-6

    def test_logits_close_and_greedy_matches(self):
        from fun_asr_gguf_tpu.models.qwen3 import (Int4Weight,
                                                   int4_dequantize,
                                                   pack_qwen3_params,
                                                   quantize_qwen3_params_int4)
        rng = np.random.default_rng(41)
        e, m = make_prompt(rng, 1, 8, [8])
        packed = pack_qwen3_params(PARAMS)
        qp = quantize_qwen3_params_int4(packed)
        assert isinstance(qp["layers"]["qkv_w"], Int4Weight)

        # exact reference: the same params with int4 weights dequantized
        # to dense OUTSIDE the graph — the in-graph path must match it
        # (both are f32 compute on identical reconstructed weights)
        dense = dict(qp)
        dense["layers"] = {
            k: (int4_dequantize(w, jnp.float32)
                if isinstance(w, Int4Weight) else w)
            for k, w in qp["layers"].items()}
        ref, _ = qwen3_prefill(dense, e, m, CFG)
        out, _ = qwen3_prefill(qp, e, m, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

        # and stays in the full-precision model's ballpark (4-bit on a
        # tiny RANDOM model is far noisier than on trained weights —
        # the exact contract is the dense-dequant equivalence above)
        full, _ = qwen3_prefill(packed, e, m, CFG)
        scale = np.abs(np.asarray(full)).max()
        assert np.abs(np.asarray(out) - np.asarray(full)).max() \
            < 0.6 * scale

        st = prefill_init(qp, e, m, jax.random.PRNGKey(0), CFG,
                          max_len=8 + 10)
        _, toks = generate_chunk(qp, st, CFG, jnp.asarray(0.0),
                                 jnp.asarray(1.0), 50, chunk_len=6,
                                 stop_tokens=(96,))
        assert np.asarray(toks).shape == (1, 6)

    def test_idempotent(self):
        from fun_asr_gguf_tpu.models.qwen3 import (Int4Weight,
                                                   quantize_qwen3_params_int4)
        qp = quantize_qwen3_params_int4(PARAMS)
        assert isinstance(qp["layers"]["q_w"], Int4Weight)
        qp2 = quantize_qwen3_params_int4(qp)
        assert qp2["layers"]["q_w"] is qp["layers"]["q_w"]


class TestInt8KVCache:
    """int8 KV cache (QuantKV): per-(slot,head) absmax scales, dequant
    fused into the attention dots; halves KV HBM reads for batched
    serving. Quantization is per-entry, so the verify step and a
    sequential decode produce IDENTICAL caches and logits within the
    int8-KV mode."""

    def _prefill(self, rng, p, t):
        e, m = make_prompt(rng, 1, p, [p])
        _, kv = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p + t + 2,
                              kv_int8=True)
        return e, m, kv

    def test_cache_structure_and_dequant_close(self):
        from fun_asr_gguf_tpu.models.qwen3 import QuantKV
        rng = np.random.default_rng(50)
        p = 6
        e, m = make_prompt(rng, 1, p, [p])
        _, kv8 = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p,
                               kv_int8=True)
        _, kv = qwen3_prefill(PARAMS, e, m, CFG, kv_max_len=p)
        assert isinstance(kv8.k, QuantKV)
        assert kv8.k.q.dtype == jnp.int8
        assert kv8.max_len == p and kv8.act_dtype == kv.k.dtype
        deq = (np.asarray(kv8.k.q, np.float32)
               * np.asarray(kv8.k.s, np.float32))
        ref = np.asarray(kv.k, np.float32)
        # 8-bit per-(slot,head) absmax: ~1/254 of each head's absmax
        bound = np.abs(ref).max(axis=-1, keepdims=True) / 127.0
        assert (np.abs(deq - ref) <= 0.5001 * bound + 1e-7).all()

    def test_verify_matches_sequential_under_int8_kv(self):
        rng = np.random.default_rng(51)
        p, t = 6, 5
        _, _, kv_a = self._prefill(rng, p, t)
        _, _, kv_b = self._prefill(np.random.default_rng(51), p, t)

        toks = rng.integers(0, CFG.vocab_size - 1, size=t).astype(np.int32)
        seq_logits = []
        for i, tok in enumerate(toks):
            emb = embed_tokens(PARAMS, jnp.asarray([tok]))
            lg, kv_a = qwen3_decode_step(
                PARAMS, kv_a, emb, jnp.asarray(p + i, jnp.int32),
                jnp.asarray([p + i], jnp.int32),
                jnp.asarray([0], jnp.int32), CFG)
            seq_logits.append(np.asarray(lg)[0])

        embs = embed_tokens(PARAMS, jnp.asarray(toks)[None, :])
        positions = jnp.asarray(np.arange(p, p + t, dtype=np.int32))[None, :]
        v_logits, kv_b = qwen3_verify_step(
            PARAMS, kv_b, embs, jnp.asarray([p], jnp.int32), positions,
            jnp.asarray([0], jnp.int32), CFG)
        np.testing.assert_allclose(np.asarray(v_logits)[0],
                                   np.stack(seq_logits),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(
            np.asarray(kv_b.k.q)[:, :, :p + t],
            np.asarray(kv_a.k.q)[:, :, :p + t])

    def test_generation_close_to_bf16_kv(self):
        rng = np.random.default_rng(52)
        p = 6
        e, m = make_prompt(rng, 1, p, [p])

        def run(kv_int8):
            st = prefill_init(PARAMS, e, m, jax.random.PRNGKey(3), CFG,
                              max_len=p + 10, kv_int8=kv_int8)
            lg = np.asarray(st.logits)
            st, toks = generate_chunk(PARAMS, st, CFG, jnp.asarray(0.0),
                                      jnp.asarray(1.0), 50, chunk_len=6,
                                      stop_tokens=(96,))
            return lg, np.asarray(toks)

        lg16, tok16 = run(False)
        lg8, tok8 = run(True)
        # prefill logits: only KV storage differs, last-token logits are
        # computed from activations — identical
        np.testing.assert_allclose(lg8, lg16, rtol=2e-4, atol=2e-4)
        assert tok8.shape == tok16.shape
        # decode logits read the quantized cache: close, not identical
        # (greedy ids may legitimately differ on near-tied random logits)

"""Fused residual-MLP megacall kernels (v1: q8_mlp_fused, v2: + next-layer
qkv) — permutation algebra, Pallas interpret parity, and the fused decode
wiring in qwen3_decode_step / qwen3_verify_step.

The reference's q8_0 decode runs every layer matmul through llama.cpp's
fused kernels (``bin/ggml-*.dll``); these tests pin our TPU megacall
equivalents against an independently computed dense chain.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.ops.quant_matmul import (
    QuantTensor, IndexedQuant, block_permute, block_unpermute,
    dequantize_weight, permute_out_channels, q8_mlp_fused,
    q8_mlp_qkv_fused, quantize_weight)

M, QD, H, FFN, NQ = 3, 128, 64, 96, 160
EPS = 1e-6


def _mk(seed):
    rng = np.random.default_rng(seed)

    def w(k, n):
        return jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.05)

    return {
        "merged": jnp.asarray(
            rng.normal(size=(M, QD)).astype(np.float32) * 0.3),
        "resid": jnp.asarray(
            rng.normal(size=(M, H)).astype(np.float32) * 0.3),
        "post_w": jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.1
                              ).astype(jnp.float32),
        "in_w": jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.1
                            ).astype(jnp.float32),
        "o": w(QD, H), "gu": w(H, 2 * FFN), "dn": w(FFN, H),
        "qkv": w(H, NQ),
    }


def _dense_chain(t):
    """Independent f32 reference in NATURAL space, quantized weights."""
    def deq(w):
        return dequantize_weight(quantize_weight(w))
    attn = t["merged"] @ deq(t["o"])
    h1 = attn + t["resid"]
    nh = (h1 * jax.lax.rsqrt(
        jnp.mean(h1 * h1, axis=-1, keepdims=True) + EPS)) * t["post_w"]
    gu = nh @ deq(t["gu"])
    act = jax.nn.silu(gu[:, :FFN]) * gu[:, FFN:]
    out = act @ deq(t["dn"]) + h1
    nh2 = (out * jax.lax.rsqrt(
        jnp.mean(out * out, axis=-1, keepdims=True) + EPS)) * t["in_w"]
    qkv = nh2 @ deq(t["qkv"])
    return out, qkv


def _fused_weights(t):
    o_q = permute_out_channels(quantize_weight(t["o"]))
    gu_q = permute_out_channels(quantize_weight(t["gu"]), halves=2)
    dn_q = permute_out_channels(quantize_weight(t["dn"]))
    qkv_q = quantize_weight(t["qkv"])
    return o_q, gu_q, dn_q, qkv_q


def _close(a, b, tol=3e-2):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = np.abs(b).max() + 1e-6
    assert np.abs(a - b).max() / scale < tol, \
        f"maxdiff {np.abs(a - b).max()} vs scale {scale}"


class TestMegacallV1:
    def test_ref_matches_dense_chain(self):
        t = _mk(0)
        o_q, gu_q, dn_q, _ = _fused_weights(t)
        out = q8_mlp_fused(
            block_permute(t["merged"]), block_permute(t["resid"]),
            block_permute(t["post_w"]), o_q, gu_q, dn_q, EPS,
            use_pallas=False)
        exp, _ = _dense_chain(t)
        _close(block_unpermute(out), exp)

    def test_interpret_matches_ref(self):
        t = _mk(1)
        o_q, gu_q, dn_q, _ = _fused_weights(t)
        args = (block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]), o_q, gu_q, dn_q, EPS)
        ref = q8_mlp_fused(*args, use_pallas=False)
        got = q8_mlp_fused(*args, use_pallas=True, interpret=True)
        _close(got, ref, tol=2e-2)

    def test_interpret_indexed_layer(self):
        t0, t1 = _mk(2), _mk(3)
        stacked = []
        for key, halves in (("o", 1), ("gu", 2), ("dn", 1)):
            qs = [permute_out_channels(quantize_weight(t[key]), halves)
                  for t in (t0, t1)]
            stacked.append(QuantTensor(
                q=jnp.stack([q.q for q in qs]),
                d=jnp.stack([q.d for q in qs])))
        o_s, gu_s, dn_s = stacked
        for l, t in ((0, t0), (1, t1)):
            got = q8_mlp_fused(
                block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]),
                IndexedQuant(o_s, l), IndexedQuant(gu_s, l),
                IndexedQuant(dn_s, l), EPS,
                use_pallas=True, interpret=True)
            exp, _ = _dense_chain(t)
            _close(block_unpermute(got), exp)

    def test_dyn_path_honors_per_weight_indices(self):
        """The scalar-prefetch path must use EACH IndexedQuant's own
        (traced) layer index — o from layer 0 with gate_up/down from
        layer 1 selects layer 1's MLP weights, not layer 0's."""
        t0, t1 = _mk(2), _mk(3)
        stacked = []
        for key, halves in (("o", 1), ("gu", 2), ("dn", 1)):
            qs = [permute_out_channels(quantize_weight(t[key]), halves)
                  for t in (t0, t1)]
            stacked.append(QuantTensor(
                q=jnp.stack([q.q for q in qs]),
                d=jnp.stack([q.d for q in qs])))
        o_s, gu_s, dn_s = stacked
        mixed = dict(t0, gu=t1["gu"], dn=t1["dn"])
        got = q8_mlp_fused(
            block_permute(t0["merged"]), block_permute(t0["resid"]),
            block_permute(t0["post_w"]),
            IndexedQuant(o_s, jnp.asarray(0)),
            IndexedQuant(gu_s, jnp.asarray(1)),
            IndexedQuant(dn_s, jnp.asarray(1)), EPS,
            use_pallas=True, interpret=True)
        exp, _ = _dense_chain(mixed)
        _close(block_unpermute(got), exp)


class TestMegacallV2:
    def test_ref_matches_dense_chain(self):
        t = _mk(4)
        o_q, gu_q, dn_q, qkv_q = _fused_weights(t)
        out, qkv = q8_mlp_qkv_fused(
            block_permute(t["merged"]), block_permute(t["resid"]),
            block_permute(t["post_w"]), block_permute(t["in_w"]),
            o_q, gu_q, dn_q, qkv_q, EPS, use_pallas=False)
        exp_out, exp_qkv = _dense_chain(t)
        _close(block_unpermute(out), exp_out)
        _close(qkv, exp_qkv)

    def test_residual_identical_to_v1(self):
        t = _mk(5)
        o_q, gu_q, dn_q, qkv_q = _fused_weights(t)
        common = (block_permute(t["merged"]), block_permute(t["resid"]),
                  block_permute(t["post_w"]))
        v1 = q8_mlp_fused(*common, o_q, gu_q, dn_q, EPS, use_pallas=False)
        v2, _ = q8_mlp_qkv_fused(*common, block_permute(t["in_w"]),
                                 o_q, gu_q, dn_q, qkv_q, EPS,
                                 use_pallas=False)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=0, atol=1e-5)

    def test_interpret_matches_ref(self):
        t = _mk(6)
        o_q, gu_q, dn_q, qkv_q = _fused_weights(t)
        args = (block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]), block_permute(t["in_w"]),
                o_q, gu_q, dn_q, qkv_q, EPS)
        r_out, r_qkv = q8_mlp_qkv_fused(*args, use_pallas=False)
        g_out, g_qkv = q8_mlp_qkv_fused(*args, use_pallas=True,
                                        interpret=True)
        _close(g_out, r_out, tol=2e-2)
        _close(g_qkv, r_qkv, tol=2e-2)


class TestStagedMegacall:
    """The pipelined (multi-step grid) variant must agree with the
    single-stage reference on every stage layout, including the no-qkv
    (last layer) form."""

    def _mk_big(self, seed):
        rng = np.random.default_rng(seed)
        M2, QD2, H2, FFN2, NQ2 = 2, 512, 256, 512, 768

        def w(k, n):
            return jnp.asarray(
                rng.normal(size=(k, n)).astype(np.float32) * 0.05)

        t = {
            "merged": jnp.asarray(
                rng.normal(size=(M2, QD2)).astype(np.float32) * 0.3),
            "resid": jnp.asarray(
                rng.normal(size=(M2, H2)).astype(np.float32) * 0.3),
            "post_w": jnp.asarray(1.0 + rng.normal(size=(H2,)) * 0.1
                                  ).astype(jnp.float32),
            "in_w": jnp.asarray(1.0 + rng.normal(size=(H2,)) * 0.1
                                ).astype(jnp.float32),
            "o": w(QD2, H2), "gu": w(H2, 2 * FFN2), "dn": w(FFN2, H2),
            "qkv": w(H2, NQ2),
        }
        dims = (M2, QD2, H2, FFN2, NQ2)
        return t, dims

    @pytest.mark.parametrize("plan", [(2, 4, 2, 3), (1, 2, 1, 1),
                                      (4, 4, 4, 3)])
    def test_staged_matches_ref(self, plan):
        from fun_asr_gguf_tpu.ops.quant_matmul import _q8_mega_staged_call
        t, (m2, qd2, h2, ffn2, nq2) = self._mk_big(7)
        o_q = permute_out_channels(quantize_weight(t["o"]))
        gu_q = permute_out_channels(quantize_weight(t["gu"]), halves=2)
        dn_q = permute_out_channels(quantize_weight(t["dn"]))
        qkv_q = quantize_weight(t["qkv"])
        args = (block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]), block_permute(t["in_w"]),
                o_q, gu_q, dn_q, qkv_q, EPS)
        r_out, r_qkv = q8_mlp_qkv_fused(*args, use_pallas=False)

        def stk(w):
            return QuantTensor(q=w.q[None], d=w.d[None])

        xm = block_permute(t["merged"]).astype(jnp.bfloat16)
        g_out, g_qkv = _q8_mega_staged_call(
            xm, block_permute(t["resid"]),
            block_permute(t["post_w"]).reshape(1, h2),
            block_permute(t["in_w"]).reshape(1, h2),
            stk(o_q), 0, stk(gu_q), 0, stk(dn_q), 0, stk(qkv_q), 0,
            EPS, plan, True)
        _close(g_out, r_out)
        _close(g_qkv, r_qkv)

    def test_staged_head_group_matches_ref(self):
        """The fused-lm_head form: the 'qkv' stage group carries a
        vocab-sized projection with the final norm in the next-input_ln
        slot, streamed over MANY chunks through the single-when body
        (the real head runs 149 chunks; here 12)."""
        from fun_asr_gguf_tpu.ops.quant_matmul import (_q8_mega_staged_call,
                                                       q8_layer_head_fused)
        t, (m2, qd2, h2, ffn2, _) = self._mk_big(11)
        nvocab = 12 * 128                     # 12 chunks of 128 rows
        rng = np.random.default_rng(12)
        head = jnp.asarray(
            rng.normal(size=(h2, nvocab)).astype(np.float32) * 0.05)
        o_q = permute_out_channels(quantize_weight(t["o"]))
        gu_q = permute_out_channels(quantize_weight(t["gu"]), halves=2)
        dn_q = permute_out_channels(quantize_weight(t["dn"]))
        head_q = quantize_weight(head)
        args = (block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]), block_permute(t["in_w"]),
                o_q, gu_q, dn_q, head_q, EPS)
        r_out, r_log = q8_layer_head_fused(*args, use_pallas=False)

        def stk(w):
            return QuantTensor(q=w.q[None], d=w.d[None])

        g_out, g_log = _q8_mega_staged_call(
            block_permute(t["merged"]).astype(jnp.bfloat16),
            block_permute(t["resid"]),
            block_permute(t["post_w"]).reshape(1, h2),
            block_permute(t["in_w"]).reshape(1, h2),
            stk(o_q), 0, stk(gu_q), 0, stk(dn_q), 0, stk(head_q), 0,
            EPS, (2, 4, 2, 12), True)
        _close(g_out, r_out)
        _close(g_log, r_log)

    def test_staged_noqkv_matches_ref(self):
        from fun_asr_gguf_tpu.ops.quant_matmul import _q8_mega_staged_call
        t, (m2, qd2, h2, ffn2, nq2) = self._mk_big(8)
        o_q = permute_out_channels(quantize_weight(t["o"]))
        gu_q = permute_out_channels(quantize_weight(t["gu"]), halves=2)
        dn_q = permute_out_channels(quantize_weight(t["dn"]))
        ref = q8_mlp_fused(
            block_permute(t["merged"]), block_permute(t["resid"]),
            block_permute(t["post_w"]), o_q, gu_q, dn_q, EPS,
            use_pallas=False)

        def stk(w):
            return QuantTensor(q=w.q[None], d=w.d[None])

        got = _q8_mega_staged_call(
            block_permute(t["merged"]).astype(jnp.bfloat16),
            block_permute(t["resid"]),
            block_permute(t["post_w"]).reshape(1, h2), None,
            stk(o_q), 0, stk(gu_q), 0, stk(dn_q), 0, None, None,
            EPS, (2, 4, 2, 0), True)
        _close(got, ref)


class TestQ8DotPath:
    """int8-dot kernels (q8dot_matmul / q8i megacall): exactness vs the
    dequantized ground truth and the fused decode wiring."""

    @pytest.mark.slow
    def test_q8dot_matches_dequant_ground_truth(self):
        # q8dot is the measured-slower opt-in experiment (PERFORMANCE.md);
        # its decode wiring test below is slow-marked for the same reason
        from fun_asr_gguf_tpu.ops.quant_matmul import (
            dequantize_weight_n, q8dot_matmul, quantize_act_q8, to_natural)
        rng = np.random.default_rng(9)
        for (m2, k2, n2) in [(1, 128, 256), (3, 96, 160)]:
            w = jnp.asarray(
                rng.normal(size=(k2, n2)).astype(np.float32) * 0.05)
            x = jnp.asarray(
                rng.normal(size=(m2, k2)).astype(np.float32) * 0.4)
            qtn = to_natural(quantize_weight(w))
            ref = q8dot_matmul(x, qtn, use_pallas=False)
            got = q8dot_matmul(x, qtn, use_pallas=True, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=0, atol=1e-5)
            xq, xs = quantize_act_q8(x)
            xdq = (xq.astype(jnp.float32).reshape(m2, k2 // 32, 32)
                   * xs[..., None]).reshape(m2, k2)
            exact = xdq @ dequantize_weight_n(qtn)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(exact),
                                       rtol=0, atol=1e-5)

    @pytest.mark.slow
    def test_q8i_decode_wiring(self, monkeypatch):
        # slow (~26 s CPU): q8i is the measured-slower int8-partials
        # variant kept for the PERFORMANCE.md ablation record, not a
        # production path; its numerics vs ground truth stay covered by
        # the faster q8dot tests above
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models import qwen3 as Q
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1")
        cfg = Qwen3Config(
            n_layers=2, hidden=128, q_heads=4, kv_heads=2, head_dim=32,
            ffn_dim=256, vocab_size=512, rope_theta=1e6, rms_eps=1e-6,
            tie_embeddings=True)
        params = Q.init_qwen3_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qp = Q.pack_qwen3_params(Q.quantize_lm_head(
            Q.quantize_qwen3_params(params), cfg))
        ip = Q.fuse_qwen3_params_q8i(qp)
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.hidden),
                                jnp.bfloat16) * 0.1
        mask = jnp.ones((2, 12), jnp.float32)
        _, kv1 = Q.qwen3_prefill(qp, emb, mask, cfg, kv_max_len=20)
        _, kv2 = Q.qwen3_prefill(ip, emb, mask, cfg, kv_max_len=20)
        tok = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.hidden),
                                jnp.bfloat16) * 0.1
        slot = jnp.asarray(12, jnp.int32)
        pos = jnp.full((2,), 12, jnp.int32)
        vf = jnp.zeros((2,), jnp.int32)
        d1, _ = Q.qwen3_decode_step(qp, kv1, tok, slot, pos, vf, cfg)
        d2, _ = Q.qwen3_decode_step(ip, kv2, tok, slot, pos, vf, cfg)
        _close(d2, d1, tol=5e-2)
        assert (np.asarray(d1.argmax(-1))
                == np.asarray(d2.argmax(-1))).all()


class TestFusedDecodeWiring:
    """qwen3_decode_step / verify_step under the q8_fused marker: the
    megacall graph (scan AND the unrolled v2 pipeline) must agree with the
    plain quantized path."""

    @pytest.fixture(scope="class")
    def setup(self):
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models import qwen3 as Q
        cfg = Qwen3Config(
            n_layers=3, hidden=128, q_heads=4, kv_heads=2, head_dim=32,
            ffn_dim=256, vocab_size=512, rope_theta=1e6, rms_eps=1e-6,
            tie_embeddings=True)
        params = Q.init_qwen3_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qp = Q.pack_qwen3_params(Q.quantize_lm_head(
            Q.quantize_qwen3_params(params), cfg))
        fp = Q.fuse_qwen3_params_q8(qp)
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden),
                                jnp.bfloat16) * 0.1
        mask = jnp.ones((2, 16), jnp.float32)
        _, kv = Q.qwen3_prefill(qp, emb, mask, cfg, kv_max_len=24)
        tok = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.hidden),
                                jnp.bfloat16) * 0.1
        return Q, cfg, qp, fp, kv, tok

    def _steps(self, setup, unroll, monkeypatch):
        Q, cfg, qp, fp, kv, tok = setup
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1" if unroll else "0")
        slot = jnp.asarray(16, jnp.int32)
        pos = jnp.full((2,), 16, jnp.int32)
        vf = jnp.zeros((2,), jnp.int32)
        base, _ = Q.qwen3_decode_step(qp, kv, tok, slot, pos, vf, cfg)
        got, _ = Q.qwen3_decode_step(fp, kv, tok, slot, pos, vf, cfg)
        _close(got, base, tol=3e-2)
        assert (np.asarray(base.argmax(-1))
                == np.asarray(got.argmax(-1))).all()
        toks = jax.random.normal(jax.random.PRNGKey(3),
                                 (2, 4, cfg.hidden), jnp.bfloat16) * 0.1
        slots = jnp.full((2,), 16, jnp.int32)
        poss = pos[:, None] + jnp.arange(4)[None, :]
        vbase, _ = Q.qwen3_verify_step(qp, kv, toks, slots, poss, vf, cfg)
        vgot, _ = Q.qwen3_verify_step(fp, kv, toks, slots, poss, vf, cfg)
        _close(vgot, vbase, tol=3e-2)

    def test_scan_path(self, setup, monkeypatch):
        self._steps(setup, unroll=False, monkeypatch=monkeypatch)

    @pytest.mark.slow
    def test_unrolled_v2_path(self, setup, monkeypatch):
        # unroll=True is the opt-in FUNASR_UNROLL_DECODE=1 variant; the
        # default scan wiring above stays in the quick suite
        self._steps(setup, unroll=True, monkeypatch=monkeypatch)


class TestFusedSlidingWindow:
    """phi3-mini-shaped configs (all-layer sliding window, no qk-norm,
    no biases) pass fuse_qwen3_params_q8's structural checks, so the
    UNROLLED megacall paths must apply the per-layer sliding bias —
    regression for the fused decode silently attending the full cache
    once generation crosses the window."""

    @pytest.fixture(scope="class")
    def setup(self):
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models import qwen3 as Q
        cfg = Qwen3Config(
            n_layers=2, hidden=128, q_heads=4, kv_heads=2, head_dim=32,
            ffn_dim=256, vocab_size=512, rope_theta=1e4, rms_eps=1e-6,
            tie_embeddings=True, qk_norm=False, arch="phi3",
            sliding_window=6, sliding_pattern=3)   # layers 0,1 slide
        params = Q.init_qwen3_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qp = Q.pack_qwen3_params(Q.quantize_lm_head(
            Q.quantize_qwen3_params(params), cfg))
        emb = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.hidden),
                                jnp.bfloat16) * 0.1
        mask = jnp.ones((1, 16), jnp.float32)
        # prefill 16 >> window 6: the decode/verify bias must exclude
        # the early slots on sliding layers
        _, kv = Q.qwen3_prefill(qp, emb, mask, cfg, kv_max_len=24)
        tok = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.hidden),
                                jnp.bfloat16) * 0.1
        return Q, cfg, qp, kv, tok

    def _run(self, setup, fuse, monkeypatch):
        from dataclasses import replace
        Q, cfg, qp, kv, tok = setup
        fp = fuse(qp)
        slot = jnp.asarray(16, jnp.int32)
        pos = jnp.full((1,), 16, jnp.int32)
        vf = jnp.zeros((1,), jnp.int32)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "0")
        base, _ = Q.qwen3_decode_step(qp, kv, tok, slot, pos, vf, cfg)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1")
        got, _ = Q.qwen3_decode_step(fp, kv, tok, slot, pos, vf, cfg)
        _close(got, base, tol=3e-2)
        # negative control: the same fused params WITHOUT the window must
        # land measurably elsewhere — proof the unrolled path actually
        # applied the sliding bias rather than coincidentally agreeing
        nocfg = replace(cfg, sliding_window=0, sliding_pattern=0)
        noslide, _ = Q.qwen3_decode_step(fp, kv, tok, slot, pos, vf, nocfg)
        scale = np.abs(np.asarray(base, np.float32)).max() + 1e-6
        assert (np.abs(np.asarray(noslide, np.float32)
                       - np.asarray(base, np.float32)).max() / scale
                > 3e-2)
        toks = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, 4, cfg.hidden), jnp.bfloat16) * 0.1
        slots = jnp.full((1,), 16, jnp.int32)
        poss = pos[:, None] + jnp.arange(4)[None, :]
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "0")
        vbase, _ = Q.qwen3_verify_step(qp, kv, toks, slots, poss, vf, cfg)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1")
        vgot, _ = Q.qwen3_verify_step(fp, kv, toks, slots, poss, vf, cfg)
        _close(vgot, vbase, tol=3e-2)

    def test_q8_fused_unrolled_honors_window(self, setup, monkeypatch):
        Q = setup[0]
        self._run(setup, Q.fuse_qwen3_params_q8, monkeypatch)

    @pytest.mark.slow
    def test_q8i_fused_unrolled_honors_window(self, setup, monkeypatch):
        Q = setup[0]
        self._run(setup, Q.fuse_qwen3_params_q8i, monkeypatch)


class TestSandwichMegacall:
    """gemma3's sandwich norms (+ gelu_tanh gate) ride the megacall:
    kernel-level parity vs an independent dense chain, staged-grid
    parity in interpret mode, and the fused decode wiring on a
    gemma-shaped tiny config."""

    def _dense_sandwich_chain(self, t, eps=EPS):
        def deq(w):
            return dequantize_weight(quantize_weight(w))

        def rms(x, w):
            return (x * jax.lax.rsqrt(
                jnp.mean(x * x, -1, keepdims=True) + eps)) * w

        attn = rms(t["merged"] @ deq(t["o"]), t["apw"])
        h1 = attn + t["resid"]
        nh = rms(h1, t["post_w"])
        gu = nh @ deq(t["gu"])
        a = jax.nn.gelu(gu[:, :FFN], approximate=True) * gu[:, FFN:]
        return rms(a @ deq(t["dn"]), t["fpw"]) + h1

    def _mk_sandwich(self, seed):
        t = _mk(seed)
        rng = np.random.default_rng(seed + 100)
        t["apw"] = jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.1
                               ).astype(jnp.float32)
        t["fpw"] = jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.1
                               ).astype(jnp.float32)
        return t

    def test_ref_matches_dense_chain(self):
        t = self._mk_sandwich(0)
        o_q, gu_q, dn_q, _ = _fused_weights(t)
        want = self._dense_sandwich_chain(t)
        got = q8_mlp_fused(
            block_permute(t["merged"]), block_permute(t["resid"]),
            block_permute(t["post_w"]),
            o_q, gu_q, dn_q, EPS, use_pallas=False,
            attn_post_w=block_permute(t["apw"]),
            ffn_post_w=block_permute(t["fpw"]), act="gelu_tanh")
        _close(block_unpermute(got), want)

    def test_staged_interpret_matches_ref(self, monkeypatch):
        # h=256 shapes + a small stage target so _mega_stage_plan admits
        # a multi-step grid; interpret mode runs the staged kernel on CPU
        monkeypatch.setenv("FUNASR_Q8_STAGE_TARGET", "65536")
        rng = np.random.default_rng(3)
        m, qd, h, ffn = 2, 256, 256, 256

        def w(k, n):
            return jnp.asarray(
                rng.normal(size=(k, n)).astype(np.float32) * 0.05)

        t = {
            "merged": jnp.asarray(
                rng.normal(size=(m, qd)).astype(np.float32) * 0.3),
            "resid": jnp.asarray(
                rng.normal(size=(m, h)).astype(np.float32) * 0.3),
            "post_w": jnp.asarray(
                1.0 + rng.normal(size=(h,)) * 0.1).astype(jnp.float32),
            "apw": jnp.asarray(
                1.0 + rng.normal(size=(h,)) * 0.1).astype(jnp.float32),
            "fpw": jnp.asarray(
                1.0 + rng.normal(size=(h,)) * 0.1).astype(jnp.float32),
            "o": w(qd, h), "gu": w(h, 2 * ffn), "dn": w(ffn, h),
        }
        o_q = permute_out_channels(quantize_weight(t["o"]))
        gu_q = permute_out_channels(quantize_weight(t["gu"]), halves=2)
        dn_q = permute_out_channels(quantize_weight(t["dn"]))
        args = (block_permute(t["merged"]), block_permute(t["resid"]),
                block_permute(t["post_w"]),
                o_q, gu_q, dn_q, EPS)
        kw = dict(attn_post_w=block_permute(t["apw"]),
                  ffn_post_w=block_permute(t["fpw"]), act="gelu_tanh")
        from fun_asr_gguf_tpu.ops.quant_matmul import _mega_stage_plan
        assert _mega_stage_plan(m, qd, h, 2 * ffn, ffn, 0) is not None
        ref = q8_mlp_fused(*args, use_pallas=False, **kw)
        got = q8_mlp_fused(*args, use_pallas=True, interpret=True, **kw)
        _close(got, ref)

    def test_gemma_shaped_fused_decode_matches_plain(self, monkeypatch):
        from dataclasses import replace

        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models import qwen3 as Q
        cfg = Qwen3Config(
            n_layers=2, hidden=128, q_heads=4, kv_heads=2, head_dim=32,
            ffn_dim=256, vocab_size=512, rope_theta=1e4, rms_eps=1e-6,
            tie_embeddings=True, arch="gemma3", qk_norm=True,
            post_norms=True, act="gelu_tanh",
            embed_scale=128.0 ** 0.5, attn_scale=32.0 ** -0.5,
            sliding_window=6, sliding_pattern=2, rope_local_theta=1e4)
        params = Q.init_qwen3_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qp = Q.pack_qwen3_params(Q.quantize_lm_head(
            Q.quantize_qwen3_params(params), cfg))
        fp = Q.fuse_qwen3_params_q8(qp)         # no longer rejected
        emb = jax.random.normal(jax.random.PRNGKey(1),
                                (1, 12, cfg.hidden), jnp.bfloat16) * 0.1
        mask = jnp.ones((1, 12), jnp.float32)
        _, kv = Q.qwen3_prefill(qp, emb, mask, cfg, kv_max_len=20)
        _, kvf = Q.qwen3_prefill(fp, emb, mask, cfg, kv_max_len=20)
        tok = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.hidden),
                                jnp.bfloat16) * 0.1
        slot = jnp.asarray(12, jnp.int32)
        pos = jnp.full((1,), 12, jnp.int32)
        vf = jnp.zeros((1,), jnp.int32)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "0")
        base, _ = Q.qwen3_decode_step(qp, kv, tok, slot, pos, vf, cfg)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1")
        got, _ = Q.qwen3_decode_step(fp, kvf, tok, slot, pos, vf, cfg)
        _close(got, base, tol=3e-2)
        toks = jax.random.normal(jax.random.PRNGKey(3),
                                 (1, 3, cfg.hidden), jnp.bfloat16) * 0.1
        slots = jnp.full((1,), 12, jnp.int32)
        poss = pos[:, None] + jnp.arange(3)[None, :]
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "0")
        vbase, _ = Q.qwen3_verify_step(qp, kv, toks, slots, poss, vf, cfg)
        monkeypatch.setenv("FUNASR_UNROLL_DECODE", "1")
        vgot, _ = Q.qwen3_verify_step(fp, kvf, toks, slots, poss, vf, cfg)
        _close(vgot, vbase, tol=3e-2)

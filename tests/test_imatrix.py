# coding: utf-8
"""Importance-matrix (imatrix) quantization: weighted scale searches,
the activation collector, and the quantize-tool integration.

Parity target: llama.cpp's llama-imatrix + llama-quantize --imatrix
(the reference ships them as prebuilt binaries; its vendored gguf-py
has no quantizers at all). Bit-exactness vs the C searches is
unverifiable here, so the tests pin what matters: same byte format
(our dequantizers read the weighted output), and the weighted search
strictly reduces importance-weighted reconstruction error on data
where it should.
"""

import numpy as np
import pytest

from fun_asr_gguf_tpu.formats import quant_np as qn

RNG = np.random.default_rng(7)


def _skewed_case(k=256, rows=4, hot=8, seed=1):
    """Rows with a few high-importance channels whose values are small
    relative to the block absmax — exactly where importance-weighted
    rounding beats absmax/uniform rounding."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(rows, k)).astype(np.float32)
    x[:, 0] *= 8.0                      # an outlier dominates each block
    qw = np.full(k, 1e-3, np.float32)
    qw[1:1 + hot] = 100.0               # the channels that matter
    return x, qw


def _werr(x, deq, qw):
    return float(np.sum(qw[None, :] * (deq - x) ** 2))


CASES = [
    ("q4_0", qn.q4_0_quantize, qn.q4_0_dequantize_blocks),
    ("q4_1", qn.q4_1_quantize, qn.q4_1_dequantize_blocks),
    ("q5_0", qn.q5_0_quantize, qn.q5_0_dequantize_blocks),
    ("q5_1", qn.q5_1_quantize, qn.q5_1_dequantize_blocks),
    ("q2_k", qn.q2_k_quantize, qn.q2_k_dequantize_blocks),
    ("q3_k", qn.q3_k_quantize, qn.q3_k_dequantize_blocks),
    ("q4_k", qn.q4_k_quantize, qn.q4_k_dequantize_blocks),
    ("q5_k", qn.q5_k_quantize, qn.q5_k_dequantize_blocks),
    ("q6_k", qn.q6_k_quantize, qn.q6_k_dequantize_blocks),
    ("iq4_nl", qn.iq4_nl_quantize, qn.iq4_nl_dequantize_blocks),
    ("iq4_xs", qn.iq4_xs_quantize, qn.iq4_xs_dequantize_blocks),
]


class TestWeightedQuantizers:
    @pytest.mark.parametrize("name,quant,deq", CASES,
                             ids=[c[0] for c in CASES])
    def test_qw_reduces_weighted_error(self, name, quant, deq):
        x, qw = _skewed_case(seed=3)
        base = deq(quant(x), x.shape)
        weighted = deq(quant(x, qw=qw), x.shape)
        e0 = _werr(x, base, qw)
        e1 = _werr(x, weighted, qw)
        assert e1 < e0, f"{name}: weighted {e1} !< unweighted {e0}"

    @pytest.mark.parametrize("name,quant,deq", CASES,
                             ids=[c[0] for c in CASES])
    def test_qw_output_is_format_valid(self, name, quant, deq):
        """Weighted output must stay byte-layout compatible: same length
        as unweighted, decodable, finite."""
        x, qw = _skewed_case(seed=4)
        raw0 = quant(x)
        raw1 = quant(x, qw=qw)
        assert raw1.dtype == raw0.dtype and raw1.shape == raw0.shape
        out = deq(raw1, x.shape)
        assert np.isfinite(out).all()

    def test_uniform_qw_close_to_unweighted(self):
        """A flat imatrix carries no information: the weighted search's
        error must be in the same class as the unweighted one (the
        search formula differs slightly, so not byte-identical)."""
        x = RNG.normal(size=(4, 256)).astype(np.float32)
        qw = np.ones(256, np.float32)
        for name, quant, deq in CASES:
            e0 = _werr(x, deq(quant(x), x.shape), qw)
            e1 = _werr(x, deq(quant(x, qw=qw), x.shape), qw)
            assert e1 <= e0 * 1.5, f"{name}: uniform-qw error {e1} vs {e0}"

    def test_no_qw_bit_identical_to_before(self):
        """qw=None must not perturb the existing bit-exact encoders."""
        x = RNG.normal(size=(2, 512)).astype(np.float32)
        for name, quant, _ in CASES:
            assert np.array_equal(quant(x), quant(x, qw=None)), name


class TestCollector:
    def _setup(self):
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
        cfg = Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                          head_dim=16, ffn_dim=96, vocab_size=128,
                          rope_theta=1e4)
        import jax
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        return cfg, params

    def test_names_and_shapes(self):
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.tools.imatrix import forward_collect
        cfg, params = self._setup()
        b, t = 2, 8
        embeds = jnp.asarray(
            RNG.normal(size=(b, t, cfg.hidden)).astype(np.float32))
        mask = jnp.ones((b, t), jnp.float32)
        stats, n = forward_collect(params, embeds, mask, cfg)
        assert float(n) == b * t
        names = set(stats)
        for l in range(cfg.n_layers):
            for tname, k in (("attn_q", cfg.hidden),
                             ("attn_output",
                              cfg.q_heads * cfg.head_dim),
                             ("ffn_gate", cfg.hidden),
                             ("ffn_down", cfg.ffn_dim)):
                key = f"blk.{l}.{tname}.weight"
                assert key in names
                assert stats[key].shape == (k,)
        assert stats["output.weight"].shape == (cfg.hidden,)

    def test_qkv_share_input_and_first_layer_is_embed(self):
        """attn_q/k/v rows are identical (same input), and layer 0's
        input stats equal the rms-normed embeddings' mean squares —
        an independent recomputation of the first accumulation."""
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.models.common import rms_norm
        from fun_asr_gguf_tpu.tools.imatrix import forward_collect
        cfg, params = self._setup()
        b, t = 2, 8
        embeds = jnp.asarray(
            RNG.normal(size=(b, t, cfg.hidden)).astype(np.float32))
        mask = jnp.ones((b, t), jnp.float32)
        stats, _ = forward_collect(params, embeds, mask, cfg)
        np.testing.assert_array_equal(np.asarray(stats["blk.0.attn_q.weight"]),
                                      np.asarray(stats["blk.0.attn_k.weight"]))
        h = rms_norm(embeds, params["layers"]["input_ln"][0], cfg.rms_eps)
        expect = np.sum(np.asarray(h, np.float32) ** 2, axis=(0, 1))
        np.testing.assert_allclose(np.asarray(stats["blk.0.attn_q.weight"]),
                                   expect, rtol=1e-5)

    def test_mask_excludes_padding(self):
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.tools.imatrix import forward_collect
        cfg, params = self._setup()
        b, t = 1, 8
        embeds = jnp.asarray(
            RNG.normal(size=(b, t, cfg.hidden)).astype(np.float32))
        full = jnp.ones((b, t), jnp.float32)
        half = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]], jnp.float32)
        s_full, n_full = forward_collect(params, embeds, full, cfg)
        s_half, n_half = forward_collect(params, embeds, half, cfg)
        assert float(n_half) == 4 and float(n_full) == 8
        k0 = "blk.0.attn_q.weight"
        assert float(np.sum(np.asarray(s_half[k0]))) < \
            float(np.sum(np.asarray(s_full[k0])))


class TestQuantizeToolIntegration:
    def test_imatrix_roundtrip_through_cli(self, tmp_path):
        """save a tiny f32 GGUF → collect imatrix on synthetic tokens →
        quantize --imatrix → engine-readable output with lower weighted
        error than the unweighted quantization."""
        import jax
        import jax.numpy as jnp
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
        from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
        from fun_asr_gguf_tpu.tools.imatrix import (collect_imatrix,
                                                    load_imatrix)
        from fun_asr_gguf_tpu.tools.quantize import quantize_gguf

        cfg = Qwen3Config(hidden=64, n_layers=2, q_heads=4, kv_heads=2,
                          head_dim=16, ffn_dim=256, vocab_size=256,
                          rope_theta=1e4)
        params = init_qwen3_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
        f32 = str(tmp_path / "f32.gguf")
        save_qwen3_to_gguf(f32, params, cfg, quantize_q8_0=False)

        embed = np.asarray(params["embed"], np.float32)
        ids = RNG.integers(0, cfg.vocab_size, size=(4, 16))
        mat = collect_imatrix(params, cfg, embed, [ids])
        imx = str(tmp_path / "im.npz")
        np.savez(imx, **mat)

        out_w = str(tmp_path / "w.gguf")
        out_p = str(tmp_path / "p.gguf")
        quantize_gguf(f32, out_w, "q4_k", imatrix=imx)
        quantize_gguf(f32, out_p, "q4_k")

        qw_map = load_imatrix(imx)
        rw, rp, rf = GGUFReader(out_w), GGUFReader(out_p), GGUFReader(f32)
        name = "blk.0.ffn_down.weight"
        ref = rf.tensor(name).astype(np.float32)
        qw = qw_map[name]
        ew = np.sum(qw[None] * (rw.tensor(name).astype(np.float32)
                                - ref) ** 2)
        ep = np.sum(qw[None] * (rp.tensor(name).astype(np.float32)
                                - ref) ** 2)
        assert ew <= ep
        # the weighted file still loads as a normal q4_k GGUF
        assert rw.tensor_info(name).ggml_type.name == "Q4_K"

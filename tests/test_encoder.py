"""SANM encoder / adaptor / CTC-head tests (tiny configs, CPU).

The load-bearing invariant is the reference's padded-vs-native consistency
criterion (SURVEY.md §4): with static-shape padding, valid-frame outputs
must not depend on padding length or padding content.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.adaptor import (adaptor_forward,
                                             ctc_head_forward,
                                             ctc_logits_forward,
                                             init_adaptor_params,
                                             init_ctc_head_params)
from fun_asr_gguf_tpu.models.config import (AdaptorConfig, CTCHeadConfig,
                                            EncoderConfig)
from fun_asr_gguf_tpu.models.sanm import (encoder_forward, fsmn_memory,
                                          init_encoder_params,
                                          sinusoidal_position_encoding)

RNG = jax.random.PRNGKey(0)


def make_mask(b, t, valid):
    return (np.arange(t)[None, :] < np.asarray(valid)[:, None]).astype(np.float32)


class TestFSMN:
    def test_depthwise_conv_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        B, T, D, K = 2, 13, 8, 5
        v = rng.normal(size=(B, T, D)).astype(np.float32)
        w = rng.normal(size=(K, D)).astype(np.float32)
        out = fsmn_memory(jnp.asarray(v), None, jnp.asarray(w))
        # torch depthwise conv1d: weight [D, 1, K], pad (K-1)//2 per side
        tw = torch.tensor(w.T[:, None, :])
        tv = torch.tensor(v.transpose(0, 2, 1))
        lp = (K - 1) // 2
        conv = torch.nn.functional.conv1d(
            torch.nn.functional.pad(tv, (lp, K - 1 - lp)), tw, groups=D)
        ref = v + conv.numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_firewall_masking(self):
        """Padding frames must be zeroed before the sliding window."""
        rng = np.random.default_rng(1)
        B, T, D, K = 1, 10, 4, 5
        v = rng.normal(size=(B, T, D)).astype(np.float32)
        w = rng.normal(size=(K, D)).astype(np.float32)
        mask = make_mask(B, T, [6])
        out1 = np.asarray(fsmn_memory(jnp.asarray(v), jnp.asarray(mask), jnp.asarray(w)))
        v2 = v.copy()
        v2[0, 6:] = 99.0  # garbage in padding
        out2 = np.asarray(fsmn_memory(jnp.asarray(v2), jnp.asarray(mask), jnp.asarray(w)))
        np.testing.assert_allclose(out1[0, :6], out2[0, :6], atol=1e-5)


class TestPositionEncoding:
    def test_positions_start_at_one(self):
        pe = np.asarray(sinusoidal_position_encoding(4, 8))
        # position index 0 encodes position 1: sin(1 * inv[0]) = sin(1)
        assert abs(pe[0, 0] - np.sin(1.0)) < 1e-6
        assert abs(pe[0, 4] - np.cos(1.0)) < 1e-6
        assert pe.shape == (4, 8)


class TestEncoder:
    def setup_method(self):
        self.cfg = EncoderConfig.tiny()
        self.params = init_encoder_params(RNG, self.cfg)

    def test_shapes(self):
        B, T = 2, 24
        x = np.random.default_rng(2).normal(size=(B, T, 560)).astype(np.float32)
        mask = make_mask(B, T, [24, 16])
        y = encoder_forward(self.params, jnp.asarray(x), jnp.asarray(mask), self.cfg)
        assert y.shape == (B, T, self.cfg.d_model)
        # final mask sweep: padding rows zero
        assert np.all(np.abs(np.asarray(y)[1, 16:]) == 0)

    def test_padding_invariance(self):
        """Valid outputs must be identical for 16 valid frames whether the
        buffer is 24 or 40 frames, and whatever the padding content."""
        rng = np.random.default_rng(3)
        valid = 16
        x = rng.normal(size=(1, valid, 560)).astype(np.float32)

        def run(total, noise):
            buf = np.zeros((1, total, 560), dtype=np.float32)
            buf[:, :valid] = x
            if noise:
                buf[:, valid:] = rng.normal(size=(1, total - valid, 560))
            mask = make_mask(1, total, [valid])
            return np.asarray(encoder_forward(
                self.params, jnp.asarray(buf), jnp.asarray(mask), self.cfg))

        a = run(24, noise=False)[0, :valid]
        b = run(40, noise=False)[0, :valid]
        c = run(40, noise=True)[0, :valid]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(a, c, rtol=2e-4, atol=2e-4)


class TestAdaptorAndCTC:
    def test_adaptor_shapes_and_masking(self):
        cfg = AdaptorConfig.tiny(in_dim=64, out_dim=64)
        params = init_adaptor_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 12, 64)).astype(np.float32)
        mask = make_mask(1, 12, [8])
        y = adaptor_forward(params, jnp.asarray(x), jnp.asarray(mask), cfg)
        assert y.shape == (1, 12, 64)
        # masked attention: padding content must not leak into valid frames
        x2 = x.copy()
        x2[0, 8:] = 7.0
        y2 = adaptor_forward(params, jnp.asarray(x2), jnp.asarray(mask), cfg)
        np.testing.assert_allclose(np.asarray(y)[0, :8], np.asarray(y2)[0, :8],
                                   rtol=2e-4, atol=2e-4)

    def test_ctc_head(self):
        cfg = CTCHeadConfig.tiny(d=64, vocab_size=33)
        params = init_ctc_head_params(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 10, 64)).astype(np.float32)
        idx = ctc_head_forward(params, jnp.asarray(x), cfg)
        assert idx.shape == (1, 10)
        assert idx.dtype == jnp.int32
        logits = ctc_logits_forward(params, jnp.asarray(x), cfg)
        assert logits.shape == (1, 10, 33)
        np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                      np.asarray(idx))


class TestFlashEncoder:
    def test_flash_encoder_matches_plain(self):
        """Encoder with use_flash_attention must match the plain path
        (jnp fallback engages off-TPU; same math either way)."""
        from dataclasses import replace
        cfg = EncoderConfig.tiny()
        params = init_encoder_params(jax.random.PRNGKey(9), cfg)
        rng = np.random.default_rng(9)
        x = rng.normal(size=(1, 20, 560)).astype(np.float32)
        mask = make_mask(1, 20, [14])
        plain = encoder_forward(params, jnp.asarray(x), jnp.asarray(mask),
                                cfg)
        flash = encoder_forward(params, jnp.asarray(x), jnp.asarray(mask),
                                replace(cfg, use_flash_attention=True))
        np.testing.assert_allclose(np.asarray(plain), np.asarray(flash),
                                   rtol=3e-4, atol=3e-4)

    def test_auto_flash_matches_forced_paths(self):
        """use_flash_attention=None (auto, the default) must agree with
        both forced settings at any batch — the batch>=2 trace-time
        selection changes the kernel, never the math."""
        from dataclasses import replace
        cfg = EncoderConfig.tiny()
        assert cfg.use_flash_attention is None
        params = init_encoder_params(jax.random.PRNGKey(9), cfg)
        rng = np.random.default_rng(10)
        x = rng.normal(size=(3, 20, 560)).astype(np.float32)
        mask = make_mask(3, 20, [14, 20, 9])
        auto = encoder_forward(params, jnp.asarray(x), jnp.asarray(mask),
                               cfg)
        for forced in (True, False):
            ref = encoder_forward(params, jnp.asarray(x), jnp.asarray(mask),
                                  replace(cfg, use_flash_attention=forced))
            np.testing.assert_allclose(np.asarray(auto), np.asarray(ref),
                                       rtol=3e-4, atol=3e-4)

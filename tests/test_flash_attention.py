"""Flash-attention kernel tests (jnp reference + Pallas interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.ops.flash_attention import (attention_with_mask,
                                                  flash_attention)


def ref_attention(q, k, v, key_bias):
    s = np.einsum("bqd,bkd->bqk", q.astype(np.float64), k.astype(np.float64))
    s = s + key_bias[:, None, :].astype(np.float64)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", p, v.astype(np.float64))


class TestFlashAttention:
    def make(self, bh=2, t=256, d=32, valid=200, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(bh, t, d)).astype(np.float32) * 0.3
        k = rng.normal(size=(bh, t, d)).astype(np.float32) * 0.3
        v = rng.normal(size=(bh, t, d)).astype(np.float32)
        bias = np.zeros((bh, t), np.float32)
        bias[:, valid:] = -1e4
        return q, k, v, bias

    def test_jnp_path_matches_reference(self):
        q, k, v, bias = self.make()
        out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(bias), use_pallas=False)
        np.testing.assert_allclose(np.asarray(out),
                                   ref_attention(q, k, v, bias),
                                   rtol=2e-4, atol=2e-4)

    def test_pallas_interpret_matches_reference(self):
        q, k, v, bias = self.make()
        out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(bias), block_q=128, block_k=128,
                              use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   ref_attention(q, k, v, bias),
                                   rtol=3e-4, atol=3e-4)

    def test_fully_masked_keys_ignored(self):
        q, k, v, bias = self.make(valid=64)
        v2 = v.copy()
        v2[:, 64:] = 1e6        # garbage in masked keys must not leak
        o1 = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             jnp.asarray(bias), block_q=128, block_k=128,
                             use_pallas=True, interpret=True)
        o2 = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v2),
                             jnp.asarray(bias), block_q=128, block_k=128,
                             use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-4, atol=1e-4)

    def test_single_pass_matches_streamed(self):
        """block_k=None auto-selects the kernel's exact single-pass
        branch at T ≤ 1024; it must agree with the streamed
        online-softmax loop and the reference."""
        q, k, v, bias = self.make()
        one = flash_attention(jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), jnp.asarray(bias),
                              block_q=128, use_pallas=True, interpret=True)
        multi = flash_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), jnp.asarray(bias),
                                block_q=128, block_k=128,
                                use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(one), np.asarray(multi),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(one),
                                   ref_attention(q, k, v, bias),
                                   rtol=3e-4, atol=3e-4)

    def test_non_divisible_t_falls_back(self):
        q, k, v, bias = self.make(t=100, valid=100)
        out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(bias), use_pallas=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   ref_attention(q, k, v, bias),
                                   rtol=2e-4, atol=2e-4)

    def test_heads_wrapper(self):
        rng = np.random.default_rng(1)
        b, h, t, d = 2, 4, 128, 16
        q = rng.normal(size=(b, h, t, d)).astype(np.float32) * 0.3
        k = rng.normal(size=(b, h, t, d)).astype(np.float32) * 0.3
        v = rng.normal(size=(b, h, t, d)).astype(np.float32)
        mask = np.ones((b, t), np.float32)
        mask[1, 96:] = 0.0
        out = attention_with_mask(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(mask),
                                  use_pallas=False)
        bias = (mask - 1.0) * 10000.0
        ref = ref_attention(q.reshape(b * h, t, d), k.reshape(b * h, t, d),
                            v.reshape(b * h, t, d),
                            np.repeat(bias, h, axis=0)).reshape(b, h, t, d)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4,
                                   atol=2e-4)

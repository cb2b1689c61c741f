"""Flash-decode attention kernel vs the XLA `_attend_cache` path.

Interpret-mode on CPU: the kernel must reproduce the plain path's math
(same dtype policy: f32 scores/softmax, bf16 probs into the mix dot)
for both the bf16 and the int8 (QuantKV) cache, T=1 decode and T>1
verify-chunk shapes, including masked slots.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.qwen3 import (KVCache, QuantKV, _attend_cache,
                                           _kv_quantize, init_kv_cache)
from fun_asr_gguf_tpu.ops.flash_decode import (flash_decode_attention,
                                               flash_decode_supported)

CFG = Qwen3Config(hidden=128, n_layers=2, q_heads=4, kv_heads=2,
                  head_dim=128, ffn_dim=256, vocab_size=64)


def _mk(b, t, s, kv_int8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, CFG.q_heads, CFG.head_dim)),
                    jnp.bfloat16)
    kraw = jnp.asarray(rng.normal(size=(b, s, CFG.kv_heads, CFG.head_dim)),
                       jnp.bfloat16)
    vraw = jnp.asarray(rng.normal(size=(b, s, CFG.kv_heads, CFG.head_dim)),
                       jnp.bfloat16)
    # per-row visibility: row i sees slots [0, lim_i)
    lims = rng.integers(low=s // 2, high=s + 1, size=(b,))
    vis = jnp.arange(s)[None, :] < jnp.asarray(lims)[:, None]   # [B,S]
    bias = jnp.where(vis[:, None, :], 0.0, -1e30).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, t, s))
    if kv_int8:
        kq, ks = _kv_quantize(kraw)
        vq, vs = _kv_quantize(vraw)
        K = QuantKV(q=kq[None], s=ks[None])      # fake layer axis
        V = QuantKV(q=vq[None], s=vs[None])
    else:
        K, V = kraw[None], vraw[None]
    return q, K, V, bias


@pytest.mark.parametrize("kv_int8", [False, True])
@pytest.mark.parametrize("b,t,s", [(1, 1, 64), (4, 1, 128), (3, 4, 64)])
def test_flash_decode_matches_attend_cache(kv_int8, b, t, s):
    q, K, V, bias = _mk(b, t, s, kv_int8)
    ref = _attend_cache(q, K, V, 0, bias[:, None, :, :], CFG)  # [B,qh,T,D]
    qs = (q.astype(jnp.float32) * CFG.head_dim ** -0.5).astype(q.dtype)
    if kv_int8:
        out = flash_decode_attention(
            qs, K.q[0], V.q[0], bias, K.s[0], V.s[0], interpret=True)
    else:
        out = flash_decode_attention(qs, K[0], V[0], bias, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.03)


def test_flash_decode_exactness_float32_stats():
    """With a uniform bias the kernel equals an fp32 numpy softmax mix
    to bf16-class tolerance (guards against a wrong softmax axis or a
    dropped scale row)."""
    b, t, s = 2, 1, 64
    q, K, V, bias = _mk(b, t, s, kv_int8=True, seed=3)
    bias = jnp.zeros_like(bias)
    qs = (q.astype(jnp.float32) * CFG.head_dim ** -0.5).astype(q.dtype)
    out = flash_decode_attention(qs, K.q[0], V.q[0], bias, K.s[0], V.s[0],
                                 interpret=True)
    kd = np.asarray(K.q[0], np.float32) * np.asarray(K.s[0], np.float32)
    vd = np.asarray(V.q[0], np.float32) * np.asarray(V.s[0], np.float32)
    qn = np.asarray(qs, np.float32)
    group = CFG.q_heads // CFG.kv_heads
    for bb in range(b):
        for h in range(CFG.q_heads):
            kh = h // group
            sc = qn[bb, 0, h] @ kd[bb, :, kh].T
            p = np.exp(sc - sc.max())
            p /= p.sum()
            expect = p @ vd[bb, :, kh]
            np.testing.assert_allclose(
                np.asarray(out[bb, h, 0], np.float32), expect,
                rtol=0.05, atol=0.05)


def test_attend_cache_routes_through_flash(monkeypatch):
    """With the gate forced on, `_attend_cache` produces the same heads
    through the Pallas route (interpret) as through the XLA path."""
    import functools

    from fun_asr_gguf_tpu.ops import flash_decode as fd

    monkeypatch.setenv("FUNASR_FLASH_DECODE", "1")
    monkeypatch.setattr(
        fd, "flash_decode_attention",
        functools.partial(fd.flash_decode_attention.__wrapped__,
                          interpret=True))
    q, K, V, bias = _mk(4, 1, 128, kv_int8=True, seed=7)
    out = _attend_cache(q, K, V, 0, bias[:, None, :, :], CFG)
    monkeypatch.setenv("FUNASR_FLASH_DECODE", "0")
    ref = _attend_cache(q, K, V, 0, bias[:, None, :, :], CFG)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.03)


def test_supported_gate():
    assert flash_decode_supported(8, 1, 512, 8, 128, quant=True)
    assert not flash_decode_supported(8, 1, 512, 8, 64, quant=True)
    assert not flash_decode_supported(8, 1, 500, 8, 128, quant=True)
    assert not flash_decode_supported(8, 1, 510, 8, 128, quant=False)
    # bf16 slabs at huge S blow the VMEM budget
    assert not flash_decode_supported(8, 1, 32768, 8, 128, quant=False)

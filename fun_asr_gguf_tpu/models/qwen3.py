"""Qwen3 decoder-only LLM in functional JAX (the llama.cpp replacement).

This is the TPU-native equivalent of the reference's GGUF/llama.cpp decode
engine (reference ``fun_asr_gguf/llama.py`` + ``bin/llama.dll``): the same
Qwen3-0.6B architecture (GQA 16/8 heads, head_dim 128, qk-RMSNorm, SiLU MLP,
rope θ=1e6, tied embeddings — see ``03-Export-Decoder-GGUF.py``), but as
jitted XLA programs:

* **embedding-injection prefill** — the prompt arrives as embeddings
  (prefix-text ++ audio ++ suffix-text, ``core/decoder.py:71-80``),
  left-padded to a static bucket so one compiled program serves any prompt
  length;
* **single-token decode step** with a static-shape KV cache updated by
  ``dynamic_update_slice`` — scanned over layers so 28 blocks compile to one
  loop;
* layers run in bf16 on TPU with f32 softmax/norms; logits in f32.

KV-cache layout: [n_layers, B, max_len, kv_heads, head_dim]. The prompt
occupies slots [P-L, P) (left-aligned padding mask) and generated token t
lives at slot P+t with rope position L+t.
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import (BlockQuant, IndexedQuant, QuantTensor,
                                QuantTensorN, block_permute,
                                block_quantize_weight, block_unpermute,
                                dequantize_weight_n, matmul_any,
                                permute_out_channels, q8_layer_head_fused,
                                q8_mlp_fused, q8_mlp_qkv_fused, q8dot_matmul,
                                q8i_layer_fused, quantize_act_q8,
                                quantize_weight, to_natural)
from .common import rms_norm
from .config import Qwen3Config


class Int8Weight(NamedTuple):
    """Per-channel int8 weight for the XLA-native decode path.

    ``w8 [..., k, n] int8`` + ``scale [..., 1, n] bf16`` (one scale per
    output channel). Unlike the Pallas q8_0 path, these ride ``lax.scan``
    xs as plain arrays: XLA fuses the int8→bf16 convert into its own dot
    reads (no copy, no custom-call boundary), halving per-token weight
    traffic — measured 852 vs 567 tok/s on v5e for Qwen3-0.6B. Same 8-bit
    weight class the reference's q8_0 GGUF decode uses, with per-channel
    instead of per-32-block scale granularity (the reference's own ONNX
    INT8 quantization is per-channel too, ``02-Quantize-ONNX.py:38-45``).
    """
    w8: jnp.ndarray
    scale: jnp.ndarray


class Int4Weight(NamedTuple):
    """Group-quantized 4-bit weight for the XLA-native decode path
    (w4a16, AWQ-style RTN): half the HBM bytes of int8 — decode being
    weight-streaming-bound, the ceiling is ~2x int8 throughput if XLA
    fuses the unpack+scale into its dot reads like it fuses the int8
    convert. Experimental accuracy class (the reference is 8-bit);
    opt-in via ``llm_weight_format='int4'``.

    ``packed [..., k/2, n] int8`` — two signed nibbles per byte along the
    contraction dim, **split-half order**: byte i holds row ``i`` in the
    low nibble and row ``i + k/2`` in the high nibble. Interleaved
    (even/odd) packing forces a transposing stack+reshape on unpack that
    XLA materializes — the whole dequantized bf16 tensor round-trips HBM
    every token (measured 131 tok/s vs int8's 757 on v5e). Split-half
    unpacks as two contiguous fusable producers (or two dots over
    contiguous activation slices — see :func:`_proj`), no interleave.
    ``scale [..., k/32, n] bf16`` — one scale per 32-value input group
    per output channel (group-wise, because a 4-bit per-channel absmax
    is far too coarse); k/2 must stay a multiple of 32 so groups don't
    straddle the halves (holds for every real config).
    """
    packed: jnp.ndarray
    scale: jnp.ndarray


INT4_GROUP = 32


def _int4_unpack(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., k/2, n] int8 → [..., k, n] int8 in [-8, 7] (arithmetic-shift
    sign extension; split-half nibble order: low half then high half —
    a fusion-friendly concat, not an interleave)."""
    lo = (packed << 4) >> 4
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=-2)


def int4_dequantize(w: Int4Weight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., k, n] dense reconstruction (elementwise producer XLA can
    fuse into a consuming dot)."""
    q = _int4_unpack(w.packed)                    # [..., k, n]
    k, n = q.shape[-2], q.shape[-1]
    g = q.reshape(*q.shape[:-2], k // INT4_GROUP, INT4_GROUP, n)
    s = w.scale[..., :, None, :].astype(dtype)
    return (g.astype(dtype) * s).reshape(*q.shape[:-2], k, n)


def int4_quantize_weight(w: jnp.ndarray) -> Int4Weight:
    """RTN group-32 symmetric quantization of a [..., k, n] weight."""
    wf = w.astype(jnp.float32)
    k, n = wf.shape[-2], wf.shape[-1]
    if (k // 2) % INT4_GROUP:
        raise ValueError(f"int4 needs k/2 % {INT4_GROUP} == 0, got k={k}")
    g = wf.reshape(*wf.shape[:-2], k // INT4_GROUP, INT4_GROUP, n)
    s = jnp.max(jnp.abs(g), axis=-2, keepdims=True) / 7.0
    q = jnp.clip(jnp.round(g / jnp.where(s == 0, 1.0, s)), -8, 7)
    q = q.astype(jnp.int8).reshape(*wf.shape[:-2], k, n)
    lo = q[..., :k // 2, :]
    hi = q[..., k // 2:, :]
    packed = ((hi << 4) | (lo & 0x0F)).astype(jnp.int8)
    return Int4Weight(packed=packed,
                      scale=s[..., 0, :].astype(jnp.bfloat16))


def _int4_half_dot(x_half, q_half, s_half):
    """dot(x_half, dequant(q_half)) for one nibble half, the group-scale
    expand left as an elementwise producer on the dot's weight operand.

    Variants measured on v5e (Qwen3-0.6B decode, tok/s): interleaved
    pack + single dot 131 (XLA materializes the transposing unpack);
    split-half producer fusion (this) 566; group-batched BlockQuant-style
    dot 487 (per-group matvecs tile poorly at m=1); native XLA s4 dtype —
    blocked by a backend layout bug through the remote tunnel. The
    remaining gap to int8 (774) is the nibble-extract VPU work XLA won't
    sink into its dot reads; int4's value is the 715 vs 909 MB footprint
    (see docs/PERFORMANCE.md).

    x_half [m, kh], q_half [kh, n] int8 nibbles, s_half [kh/32, n].
    Nibbles convert to the activation dtype (bf16 fast path; f32 when the
    caller runs float32 compute)."""
    kh, n = q_half.shape[-2], q_half.shape[-1]
    g = q_half.reshape(kh // INT4_GROUP, INT4_GROUP, n)
    deq = (g.astype(x_half.dtype)
           * s_half[..., :, None, :].astype(x_half.dtype)).reshape(kh, n)
    return jnp.dot(x_half, deq, preferred_element_type=jnp.float32)


def _split_quant_layers(layers):
    """Split the stacked layer dict for scanning: QuantTensor(N) weights
    must NOT ride scan xs (XLA copies every per-layer slice before the
    pallas custom call — 3× HBM traffic); they stay whole and the kernel
    selects the layer via scalar-prefetch / static index_maps (see
    ops.quant_matmul.IndexedQuant)."""
    dense = {k: v for k, v in layers.items()
             if not isinstance(v, (QuantTensor, QuantTensorN))}
    quant = {k: v for k, v in layers.items()
             if isinstance(v, (QuantTensor, QuantTensorN))}
    return dense, quant


def _layer_params(dense_slice, quant, l):
    lp = dict(dense_slice)
    for key, qt in quant.items():
        lp[key] = IndexedQuant(qt, l)
    return lp


def _pre_layer_count(params) -> int:
    """Heterogeneous stacks (deepseek ``first_k_dense_replace``): depth
    of the optional dense-MLP prefix stack ``layers_pre``; its layers
    run before the uniform ``layers`` scan."""
    pre = params.get("layers_pre")
    return int(pre["input_ln"].shape[0]) if pre is not None else 0


def _dense_layer_slice(dense, l):
    """One layer's slice of a stacked dense dict. tree_map so NamedTuple
    weights (Int8Weight/Int4Weight) slice their leading layer dim instead
    of tuple-indexing their fields."""
    return {key: jax.tree_util.tree_map(lambda x: x[l], w)
            for key, w in dense.items()}


def _unroll_decode(default: bool = False) -> bool:
    """Unroll the quantized decode over layers (static kernel indices).

    Copy-free, scalar-free weight streaming at the cost of compile time.
    For the plain 4-call-per-layer path it trails the scan (XLA's async
    scheduler hides scan-slice copies behind attention compute), so that
    path defaults off. The fused megacall-v2 pipeline requires static
    layer pairing and measured fastest unrolled (507 → 575 tok/s on
    v5e), so fused callers pass ``default=True``. ``FUNASR_UNROLL_DECODE``
    overrides either way."""
    import os
    v = os.environ.get("FUNASR_UNROLL_DECODE")
    if v is None:
        return default
    return v != "0"


class QuantKV(NamedTuple):
    """int8 cache half: per-(layer,row,slot,head) absmax scales.

    Halves KV HBM traffic — decode reads the whole cache every step, and
    past batch ~16 those reads outweigh the weights (docs/PERFORMANCE.md
    KV table). Dequant (q·s) is an elementwise producer XLA fuses into
    the attention dots. Opt-in via ``kv_cache_dtype='int8'``.
    """
    q: jnp.ndarray  # int8 [n_layers, B, S, kv_heads, head_dim]
    s: jnp.ndarray  # activation dtype [n_layers, B, S, kv_heads, 1]


class KVCache(NamedTuple):
    k: Any  # [n_layers, B, S, kv_heads, head_dim] array — or QuantKV
    v: Any

    @property
    def max_len(self):
        arr = self.k.q if isinstance(self.k, QuantKV) else self.k
        return arr.shape[2]

    @property
    def act_dtype(self):
        """The activation dtype this cache pairs with."""
        return (self.k.s.dtype if isinstance(self.k, QuantKV)
                else self.k.dtype)


def _kv_quantize(a: jnp.ndarray):
    """[..., head_dim] activations → (int8 values, [..., 1] scales).

    Values are rounded against the scale AS STORED (after the cast to
    the activation dtype) so encode and decode agree exactly — in bf16
    mode an f32-scale encode would add ~0.2% extra error on top of the
    0.4% quantization step."""
    s = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1,
                keepdims=True) / 127.0
    s = s.astype(a.dtype)
    sf = s.astype(jnp.float32)
    q = jnp.round(a.astype(jnp.float32) / jnp.where(sf == 0, 1.0, sf))
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


def _kv_store(K, new, write_fn):
    """Write ``new`` activations into an array or QuantKV cache;
    ``write_fn(big, payload)`` performs the positional update."""
    if isinstance(K, QuantKV):
        q, s = _kv_quantize(new)
        return QuantKV(q=write_fn(K.q, q), s=write_fn(K.s, s))
    return write_fn(K, new)


def _kv_layer_slice(K, l, dtype):
    """Layer ``l``'s dequantized [B, S, kh, hd] view."""
    if isinstance(K, QuantKV):
        q = jax.lax.dynamic_index_in_dim(K.q, l, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(K.s, l, 0, keepdims=False)
        return q.astype(dtype) * s.astype(dtype)
    return jax.lax.dynamic_index_in_dim(K, l, 0, keepdims=False)


def _flash_decode_wanted(b: int, t: int) -> bool:
    """Gate for the fused Pallas decode-attention kernel.

    Default OFF: two kernel designs (per-head small dots; E-matrix
    block-diagonal single-dot, see ops/flash_decode.py) were measured
    20-50% SLOWER than the XLA path at b=16/32 on v5e
    (experiments/flash_decode_ab.py; docs/PERFORMANCE.md "Flash-decode"
    section) -- decode attention is a batched-small-GEMM workload whose
    XLA einsums already run near the cache-read floor, and Mosaic's
    per-grid-cell cost (B cells x 28 layers/step) has no fusion win to
    hide behind. ``FUNASR_FLASH_DECODE=1`` forces the kernel on for
    experiments.
    """
    import os
    return os.environ.get("FUNASR_FLASH_DECODE", "0") == "1"


def _attn_probs(scores, sinks=None):
    """Softmax over the key axis, optionally against per-head sink
    logits (gpt-oss): the sink joins the denominator as one extra
    column and its probability mass is dropped — attention may "park"
    on nothing (HF ``GptOssAttention`` eager semantics)."""
    if sinks is None:
        return jax.nn.softmax(scores, axis=-1)
    b, qh, t, s = scores.shape
    sk = jnp.broadcast_to(
        sinks.astype(scores.dtype).reshape(1, qh, 1, 1), (b, qh, t, 1))
    comb = jnp.concatenate([scores, sk], axis=-1)
    return jax.nn.softmax(comb, axis=-1)[..., :s]


def _attend_cache_flash(q, K, V, l, bias, cfg):
    """Route one layer's decode attention through the fused Pallas
    kernel (ops/flash_decode.py). Returns None when the shapes fall
    outside the kernel's tiling gate — caller falls back to XLA."""
    b, t = q.shape[0], q.shape[1]
    if not _flash_decode_wanted(b, t):
        return None
    from ..ops.flash_decode import (flash_decode_attention,
                                    flash_decode_supported)
    quant = isinstance(K, QuantKV)
    arr = K.q if quant else K
    s, kh, hd = arr.shape[2], arr.shape[3], arr.shape[4]
    if not flash_decode_supported(b, t, s, kh, hd, quant):
        return None
    qs = (q.astype(jnp.float32) * _attn_scale(cfg)).astype(q.dtype)
    bias3 = jnp.broadcast_to(bias[:, 0], (b, t, s))
    if quant:
        kq = jax.lax.dynamic_index_in_dim(K.q, l, 0, keepdims=False)
        ks = jax.lax.dynamic_index_in_dim(K.s, l, 0, keepdims=False)
        vq = jax.lax.dynamic_index_in_dim(V.q, l, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(V.s, l, 0, keepdims=False)
        return flash_decode_attention(qs, kq, vq, bias3, ks, vs)
    k_cache = jax.lax.dynamic_index_in_dim(K, l, 0, keepdims=False)
    v_cache = jax.lax.dynamic_index_in_dim(V, l, 0, keepdims=False)
    return flash_decode_attention(qs, k_cache, v_cache, bias3)


def _attend_cache(q, K, V, l, bias, cfg, sinks=None):
    """Attention of q [B,T,qh,hd] over layer ``l`` of a stacked cache.

    For a QuantKV cache the per-(slot,head) scales COMMUTE out of the
    head_dim contraction, so the [S, hd] dequant expand never exists:
    scores are computed on the raw int8 K (the int8→compute-dtype
    convert is exact, the same convert XLA fuses for ``Int8Weight``)
    and K's scale multiplies the [.., s] score row; V's scale folds
    into the probabilities before the mix dot. Numerically this is at
    least as accurate as dequant-then-dot (one fewer bf16 rounding on
    the K side).

    Batched serving routes through the fused Pallas flash-decode
    kernel instead (same numerics class; see ops/flash_decode.py)."""
    if sinks is None and not cfg.attn_softcap:
        # the flash kernel has neither a sink column nor score softcap
        flash = _attend_cache_flash(q, K, V, l, bias, cfg)
        if flash is not None:
            return flash
    if isinstance(K, QuantKV):
        kq = jax.lax.dynamic_index_in_dim(K.q, l, 0, keepdims=False)
        ks = jax.lax.dynamic_index_in_dim(K.s, l, 0, keepdims=False)
        vq = jax.lax.dynamic_index_in_dim(V.q, l, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(V.s, l, 0, keepdims=False)
        group = cfg.q_heads // cfg.kv_heads
        scores = _gqa_scores(q, kq.astype(q.dtype), cfg)   # [B,qh,T,S]
        b, _, t, s = scores.shape
        kscale = jnp.transpose(ks[..., 0].astype(jnp.float32),
                               (0, 2, 1))                  # [B,kh,S]
        scores = _softcap_scores(
            (scores.reshape(b, cfg.kv_heads, group, t, s)
             * kscale[:, :, None, None, :]
             ).reshape(b, cfg.q_heads, t, s), cfg) + bias
        probs = _attn_probs(scores, sinks)
        vscale = jnp.transpose(vs[..., 0].astype(jnp.float32), (0, 2, 1))
        probs = (probs.reshape(b, cfg.kv_heads, group, t, s)
                 * vscale[:, :, None, None, :]
                 ).reshape(b, cfg.q_heads, t, s)
        return _gqa_mix(probs, vq.astype(q.dtype), cfg)
    k_cache = _kv_layer_slice(K, l, q.dtype)
    v_cache = _kv_layer_slice(V, l, q.dtype)
    scores = _softcap_scores(_gqa_scores(q, k_cache, cfg), cfg) + bias
    probs = _attn_probs(scores, sinks)
    return _gqa_mix(probs, v_cache, cfg)


def init_kv_cache(cfg: Qwen3Config, batch: int, max_len: int,
                  dtype=jnp.bfloat16, kv_int8: bool = False) -> KVCache:
    shape = (cfg.n_layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
    if kv_int8:
        sshape = shape[:-1] + (1,)
        # k and v MUST be distinct allocations: generate_chunk donates
        # the state, and an aliased buffer donated twice corrupts/errors
        return KVCache(k=QuantKV(q=jnp.zeros(shape, jnp.int8),
                                 s=jnp.zeros(sshape, dtype)),
                       v=QuantKV(q=jnp.zeros(shape, jnp.int8),
                                 s=jnp.zeros(sshape, dtype)))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


# ---------------------------------------------------------------------------
# RoPE (HF half-rotation convention)
# ---------------------------------------------------------------------------

def rope_cos_sin(positions, head_dim: int, theta: float, dtype,
                 factors=None, attn_factor: float = 1.0):
    """positions [...,] → (cos, sin) each [..., head_dim].

    ``factors`` (len head_dim//2) divide each inverse frequency and
    ``attn_factor`` scales the magnitudes — phi3 longrope semantics
    (HF ``modeling_rope_utils._compute_longrope_parameters``; llama.cpp
    ``rope_factors_{short,long}.weight`` + attn-factor correction)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    if factors is not None:
        inv_freq = inv_freq / jnp.asarray(factors, jnp.float32)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    if attn_factor != 1.0:
        cos, sin = cos * attn_factor, sin * attn_factor
    return cos.astype(dtype), sin.astype(dtype)


def apply_rope(x, cos, sin):
    """x [..., T, H, D]; cos/sin broadcastable [..., T, 1, d], d ≤ D.

    d < D is partial rotary (phi3 ``rope.dimension_count``): the first d
    dims rotate, the tail passes through unchanged."""
    d = cos.shape[-1]
    if d < x.shape[-1]:
        xr, xp = x[..., :d], x[..., d:]
        half = d // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return jnp.concatenate([xr * cos + rotated * sin, xp], axis=-1)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


# ---------------------------------------------------------------------------
# Transformer block primitives
# ---------------------------------------------------------------------------

def _proj(x, w, pre: bool = False):
    """Dense, int8-per-channel, or q8_0-quantized projection. ``pre``
    declares x already block-permuted (fused q8 convention; quantized
    weights only)."""
    if isinstance(w, Int8Weight):
        # convert weights to the ACTIVATION dtype: bf16 in the fast path,
        # f32 when the caller runs float32 compute (don't silently
        # round-trip f32 activations through bf16)
        out = jnp.dot(x, w.w8.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return (out * w.scale.astype(jnp.float32)).astype(x.dtype)
    if isinstance(w, Int4Weight):
        # two group-batched dots over contiguous activation halves (the
        # interleave-free split-half packing makes both the nibble
        # extracts and the scale slices contiguous). A single dot over
        # the full dequantized reconstruction makes XLA materialize the
        # bf16 tensor through HBM instead (measured 131 tok/s).
        kh = w.packed.shape[-2]
        gs = w.scale.shape[-2] // 2
        lead, k = x.shape[:-1], x.shape[-1]
        xf = x.reshape(-1, k)
        out = _int4_half_dot(xf[:, :kh], (w.packed << 4) >> 4,
                             w.scale[..., :gs, :])
        out = out + _int4_half_dot(xf[:, kh:], w.packed >> 4,
                                   w.scale[..., gs:, :])
        return out.reshape(*lead, -1).astype(x.dtype)
    return matmul_any(x, w, x_preblocked=pre).astype(x.dtype)


_MATMUL_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
                "qkv_w", "gate_up_w")
# stacked expert weights [L, E, k, n]: shape-agnostic quantizers (int8 /
# int4) handle them; the 2-D Pallas q8_0 kernels do not (router_w stays
# dense — it is tiny and feeds a f32 softmax)
_MOE_MATMUL_KEYS = ("moe_gate_w", "moe_up_w", "moe_down_w",
                    "shared_gate_w", "shared_up_w", "shared_down_w")
# MLA projections (deepseek): per-channel quantizers handle any [L,k,n];
# the low-rank k dims (q_lora/kv_lora) need not divide the q8_0 block
_MLA_MATMUL_KEYS = ("q_a_w", "q_b_w", "kv_a_w", "kv_b_w")


def _q8_mode() -> str:
    """q8_0 on-device representation: 'xla' (BlockQuant — dense-layout int8
    + per-block scales, batched-block dot, rides scan xs) or 'pallas'
    (QuantTensor — kernel layout, scalar-prefetch Pallas dequant-matmul).
    Same stored numbers either way."""
    import os
    return os.environ.get("FUNASR_Q8_MODE", "pallas")


def quantize_qwen3_params(params, keys=None, mode=None):
    """Convert the per-layer matmul weights to q8_0 (QuantTensor or
    BlockQuant per ``mode``, default ``FUNASR_Q8_MODE``).

    The embedding stays dense for gather efficiency (see
    :func:`quantize_lm_head` for the output projection); everything else
    drops to 1.06 bytes/param in HBM — the same storage policy as the
    reference's q8_0 GGUF decode path. Handles both the unpacked and the
    :func:`pack_qwen3_params` fused layouts.
    """
    mode = mode or _q8_mode()
    quant_fn = block_quantize_weight if mode == "xla" else quantize_weight

    def one_stack(src):
        layers = dict(src)
        for key in (keys or _MATMUL_KEYS):
            w = layers.get(key)           # [L, k_in, n_out]
            if w is None or isinstance(w, (QuantTensor, BlockQuant)):
                continue
            layers[key] = jax.vmap(quant_fn)(w)
        return layers

    out = dict(params)
    out["layers"] = one_stack(params["layers"])
    if "layers_pre" in params:
        out["layers_pre"] = one_stack(params["layers_pre"])
    return out


def quantize_qwen3_params_int8(params, keys=None, donate: bool = False):
    """Convert layer matmul weights to per-channel int8 (`Int8Weight`).

    The fastest decode format on TPU (see Int8Weight); works on packed or
    unpacked layouts. QuantTensor (q8_0) weights are left untouched.

    ``donate=True`` MUTATES ``params['layers']``, dropping each bf16
    source as it is consumed so its HBM frees immediately — needed to
    quantize multi-GB decoders (4B+) on one chip. Layer-by-layer
    quantization bounds the f32 transient to a single layer slice.
    """
    def quant_one(w):                                   # [k, n] → Int8Weight
        wf = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
        w8 = jnp.round(wf / jnp.where(s == 0, 1.0, s)).astype(jnp.int8)
        return Int8Weight(w8=w8, scale=s.astype(jnp.bfloat16))

    def one_stack(src):
        layers = dict(src)
        for key in (keys or
                    _MATMUL_KEYS + _MOE_MATMUL_KEYS + _MLA_MATMUL_KEYS):
            w = layers.get(key)
            if w is None or isinstance(w, (QuantTensor, BlockQuant,
                                           Int8Weight)):
                continue
            if donate:
                src.pop(key, None)    # release the caller's bf16 reference
            # quantize layer-by-layer: a whole-stack f32 transient would
            # be 2x the bf16 weight bytes in HBM (OOMs a 4B model on one
            # v5e); block per step so async dispatch can't pile up the
            # transients
            per = []
            for i in range(w.shape[0]):
                q = quant_one(w[i])
                jax.block_until_ready(q.w8)
                per.append(q)
            del w
            layers[key] = Int8Weight(
                w8=jnp.stack([p.w8 for p in per]),
                scale=jnp.stack([p.scale for p in per]))
        return layers

    out = dict(params)
    out["layers"] = one_stack(params["layers"])
    if "layers_pre" in params:
        out["layers_pre"] = one_stack(params["layers_pre"])
    return out


def quantize_qwen3_params_int4(params, keys=None, donate: bool = False):
    """Convert layer matmul weights to group-32 int4 (`Int4Weight`).

    Same structure as :func:`quantize_qwen3_params_int8` (layer-by-layer,
    optional donation); QuantTensor/Int8Weight entries are left alone.
    """
    src = params["layers"]
    layers = dict(src)
    for key in (keys or _MATMUL_KEYS):
        w = layers.get(key)
        if w is None or isinstance(w, (QuantTensor, BlockQuant,
                                       Int8Weight, Int4Weight)):
            continue
        if donate:
            src.pop(key, None)
        per = []
        for i in range(w.shape[0]):
            q = int4_quantize_weight(w[i])
            jax.block_until_ready(q.packed)
            per.append(q)
        del w
        layers[key] = Int4Weight(
            packed=jnp.stack([p.packed for p in per]),
            scale=jnp.stack([p.scale for p in per]))
    out = dict(params)
    out["layers"] = layers
    return out


def pack_qwen3_params(params):
    """Fuse q/k/v and gate/up into single projections (decode layout).

    Cuts the per-layer matmul count 7 → 4, which matters at decode: each
    kernel dispatch has fixed cost and batch-1 matvecs can't amortize it.
    q8_0 rows are independent, so ``pack∘quantize == quantize∘pack``
    bit-exactly. Training keeps the unpacked layout (per-weight grads).
    """
    def one_stack(src):
        if "qkv_w" in src or ("kv_a_w" in src and "gate_w" not in src):
            return src      # already packed / nothing fusable (MLA MoE)
        layers = dict(src)

        def cat(keys):
            ws = [layers.pop(k) for k in keys]
            if isinstance(ws[0], QuantTensor):
                return QuantTensor(
                    q=jnp.concatenate([w.q for w in ws], axis=-2),
                    d=jnp.concatenate([w.d for w in ws], axis=-2))
            if isinstance(ws[0], Int8Weight):
                return Int8Weight(
                    w8=jnp.concatenate([w.w8 for w in ws], axis=-1),
                    scale=jnp.concatenate([w.scale for w in ws], axis=-1))
            if isinstance(ws[0], BlockQuant):
                return BlockQuant(
                    q=jnp.concatenate([w.q for w in ws], axis=-1),
                    d=jnp.concatenate([w.d for w in ws], axis=-1))
            return jnp.concatenate(ws, axis=-1)

        if "kv_a_w" not in layers:  # MLA projections stay separate
            layers["qkv_w"] = cat(("q_w", "k_w", "v_w"))
        if "gate_w" in layers:      # MoE layers have expert MLPs instead
            layers["gate_up_w"] = cat(("gate_w", "up_w"))
        if "q_b" in layers:  # qwen2-family biases ride along, fused too
            layers["qkv_b"] = jnp.concatenate(
                [layers.pop(k) for k in ("q_b", "k_b", "v_b")], axis=-1)
        return layers

    new_main = one_stack(params["layers"])
    new_pre = (one_stack(params["layers_pre"])
               if "layers_pre" in params else None)
    if new_main is params["layers"] and (
            new_pre is None or new_pre is params["layers_pre"]):
        return params                      # idempotent: same object
    out = dict(params)
    out["layers"] = new_main
    if new_pre is not None:
        out["layers_pre"] = new_pre
    return out


def quantize_lm_head(params, cfg: Qwen3Config, mode=None):
    """Quantize the output projection to q8_0 (``lm_head_q``).

    The tied-embedding logits matmul reads the full [vocab, hidden] table
    every generated token — a quarter of all decode HBM traffic in bf16.
    llama.cpp's q8_0 files quantize ``output.weight`` the same way; the
    dense ``embed`` stays for prompt/token gathers.
    """
    if "lm_head_q" in params:
        return params
    mode = mode or _q8_mode()
    head = _lm_head(params, cfg)                       # [hidden, vocab]
    # pad the vocab dim to a kernel-tile multiple: the Qwen3 vocab
    # (151936 = 128 x 1187) otherwise forces a 128-row kernel tile — 1187
    # grid steps whose fixed costs dominate. Padded rows are zero; _logits
    # slices them off.
    pad = -head.shape[-1] % 1024
    if pad:
        head = jnp.pad(head, ((0, 0), (0, pad)))
    out = dict(params)
    quant_fn = block_quantize_weight if mode == "xla" else quantize_weight
    out["lm_head_q"] = quant_fn(head.astype(jnp.float32))
    # untied models: the dense lm_head is never read once the quantized
    # head exists — keeping it would waste hundreds of MB of HBM
    out.pop("lm_head", None)
    return out


def fuse_qwen3_params_q8(params):
    """Adopt the fused-q8 "perm space" convention (megacall decode).

    Requires packed (:func:`pack_qwen3_params`) q8_0 (QuantTensor) params.
    Reorders — never recomputes — the stored q8_0 bytes: o/gate_up/down
    output channels go block-permuted (gate_up per half), and the
    elementwise norm weights are permuted to match, so the residual stream
    can live permanently in block-permuted lane order. Graph builders
    switch on the ``q8_fused`` marker key (static: dict structure).
    See ops.quant_matmul.q8_mlp_fused for why.
    """
    if "q8_fused" in params:
        return params
    layers = dict(params["layers"])
    if "router_w" in layers:
        raise ValueError(
            "fuse_qwen3_params_q8 does not support MoE layers — use the "
            "int8/bf16 paths for qwen3moe decoders")
    if "qkv_b" in layers or "q_b" in layers:
        raise ValueError(
            "fuse_qwen3_params_q8 supports bias-free archs only (qwen3/"
            "llama); qwen2-family biases would need perm-space handling — "
            "use the int8/bf16 paths instead")
    if "input_ln" not in layers:
        raise ValueError(
            "fuse_qwen3_params_q8 needs pre-norm layers; post-norm-only "
            "archs (olmo2) have no input_ln to permute — use the "
            "int8/bf16 paths")
    for key in ("qkv_w", "o_w", "gate_up_w", "down_w"):
        if not isinstance(layers.get(key), QuantTensor):
            raise ValueError(
                f"fuse_qwen3_params_q8 needs packed q8_0 params ({key})")
    layers["o_w"] = permute_out_channels(layers["o_w"])
    layers["gate_up_w"] = permute_out_channels(layers["gate_up_w"], halves=2)
    layers["down_w"] = permute_out_channels(layers["down_w"])
    layers["input_ln"] = block_permute(layers["input_ln"])
    layers["post_ln"] = block_permute(layers["post_ln"])
    if "attn_post_ln" in layers:
        # sandwich norms (gemma3): rmsnorm is permutation-invariant and
        # the extra stages are elementwise, so they ride the megacall in
        # perm space (ops.quant_matmul sandwich rows)
        layers["attn_post_ln"] = block_permute(layers["attn_post_ln"])
        layers["ffn_post_ln"] = block_permute(layers["ffn_post_ln"])
    out = dict(params)
    out["layers"] = layers
    out["final_ln"] = block_permute(params["final_ln"])
    out["q8_fused"] = jnp.zeros((0,), jnp.int8)      # static marker
    return out


def fuse_qwen3_params_q8_mega(params, cfg: Qwen3Config):
    """Adopt the all-layers megakernel decode convention.

    On top of :func:`fuse_qwen3_params_q8` (+ a quantized lm_head), adds
    the precomputed ``norms_next`` stack (layer l's "next" input rmsnorm;
    the last slot is the final norm — the megakernel applies it inside
    layer L-1's down-stage so the fused head streams right after) and the
    ``q8_mega`` marker. Only marks params the kernel can actually serve
    (staged plan exists, GQA group 2, Pallas head present) — otherwise
    returns the input unchanged and the decode step keeps the per-layer
    megacall path.
    """
    from ..ops.quant_matmul import _mega_stage_plan
    if "q8_mega" in params:
        return params
    layers = params["layers"]
    head = params.get("lm_head_q")
    if (not isinstance(head, QuantTensor)
            or "q8_fused" not in params
            or "q_norm" not in layers
            or cfg.q_heads != 2 * cfg.kv_heads
            # the in-kernel rope is plain full-dim rope_theta: no sliding
            # interleave, longrope factors, attn-factor or partial dims
            # (phi3) and no linear position scale (gemma)
            or cfg.sliding_pattern
            or (cfg.rope_dim and cfg.rope_dim != cfg.head_dim)
            or cfg.active_rope_factors
            or cfg.rope_attn_factor != 1.0
            or cfg.rope_global_scale != 1.0
            # granite: residual adds are baked plain into the kernel
            or cfg.residual_scale != 1.0):
        return params
    qd = cfg.q_heads * cfg.head_dim
    nq = layers["qkv_w"].q.shape[-2]
    f2 = layers["gate_up_w"].q.shape[-2]
    vp = head.q.shape[-2]
    plan_l = _mega_stage_plan(1, qd, cfg.hidden, f2, cfg.ffn_dim, nq)
    plan_h = _mega_stage_plan(1, qd, cfg.hidden, f2, cfg.ffn_dim, vp)
    if plan_l is None or plan_h is None or plan_h[3] == 0 \
            or (vp // plan_h[3]) * cfg.hidden > 4 << 20:
        return params
    out = dict(params)
    out["norms_next"] = jnp.concatenate(
        [layers["input_ln"][1:], params["final_ln"][None]], axis=0)
    out["q8_mega"] = jnp.zeros((0,), jnp.int8)     # static marker
    return out


def fuse_qwen3_params_q8i(params):
    """Adopt the int8-dot decode convention (megacall v3).

    Requires packed q8_0 (QuantTensor) params WITHOUT the perm-space
    transform. Relabels — never recomputes — the stored q8_0 bytes:
    weights move to natural-k :class:`QuantTensorN` storage and the
    lm_head to the q8dot layout. Every decode matmul then runs s8×s8 MXU
    dots with the weight/activation block scales multiplied into partial
    sums — the identical compute contract to llama.cpp's q8_0×q8_0
    ``vec_dot`` (the reference's entire decode path), removing the
    per-element VPU dequantization that bounds the perm-space megacalls.
    Norm weights stay natural; activations are NOT block-permuted.
    """
    if "q8i_fused" in params:
        return params
    if "q8_fused" in params:
        raise ValueError("params already use the perm-space (q8_fused) "
                         "convention; build q8i from unfused packed params")
    layers = dict(params["layers"])
    if "attn_post_ln" in layers:
        raise ValueError(
            "fuse_qwen3_params_q8i does not support sandwich-norm archs "
            "(gemma); use the int8/bf16 paths")
    if "input_ln" not in layers:
        raise ValueError(
            "fuse_qwen3_params_q8i does not support post-norm-only archs "
            "(olmo2); use the int8/bf16 paths")
    if "router_w" in layers:
        raise ValueError(
            "fuse_qwen3_params_q8i does not support MoE layers — use the "
            "int8/bf16 paths for qwen3moe decoders")
    for key in ("qkv_w", "o_w", "gate_up_w", "down_w"):
        w = layers.get(key)
        if isinstance(w, QuantTensor):
            layers[key] = to_natural(w)
        elif not isinstance(w, QuantTensorN):
            raise ValueError(
                f"fuse_qwen3_params_q8i needs packed q8_0 params ({key})")
    out = dict(params)
    out["layers"] = layers
    out["q8i_fused"] = jnp.zeros((0,), jnp.int8)     # static marker
    return lm_head_q8dot(out)


def _qkv_post(qkv, lp, cfg: Qwen3Config, cos, sin):
    """Split a raw packed qkv projection [B, T, n_qkv] into heads and apply
    (arch-dependent) bias, qk-RMSNorm and rope.

    Bias/norm presence follows the param dict, which the loaders populate
    per arch (qwen3: qk-norm, no bias; qwen2: bias, no qk-norm; llama:
    neither) — the graph functions stay arch-agnostic."""
    b, t, _ = qkv.shape
    if "qkv_b" in lp:
        qkv = qkv + lp["qkv_b"].astype(qkv.dtype)
    qd = cfg.q_heads * cfg.head_dim
    kd = cfg.kv_heads * cfg.head_dim
    q = qkv[..., :qd]
    k = qkv[..., qd:qd + kd]
    v = qkv[..., qd + kd:].reshape(b, t, cfg.kv_heads, cfg.head_dim)
    if "q_norm" in lp and cfg.qk_norm_full:
        # olmo2: RMSNorm over the whole projected vector, pre-reshape
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = q.reshape(b, t, cfg.q_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    if "q_norm" in lp and not cfg.qk_norm_full:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _deinterleave_pairs(x):
    """[..., d] with rotary pairs stored interleaved (x0,y0,x1,y1,…) →
    half-split (x0,x1,…,y0,y1,…) — deepseek checkpoints store the rope
    dims interleaved (HF ``DeepseekV3Attention`` does the same reshuffle
    before its standard half-rotation rope)."""
    d = x.shape[-1]
    return (x.reshape(*x.shape[:-1], d // 2, 2)
            .swapaxes(-1, -2).reshape(*x.shape[:-1], d))


def _mla_qkv(x, lp, cfg: Qwen3Config, cos, sin):
    """Multi-head Latent Attention projections (deepseek2/3).

    q: dense or low-rank (q_a → rmsnorm → q_b), per head
    [qk_nope ++ qk_rope]; kv: low-rank ``kv_a`` whose tail ``qk_rope``
    dims are a SHARED (single-head) rotary key, the rest rmsnormed and
    expanded by ``kv_b`` into per-head [k_nope ++ v]. v (v_head_dim)
    zero-pads up to head_dim so the standard cache/attention machinery
    applies; :func:`_attn_out` slices the pad back off.
    """
    b, t, _ = x.shape
    nope, rp, hd = cfg.qk_nope_dim, cfg.qk_rope_dim, cfg.head_dim
    vd = cfg.v_head_dim or hd
    if "q_a_w" in lp:
        qa = rms_norm(_proj(x, lp["q_a_w"]), lp["q_a_norm"], cfg.rms_eps)
        q = _proj(qa, lp["q_b_w"])
    else:
        q = _proj(x, lp["q_w"])
    q = q.reshape(b, t, cfg.q_heads, nope + rp)
    kv_a = _proj(x, lp["kv_a_w"])                 # [B,T, lora+rp]
    c_kv = rms_norm(kv_a[..., :cfg.kv_lora_rank], lp["kv_a_norm"],
                    cfg.rms_eps)
    k_pe = kv_a[..., None, cfg.kv_lora_rank:]     # [B,T,1,rp] shared
    kv = _proj(c_kv, lp["kv_b_w"]).reshape(b, t, cfg.q_heads, nope + vd)
    k_nope, v = kv[..., :nope], kv[..., nope:]
    q_nope, q_pe = q[..., :nope], q[..., nope:]
    if cfg.rope_interleaved:
        q_pe = _deinterleave_pairs(q_pe)
        k_pe = _deinterleave_pairs(k_pe)
    q_pe = apply_rope(q_pe, cos, sin)
    k_pe = apply_rope(k_pe, cos, sin)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (b, t, cfg.q_heads, rp))],
        axis=-1)
    if vd < hd:     # pad v into the uniform cache head_dim
        v = jnp.pad(v, [(0, 0)] * 3 + [(0, hd - vd)])
    return q, k, v


def _qkv(x, lp, cfg: Qwen3Config, cos, sin, pre: bool = False):
    """Project + qk-norm + rope. x [B, T, H] → q [B,T,qh,D], k/v [B,T,kh,D].

    Supports both layouts: fused ``qkv_w`` (one matmul, then split) and
    separate ``q_w``/``k_w``/``v_w``. ``pre``: x arrives block-permuted.
    """
    b, t, _ = x.shape
    if "kv_a_w" in lp:
        return _mla_qkv(x, lp, cfg, cos, sin)
    if "qkv_w" in lp:
        return _qkv_post(_proj(x, lp["qkv_w"], pre), lp, cfg, cos, sin)
    q = _proj(x, lp["q_w"], pre)
    k = _proj(x, lp["k_w"], pre)
    v = _proj(x, lp["v_w"], pre)
    if "q_b" in lp:
        q = q + lp["q_b"].astype(q.dtype)
        k = k + lp["k_b"].astype(k.dtype)
        v = v + lp["v_b"].astype(v.dtype)
    if "q_norm" in lp and cfg.qk_norm_full:
        # olmo2: RMSNorm over the whole projected vector, pre-reshape
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = q.reshape(b, t, cfg.q_heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    if "q_norm" in lp and not cfg.qk_norm_full:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def _merge_heads(attn_heads, cfg: Qwen3Config):
    b, t = attn_heads.shape[0], attn_heads.shape[2]
    return attn_heads.transpose(0, 2, 1, 3).reshape(
        b, t, cfg.q_heads * cfg.head_dim)


def _attn_out(attn_heads, lp, cfg: Qwen3Config, pre: bool = False):
    if cfg.v_head_dim and cfg.v_head_dim < cfg.head_dim:
        # MLA: drop the v zero-pad before o_proj ([.., v_head_dim] rows)
        attn_heads = attn_heads[..., :cfg.v_head_dim]
        b, t = attn_heads.shape[0], attn_heads.shape[2]
        merged = attn_heads.transpose(0, 2, 1, 3).reshape(
            b, t, cfg.q_heads * cfg.v_head_dim)
        return _proj(merged, lp["o_w"], pre)
    merged = _merge_heads(attn_heads, cfg)
    if pre:
        # fused-q8 convention: o_w contracts block-permuted lanes and its
        # output channels are pre-permuted, so the result stays in perm
        # space (matches the residual stream)
        merged = block_permute(merged)
    out = _proj(merged, lp["o_w"], pre)
    if "o_b" in lp:                    # gpt-oss: bias on every projection
        out = out + lp["o_b"].astype(out.dtype)
    return out


def _mlp(x, lp, pre: bool = False, act: str = "silu"):
    if "gate_up_w" in lp:
        gu = _proj(x, lp["gate_up_w"], pre)
        f = gu.shape[-1] // 2
        gate, up = gu[..., :f], gu[..., f:]
    else:
        gate = _proj(x, lp["gate_w"], pre)
        up = _proj(x, lp["up_w"], pre)
    gate = (jax.nn.gelu(gate, approximate=True) if act == "gelu_tanh"
            else jax.nn.silu(gate))
    # pre: gate/up channel orders are half-permuted identically, so the
    # elementwise pairing is aligned and the product lands in down_w's
    # expected (permuted) contraction order
    return _proj(gate * up, lp["down_w"], pre)


def _moe_dense(w, dtype):
    """Dense view of stacked expert weights [..., E, k, n] (the
    Int8Weight dequant is an elementwise producer XLA fuses into the
    consuming einsum's weight reads — no materialized bf16 copy)."""
    if isinstance(w, Int8Weight):
        return w.w8.astype(dtype) * w.scale.astype(dtype)
    return w.astype(dtype)


def _moe_gather(w, idx):
    """Select expert slices by routing index: idx [N, K] → [N, K, k, n]."""
    if isinstance(w, Int8Weight):
        return Int8Weight(w8=w.w8[idx], scale=w.scale[idx])
    return w[idx]


def _moe_mlp(x, lp, cfg: Qwen3Config):
    """Sparse-MoE MLP block (Qwen3-MoE: softmax router over all experts,
    top-k selection, optional renormalization of the selected probs, no
    shared expert — ``Qwen3MoeSparseMoeBlock``; the reference converter
    registers the family at ``convert_hf_to_gguf.py:4328``).

    Two execution strategies, chosen statically by token count:

    * **gather** (decode/verify: few tokens): pull the top-k experts'
      weight slices per token and batch the per-token expert MLPs — HBM
      reads only the ACTIVE experts' bytes, which is what makes MoE
      decode cheap (k/E of the weight traffic);
    * **dense dispatch** (prefill/training: many tokens): run every
      expert over every token and combine with the routing weights —
      one pass over all expert weights (which ≥E/k tokens activate
      almost surely anyway) using full-size MXU matmuls instead of N·k
      scattered slices. This form is also what expert-parallel sharding
      partitions (each device computes its expert shard, psum combines).
    """
    lead, h = x.shape[:-1], x.shape[-1]
    xf = x.reshape(-1, h)
    n = xf.shape[0]
    k = cfg.n_experts_per_tok
    logits = jnp.dot(xf.astype(jnp.float32),
                     lp["router_w"].astype(jnp.float32),
                     preferred_element_type=jnp.float32)       # [N, E]
    topv, topi = _moe_route(logits, lp, cfg)

    gw, uw, dw = lp["moe_gate_w"], lp["moe_up_w"], lp["moe_down_w"]
    gb, ub, db = (lp.get("moe_gate_b"), lp.get("moe_up_b"),
                  lp.get("moe_down_b"))
    if n * k <= cfg.n_experts:
        g_sel = _moe_dense(_moe_gather(gw, topi), x.dtype)     # [N,K,h,f]
        u_sel = _moe_dense(_moe_gather(uw, topi), x.dtype)
        d_sel = _moe_dense(_moe_gather(dw, topi), x.dtype)     # [N,K,f,h]
        g = jnp.einsum("nh,nkhf->nkf", xf, g_sel,
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("nh,nkhf->nkf", xf, u_sel,
                       preferred_element_type=jnp.float32)
        if gb is not None:
            g = g + gb[topi].astype(jnp.float32)               # [N,K,f]
            u = u + ub[topi].astype(jnp.float32)
        a = _moe_act(g, u, cfg).astype(x.dtype)
        y = jnp.einsum("nkf,nkfh->nkh", a, d_sel,
                       preferred_element_type=jnp.float32)     # [N,K,h]
        if db is not None:
            y = y + db[topi].astype(jnp.float32)
        out = jnp.einsum("nkh,nk->nh", y, topv,
                         preferred_element_type=jnp.float32)
    else:
        out = _moe_dense_dispatch(xf, topv, topi, gw, uw, dw, cfg,
                                  gb=gb, ub=ub, db=db)
    if "shared_gate_w" in lp:
        # deepseek/qwen2moe shared experts: an always-on dense gated MLP
        # added to the routed output (``DeepseekV2MLP``; qwen2moe's
        # ``Qwen2MoeSparseMoeBlock`` additionally scales it by
        # sigmoid(x @ shared_expert_gate) per token)
        shared = _mlp(xf.astype(x.dtype),
                      {"gate_w": lp["shared_gate_w"],
                       "up_w": lp["shared_up_w"],
                       "down_w": lp["shared_down_w"]}, act=cfg.act
                      ).astype(jnp.float32)
        if "shexp_gate_w" in lp:
            gate = jax.nn.sigmoid(
                xf @ lp["shexp_gate_w"].astype(jnp.float32))      # [N]
            shared = shared * gate[:, None]
        out = out + shared
    return out.reshape(*lead, h).astype(x.dtype)


def _moe_route(logits, lp, cfg: Qwen3Config):
    """Routing logits [N, E] → (weights [N, K], indices [N, K]).

    Three scoring families: softmax-then-topk (qwen3moe/deepseek2),
    topk-then-softmax (gpt-oss), and sigmoid scores with a
    selection-only correction bias + optional group-limited top-k
    (deepseek3's ``DeepseekV3TopkRouter``: groups are ranked by the sum
    of their top-2 biased scores, non-surviving groups zeroed before
    selection; the WEIGHTS use the unbiased scores)."""
    k = cfg.n_experts_per_tok
    if cfg.router_scoring == "topk_softmax":
        if "router_b" in lp:
            logits = logits + lp["router_b"].astype(jnp.float32)
        topl, topi = jax.lax.top_k(logits, k)                  # [N, K]
        return jax.nn.softmax(topl, axis=-1), topi
    if cfg.router_scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
        choice = scores
        if "router_b" in lp:     # e_score_correction_bias
            choice = choice + lp["router_b"].astype(jnp.float32)
        if cfg.n_group and cfg.topk_group:
            # deepseek3 noaux_tc: groups ranked by top-2 biased sum
            choice = _group_limit(choice, cfg, top2=True)
        _, topi = jax.lax.top_k(choice, k)
        topv = jnp.take_along_axis(scores, topi, axis=-1)
        if cfg.norm_topk_prob:
            topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
        return topv * cfg.routed_scaling_factor, topi
    # softmax over ALL experts, then take the top-k
    if "router_b" in lp:
        logits = logits + lp["router_b"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    choice = probs
    if cfg.n_group and cfg.topk_group:
        # deepseek2 group_limited_greedy: groups ranked by their MAX
        # score (``DeepseekV2MoEGate``), selection restricted to the
        # surviving groups, weights from the unmasked probs
        choice = _group_limit(probs, cfg, top2=False)
    _, topi = jax.lax.top_k(choice, k)                         # [N, K]
    topv = jnp.take_along_axis(probs, topi, axis=-1)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    if cfg.routed_scaling_factor != 1.0:
        topv = topv * cfg.routed_scaling_factor
    return topv, topi


def _group_limit(choice, cfg: Qwen3Config, top2: bool):
    """Zero out experts outside the top ``topk_group`` groups; a group's
    rank is its top-2 sum (deepseek3) or its max (deepseek2)."""
    n, e = choice.shape
    per = e // cfg.n_group
    grp = choice.reshape(n, cfg.n_group, per)
    gscore = (jnp.sum(jax.lax.top_k(grp, 2)[0], axis=-1) if top2
              else jnp.max(grp, axis=-1))                      # [N, G]
    _, gi = jax.lax.top_k(gscore, cfg.topk_group)
    keep = jnp.zeros((n, cfg.n_group), bool).at[
        jnp.arange(n)[:, None], gi].set(True)
    return jnp.where(jnp.repeat(keep, per, axis=1), choice, 0.0)


def _moe_act(g, u, cfg: Qwen3Config):
    """Gated-MLP activation on f32 pre-activations.

    ``swiglu_oai`` (gpt-oss, ``GptOssExperts``): clamp gate above at
    +limit and up to ±limit, glu = g·sigmoid(1.702·g), out = (u+1)·glu.
    Everything else: plain SiLU-gate."""
    if cfg.act == "swiglu_oai":
        lim = cfg.swiglu_limit
        g = jnp.minimum(g, lim)
        u = jnp.clip(u, -lim, lim)
        return (u + 1.0) * (g * jax.nn.sigmoid(1.702 * g))
    return jax.nn.silu(g) * u


def _moe_dense_dispatch(xf, topv, topi, gw, uw, dw, cfg: Qwen3Config,
                        expert_offset: int = 0,
                        n_local: Optional[int] = None,
                        gb=None, ub=None, db=None):
    """All-experts-over-all-tokens form: xf [N, h] → [N, h] f32.

    ``expert_offset``/``n_local`` restrict to an expert shard (expert
    parallelism: each device holds E/ep experts, combines with psum —
    routing weights for non-local experts contribute zero here).
    ``gb``/``ub``/``db`` are optional per-expert biases [E(_local), n]
    (gpt-oss), applied inside each expert before the routing weight."""
    n_local = n_local or cfg.n_experts
    onehot = jax.nn.one_hot(topi - expert_offset, n_local,
                            dtype=jnp.float32)                 # [N,K,El]
    cw = jnp.einsum("nke,nk->ne", onehot, topv)                # [N, El]
    dt = xf.dtype
    g = jnp.einsum("nh,ehf->enf", xf, _moe_dense(gw, dt),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("nh,ehf->enf", xf, _moe_dense(uw, dt),
                   preferred_element_type=jnp.float32)
    if gb is not None:
        g = g + gb[:, None, :].astype(jnp.float32)
        u = u + ub[:, None, :].astype(jnp.float32)
    a = _moe_act(g, u, cfg).astype(dt)
    y = jnp.einsum("enf,efh->enh", a, _moe_dense(dw, dt),
                   preferred_element_type=jnp.float32)         # [E,N,h]
    if db is not None:
        y = y + db[:, None, :].astype(jnp.float32)
    return jnp.einsum("enh,ne->nh", y, cw,
                      preferred_element_type=jnp.float32)


def _mlp_block(h, lp, cfg: Qwen3Config, pre: bool = False):
    """MLP dispatcher: sparse MoE when the layer carries a router."""
    if "router_w" in lp:
        return _moe_mlp(h, lp, cfg)
    return _mlp(h, lp, pre, act=cfg.act)


def _fused_mlp_call(attn_heads, x, lp, cfg: Qwen3Config, eps):
    """Megacall path (decode/verify: small token counts): one Pallas call
    for o_proj + residual + post-norm + gate_up + swiglu + down +
    residual (plus the sandwich-norm stages and gelu gate for gemma).
    x and the result ride in perm space."""
    b, t, h = x.shape
    merged = block_permute(_merge_heads(attn_heads, cfg))
    out = q8_mlp_fused(
        merged.reshape(b * t, -1).astype(jnp.bfloat16),
        x.reshape(b * t, h), lp["post_ln"],
        lp["o_w"], lp["gate_up_w"], lp["down_w"], eps,
        attn_post_w=lp.get("attn_post_ln"),
        ffn_post_w=lp.get("ffn_post_ln"), act=cfg.act)
    return out.reshape(b, t, h).astype(x.dtype)


def _fused_mlp_qkv_call(attn_heads, x, lp, lp_next, cfg: Qwen3Config, eps):
    """Megacall v2: the v1 chain plus the NEXT layer's input_ln + qkv
    projection in the same Pallas call — one call per layer instead of
    two (the per-call fixed cost is the q8_0 decode bottleneck). Returns
    (new residual [B,T,H] perm space, raw qkv [B,T,n_qkv])."""
    b, t, h = x.shape
    merged = block_permute(_merge_heads(attn_heads, cfg))
    out, qkv = q8_mlp_qkv_fused(
        merged.reshape(b * t, -1).astype(jnp.bfloat16),
        x.reshape(b * t, h), lp["post_ln"], lp_next["input_ln"],
        lp["o_w"], lp["gate_up_w"], lp["down_w"], lp_next["qkv_w"], eps,
        attn_post_w=lp.get("attn_post_ln"),
        ffn_post_w=lp.get("ffn_post_ln"), act=cfg.act)
    return (out.reshape(b, t, h).astype(x.dtype),
            qkv.reshape(b, t, -1).astype(x.dtype))


def _fused_head_call(attn_heads, x, lp, params, cfg: Qwen3Config, eps):
    """Last-layer megacall with the lm_head fused in: the final rmsnorm
    and the vocab logits stream through the same staged Pallas grid as
    the layer weights (ops.quant_matmul.q8_layer_head_fused) — the
    lm_head is mathematically the qkv stage group with ``final_ln`` in
    the next-input_ln slot. Returns logits [B, T, vocab] f32, or None
    when the staged head path is unavailable (caller falls back to the
    separate final-norm + head matmul)."""
    head = params.get("lm_head_q")
    if not isinstance(head, QuantTensor):
        return None
    if cfg.final_softcap:
        # the fused head emits raw logits; softcap archs need the
        # separate _logits path (cap·tanh applied after the matmul)
        return None
    b, t, h = x.shape
    merged = block_permute(_merge_heads(attn_heads, cfg))
    res = q8_layer_head_fused(
        merged.reshape(b * t, -1).astype(jnp.bfloat16),
        x.reshape(b * t, h), lp["post_ln"], params["final_ln"],
        lp["o_w"], lp["gate_up_w"], lp["down_w"], head, eps,
        attn_post_w=lp.get("attn_post_ln"),
        ffn_post_w=lp.get("ffn_post_ln"), act=cfg.act)
    if res is None:
        return None
    _out, logits = res
    return logits.reshape(b, t, -1)[..., :cfg.vocab_size]


def _q8i_layer_call(attn_heads, x_col, lp, lp_next, cfg: Qwen3Config, eps,
                    with_qkv: bool):
    """Megacall v3 (int8-dot): quantize the merged attention output to
    q8_0 columns in XLA, then one Pallas call for the whole layer chain
    (+ the next layer's input_ln + qkv when ``with_qkv``). The residual
    rides column-major between calls; returns (x_col', qkv_col|None)."""
    b, t = attn_heads.shape[0], attn_heads.shape[2]
    merged = _merge_heads(attn_heads, cfg).reshape(b * t, -1)
    aq, as_ = quantize_act_q8(merged.astype(jnp.float32))
    return q8i_layer_fused(
        aq.T, as_.T, x_col, lp["post_ln"],
        lp_next["input_ln"] if with_qkv else None,
        lp["o_w"], lp["gate_up_w"], lp["down_w"],
        lp_next["qkv_w"] if with_qkv else None, eps, with_qkv=with_qkv)


def _attn_scale(cfg: Qwen3Config) -> float:
    """Query scale: head_dim**-0.5, or the arch override (gemma3's
    query_pre_attn_scalar**-0.5 arrives as cfg.attn_scale)."""
    return cfg.attn_scale if cfg.attn_scale else cfg.head_dim ** -0.5


def _global_layer_flags(cfg: Qwen3Config):
    """[L] bool: which layers attend globally. All of them unless the
    arch interleaves sliding-window layers (gemma3: every Nth global)."""
    l = jnp.arange(cfg.n_layers)
    if not cfg.sliding_pattern:
        return jnp.ones((cfg.n_layers,), bool)
    return (l + 1) % cfg.sliding_pattern == 0


def _static_global_flags(cfg: Qwen3Config):
    """Python-bool mirror of :func:`_global_layer_flags` for the UNROLLED
    decode paths, where the layer index is static — lets each layer pick
    its global vs sliding bias/rope at trace time (phi3-mini slides on
    every layer; gpt-oss alternates)."""
    if not cfg.sliding_pattern:
        return [True] * cfg.n_layers
    return [(l + 1) % cfg.sliding_pattern == 0
            for l in range(cfg.n_layers)]


def _dual_rope(positions, cfg: Qwen3Config, dtype):
    """(cos_g, sin_g, cos_l, sin_l): global layers use rope_theta with
    linear position scaling; sliding layers use rope_local_theta.

    Longrope factors / attn-factor / partial rotary dims (phi3) apply to
    both branches — for phi3 every layer is "sliding" with
    rope_local_theta == rope_theta; gemma (the other sliding arch) never
    carries factors, so the shared application is a no-op there."""
    posf = positions.astype(jnp.float32)
    dim = cfg.rope_dim or cfg.head_dim
    fac = cfg.active_rope_factors or None
    af = cfg.rope_attn_factor
    cos_g, sin_g = rope_cos_sin(posf / cfg.rope_global_scale,
                                dim, cfg.rope_theta, dtype, fac, af)
    if not cfg.sliding_pattern:
        return cos_g, sin_g, cos_g, sin_g
    cos_l, sin_l = rope_cos_sin(posf, dim,
                                cfg.rope_local_theta, dtype, fac, af)
    return cos_g, sin_g, cos_l, sin_l


def _softcap_scores(scores, cfg: Qwen3Config):
    """gemma2 attention-logit softcapping: cap·tanh(s/cap) applied to
    the SCALED scores, before the mask/bias (HF Gemma2Attention). A
    no-op unless cfg.attn_softcap > 0."""
    if not cfg.attn_softcap:
        return scores
    cap = jnp.float32(cfg.attn_softcap)
    return jnp.tanh(scores / cap) * cap


def _gqa_scores(q, k, cfg: Qwen3Config):
    """q [B,T,qh,D], k [B,S,kh,D] → scores [B,qh,T,S] (f32, scaled)."""
    group = cfg.q_heads // cfg.kv_heads
    b, t = q.shape[0], q.shape[1]
    s = k.shape[1]
    qg = q.reshape(b, t, cfg.kv_heads, group, cfg.head_dim)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32)
    scores = scores * _attn_scale(cfg)
    return scores.reshape(b, cfg.q_heads, t, s)


def _gqa_mix(probs, v, cfg: Qwen3Config):
    """probs [B,qh,T,S] f32, v [B,S,kh,D] → [B,qh,T,D]."""
    group = cfg.q_heads // cfg.kv_heads
    b, _, t, s = probs.shape
    pg = probs.reshape(b, cfg.kv_heads, group, t, s).astype(v.dtype)
    out = jnp.einsum("bkgts,bskd->bkgtd", pg, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, cfg.q_heads, t, cfg.head_dim).astype(v.dtype)


NEG_INF = -1e30


def qwen3_prefill(params, embeds, attn_mask, cfg: Qwen3Config,
                  kv_max_len: Optional[int] = None,
                  kv_int8: bool = False
                  ) -> Tuple[jnp.ndarray, KVCache]:
    """Prefill from injected embeddings.

    embeds: [B, P, hidden] left-padded (valid tokens occupy the suffix).
    attn_mask: [B, P] 1.0 for valid. Returns (last-token logits [B, vocab]
    f32, KVCache with the prompt written at slots [0, P)); ``kv_int8``
    stores the cache as per-(slot,head) int8 (see :class:`QuantKV`).
    """
    b, p, _ = embeds.shape
    kv_max_len = kv_max_len or p
    fused = "q8_fused" in params
    if cfg.embed_scale != 1.0:
        embeds = embeds * jnp.asarray(cfg.embed_scale, embeds.dtype)
    x = block_permute(embeds) if fused else embeds
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)     # [B]
    shift = p - prompt_len                                        # [B]
    positions = (jnp.arange(p, dtype=jnp.int32)[None, :] - shift[:, None])
    positions = jnp.maximum(positions, 0)
    cos, sin, cos_l, sin_l = _dual_rope(positions, cfg, x.dtype)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    cos_l, sin_l = cos_l[:, :, None, :], sin_l[:, :, None, :]

    # causal + padding mask [B, 1, P, P]
    i = jnp.arange(p)[:, None]
    j = jnp.arange(p)[None, :]
    causal = (j <= i)[None, None, :, :]
    pad = attn_mask[:, None, None, :] > 0
    bias = jnp.where(causal & pad, 0.0, NEG_INF).astype(jnp.float32)
    if cfg.sliding_pattern:
        near = ((i - j) < cfg.sliding_window)[None, None, :, :]
        bias_l = jnp.where(causal & pad & near, 0.0,
                           NEG_INF).astype(jnp.float32)
    else:
        bias_l = bias

    dense, quant = _split_quant_layers(params["layers"])
    gflags = _global_layer_flags(cfg)

    def layer(x, xs, _quant=None):
        l, g, lp_dense = xs
        if cfg.sliding_pattern:    # static: qwen-family skips the selects
            lcos, lsin = jnp.where(g, cos, cos_l), jnp.where(g, sin, sin_l)
            lbias = jnp.where(g, bias, bias_l)
        else:
            lcos, lsin, lbias = cos, sin, bias
        lp = _layer_params(lp_dense, quant if _quant is None else _quant,
                           l)
        h = (rms_norm(x, lp["input_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        q, k, v = _qkv(h, lp, cfg, lcos, lsin, fused)
        scores = _softcap_scores(_gqa_scores(q, k, cfg), cfg) + lbias
        probs = _attn_probs(scores, lp.get("sinks"))
        attn = _attn_out(_gqa_mix(probs, v, cfg), lp, cfg, fused)
        if cfg.post_norms:
            attn = rms_norm(attn, lp["attn_post_ln"], cfg.rms_eps)
        x = x + (attn * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else attn)
        h = (rms_norm(x, lp["post_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        mlp = _mlp_block(h, lp, cfg, fused)
        if cfg.post_norms:
            mlp = rms_norm(mlp, lp["ffn_post_ln"], cfg.rms_eps)
        x = x + (mlp * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else mlp)
        return x, (k, v)

    k0 = _pre_layer_count(params)
    pre_kv = []
    if k0:      # heterogeneous prefix (deepseek first-k dense layers)
        dense_p, quant_p = _split_quant_layers(params["layers_pre"])
        for l in range(k0):
            x, kvl = layer(x, (l, gflags[l],
                               _dense_layer_slice(dense_p, l)),
                           _quant=quant_p)
            pre_kv.append(kvl)
    x, (ks, vs) = jax.lax.scan(
        layer, x, (jnp.arange(cfg.n_layers - k0, dtype=jnp.int32),
                   gflags[k0:], dense))
    if pre_kv:
        ks = jnp.concatenate(
            [jnp.stack([k for k, _ in pre_kv]), ks], axis=0)
        vs = jnp.concatenate(
            [jnp.stack([v for _, v in pre_kv]), vs], axis=0)

    kv_dtype = x.dtype
    pad_len = kv_max_len - p
    if pad_len > 0:
        zpad = jnp.zeros((cfg.n_layers, b, pad_len, cfg.kv_heads,
                          cfg.head_dim), kv_dtype)
        ks = jnp.concatenate([ks.astype(kv_dtype), zpad], axis=2)
        vs = jnp.concatenate([vs.astype(kv_dtype), zpad], axis=2)
    if kv_int8:
        kq, ksc = _kv_quantize(ks.astype(kv_dtype))
        vq, vsc = _kv_quantize(vs.astype(kv_dtype))
        kv = KVCache(k=QuantKV(q=kq, s=ksc), v=QuantKV(q=vq, s=vsc))
    else:
        kv = KVCache(k=ks.astype(kv_dtype), v=vs.astype(kv_dtype))

    x = rms_norm(x, params["final_ln"], cfg.rms_eps)
    logits = _logits(params, x[:, -1, :], cfg)                    # [B, vocab]
    return logits, kv


def qwen3_decode_step(params, kv: KVCache, token_embed, slot, position,
                      valid_from, cfg: Qwen3Config
                      ) -> Tuple[jnp.ndarray, KVCache]:
    """One generation step.

    token_embed: [B, hidden]; slot: [] int32 cache slot to write;
    position: [B] rope position; valid_from: [B] first valid cache slot
    (= P - prompt_len for left-padded prompts). Returns (logits [B, vocab]
    f32, updated cache).
    """
    b = token_embed.shape[0]
    fused = "q8_fused" in params
    if cfg.embed_scale != 1.0:
        token_embed = token_embed * jnp.asarray(cfg.embed_scale,
                                                token_embed.dtype)
    if fused:
        token_embed = block_permute(token_embed)
    x = token_embed[:, None, :]                                   # [B,1,H]
    cos, sin, cos_l, sin_l = _dual_rope(position[:, None], cfg, x.dtype)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    cos_l, sin_l = cos_l[:, :, None, :], sin_l[:, :, None, :]

    s = kv.max_len
    j = jnp.arange(s, dtype=jnp.int32)[None, :]
    visible = (j >= valid_from[:, None]) & (j <= slot)
    bias = jnp.where(visible, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    if cfg.sliding_pattern:
        near = j > (slot - cfg.sliding_window)
        bias_l = jnp.where(visible & near, 0.0, NEG_INF
                           ).astype(jnp.float32)[:, None, None, :]
    else:
        bias_l = bias

    dense, quant = _split_quant_layers(params["layers"])
    zero = jnp.asarray(0, jnp.int32)

    # The stacked KV rides the layer scan as CARRY, not xs→ys: the ys path
    # stacks a full copy of the cache every step (reads the old slice,
    # writes the whole [L,B,S,kh,D] array back), which at batch 8 costs
    # more HBM traffic than the weights themselves — measured 4.0 vs
    # 1.9 ms/step on v5e. As carry, each layer writes only its one new
    # [B,1,kh,D] entry in place and reads its slice for attention.
    def attn_core(q, k, v, K, V, l, lbias=None, sinks=None):
        def upd(big, new):
            return jax.lax.dynamic_update_slice(
                big, new[None].astype(big.dtype),
                (l, zero, slot, zero, zero))

        K = _kv_store(K, k, upd)
        V = _kv_store(V, v, upd)
        lbias = bias if lbias is None else lbias
        return _attend_cache(q, K, V, l, lbias, cfg, sinks), K, V

    def layer(carry, inputs, _quant=None):
        x, K, V = carry
        l, lq, g, lp_dense = inputs   # l: global cache idx; lq: in-stack
        if cfg.sliding_pattern:    # static: qwen-family skips the selects
            lcos, lsin = jnp.where(g, cos, cos_l), jnp.where(g, sin, sin_l)
            lbias = jnp.where(g, bias, bias_l)
        else:
            lcos, lsin, lbias = cos, sin, bias
        lp = _layer_params(lp_dense, quant if _quant is None else _quant,
                           lq)
        h = (rms_norm(x, lp["input_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        q, k, v = _qkv(h, lp, cfg, lcos, lsin, fused)
        heads, K, V = attn_core(q, k, v, K, V, l, lbias,
                                lp.get("sinks"))
        if fused:
            x = _fused_mlp_call(heads, x, lp, cfg, cfg.rms_eps)
        else:
            attn = _attn_out(heads, lp, cfg)
            if cfg.post_norms:
                attn = rms_norm(attn, lp["attn_post_ln"], cfg.rms_eps)
            x = x + (attn * cfg.residual_scale
                     if cfg.residual_scale != 1.0 else attn)
            h = (rms_norm(x, lp["post_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
            mlp = _mlp_block(h, lp, cfg)
            if cfg.post_norms:
                mlp = rms_norm(mlp, lp["ffn_post_ln"], cfg.rms_eps)
            x = x + (mlp * cfg.residual_scale
                     if cfg.residual_scale != 1.0 else mlp)
        return (x, K, V), jnp.int32(0)

    k0 = _pre_layer_count(params)

    def run_pre(carry, gflags):
        dense_p, quant_p = _split_quant_layers(params["layers_pre"])
        for l in range(k0):
            carry, _ = layer(
                carry, (l, l, gflags[l],
                        _dense_layer_slice(dense_p, l)),
                _quant=quant_p)
        return carry

    if ("q8_mega" in params and b == 1
            and not isinstance(kv.k, QuantKV) and kv.k.ndim == 4):
        # all-layers megakernel: 28 layers + attention + lm_head in ONE
        # pallas call over a head-major [L, kh, S, D] cache (see
        # ops.quant_matmul.q8_decode_all_fused). The cache is NOT yet
        # written for this token: the kernel attends the current k/v
        # in-register and returns the rows, scattered here at `slot`.
        from ..ops.quant_matmul import q8_decode_all_fused
        layers = params["layers"]
        x0 = token_embed.astype(jnp.float32)              # [1, H] perm
        nhb0 = rms_norm(x0, layers["input_ln"][0],
                        cfg.rms_eps).astype(jnp.bfloat16)
        mc, ms = rope_cos_sin(position, cfg.head_dim, cfg.rope_theta,
                              jnp.float32)                # [1, D]
        s_len = kv.k.shape[2]
        jj = jnp.arange(s_len)
        mbias = jnp.where((jj >= valid_from[0]) & (jj < slot), 0.0,
                          NEG_INF).astype(jnp.float32)[None]
        out = q8_decode_all_fused(
            x0, nhb0, layers["post_ln"], params["norms_next"],
            layers["q_norm"], layers["k_norm"], mc, ms, mbias,
            kv.k, kv.v, layers["qkv_w"], layers["o_w"],
            layers["gate_up_w"], layers["down_w"], params["lm_head_q"],
            cfg.rms_eps)
        if out is None:
            raise ValueError(
                "q8_mega params with a cache the megakernel cannot chunk "
                f"(S={s_len}); build the cache via prefill_init")
        mlogits, kn, vn = out
        ks = jax.lax.dynamic_update_slice(
            kv.k, kn[:, :, None, :].astype(kv.k.dtype),
            (zero, zero, slot, zero))
        vs = jax.lax.dynamic_update_slice(
            kv.v, vn[:, :, None, :].astype(kv.v.dtype),
            (zero, zero, slot, zero))
        return mlogits[:, :cfg.vocab_size], KVCache(k=ks, v=vs)

    fused_i = "q8i_fused" in params
    logits = None                    # set in-branch when the head fuses
    if quant and fused_i and _unroll_decode(default=True):
        # megacall v3: int8-dot layer chain, residual column-major
        lps = [_layer_params(_dense_layer_slice(dense, l),
                             quant, l) for l in range(cfg.n_layers)]
        h0 = rms_norm(x, lps[0]["input_ln"], cfg.rms_eps)
        qkv_raw = _proj(h0, lps[0]["qkv_w"])
        x_col = x.reshape(b, -1).T.astype(jnp.float32)
        K, V = kv.k, kv.v
        sflags = _static_global_flags(cfg)
        for l in range(cfg.n_layers):
            g = sflags[l]
            q, k, v = _qkv_post(qkv_raw.astype(x.dtype), lps[l], cfg,
                                cos if g else cos_l, sin if g else sin_l)
            heads, K, V = attn_core(q, k, v, K, V, l,
                                    bias if g else bias_l,
                                    sinks=lps[l].get("sinks"))
            wq = l + 1 < cfg.n_layers
            x_col, qkv_col = _q8i_layer_call(
                heads, x_col, lps[l], lps[l + 1] if wq else None, cfg,
                cfg.rms_eps, wq)
            if wq:
                qkv_raw = qkv_col.T.reshape(b, 1, -1)
        x = x_col.T.reshape(b, 1, -1).astype(x.dtype)
        ks, vs = K, V
    elif quant and fused and _unroll_decode(default=True):
        # megacall v2 pipeline: layer l's Pallas call also emits layer
        # l+1's qkv projection, so each layer costs ONE kernel launch;
        # the LAST layer's call also emits the lm_head logits when the
        # staged head path is available.
        lps = [_layer_params(_dense_layer_slice(dense, l),
                             quant, l) for l in range(cfg.n_layers)]
        h0 = rms_norm(x, lps[0]["input_ln"], cfg.rms_eps)
        qkv_raw = _proj(h0, lps[0]["qkv_w"], True)
        K, V = kv.k, kv.v
        sflags = _static_global_flags(cfg)
        for l in range(cfg.n_layers):
            g = sflags[l]
            q, k, v = _qkv_post(qkv_raw, lps[l], cfg,
                                cos if g else cos_l, sin if g else sin_l)
            heads, K, V = attn_core(q, k, v, K, V, l,
                                    bias if g else bias_l,
                                    sinks=lps[l].get("sinks"))
            if l + 1 < cfg.n_layers:
                x, qkv_raw = _fused_mlp_qkv_call(
                    heads, x, lps[l], lps[l + 1], cfg, cfg.rms_eps)
            else:
                lg = _fused_head_call(heads, x, lps[l], params, cfg,
                                      cfg.rms_eps)
                if lg is not None:
                    logits = lg[:, 0, :]
                else:
                    x = _fused_mlp_call(heads, x, lps[l], cfg, cfg.rms_eps)
        ks, vs = K, V
    elif quant and _unroll_decode():
        # static layer indices: each kernel's index_map bakes in its layer,
        # so weights stream copy-free with no scalar-prefetch plumbing.
        gflags = _global_layer_flags(cfg)
        carry = (x, kv.k, kv.v)
        if k0:
            carry = run_pre(carry, gflags)
        for l in range(k0, cfg.n_layers):
            dense_l = _dense_layer_slice(dense, l - k0)
            carry, _ = layer(carry, (l, l - k0, gflags[l], dense_l))
        x, ks, vs = carry
    else:
        gflags = _global_layer_flags(cfg)
        carry = (x, kv.k, kv.v)
        if k0:
            carry = run_pre(carry, gflags)
        nl = cfg.n_layers - k0
        (x, ks, vs), _ = jax.lax.scan(
            layer, carry,
            (k0 + jnp.arange(nl, dtype=jnp.int32),
             jnp.arange(nl, dtype=jnp.int32), gflags[k0:], dense))
    if logits is None:
        x = rms_norm(x, params["final_ln"], cfg.rms_eps)
        logits = _logits(params, x[:, 0, :], cfg)
    return logits, KVCache(k=ks, v=vs)


def qwen3_verify_step(params, kv: KVCache, token_embeds, slots, positions,
                      valid_from, cfg: Qwen3Config
                      ) -> Tuple[jnp.ndarray, KVCache]:
    """Multi-token decode step (the speculative-decoding "verify" pass).

    Processes T tokens at once against the KV cache — same weight traffic
    as one :func:`qwen3_decode_step` (decode is weight-bandwidth-bound),
    but T logits come back. Used to score a drafted continuation: position
    i's logits are the model's next-token distribution after consuming
    tokens 0..i.

    token_embeds: [B, T, hidden]; slots: [B] int32 — first cache slot to
    write (token i of row b lands at ``slots[b]+i``; per-row because rows
    of a batch accept different draft lengths); positions: [B, T] rope
    positions; valid_from: [B]. Returns (logits [B, T, vocab] f32, updated
    cache).

    Rewind safety: rejected drafts leave stale KV entries above the
    accepted point, but every mask here and in the single-token step only
    exposes slots ``<= slots[b]+i``, so stale entries are invisible until
    overwritten by the next write at the same slot.
    """
    b, t, _ = token_embeds.shape
    fused = "q8_fused" in params
    if cfg.embed_scale != 1.0:
        token_embeds = token_embeds * jnp.asarray(cfg.embed_scale,
                                                  token_embeds.dtype)
    x = block_permute(token_embeds) if fused else token_embeds
    cos, sin, cos_l, sin_l = _dual_rope(positions, cfg, x.dtype)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    cos_l, sin_l = cos_l[:, :, None, :], sin_l[:, :, None, :]

    s = kv.max_len
    j = jnp.arange(s, dtype=jnp.int32)[None, None, :]             # [1,1,S]
    i = jnp.arange(t, dtype=jnp.int32)[None, :, None]             # [1,T,1]
    visible = ((j >= valid_from[:, None, None])
               & (j <= slots[:, None, None] + i))                 # [B,T,S]
    bias = jnp.where(visible, 0.0, NEG_INF).astype(
        jnp.float32)[:, None, :, :]                               # [B,1,T,S]
    if cfg.sliding_pattern:
        near = j > (slots[:, None, None] + i - cfg.sliding_window)
        bias_l = jnp.where(visible & near, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :, :]
    else:
        bias_l = bias

    rows = jnp.arange(b)[:, None]                                 # [B,1]
    cols = slots[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # [B,T]
    zero = jnp.asarray(0, jnp.int32)

    def write_kv(big, new, l):
        """Write layer ``l``'s T new entries into the stacked cache."""
        if b == 1:
            # single-stream hot path: a contiguous dynamic_update_slice is
            # far cheaper on TPU than a general scatter
            return jax.lax.dynamic_update_slice(
                big, new[None].astype(big.dtype),
                (l, zero, slots[0], zero, zero))
        return big.at[l, rows, cols].set(new.astype(big.dtype))

    dense, quant = _split_quant_layers(params["layers"])

    # stacked KV as scan CARRY (see qwen3_decode_step: the ys path
    # re-writes the whole cache every pass)
    def attn_core(q, k, v, K, V, l, lbias=None, sinks=None):
        K = _kv_store(K, k, lambda big, new: write_kv(big, new, l))
        V = _kv_store(V, v, lambda big, new: write_kv(big, new, l))
        lbias = bias if lbias is None else lbias
        return _attend_cache(q, K, V, l, lbias, cfg, sinks), K, V

    def layer(carry, inputs, _quant=None):
        x, K, V = carry
        l, lq, g, lp_dense = inputs   # l: global cache idx; lq: in-stack
        if cfg.sliding_pattern:    # static: qwen-family skips the selects
            lcos, lsin = jnp.where(g, cos, cos_l), jnp.where(g, sin, sin_l)
            lbias = jnp.where(g, bias, bias_l)
        else:
            lcos, lsin, lbias = cos, sin, bias
        lp = _layer_params(lp_dense, quant if _quant is None else _quant,
                           lq)
        h = (rms_norm(x, lp["input_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        q, k, v = _qkv(h, lp, cfg, lcos, lsin, fused)
        heads, K, V = attn_core(q, k, v, K, V, l, lbias,
                                lp.get("sinks"))
        if fused:
            x = _fused_mlp_call(heads, x, lp, cfg, cfg.rms_eps)
        else:
            attn = _attn_out(heads, lp, cfg)
            if cfg.post_norms:
                attn = rms_norm(attn, lp["attn_post_ln"], cfg.rms_eps)
            x = x + (attn * cfg.residual_scale
                     if cfg.residual_scale != 1.0 else attn)
            h = (rms_norm(x, lp["post_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
            mlp = _mlp_block(h, lp, cfg)
            if cfg.post_norms:
                mlp = rms_norm(mlp, lp["ffn_post_ln"], cfg.rms_eps)
            x = x + (mlp * cfg.residual_scale
                     if cfg.residual_scale != 1.0 else mlp)
        return (x, K, V), jnp.int32(0)

    k0 = _pre_layer_count(params)

    def run_pre(carry, gflags):
        dense_p, quant_p = _split_quant_layers(params["layers_pre"])
        for l in range(k0):
            carry, _ = layer(
                carry, (l, l, gflags[l],
                        _dense_layer_slice(dense_p, l)),
                _quant=quant_p)
        return carry

    fused_i = "q8i_fused" in params
    logits = None                    # set in-branch when the head fuses
    if quant and fused_i and _unroll_decode(default=True):
        # megacall v3 (see qwen3_decode_step): int8-dot chain, m = B*T
        lps = [_layer_params(_dense_layer_slice(dense, l),
                             quant, l) for l in range(cfg.n_layers)]
        h0 = rms_norm(x, lps[0]["input_ln"], cfg.rms_eps)
        qkv_raw = _proj(h0, lps[0]["qkv_w"])
        x_col = x.reshape(b * t, -1).T.astype(jnp.float32)
        K, V = kv.k, kv.v
        sflags = _static_global_flags(cfg)
        for l in range(cfg.n_layers):
            g = sflags[l]
            q, k, v = _qkv_post(qkv_raw.astype(x.dtype), lps[l], cfg,
                                cos if g else cos_l, sin if g else sin_l)
            heads, K, V = attn_core(q, k, v, K, V, l,
                                    bias if g else bias_l,
                                    sinks=lps[l].get("sinks"))
            wq = l + 1 < cfg.n_layers
            x_col, qkv_col = _q8i_layer_call(
                heads, x_col, lps[l], lps[l + 1] if wq else None, cfg,
                cfg.rms_eps, wq)
            if wq:
                qkv_raw = qkv_col.T.reshape(b, t, -1)
        x = x_col.T.reshape(b, t, -1).astype(x.dtype)
        ks, vs = K, V
    elif quant and fused and _unroll_decode(default=True):
        # megacall v2 (see qwen3_decode_step): one Pallas call per layer,
        # lm_head fused into the last layer's call when available
        lps = [_layer_params(_dense_layer_slice(dense, l),
                             quant, l) for l in range(cfg.n_layers)]
        h0 = rms_norm(x, lps[0]["input_ln"], cfg.rms_eps)
        qkv_raw = _proj(h0, lps[0]["qkv_w"], True)
        K, V = kv.k, kv.v
        sflags = _static_global_flags(cfg)
        for l in range(cfg.n_layers):
            g = sflags[l]
            q, k, v = _qkv_post(qkv_raw, lps[l], cfg,
                                cos if g else cos_l, sin if g else sin_l)
            heads, K, V = attn_core(q, k, v, K, V, l,
                                    bias if g else bias_l,
                                    sinks=lps[l].get("sinks"))
            if l + 1 < cfg.n_layers:
                x, qkv_raw = _fused_mlp_qkv_call(
                    heads, x, lps[l], lps[l + 1], cfg, cfg.rms_eps)
            else:
                lg = _fused_head_call(heads, x, lps[l], params, cfg,
                                      cfg.rms_eps)
                if lg is not None:
                    logits = lg
                else:
                    x = _fused_mlp_call(heads, x, lps[l], cfg, cfg.rms_eps)
        ks, vs = K, V
    elif quant and _unroll_decode():
        gflags = _global_layer_flags(cfg)
        carry = (x, kv.k, kv.v)
        if k0:
            carry = run_pre(carry, gflags)
        for l in range(k0, cfg.n_layers):
            dense_l = _dense_layer_slice(dense, l - k0)
            carry, _ = layer(carry, (l, l - k0, gflags[l], dense_l))
        x, ks, vs = carry
    else:
        gflags = _global_layer_flags(cfg)
        carry = (x, kv.k, kv.v)
        if k0:
            carry = run_pre(carry, gflags)
        nl = cfg.n_layers - k0
        (x, ks, vs), _ = jax.lax.scan(
            layer, carry,
            (k0 + jnp.arange(nl, dtype=jnp.int32),
             jnp.arange(nl, dtype=jnp.int32), gflags[k0:], dense))
    if logits is None:
        x = rms_norm(x, params["final_ln"], cfg.rms_eps)
        logits = _logits(params, x, cfg)                          # [B,T,V]
    return logits, KVCache(k=ks, v=vs)


def qwen3_forward_logits(params, embeds, attn_mask, cfg: Qwen3Config):
    """All-position logits (training / parity tests). embeds [B,T,H] →
    logits [B,T,vocab] f32 with causal+padding masking."""
    b, p, _ = embeds.shape
    fused = "q8_fused" in params
    if cfg.embed_scale != 1.0:
        embeds = embeds * jnp.asarray(cfg.embed_scale, embeds.dtype)
    x = block_permute(embeds) if fused else embeds
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    shift = p - prompt_len
    positions = jnp.maximum(
        jnp.arange(p, dtype=jnp.int32)[None, :] - shift[:, None], 0)
    cos, sin, cos_l, sin_l = _dual_rope(positions, cfg, x.dtype)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    cos_l, sin_l = cos_l[:, :, None, :], sin_l[:, :, None, :]
    i = jnp.arange(p)[:, None]
    j = jnp.arange(p)[None, :]
    causal_pad = (j <= i)[None, None] & (attn_mask[:, None, None, :] > 0)
    bias = jnp.where(causal_pad, 0.0, NEG_INF).astype(jnp.float32)
    if cfg.sliding_pattern:
        near = ((i - j) < cfg.sliding_window)[None, None]
        bias_l = jnp.where(causal_pad & near, 0.0,
                           NEG_INF).astype(jnp.float32)
    else:
        bias_l = bias

    dense, quant = _split_quant_layers(params["layers"])

    def layer(x, xs, _quant=None):
        l, g, lp_dense = xs
        if cfg.sliding_pattern:    # static: qwen-family skips the selects
            lcos, lsin = jnp.where(g, cos, cos_l), jnp.where(g, sin, sin_l)
            lbias = jnp.where(g, bias, bias_l)
        else:
            lcos, lsin, lbias = cos, sin, bias
        lp = _layer_params(lp_dense, quant if _quant is None else _quant,
                           l)
        h = (rms_norm(x, lp["input_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        q, k, v = _qkv(h, lp, cfg, lcos, lsin, fused)
        scores = _softcap_scores(_gqa_scores(q, k, cfg), cfg) + lbias
        probs = _attn_probs(scores, lp.get("sinks"))
        attn = _attn_out(_gqa_mix(probs, v, cfg), lp, cfg, fused)
        if cfg.post_norms:
            attn = rms_norm(attn, lp["attn_post_ln"], cfg.rms_eps)
        x = x + (attn * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else attn)
        h = (rms_norm(x, lp["post_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        mlp = _mlp_block(h, lp, cfg, fused)
        if cfg.post_norms:
            mlp = rms_norm(mlp, lp["ffn_post_ln"], cfg.rms_eps)
        x = x + (mlp * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else mlp)
        return x, None

    gflags = _global_layer_flags(cfg)
    k0 = _pre_layer_count(params)
    if k0:      # heterogeneous prefix (deepseek first-k dense layers)
        dense_p, quant_p = _split_quant_layers(params["layers_pre"])
        for l in range(k0):
            x, _ = layer(x, (l, gflags[l],
                             _dense_layer_slice(dense_p, l)),
                         _quant=quant_p)
    x, _ = jax.lax.scan(
        layer, x, (jnp.arange(cfg.n_layers - k0, dtype=jnp.int32),
                   gflags[k0:], dense))
    x = rms_norm(x, params["final_ln"], cfg.rms_eps)
    return _logits(params, x, cfg)


def _lm_head(params, cfg: Qwen3Config):
    if cfg.tie_embeddings:
        return params["embed"].T
    return params["lm_head"]


def quantize_lm_head_per_channel(params, cfg: Qwen3Config):
    """Per-channel int8 output projection (``lm_head_i8``).

    XLA fuses the int8→bf16 convert into the logits dot, halving the
    tied-embedding read (311 → 155 MB/token) with no Pallas involvement —
    measured +6% decode throughput in bf16 mode on v5e. Coarser scales
    than q8_0 (one per vocab column instead of per 32 weights), same
    approach as the reference's own per-channel INT8 ONNX quantization
    (``02-Quantize-ONNX.py:38-45``).
    """
    if "lm_head_i8" in params or "lm_head_q" in params:
        return params
    head = _lm_head(params, cfg).astype(jnp.float32)     # [hidden, vocab]
    scale = jnp.max(jnp.abs(head), axis=0) / 127.0       # [vocab]
    w_i8 = jnp.round(head / jnp.where(scale == 0, 1.0, scale)
                     ).astype(jnp.int8)
    out = dict(params)
    out["lm_head_i8"] = (w_i8, scale.astype(jnp.float32))
    out.pop("lm_head", None)     # untied dense head is dead weight now
    return out


def lm_head_q8dot(params):
    """Convert a q8_0 head (``lm_head_q``) to the int8-dot layout
    (``lm_head_qn``, natural-k QuantTensorN): the logits matmul then runs
    s8×s8 MXU dots with scales applied to per-block partial sums —
    llama.cpp's own q8_0 GEMM contract — instead of per-element VPU
    dequantization (the single most expensive op of the fused decode
    step: 315 µs/token measured by ablation on v5e). Same stored q8_0
    bytes, relabeled only."""
    if "lm_head_qn" in params or "lm_head_q" not in params:
        return params
    out = dict(params)
    out["lm_head_qn"] = to_natural(out.pop("lm_head_q"))
    return out


def _logits(params, x, cfg: Qwen3Config):
    """x [..., hidden] → logits [..., vocab] f32, with the arch's final
    softcap (gemma) applied when configured."""
    out = _logits_raw(params, x, cfg)
    if cfg.final_softcap:
        cap = jnp.float32(cfg.final_softcap)
        out = cap * jnp.tanh(out / cap)
    return out


def _logits_raw(params, x, cfg: Qwen3Config):
    """x [..., hidden] → logits [..., vocab] f32 (quantized head if built).
    In fused-q8 mode x arrives in perm space; the q8 head contracts it
    directly, other heads get it unpermuted first."""
    fused = "q8_fused" in params
    if "lm_head_qn" in params:
        if fused:
            x = block_unpermute(x)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if x2.shape[0] <= 16:
            out = q8dot_matmul(x2, params["lm_head_qn"])
        else:
            # prefill/training-sized m: per-element dequant amortizes
            out = jnp.dot(x2.astype(jnp.bfloat16),
                          dequantize_weight_n(params["lm_head_qn"]
                                              ).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return out.reshape(*lead, -1)[..., :cfg.vocab_size]
    if "lm_head_i8" in params:
        if fused:
            x = block_unpermute(x)
        w, s = params["lm_head_i8"]
        out = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return out * s
    if "lm_head_q" in params:
        return matmul_any(x, params["lm_head_q"],
                          x_preblocked=fused)[..., :cfg.vocab_size]
    if fused:
        x = block_unpermute(x)
    return jnp.dot(x, _lm_head(params, cfg),
                   preferred_element_type=jnp.float32)


def embed_tokens(params, token_ids):
    """Token ids → embeddings (the device-side embedding table)."""
    return params["embed"][token_ids]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_qwen3_params(rng, cfg: Qwen3Config, dtype=jnp.float32):
    def norm(key, shape, scale):
        return jax.random.normal(key, shape, dtype) * scale

    n = cfg.n_layers
    keys = jax.random.split(rng, 8)
    h, qd, kd = cfg.hidden, cfg.q_heads * cfg.head_dim, cfg.kv_heads * cfg.head_dim
    s_h, s_q, s_f = h ** -0.5, qd ** -0.5, cfg.ffn_dim ** -0.5
    layers = {}
    if cfg.pre_norms:
        layers["input_ln"] = jnp.ones((n, h), dtype)
        layers["post_ln"] = jnp.ones((n, h), dtype)
    if cfg.kv_lora_rank:
        # MLA (deepseek): low-rank kv (+ optionally q); o contracts
        # q_heads·v_head_dim rows
        lora, rp = cfg.kv_lora_rank, cfg.qk_rope_dim
        vd = cfg.v_head_dim or cfg.head_dim
        akeys = jax.random.split(keys[0], 6)
        if cfg.q_lora_rank:
            layers["q_a_w"] = norm(akeys[0], (n, h, cfg.q_lora_rank), s_h)
            layers["q_a_norm"] = jnp.ones((n, cfg.q_lora_rank), dtype)
            layers["q_b_w"] = norm(akeys[1], (n, cfg.q_lora_rank, qd),
                                   cfg.q_lora_rank ** -0.5)
        else:
            layers["q_w"] = norm(akeys[0], (n, h, qd), s_h)
        layers["kv_a_w"] = norm(akeys[2], (n, h, lora + rp), s_h)
        layers["kv_a_norm"] = jnp.ones((n, lora), dtype)
        layers["kv_b_w"] = norm(
            akeys[3], (n, lora, cfg.q_heads * (cfg.qk_nope_dim + vd)),
            lora ** -0.5)
        layers["o_w"] = norm(keys[3], (n, cfg.q_heads * vd, h),
                             (cfg.q_heads * vd) ** -0.5)
    else:
        layers.update({
            "q_w": norm(keys[0], (n, h, qd), s_h),
            "k_w": norm(keys[1], (n, h, kd), s_h),
            "v_w": norm(keys[2], (n, h, kd), s_h),
            "o_w": norm(keys[3], (n, qd, h), s_q),
        })
    k0 = cfg.moe_first_dense if cfg.is_moe else 0

    def moe_keys(nl, base):
        # key derivations are frozen (split(base, 8) + fold_in for the
        # shared experts): tests pin behaviors of specific seeds
        e, f = cfg.n_experts, cfg.moe_ffn_dim
        mkeys = jax.random.split(base, 8)
        d = {
            "router_w": norm(mkeys[0], (nl, h, e), s_h),
            "moe_gate_w": norm(mkeys[1], (nl, e, h, f), s_h),
            "moe_up_w": norm(mkeys[2], (nl, e, h, f), s_h),
            "moe_down_w": norm(mkeys[3], (nl, e, f, h), f ** -0.5),
        }
        if cfg.router_bias:
            d["router_b"] = norm(mkeys[4], (nl, e), 0.02)
        if cfg.moe_bias:
            d["moe_gate_b"] = norm(mkeys[5], (nl, e, f), 0.02)
            d["moe_up_b"] = norm(mkeys[6], (nl, e, f), 0.02)
            d["moe_down_b"] = norm(mkeys[7], (nl, e, h), 0.02)
        if cfg.n_shared_experts:
            sf = cfg.shared_ffn_dim or cfg.n_shared_experts * f
            skeys = jax.random.split(jax.random.fold_in(base, 1), 3)
            d["shared_gate_w"] = norm(skeys[0], (nl, h, sf), s_h)
            d["shared_up_w"] = norm(skeys[1], (nl, h, sf), s_h)
            d["shared_down_w"] = norm(skeys[2], (nl, sf, h), sf ** -0.5)
            if cfg.shared_expert_gate:
                # qwen2moe: Linear(h -> 1, no bias) stored as a vector
                d["shexp_gate_w"] = norm(
                    jax.random.fold_in(base, 2), (nl, h), s_h)
        return d

    def dense_keys(nl, base3):
        kg, ku, kd2 = base3
        return {
            "gate_w": norm(kg, (nl, h, cfg.ffn_dim), s_h),
            "up_w": norm(ku, (nl, h, cfg.ffn_dim), s_h),
            "down_w": norm(kd2, (nl, cfg.ffn_dim, h), s_f),
        }

    if cfg.is_moe:
        layers.update(moe_keys(n - k0, keys[4]))
    else:
        layers.update(dense_keys(n, (keys[4], keys[5], keys[6])))
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones(
            (n, qd if cfg.qk_norm_full else cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones(
            (n, kd if cfg.qk_norm_full else cfg.head_dim), dtype)
    if cfg.attn_bias:
        bkeys = jax.random.split(keys[7], 4)
        layers["q_b"] = norm(bkeys[0], (n, qd), 0.02)
        layers["k_b"] = norm(bkeys[1], (n, kd), 0.02)
        layers["v_b"] = norm(bkeys[2], (n, kd), 0.02)
        if cfg.attn_out_bias:
            layers["o_b"] = norm(bkeys[3], (n, h), 0.02)
    if cfg.attn_sinks:
        layers["sinks"] = norm(jax.random.split(keys[6], 1)[0],
                               (n, cfg.q_heads), 1.0)
    if cfg.post_norms:
        layers["attn_post_ln"] = jnp.ones((n, h), dtype)
        layers["ffn_post_ln"] = jnp.ones((n, h), dtype)
    params = {
        "layers": layers,
        "final_ln": jnp.ones((h,), dtype),
        "embed": norm(keys[7], (cfg.vocab_size, h), 0.02),
    }
    if k0:
        # heterogeneous stacks (deepseek first_k_dense_replace): the
        # first k layers carry a dense MLP; attention/norm keys split
        # off the full-depth stacks built above
        pre3 = jax.random.split(jax.random.fold_in(keys[5], 7), 3)
        mlp_keys = {"router_w", "router_b", "moe_gate_w", "moe_up_w",
                    "moe_down_w", "moe_gate_b", "moe_up_b", "moe_down_b",
                    "shared_gate_w", "shared_up_w", "shared_down_w",
                    "shexp_gate_w", "gate_w", "up_w", "down_w"}
        pre = {key: w[:k0] for key, w in layers.items()
               if key not in mlp_keys}
        pre.update(dense_keys(k0, pre3))
        main = {key: (w if key in mlp_keys else w[k0:])
                for key, w in layers.items()}
        params["layers"] = main
        params["layers_pre"] = pre
    if not cfg.tie_embeddings:
        params["lm_head"] = norm(keys[7], (h, cfg.vocab_size), s_h)
    return params

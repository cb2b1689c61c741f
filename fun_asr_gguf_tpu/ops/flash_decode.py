"""Pallas flash-decode attention over the stacked KV cache.

Decode-time attention reads the WHOLE cache every step; past batch ~16
those reads outweigh the weight stream (docs/PERFORMANCE.md KV table),
so the batched serving ceiling is set by how efficiently the cache
bytes move. The XLA path (`models/qwen3.py:_attend_cache`) materializes
[B, qh, T, S] scores in HBM between two einsums and, for the int8
cache, routes the scale-commuted multiplies through separate fused
producers; this kernel fuses score → softmax → scale → mix into one
VMEM-resident pass per batch row so the cache is read once at
streaming rate and nothing else touches HBM.

Design notes (TPU):
- One grid cell per batch row: the [S, kh·hd] K and V slabs for that
  row land in VMEM as single contiguous blocks (the cache layout
  [B, S, kh, hd] flattens to [B, S, kh·hd] for free), and Pallas
  double-buffers the next row's DMA behind the current row's compute.
- GQA without small dots: a first cut looped kv-heads and issued
  [group, S] dots per head — 16 dependent MXU passes + 16 unaligned
  sub-tile stores per cell, measured 28-35% SLOWER than XLA at b=16.
  Instead the queries are expanded BLOCK-DIAGONALLY over the head axis
  outside the kernel (row t·qh+h·group+g carries its hd values in
  columns h·hd:(h+1)·hd, zeros elsewhere — a tiny [B, T·qh, kh·hd]
  bf16 tensor), so ALL heads' scores are ONE [R, kh·hd]×[S, kh·hd]
  MXU dot against the raw K slab, and the probability mix is ONE
  [R, S]×[S, kh·hd] dot; the per-head [R, hd] result is folded out of
  the [R, kh·hd] mix with 8 masked adds. Per-head score/bias/scale
  rows are expanded in-kernel by tiny constant selection dots
  (E [R, kh] built from iota — the same E-matrix trick as the q8
  megakernel's o-stage).
- int8 cache (:class:`~..models.qwen3.QuantKV`): the per-(slot, head)
  scales commute out of the hd contraction (same identity the XLA path
  uses) — scores are computed on raw int8→bf16 keys and multiplied by
  the f32 K-scale row; the V-scale row folds into the probabilities
  before the bf16 mix dot. One exact softmax per row (whole S is in
  VMEM, so no online rescaling is needed — exact row max up front,
  same trick as ops/flash_attention.py's single-pass branch).
- Numerics class matches `_attend_cache` exactly: f32 scores and
  statistics, probabilities cast to bf16 for the mix dot
  (`_gqa_mix` does the same cast), f32 accumulation.

Replaces the decode-attention use of the reference's llama.cpp
GGML_OP_FLASH_ATTN_EXT path (reference `bin/ggml-*.dll`); the encoder's
prefill-time flash attention lives in ops/flash_attention.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_head(r_rows: int, qh: int, group: int):
    """[R, 1] int32: kv-head index of each expanded-q row."""
    r = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0)
    return (r % qh) // group


def _sel_matrix(r_rows: int, cols: int, idx_of_row):
    """[R, cols] f32 with 1.0 at (r, idx_of_row[r]) — a selection
    matrix for expanding per-head/per-t rows by one small MXU dot."""
    c = jax.lax.broadcasted_iota(jnp.int32, (r_rows, cols), 1)
    return (idx_of_row == c).astype(jnp.float32)


def _flash_decode_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
                         o_ref, *, t: int, kv_heads: int, group: int,
                         head_dim: int):
    """One batch row. q_ref [1, R, kh·hd] block-diagonal expanded
    queries (R = t·qh), K/V [1, S, kh·hd], scales [1, kh, S],
    bias [1, t, S]. Quantized mode when ks_ref/vs_ref are given
    (K/V refs hold int8)."""
    quant = ks_ref is not None
    qh = kv_heads * group
    r_rows = t * qh
    kslab = k_ref[0]
    vslab = v_ref[0]
    if quant:
        kslab = kslab.astype(jnp.bfloat16)
        vslab = vslab.astype(jnp.bfloat16)

    head_of_row = _row_head(r_rows, qh, group)               # [R, 1]
    e_head = _sel_matrix(r_rows, kv_heads, head_of_row)      # [R, kh]

    # ---- scores: ONE dot; zeros in q's off-head columns kill the
    # cross-head terms exactly ----
    sc = jax.lax.dot_general(
        q_ref[0], kslab, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [R, S]
    if quant:
        ksc = ks_ref[0].astype(jnp.float32)                  # [kh, S]
        sc = sc * jax.lax.dot_general(
            e_head, ksc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if t == 1:
        bias = bias_ref[0]                                   # [1, S]
        sc = sc + jnp.broadcast_to(bias, sc.shape)
    else:
        t_of_row = (jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0)
                    // qh)
        e_t = _sel_matrix(r_rows, t, t_of_row)               # [R, t]
        sc = sc + jax.lax.dot_general(
            e_t, bias_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- exact softmax (whole S resident) ----
    m = jnp.max(sc, axis=1, keepdims=True)
    p = jnp.exp(sc - m)
    l = jnp.sum(p, axis=1, keepdims=True)                    # [R, 1]
    if quant:
        vsc = vs_ref[0].astype(jnp.float32)
        p = p * jax.lax.dot_general(
            e_head, vsc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- mix: ONE dot, then fold the [R, kh·hd] back to [R, hd] by
    # selecting each row's own head block ----
    mix = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vslab, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [R, kh·hd]
    acc = jnp.zeros((r_rows, head_dim), jnp.float32)
    for h in range(kv_heads):
        blk = mix[:, h * head_dim:(h + 1) * head_dim]
        acc = acc + jnp.where(head_of_row == h, blk, 0.0)
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(q, k, v, bias, k_scale=None, v_scale=None,
                           interpret: bool = False):
    """Fused decode attention over one cache layer.

    q:    [B, T, qh, hd]  query heads, ALREADY scaled by hd**-0.5
    k, v: [B, S, kh, hd]  cache layer — bf16, or int8 with
                          k_scale/v_scale [B, S, kh, 1]
    bias: [B, T, S] f32 additive (0 visible / -1e30 masked)

    Returns [B, qh, T, hd] in the activation dtype (v dtype, or the
    scale dtype for the int8 cache) — the `_gqa_mix` output contract.
    """
    b, t, qh, hd = q.shape
    s, kh = k.shape[1], k.shape[2]
    group = qh // kh
    r_rows = t * qh
    act_dtype = v_scale.dtype if v_scale is not None else v.dtype

    quant = k_scale is not None
    k2 = k.reshape(b, s, kh * hd)
    v2 = v.reshape(b, s, kh * hd)
    # block-diagonal q expansion: row t·qh + h·group + g carries its
    # values in columns h·hd:(h+1)·hd (tiny: B·R·kh·hd bf16)
    q4 = q.astype(jnp.bfloat16).reshape(b, t, kh, group, hd)
    eye = jnp.eye(kh, dtype=jnp.bfloat16)                    # [kh, kh']
    q_exp = jnp.einsum("btkgd,ke->btkged", q4, eye
                       ).reshape(b, r_rows, kh * hd)
    # [B, S, kh, 1] → [B, kh, S]: a tiny transpose that buys contiguous
    # [kh, S] scale rows in VMEM
    ks2 = (jnp.transpose(k_scale[..., 0], (0, 2, 1)).astype(jnp.float32)
           if quant else None)
    vs2 = (jnp.transpose(v_scale[..., 0], (0, 2, 1)).astype(jnp.float32)
           if quant else None)

    specs = [
        pl.BlockSpec((1, r_rows, kh * hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, kh * hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, kh * hd), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q_exp, k2, v2]
    if quant:
        specs += [pl.BlockSpec((1, kh, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2
        args += [ks2, vs2]
    specs.append(pl.BlockSpec((1, t, s), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM))
    args.append(bias.astype(jnp.float32))

    def body(*refs):
        if quant:
            q_r, k_r, v_r, ks_r, vs_r, b_r, o_r = refs
        else:
            q_r, k_r, v_r, b_r, o_r = refs
            ks_r = vs_r = None
        _flash_decode_kernel(q_r, k_r, v_r, ks_r, vs_r, b_r, o_r,
                             t=t, kv_heads=kh, group=group, head_dim=hd)

    out = pl.pallas_call(
        body,
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, r_rows, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_rows, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * r_rows * s * kh * hd,
            bytes_accessed=2 * b * s * kh * hd * (1 if quant else 2),
            transcendentals=b * r_rows * s),
        interpret=interpret,
    )(*args)
    return (out.reshape(b, t, qh, hd).transpose(0, 2, 1, 3)
            .astype(act_dtype))


def flash_decode_supported(b: int, t: int, s: int, kh: int, hd: int,
                           quant: bool) -> bool:
    """Shape gate: contiguous full-row blocks must satisfy Mosaic's
    tiling (S multiple of the sublane tile; lane dim multiple of 128)
    and fit two double-buffered [S, kh·hd] slabs in VMEM."""
    if hd % 128 != 0:
        return False
    if s % (32 if quant else 16) != 0:
        return False
    slab = s * kh * hd * (1 if quant else 2)
    return 2 * 2 * slab <= 48 * 1024 * 1024

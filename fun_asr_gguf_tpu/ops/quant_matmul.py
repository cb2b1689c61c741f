"""Pallas q8_0 dequant-matmul kernel + quantized-weight representation.

The TPU replacement for llama.cpp's fused q8_0 kernels (the entire decode
path of the reference runs through them, ``bin/ggml-*.dll``): weights live
in HBM as int8 + per-32-block fp16 scales (1.06 B/param instead of 2 for
bf16), are DMA'd to VMEM as int8, and dequantized in-register right before
the MXU multiply. For the bandwidth-bound single-token decode this halves
the bytes moved per step, which is the whole game (SURVEY.md §7 risks).

Weight layout: ``QuantTensor(q=[..., n_out, k] int8, d=[..., n_out, k/32]
f32)`` with the contraction dim stored **block-transposed**: natural index
``j = b*32 + t`` (block b, offset t) lives at lane ``j' = t*(k/32) + b``.
Under that permutation the per-lane scale vector is exactly ``d`` tiled
32× along lanes — a Mosaic-supported concat — instead of an interleaving
``[n, k] -> [n, k/32, 32]`` reshape, which Mosaic's vector layout
inference rejects ("unsupported shape cast"). The activation is permuted
the same way outside the kernel (cheap: x is a handful of rows).

``quant_matmul(x, qt)`` computes ``x @ dequant(qt).T``; a jnp reference
path (`use_pallas=False`) backs tests and non-TPU platforms.
"""

import functools
from typing import NamedTuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 32


class QuantTensor(NamedTuple):
    q: jnp.ndarray   # int8  [..., n, k]  (k block-transposed, see module doc)
    d: jnp.ndarray   # f32   [..., n, k // 32]

    @property
    def shape(self):
        return self.q.shape


def block_permute(a: jnp.ndarray) -> jnp.ndarray:
    """[..., k] natural order → block-transposed: (b*32+t) ↦ (t*(k/32)+b)."""
    k = a.shape[-1]
    return (a.reshape(*a.shape[:-1], k // BLOCK, BLOCK)
            .swapaxes(-1, -2).reshape(*a.shape))


def block_unpermute(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`block_permute`."""
    k = a.shape[-1]
    return (a.reshape(*a.shape[:-1], BLOCK, k // BLOCK)
            .swapaxes(-1, -2).reshape(*a.shape))


def quantize_weight(w: jnp.ndarray) -> QuantTensor:
    """w [k_in, n_out] (x @ w convention) → QuantTensor([n, k]).

    Bit-exact with ggml's quantize_row_q8_0_ref (and our numpy
    ``q8_0_quantize``): quantize against the UNROUNDED f32 scale with
    ties-away-from-zero rounding, then store the f16-rounded scale.
    """
    wt = jnp.swapaxes(w, -1, -2).astype(jnp.float32)      # [n, k]
    k = wt.shape[-1]
    if k % BLOCK != 0:
        raise ValueError(f"contraction dim {k} not divisible by {BLOCK}")
    blocks = wt.reshape(*wt.shape[:-1], k // BLOCK, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    d = absmax / 127.0
    inv = jnp.where(d == 0, 0.0, 1.0 / d)
    scaled = blocks * inv[..., None]
    q = (jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
         ).astype(jnp.int8)
    d16 = d.astype(jnp.float16).astype(jnp.float32)
    return QuantTensor(q=block_permute(q.reshape(wt.shape)), d=d16)


def dequantize_weight(qt: QuantTensor) -> jnp.ndarray:
    """QuantTensor → dense [k_in, n_out] f32."""
    n, k = qt.q.shape[-2], qt.q.shape[-1]
    qn = block_unpermute(qt.q)
    deq = (qn.astype(jnp.float32)
           .reshape(*qn.shape[:-1], k // BLOCK, BLOCK)
           * qt.d[..., None]).reshape(*qn.shape[:-2], n, k)
    return jnp.swapaxes(deq, -1, -2)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _dequant_dot(x, q, d, o_ref):
    """Shared kernel body: dequantize one (TN, K) int8 tile, matmul into o.

    Inputs are block-transposed along k, so the lane-j scale is
    ``d[:, j % (k/32)]`` — i.e. ``d`` tiled 32× along lanes. Lane concat is
    a supported Mosaic op; the interleaving reshape is not.
    """
    dexp = jnp.concatenate([d.astype(jnp.bfloat16)] * BLOCK, axis=1)
    deq = q.astype(jnp.bfloat16) * dexp
    o_ref[:] = jax.lax.dot_general(
        x.astype(jnp.bfloat16), deq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pick_tile(n: int, k: int, tile_n: int) -> int:
    """Tile policy: as large as the VMEM dequant working set allows
    (per-grid-step fixed costs dominate bandwidth-bound decode matvecs);
    must divide n on a 128-lane boundary. Returns 0 when impossible.
    ``FUNASR_Q8_TILE`` overrides the automatic choice (tuning knob)."""
    if tile_n == 0:
        import os
        tile_n = int(os.environ.get("FUNASR_Q8_TILE", 0)) or \
            (1024 if k <= 2048 else 512)
    tile_n = min(tile_n, n)
    if n % tile_n != 0:
        # largest 128-multiple dividing n (the Qwen3 vocab 151936 =
        # 128 x 1187 admits only 128)
        tile_n = next((t for t in range(tile_n - tile_n % 128, 127, -128)
                       if n % t == 0), 0)
    return tile_n


def _q8_matmul_kernel(x_ref, q_ref, d_ref, o_ref):
    _dequant_dot(x_ref[:], q_ref[:], d_ref[:], o_ref)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "use_pallas", "interpret"))
def quant_matmul(x: jnp.ndarray, qt: QuantTensor, tile_n: int = 0,
                 use_pallas: bool = True, interpret: bool = False
                 ) -> jnp.ndarray:
    """x [m, k] × QuantTensor([n, k]) → [m, n] f32.

    ``tile_n=0`` picks the tile automatically: as large as VMEM allows
    (the int8 tile plus its bf16 dequant working set must fit alongside
    double-buffered DMA), since per-grid-step fixed costs dominate the
    bandwidth-bound decode matvecs. ``use_pallas=False`` falls back to a
    dequantize-then-dot jnp path (reference implementation for parity
    tests / CPU).
    """
    m, k = x.shape
    n = qt.q.shape[0]
    tile_n = _pick_tile(n, k, tile_n) if use_pallas else 0
    if tile_n == 0:
        # non-pallas request, or no lane-aligned tiling — dequantize-then-dot
        deq = dequantize_weight(qt)                  # [k, n]
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    grid = (n // tile_n,)
    xp = block_permute(x)    # match the weights' block-transposed k order
    return pl.pallas_call(
        _q8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, k // BLOCK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + n * k + n * (k // BLOCK) * 4
                           + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, qt.q, qt.d)


# ---------------------------------------------------------------------------
# Layer-indexed kernel: stacked weights stay in HBM, scalar-prefetch selects
# the layer
# ---------------------------------------------------------------------------

class IndexedQuant(NamedTuple):
    """A layer slice of stacked QuantTensors, resolved inside the kernel.

    Feeding per-layer QuantTensor slices through ``lax.scan`` xs makes XLA
    materialize a copy of every layer's weights before each pallas custom
    call (read + write + read = 3× HBM traffic — measured ~340 GB/s vs
    ~740 for copy-free streams). Instead the scan carries only the layer
    index; the kernel DMAs the block straight out of the stacked array via
    a scalar-prefetch index_map.
    """
    qt: QuantTensor          # q [L, n, k], d [L, n, k//32]
    idx: jnp.ndarray         # [] int32


def _q8_matmul_idx_kernel(l_ref, x_ref, q_ref, d_ref, o_ref):
    _dequant_dot(x_ref[:], q_ref[0], d_ref[0], o_ref)


def quant_matmul_indexed(x: jnp.ndarray, qt: QuantTensor, layer_idx,
                         tile_n: int = 0, use_pallas: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """x [m, k] × stacked QuantTensor([L, n, k])[layer_idx] → [m, n] f32.

    ``layer_idx`` may be a traced scalar (scalar-prefetch kernel) or a
    Python int (static index baked into the block index_map — no scalar
    plumbing; used by the unrolled decode path).
    """
    if isinstance(layer_idx, int):
        return _quant_matmul_static_idx(x, qt, layer_idx, tile_n,
                                        use_pallas, interpret)
    return _quant_matmul_dyn_idx(x, qt, layer_idx, tile_n, use_pallas,
                                 interpret)


@functools.partial(jax.jit,
                   static_argnames=("layer_idx", "tile_n", "use_pallas",
                                    "interpret"))
def _quant_matmul_static_idx(x, qt, layer_idx: int, tile_n, use_pallas,
                             interpret):
    m, k = x.shape
    _, n, _ = qt.q.shape
    tile_n = _pick_tile(n, k, tile_n) if use_pallas else 0
    if tile_n == 0:
        sl = QuantTensor(q=qt.q[layer_idx], d=qt.d[layer_idx])
        deq = dequantize_weight(sl)
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    xp = block_permute(x)
    li = layer_idx
    return pl.pallas_call(
        _q8_matmul_idx_kernel_nos,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((1, tile_n, k), lambda i, _l=li: (_l, i, 0)),
            pl.BlockSpec((1, tile_n, k // BLOCK), lambda i, _l=li: (_l, i, 0)),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + n * k + n * (k // BLOCK) * 4
                           + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, qt.q, qt.d)


def _q8_matmul_idx_kernel_nos(x_ref, q_ref, d_ref, o_ref):
    """Static-index variant: no scalar-prefetch argument."""
    _dequant_dot(x_ref[:], q_ref[0], d_ref[0], o_ref)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "use_pallas", "interpret"))
def _quant_matmul_dyn_idx(x: jnp.ndarray, qt: QuantTensor, layer_idx,
                          tile_n: int = 0, use_pallas: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    m, k = x.shape
    _, n, _ = qt.q.shape
    tile_n = _pick_tile(n, k, tile_n) if use_pallas else 0
    if tile_n == 0:
        sl = QuantTensor(q=jax.lax.dynamic_index_in_dim(qt.q, layer_idx, 0,
                                                        keepdims=False),
                         d=jax.lax.dynamic_index_in_dim(qt.d, layer_idx, 0,
                                                        keepdims=False))
        deq = dequantize_weight(sl)
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    xp = block_permute(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i, l: (0, 0)),
            pl.BlockSpec((1, tile_n, k), lambda i, l: (l[0], i, 0)),
            pl.BlockSpec((1, tile_n, k // BLOCK), lambda i, l: (l[0], i, 0)),
        ],
        out_specs=pl.BlockSpec((m, tile_n), lambda i, l: (0, i)),
    )
    return pl.pallas_call(
        _q8_matmul_idx_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + n * k + n * (k // BLOCK) * 4
                           + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xp, qt.q, qt.d)


import functools as _functools


@_functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import os
    if os.environ.get("FUNASR_Q8_PALLAS") == "0":   # debug/bench knob:
        return False                                # force XLA dequant-dot
    return jax.default_backend() in ("tpu", "axon")


def matmul_any(x: jnp.ndarray,
               w: Union[jnp.ndarray, QuantTensor, IndexedQuant],
               use_pallas: bool = None) -> jnp.ndarray:
    """Dispatch: dense ``x @ w``, quantized kernel, or layer-indexed
    quantized kernel. Keeps callers (qwen3 _proj) agnostic of the weight
    storage format. Supports leading batch dims on x by flattening. The
    Pallas path engages only on TPU backends unless forced."""
    if isinstance(w, (QuantTensor, IndexedQuant)):
        if use_pallas is None:
            use_pallas = _on_tpu()
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if isinstance(w, IndexedQuant):
            out = quant_matmul_indexed(x2, w.qt, w.idx,
                                       use_pallas=use_pallas)
        else:
            out = quant_matmul(x2, w, use_pallas=use_pallas)
        return out.reshape(*lead, out.shape[-1])
    return jnp.dot(x, w, preferred_element_type=jnp.float32)

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
    # subnormal d -> zero block, matching quant_np/C++/export paths
    # (the stored fp16 scale underflows to 0 regardless)
    d = jnp.where(d < 1.17549435e-38, 0.0, d)
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
    ``FUNASR_Q8_TILE`` overrides the automatic choice (tuning knob).

    The public entry points (:func:`quant_matmul`,
    :func:`quant_matmul_indexed`) resolve this OUTSIDE jit so the env knob
    keys the jit cache; paths that are themselves traced into a larger
    program (q8dot_matmul, the megacalls' stage plan) read it at trace
    time — there the knob is process-start-only by nature, since the
    enclosing decode program compiles once."""
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


def _ksplit(k: int) -> int:
    """Number of k-chunks for the streaming (2-D grid) kernel variant.

    Splitting the contraction dim gives every call a multi-step grid so
    the next chunk's DMA overlaps the current chunk's dequant+dot — the
    1-2-step grids of the small decode matmuls (o_proj, down_proj) have
    no such overlap and stall on the initial weight DMA. The chunk count
    must divide 32 so each chunk covers whole block-transpose periods
    (chunk lanes then map onto ``d`` tiled ``reps`` times, same trick as
    the full-k kernel). 0/1 disables (the round-1 single-step layout)."""
    import os
    s = int(os.environ.get("FUNASR_Q8_KSPLIT", 0))
    return s if s > 1 and 32 % s == 0 else 1


def _dequant_dot_acc(x, q, d, o_ref, c):
    """k-chunk variant of :func:`_dequant_dot`: q is a [TN, tile_k] chunk
    of the block-transposed weight (tile_k = reps * k/32 whole periods),
    d the full [TN, k/32] scale row; accumulate into o_ref across c."""
    reps = q.shape[-1] // d.shape[-1]
    dexp = jnp.concatenate([d.astype(jnp.bfloat16)] * reps, axis=1)
    deq = q.astype(jnp.bfloat16) * dexp
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), deq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _init():
        o_ref[:] = acc

    @pl.when(c != 0)
    def _acc():
        o_ref[:] += acc


def quant_matmul(x: jnp.ndarray, qt: QuantTensor, tile_n: int = 0,
                 use_pallas: bool = True, interpret: bool = False,
                 x_preblocked: bool = False) -> jnp.ndarray:
    """x [m, k] × QuantTensor([n, k]) → [m, n] f32.

    ``x_preblocked=True`` declares that ``x`` is already in block-permuted
    lane order (the fused-decode "perm space" convention) and skips the
    internal :func:`block_permute`.

    ``tile_n=0`` picks the tile automatically: as large as VMEM allows
    (the int8 tile plus its bf16 dequant working set must fit alongside
    double-buffered DMA), since per-grid-step fixed costs dominate the
    bandwidth-bound decode matvecs. ``use_pallas=False`` falls back to a
    dequantize-then-dot jnp path (reference implementation for parity
    tests / CPU).

    The ``FUNASR_Q8_TILE`` / ``FUNASR_Q8_KSPLIT`` env knobs are resolved
    HERE, outside jit, so they participate in the jit cache key — a knob
    change mid-process takes effect instead of silently hitting a stale
    trace.
    """
    n, k = qt.q.shape[0], x.shape[1]
    tile_n = _pick_tile(n, k, tile_n) if use_pallas else 0
    return _quant_matmul_impl(x, qt, tile_n, _ksplit(k), use_pallas,
                              interpret, x_preblocked)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "ksplit", "use_pallas",
                                    "interpret", "x_preblocked"))
def _quant_matmul_impl(x: jnp.ndarray, qt: QuantTensor, tile_n: int,
                       ksplit: int, use_pallas: bool,
                       interpret: bool = False,
                       x_preblocked: bool = False) -> jnp.ndarray:
    m, k = x.shape
    n = qt.q.shape[0]
    if tile_n == 0:
        # non-pallas request, or no lane-aligned tiling — dequantize-then-dot
        if x_preblocked:
            x = block_unpermute(x)
        deq = dequantize_weight(qt)                  # [k, n]
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    # match the weights' block-transposed k order
    xp = x if x_preblocked else block_permute(x)
    ks = ksplit
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * 2 + n * k + n * (k // BLOCK) * 4 + m * n * 4,
        transcendentals=0)
    if ks > 1:
        tile_k = k // ks
        return pl.pallas_call(
            _q8_matmul_kernel_2d,
            grid=(n // tile_n, ks),
            in_specs=[
                pl.BlockSpec((m, tile_k), lambda i, c: (0, c)),
                pl.BlockSpec((tile_n, tile_k), lambda i, c: (i, c)),
                pl.BlockSpec((tile_n, k // BLOCK), lambda i, c: (i, 0)),
            ],
            out_specs=pl.BlockSpec((m, tile_n), lambda i, c: (0, i)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=cost,
            interpret=interpret,
        )(xp, qt.q, qt.d)
    return pl.pallas_call(
        _q8_matmul_kernel,
        grid=(n // tile_n,),
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
        cost_estimate=cost,
        interpret=interpret,
    )(xp, qt.q, qt.d)


def _q8_matmul_kernel_2d(x_ref, q_ref, d_ref, o_ref):
    _dequant_dot_acc(x_ref[:], q_ref[:], d_ref[:], o_ref, pl.program_id(1))


def _q8_matmul_idx_kernel_2d(l_ref, x_ref, q_ref, d_ref, o_ref):
    _dequant_dot_acc(x_ref[:], q_ref[0], d_ref[0], o_ref, pl.program_id(1))


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


def _split_indexed(w, qt_cls=QuantTensor):
    """IndexedQuant → (stacked tensor, layer idx); a plain quant tensor
    → (1-layer stack, 0). Shared by every fused entry point so the
    unwrap convention lives in one place."""
    if isinstance(w, IndexedQuant):
        return w.qt, w.idx
    return qt_cls(q=w.q[None], d=w.d[None]), 0


def _q8_matmul_idx_kernel(l_ref, x_ref, q_ref, d_ref, o_ref):
    _dequant_dot(x_ref[:], q_ref[0], d_ref[0], o_ref)


def quant_matmul_indexed(x: jnp.ndarray, qt: QuantTensor, layer_idx,
                         tile_n: int = 0, use_pallas: bool = True,
                         interpret: bool = False,
                         x_preblocked: bool = False) -> jnp.ndarray:
    """x [m, k] × stacked QuantTensor([L, n, k])[layer_idx] → [m, n] f32.

    ``layer_idx`` may be a traced scalar (scalar-prefetch kernel) or a
    Python int (static index baked into the block index_map — no scalar
    plumbing; used by the unrolled decode path). Env knobs resolve here,
    outside jit (see :func:`quant_matmul`).
    """
    _, n, k = qt.q.shape
    tile_n = _pick_tile(n, k, tile_n) if use_pallas else 0
    if isinstance(layer_idx, int):
        return _quant_matmul_static_idx(x, qt, layer_idx, tile_n,
                                        use_pallas, interpret, x_preblocked)
    return _quant_matmul_dyn_idx(x, qt, layer_idx, tile_n, _ksplit(k),
                                 use_pallas, interpret, x_preblocked)


@functools.partial(jax.jit,
                   static_argnames=("layer_idx", "tile_n", "use_pallas",
                                    "interpret", "x_preblocked"))
def _quant_matmul_static_idx(x, qt, layer_idx: int, tile_n, use_pallas,
                             interpret, x_preblocked: bool = False):
    m, k = x.shape
    _, n, _ = qt.q.shape
    if tile_n == 0:
        if x_preblocked:
            x = block_unpermute(x)
        sl = QuantTensor(q=qt.q[layer_idx], d=qt.d[layer_idx])
        deq = dequantize_weight(sl)
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    xp = x if x_preblocked else block_permute(x)
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
                   static_argnames=("tile_n", "ksplit", "use_pallas",
                                    "interpret", "x_preblocked"))
def _quant_matmul_dyn_idx(x: jnp.ndarray, qt: QuantTensor, layer_idx,
                          tile_n: int = 0, ksplit: int = 1,
                          use_pallas: bool = True,
                          interpret: bool = False,
                          x_preblocked: bool = False) -> jnp.ndarray:
    m, k = x.shape
    _, n, _ = qt.q.shape
    if tile_n == 0:
        if x_preblocked:
            x = block_unpermute(x)
        sl = QuantTensor(q=jax.lax.dynamic_index_in_dim(qt.q, layer_idx, 0,
                                                        keepdims=False),
                         d=jax.lax.dynamic_index_in_dim(qt.d, layer_idx, 0,
                                                        keepdims=False))
        deq = dequantize_weight(sl)
        return jnp.dot(x.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    xp = x if x_preblocked else block_permute(x)
    ks = ksplit
    cost = pl.CostEstimate(
        flops=2 * m * n * k,
        bytes_accessed=m * k * 2 + n * k + n * (k // BLOCK) * 4 + m * n * 4,
        transcendentals=0)
    if ks > 1:
        tile_k = k // ks
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tile_n, ks),
            in_specs=[
                pl.BlockSpec((m, tile_k), lambda i, c, l: (0, c)),
                pl.BlockSpec((1, tile_n, tile_k),
                             lambda i, c, l: (l[0], i, c)),
                pl.BlockSpec((1, tile_n, k // BLOCK),
                             lambda i, c, l: (l[0], i, 0)),
            ],
            out_specs=pl.BlockSpec((m, tile_n), lambda i, c, l: (0, i)),
        )
        return pl.pallas_call(
            _q8_matmul_idx_kernel_2d,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xp, qt.q, qt.d)
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
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xp, qt.q, qt.d)


# ---------------------------------------------------------------------------
# XLA-native block-quant path: q8_0 data in the dense weight's own layout
# ---------------------------------------------------------------------------

class BlockQuant(NamedTuple):
    """q8_0 weights in XLA-fusable form (same numbers as QuantTensor).

    ``q [..., k, n] int8`` — the dense weight's exact layout; ``d
    [..., k//32, n] f32`` — ggml's per-(32-k-block, out-channel) scale.
    Unlike the Pallas ``QuantTensor`` path these ride ``lax.scan`` xs as
    plain arrays and the matmul is pure XLA (a k-block-batched dot + a
    scale contraction), so the scheduler overlaps weight streaming with
    attention compute exactly as it does for ``Int8Weight`` — no
    custom-call boundary, no scan-slice copies (docs/PERFORMANCE.md "Why
    XLA beats the custom Pallas path").
    """
    q: jnp.ndarray
    d: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape


def block_quantize_weight(w: jnp.ndarray) -> BlockQuant:
    """w [k_in, n_out] → BlockQuant; same ggml q8_0 numbers as
    :func:`quantize_weight` (unrounded-f32-scale, ties-away rounding,
    f16-rounded stored scale), different on-device layout."""
    wf = w.astype(jnp.float32)
    k = wf.shape[-2]
    if k % BLOCK != 0:
        raise ValueError(f"contraction dim {k} not divisible by {BLOCK}")
    blocks = wf.reshape(*wf.shape[:-2], k // BLOCK, BLOCK, wf.shape[-1])
    absmax = jnp.max(jnp.abs(blocks), axis=-2)            # [..., k/32, n]
    d = absmax / 127.0
    inv = jnp.where(d == 0, 0.0, 1.0 / d)
    scaled = blocks * inv[..., None, :]
    q = (jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + 0.5)
         ).astype(jnp.int8)
    return BlockQuant(q=q.reshape(wf.shape),
                      d=d.astype(jnp.float16).astype(jnp.float32))


def blockquant_from_qt(qt: QuantTensor) -> BlockQuant:
    """Kernel-layout QuantTensor([n, k]) → BlockQuant([k, n]) (one-time
    load-side shuffle; exact same stored numbers)."""
    qn = block_unpermute(qt.q)                            # [..., n, k]
    return BlockQuant(q=jnp.swapaxes(qn, -1, -2),
                      d=jnp.swapaxes(qt.d, -1, -2))


def blockquant_dequantize(bq: BlockQuant) -> jnp.ndarray:
    """BlockQuant → dense [k_in, n_out] f32."""
    k, n = bq.q.shape[-2], bq.q.shape[-1]
    blocks = bq.q.astype(jnp.float32).reshape(
        *bq.q.shape[:-2], k // BLOCK, BLOCK, n)
    return (blocks * bq.d[..., None, :]).reshape(*bq.q.shape[:-2], k, n)


def blockquant_matmul(x: jnp.ndarray, bq: BlockQuant) -> jnp.ndarray:
    """x [m, k] × BlockQuant([k, n]) → [m, n] f32, pure XLA.

    Split the contraction at ggml's 32-block boundary: within a block the
    scale is constant per output channel, so
    ``out[m,n] = Σ_b d[b,n] · (x[m, b·32:b·32+32] @ q[b·32:b·32+32, n])``
    — a k/32-batched (m,32)×(32,n) int8 dot (weights read once, converted
    to bf16 in XLA's fused operand read) followed by an f32 contraction
    with the scales. The [b, m, n] partial-sum intermediate is tiny next
    to the weight bytes (m is 1..spec_k+1 in decode).
    """
    m, k = x.shape
    n = bq.q.shape[-1]
    xb = jnp.swapaxes(x.reshape(m, k // BLOCK, BLOCK), 0, 1)  # [b, m, 32]
    qb = bq.q.reshape(k // BLOCK, BLOCK, n)                   # [b, 32, n]
    s = jax.lax.dot_general(
        xb.astype(jnp.bfloat16), qb.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [b, m, n]
    return jnp.einsum("bmn,bn->mn", s, bq.d)


# ---------------------------------------------------------------------------
# Fused residual-MLP megacall (o_proj + residual + rmsnorm + gate_up +
# swiglu + down + residual in ONE Pallas call)
# ---------------------------------------------------------------------------
#
# Decode throughput on the quantized path is limited by per-Pallas-call
# fixed costs (semaphore setup, DMA ramp): 4 calls/layer x 28 layers ≈
# 112 calls/token. This megacall collapses the 3 post-attention matmuls
# (o, gate_up, down) plus their elementwise glue into one call → 2
# calls/layer.
#
# In-kernel chaining requires each matmul's OUTPUT to be in the next
# matmul's expected (block-transposed) activation order. Mosaic cannot do
# the interleaving [m, k] -> [m, k/32, 32] relayout in-kernel, so instead
# the weights' OUTPUT channels are pre-permuted at load time
# (:func:`permute_out_channels`): the residual stream then lives
# permanently in block-permuted order ("perm space") and no runtime
# permutes are needed anywhere in the chain. Permutation is a bit-exact
# relabeling: rmsnorm is permutation-invariant (its elementwise weight is
# stored permuted too), and q8_0 rows are independent, so quantized bytes
# are merely reordered, never recomputed.


def nperm_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """:func:`block_permute` applied along an arbitrary axis."""
    a = jnp.moveaxis(a, axis, -1)
    return jnp.moveaxis(block_permute(a), -1, axis)


def permute_out_channels(qt: QuantTensor, halves: int = 1) -> QuantTensor:
    """Reorder a QuantTensor's output channels (the n axis) into
    block-transposed order, so ``quant_matmul`` emits results directly in
    the permuted activation basis of a following quantized contraction.
    ``halves=2`` permutes each half independently (fused gate_up: the
    silu(gate)*up elementwise pairing must stay aligned)."""
    def perm(arr):
        if halves > 1:
            parts = jnp.split(arr, halves, axis=-2)
            return jnp.concatenate([nperm_axis(p, -2) for p in parts],
                                   axis=-2)
        return nperm_axis(arr, -2)
    return QuantTensor(q=perm(qt.q), d=perm(qt.d))


def _deq_dot_rows(x, q, d, lo: int, hi: int):
    """dot(x, dequant(q[lo:hi]).T) for a static row range — bounds the
    VMEM footprint of the dequantized tile (q rows are output channels)."""
    qs = q[lo:hi]
    ds = d[lo:hi]
    dexp = jnp.concatenate([ds.astype(jnp.bfloat16)] * BLOCK, axis=1)
    deq = qs.astype(jnp.bfloat16) * dexp
    return jax.lax.dot_general(
        x, deq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _rms_apply(x, w, eps):
    """rmsnorm(x)·w in f32 — permutation-invariant (the mean runs over
    ALL lanes), so it applies identically in perm space."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * w.astype(jnp.float32)


def _gate_act(g, u, act: str):
    """Gated-MLP activation on f32 pre-activations (silu: qwen/llama;
    gelu_tanh: gemma)."""
    if act == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True) * u
    return jax.nn.silu(g) * u


def _q8_mlp_fused_body(xm, res, pw, oq, od, gq, gd, dq, dd, o_ref, eps,
                       act="silu"):
    """pw rows: [post_ln] — or [post_ln, attn_post_ln, ffn_post_ln] for
    sandwich-norm archs (gemma3), where the attention/MLP branch outputs
    are rms-normed BEFORE their residual adds."""
    h_dim = oq.shape[0]
    ffn = gq.shape[0] // 2
    sandwich = pw.shape[0] == 3
    attn = _deq_dot_rows(xm, oq, od, 0, h_dim)            # [m, h] f32
    if sandwich:
        attn = _rms_apply(attn, pw[1], eps)
    h = attn + res.astype(jnp.float32)
    nh = _rms_apply(h, pw[0], eps)                        # perm space
    nhb = nh.astype(jnp.bfloat16)
    g = _deq_dot_rows(nhb, gq, gd, 0, ffn)                # [m, ffn]
    u = _deq_dot_rows(nhb, gq, gd, ffn, 2 * ffn)
    a = _gate_act(g, u, act).astype(jnp.bfloat16)
    out = _deq_dot_rows(a, dq, dd, 0, h_dim)
    if sandwich:
        out = _rms_apply(out, pw[2], eps)
    o_ref[:] = out + h


def _q8_mlp_fused_kernel(xm_ref, res_ref, pw_ref, oq_ref, od_ref,
                         gq_ref, gd_ref, dq_ref, dd_ref, o_ref, *, eps,
                         act="silu"):
    _q8_mlp_fused_body(xm_ref[:], res_ref[:], pw_ref[:], oq_ref[0],
                       od_ref[0], gq_ref[0], gd_ref[0], dq_ref[0],
                       dd_ref[0], o_ref, eps, act)


def _q8_mlp_fused_kernel_dyn(l_ref, xm_ref, res_ref, pw_ref, oq_ref,
                             od_ref, gq_ref, gd_ref, dq_ref, dd_ref,
                             o_ref, *, eps, act="silu"):
    _q8_mlp_fused_body(xm_ref[:], res_ref[:], pw_ref[:], oq_ref[0],
                       od_ref[0], gq_ref[0], gd_ref[0], dq_ref[0],
                       dd_ref[0], o_ref, eps, act)


def _q8_mlp_fused_ref(xm, res, pw, oq, oi, gq, gi, dq, di, eps,
                      apw=None, fpw=None, act="silu"):
    """jnp reference for the megacall (CPU tests / non-TPU): same perm-space
    convention — inputs arrive permuted, weight rows are channel-permuted.
    ``apw``/``fpw``: sandwich-norm weights (gemma3), permuted."""
    def mm(xp, qt, idx):
        sl = QuantTensor(
            q=jax.lax.dynamic_index_in_dim(qt.q, idx, 0, keepdims=False),
            d=jax.lax.dynamic_index_in_dim(qt.d, idx, 0, keepdims=False))
        deq = dequantize_weight(sl).astype(jnp.bfloat16)  # [k(nat), n]
        return jnp.dot(block_unpermute(xp).astype(jnp.bfloat16), deq,
                       preferred_element_type=jnp.float32)
    attn = mm(xm, oq, oi)
    if apw is not None:
        attn = _rms_apply(attn, apw, eps)
    h = attn + res.astype(jnp.float32)
    nh = _rms_apply(h, pw, eps)
    gu = mm(nh.astype(jnp.bfloat16), gq, gi)
    ffn = gu.shape[-1] // 2
    a = _gate_act(gu[:, :ffn], gu[:, ffn:], act).astype(jnp.bfloat16)
    out = mm(a, dq, di)
    if fpw is not None:
        out = _rms_apply(out, fpw, eps)
    return out + h


def q8_mlp_fused(merged_perm: jnp.ndarray, resid: jnp.ndarray,
                 post_w: jnp.ndarray, o_w, gu_w, down_w, eps: float,
                 use_pallas: bool = None,
                 interpret: bool = False,
                 attn_post_w: jnp.ndarray = None,
                 ffn_post_w: jnp.ndarray = None,
                 act: str = "silu") -> jnp.ndarray:
    """One transformer layer's post-attention half in a single Pallas call.

    ``merged_perm [m, q_heads*head_dim]``: attention output, block-permuted;
    ``resid [m, hidden]``: the layer-input residual in perm space;
    ``post_w [hidden]``: the post-attention rmsnorm weight, permuted.
    ``o_w/gu_w/down_w``: QuantTensor or IndexedQuant whose output channels
    were pre-permuted by :func:`permute_out_channels`. Returns the new
    residual [m, hidden] f32, in perm space.

    ``attn_post_w``/``ffn_post_w`` (both or neither, permuted): sandwich
    norms (gemma3) applied to the attention/MLP branch outputs before
    their residual adds; ``act``: gate activation ("silu"/"gelu_tanh").
    rmsnorm is permutation-invariant, so the sandwich stages run in perm
    space natively.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()

    (oq, oi), (gq, gi), (dq, di) = (_split_indexed(o_w),
                                    _split_indexed(gu_w),
                                    _split_indexed(down_w))
    m, qd = merged_perm.shape
    h = oq.q.shape[1]
    f2 = gq.q.shape[1]
    ffn = dq.q.shape[2]
    if not use_pallas:
        return _q8_mlp_fused_ref(merged_perm, resid, post_w, oq, oi,
                                 gq, gi, dq, di, eps,
                                 apw=attn_post_w, fpw=ffn_post_w, act=act)

    xm = merged_perm.astype(jnp.bfloat16)
    if attn_post_w is not None:
        pw = jnp.stack([post_w, attn_post_w, ffn_post_w])   # [3, h]
    else:
        pw = post_w.reshape(1, h)
    cost = pl.CostEstimate(
        flops=2 * m * (h * qd + f2 * h + h * ffn),
        bytes_accessed=(h * qd + f2 * h + h * ffn)          # int8 weights
        + (h * qd // BLOCK + f2 * h // BLOCK + h * ffn // BLOCK) * 4
        + m * (qd + h) * 2 + m * h * 4,
        transcendentals=m * ffn)
    kern = functools.partial(_q8_mlp_fused_kernel, eps=eps, act=act)
    kern_dyn = functools.partial(_q8_mlp_fused_kernel_dyn, eps=eps,
                                 act=act)
    pr = pw.shape[0]
    if isinstance(oi, int):
        if _staged_enabled():
            plan = _mega_stage_plan(m, qd, h, f2, ffn, 0)
            if plan:
                return _q8_mega_staged_call(
                    xm, resid, pw, None, oq, oi, gq, gi, dq, di, None,
                    None, eps, plan, interpret, act=act)
        _o, _g, _d = oi, gi, di
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((m, qd), lambda i: (0, 0)),
                pl.BlockSpec((m, h), lambda i: (0, 0)),
                pl.BlockSpec((pr, h), lambda i: (0, 0)),
                pl.BlockSpec((1, h, qd), lambda i, _l=_o: (_l, 0, 0)),
                pl.BlockSpec((1, h, qd // BLOCK), lambda i, _l=_o: (_l, 0, 0)),
                pl.BlockSpec((1, f2, h), lambda i, _l=_g: (_l, 0, 0)),
                pl.BlockSpec((1, f2, h // BLOCK), lambda i, _l=_g: (_l, 0, 0)),
                pl.BlockSpec((1, h, ffn), lambda i, _l=_d: (_l, 0, 0)),
                pl.BlockSpec((1, h, ffn // BLOCK), lambda i, _l=_d: (_l, 0, 0)),
            ],
            out_specs=pl.BlockSpec((m, h), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(xm, resid, pw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d)

    # scalar-prefetch [3] = per-weight layer indices (o, gate_up, down) —
    # honoring each IndexedQuant's own idx, like the static path
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m, qd), lambda i, l: (0, 0)),
            pl.BlockSpec((m, h), lambda i, l: (0, 0)),
            pl.BlockSpec((pr, h), lambda i, l: (0, 0)),
            pl.BlockSpec((1, h, qd), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, h, qd // BLOCK), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, f2, h), lambda i, l: (l[1], 0, 0)),
            pl.BlockSpec((1, f2, h // BLOCK), lambda i, l: (l[1], 0, 0)),
            pl.BlockSpec((1, h, ffn), lambda i, l: (l[2], 0, 0)),
            pl.BlockSpec((1, h, ffn // BLOCK), lambda i, l: (l[2], 0, 0)),
        ],
        out_specs=pl.BlockSpec((m, h), lambda i, l: (0, 0)),
    )
    lidx = jnp.stack([jnp.asarray(i, jnp.int32) for i in (oi, gi, di)])
    return pl.pallas_call(
        kern_dyn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(lidx, xm, resid, pw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d)


# ---------------------------------------------------------------------------
# Megacall v2: + next layer's input_ln and qkv projection
# ---------------------------------------------------------------------------
#
# With the v1 megacall the decode step still issues 2 Pallas calls per
# layer (qkv, then the fused MLP chain); measured per-call fixed costs of
# ~8-15 us dominate the q8_0 gap to int8 (see docs/PERFORMANCE.md). The
# only op between a layer's MLP output and the NEXT layer's qkv
# projection is an rmsnorm, so this variant appends next-input_ln +
# qkv-matmul to the same kernel: 1 Pallas call per layer. The qkv output
# leaves in natural channel order (rope/attention stay in XLA).


def _q8_mlp_qkv_fused_body(xm, res, pw, nw, oq, od, gq, gd, dq, dd,
                           qq, qd_, o_ref, qkv_ref, eps, act="silu"):
    h_dim = oq.shape[0]
    ffn = gq.shape[0] // 2
    sandwich = pw.shape[0] == 3
    attn = _deq_dot_rows(xm, oq, od, 0, h_dim)            # [m, h] f32
    if sandwich:
        attn = _rms_apply(attn, pw[1], eps)
    h = attn + res.astype(jnp.float32)
    nh = _rms_apply(h, pw[0], eps)                        # perm space
    nhb = nh.astype(jnp.bfloat16)
    g = _deq_dot_rows(nhb, gq, gd, 0, ffn)                # [m, ffn]
    u = _deq_dot_rows(nhb, gq, gd, ffn, 2 * ffn)
    a = _gate_act(g, u, act).astype(jnp.bfloat16)
    mlp = _deq_dot_rows(a, dq, dd, 0, h_dim)
    if sandwich:
        mlp = _rms_apply(mlp, pw[2], eps)
    out = mlp + h
    o_ref[:] = out
    nh2 = _rms_apply(out, nw[0], eps)
    qkv_ref[:] = _deq_dot_rows(nh2.astype(jnp.bfloat16), qq, qd_,
                               0, qq.shape[0])


def _q8_mlp_qkv_fused_kernel(xm_ref, res_ref, pw_ref, nw_ref, oq_ref,
                             od_ref, gq_ref, gd_ref, dq_ref, dd_ref,
                             qq_ref, qd_ref, o_ref, qkv_ref, *, eps,
                             act="silu"):
    _q8_mlp_qkv_fused_body(
        xm_ref[:], res_ref[:], pw_ref[:], nw_ref[:], oq_ref[0], od_ref[0],
        gq_ref[0], gd_ref[0], dq_ref[0], dd_ref[0], qq_ref[0], qd_ref[0],
        o_ref, qkv_ref, eps, act)


def _q8_mlp_qkv_fused_kernel_dyn(l_ref, xm_ref, res_ref, pw_ref, nw_ref,
                                 oq_ref, od_ref, gq_ref, gd_ref, dq_ref,
                                 dd_ref, qq_ref, qd_ref, o_ref, qkv_ref,
                                 *, eps, act="silu"):
    _q8_mlp_qkv_fused_body(
        xm_ref[:], res_ref[:], pw_ref[:], nw_ref[:], oq_ref[0], od_ref[0],
        gq_ref[0], gd_ref[0], dq_ref[0], dd_ref[0], qq_ref[0], qd_ref[0],
        o_ref, qkv_ref, eps, act)


def _q8_mlp_qkv_fused_ref(xm, res, pw, nw, oq, oi, gq, gi, dq, di,
                          qq, qi, eps, apw=None, fpw=None, act="silu"):
    """jnp reference (CPU tests / non-TPU): the v1 reference chain plus
    next-input_ln + qkv. nw arrives permuted (perm-space elementwise);
    the qkv weight contracts perm-space activations natively."""
    out = _q8_mlp_fused_ref(xm, res, pw, oq, oi, gq, gi, dq, di, eps,
                            apw=apw, fpw=fpw, act=act)
    var2 = jnp.mean(out * out, axis=-1, keepdims=True)
    nh2 = (out * jax.lax.rsqrt(var2 + eps)) * nw.astype(jnp.float32)
    sl = QuantTensor(
        q=jax.lax.dynamic_index_in_dim(qq.q, qi, 0, keepdims=False),
        d=jax.lax.dynamic_index_in_dim(qq.d, qi, 0, keepdims=False))
    deq = dequantize_weight(sl).astype(jnp.bfloat16)      # [k(nat), n_qkv]
    qkv = jnp.dot(block_unpermute(nh2).astype(jnp.bfloat16), deq,
                  preferred_element_type=jnp.float32)
    return out, qkv


def q8_mlp_qkv_fused(merged_perm: jnp.ndarray, resid: jnp.ndarray,
                     post_w: jnp.ndarray, next_in_w: jnp.ndarray,
                     o_w, gu_w, down_w, next_qkv_w, eps: float,
                     use_pallas: bool = None, interpret: bool = False,
                     attn_post_w: jnp.ndarray = None,
                     ffn_post_w: jnp.ndarray = None,
                     act: str = "silu"):
    """One layer's post-attention half PLUS the next layer's input_ln +
    qkv projection, in a single Pallas call.

    Same contract as :func:`q8_mlp_fused` (incl. the sandwich-norm /
    activation options) with two additions: ``next_in_w [hidden]`` — the
    NEXT layer's input rmsnorm weight, permuted; ``next_qkv_w`` —
    QuantTensor/IndexedQuant for the next layer's packed qkv projection
    (natural output channels). Returns ``(new_resid [m, hidden] f32
    perm-space, qkv [m, n_qkv] f32)``.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()

    (oq, oi), (gq, gi), (dq, di) = (_split_indexed(o_w),
                                    _split_indexed(gu_w),
                                    _split_indexed(down_w))
    qq, qi = _split_indexed(next_qkv_w)
    m, qd = merged_perm.shape
    h = oq.q.shape[1]
    f2 = gq.q.shape[1]
    ffn = dq.q.shape[2]
    nq = qq.q.shape[1]
    if not use_pallas:
        return _q8_mlp_qkv_fused_ref(merged_perm, resid, post_w, next_in_w,
                                     oq, oi, gq, gi, dq, di,
                                     QuantTensor(q=qq.q, d=qq.d), qi, eps,
                                     apw=attn_post_w, fpw=ffn_post_w,
                                     act=act)

    xm = merged_perm.astype(jnp.bfloat16)
    if attn_post_w is not None:
        pw = jnp.stack([post_w, attn_post_w, ffn_post_w])   # [3, h]
    else:
        pw = post_w.reshape(1, h)
    nw = next_in_w.reshape(1, h)
    cost = pl.CostEstimate(
        flops=2 * m * (h * qd + f2 * h + h * ffn + nq * h),
        bytes_accessed=(h * qd + f2 * h + h * ffn + nq * h)  # int8 weights
        + ((h * qd + f2 * h + h * ffn + nq * h) // BLOCK) * 4
        + m * (qd + 2 * h + nq) * 2 + m * h * 4,
        transcendentals=m * ffn)
    out_shape = (jax.ShapeDtypeStruct((m, h), jnp.float32),
                 jax.ShapeDtypeStruct((m, nq), jnp.float32))
    kern = functools.partial(_q8_mlp_qkv_fused_kernel, eps=eps, act=act)
    kern_dyn = functools.partial(_q8_mlp_qkv_fused_kernel_dyn, eps=eps,
                                 act=act)
    pr = pw.shape[0]
    if isinstance(oi, int):
        if _staged_enabled():
            plan = _mega_stage_plan(m, qd, h, f2, ffn, nq)
            if plan:
                return _q8_mega_staged_call(
                    xm, resid, pw, nw, oq, oi, gq, gi, dq, di, qq, qi,
                    eps, plan, interpret, act=act)
        _o, _g, _d, _q = oi, gi, di, qi
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((m, qd), lambda i: (0, 0)),
                pl.BlockSpec((m, h), lambda i: (0, 0)),
                pl.BlockSpec((pr, h), lambda i: (0, 0)),
                pl.BlockSpec((1, h), lambda i: (0, 0)),
                pl.BlockSpec((1, h, qd), lambda i, _l=_o: (_l, 0, 0)),
                pl.BlockSpec((1, h, qd // BLOCK), lambda i, _l=_o: (_l, 0, 0)),
                pl.BlockSpec((1, f2, h), lambda i, _l=_g: (_l, 0, 0)),
                pl.BlockSpec((1, f2, h // BLOCK), lambda i, _l=_g: (_l, 0, 0)),
                pl.BlockSpec((1, h, ffn), lambda i, _l=_d: (_l, 0, 0)),
                pl.BlockSpec((1, h, ffn // BLOCK), lambda i, _l=_d: (_l, 0, 0)),
                pl.BlockSpec((1, nq, h), lambda i, _l=_q: (_l, 0, 0)),
                pl.BlockSpec((1, nq, h // BLOCK), lambda i, _l=_q: (_l, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((m, h), lambda i: (0, 0)),
                       pl.BlockSpec((m, nq), lambda i: (0, 0))],
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(xm, resid, pw, nw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d,
          qq.q, qq.d)

    # dynamic layer index: scalar-prefetch [4] = per-weight layer indices
    # (o, gate_up, down, next-qkv) — each IndexedQuant's own idx
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m, qd), lambda i, l: (0, 0)),
            pl.BlockSpec((m, h), lambda i, l: (0, 0)),
            pl.BlockSpec((pr, h), lambda i, l: (0, 0)),
            pl.BlockSpec((1, h), lambda i, l: (0, 0)),
            pl.BlockSpec((1, h, qd), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, h, qd // BLOCK), lambda i, l: (l[0], 0, 0)),
            pl.BlockSpec((1, f2, h), lambda i, l: (l[1], 0, 0)),
            pl.BlockSpec((1, f2, h // BLOCK), lambda i, l: (l[1], 0, 0)),
            pl.BlockSpec((1, h, ffn), lambda i, l: (l[2], 0, 0)),
            pl.BlockSpec((1, h, ffn // BLOCK), lambda i, l: (l[2], 0, 0)),
            pl.BlockSpec((1, nq, h), lambda i, l: (l[3], 0, 0)),
            pl.BlockSpec((1, nq, h // BLOCK), lambda i, l: (l[3], 0, 0)),
        ],
        out_specs=[pl.BlockSpec((m, h), lambda i, l: (0, 0)),
                   pl.BlockSpec((m, nq), lambda i, l: (0, 0))],
    )
    lidx = jnp.stack([jnp.asarray(i, jnp.int32)
                      for i in (oi, gi, di, qi)])
    return pl.pallas_call(
        kern_dyn,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(lidx, xm, resid, pw, nw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d,
      qq.q, qq.d)


def q8_layer_head_fused(merged_perm: jnp.ndarray, resid: jnp.ndarray,
                        post_w: jnp.ndarray, final_w: jnp.ndarray,
                        o_w, gu_w, down_w, head_w, eps: float,
                        use_pallas: bool = None, interpret: bool = False,
                        attn_post_w: jnp.ndarray = None,
                        ffn_post_w: jnp.ndarray = None,
                        act: str = "silu"):
    """LAST-layer megacall: the layer chain plus final-rmsnorm + lm_head
    logits in the same staged Pallas call.

    Mathematically the lm_head is the qkv stage group with the final norm
    weight in the next-input_ln slot — ``head_w`` is the same
    ``quantize_weight([hidden, vocab_padded])`` QuantTensor ``_logits``
    consumes, contracting perm-space activations natively. Fusing it
    removes the separate head custom call whose ramp is exposed (measured:
    the isolated head kernel runs at roofline, 209.8 µs, but costs 315 µs
    in-graph — docs/PERFORMANCE.md), and streams the 149 vocab chunks
    through the SAME pipelined grid as the layer weights.

    Returns ``(new_resid [m, hidden] f32 perm space, logits [m, vocab_pad]
    f32)``, or ``None`` when the staged path cannot run (tiny shapes, no
    aligned chunking, staging disabled) — the caller falls back to the
    separate final-norm + head matmul. The grid=(1,) fallback of
    :func:`q8_mlp_qkv_fused` is never used here: a whole-vocab block
    (~150 MB) cannot reside in VMEM.
    """
    (oq, oi), (gq, gi), (dq, di) = (_split_indexed(o_w),
                                    _split_indexed(gu_w),
                                    _split_indexed(down_w))
    hq, hi = _split_indexed(head_w)
    m, qd = merged_perm.shape
    h = oq.q.shape[1]
    f2 = gq.q.shape[1]
    ffn = dq.q.shape[2]
    nv = hq.q.shape[1]
    if use_pallas is None:
        use_pallas = _on_tpu()
    if not use_pallas:
        return _q8_mlp_qkv_fused_ref(merged_perm, resid, post_w, final_w,
                                     oq, oi, gq, gi, dq, di,
                                     QuantTensor(q=hq.q, d=hq.d), hi, eps,
                                     apw=attn_post_w, fpw=ffn_post_w,
                                     act=act)
    import os
    if os.environ.get("FUNASR_Q8_FUSED_HEAD", "0") == "0":
        # default OFF: an interleaved same-process A/B on v5e measured the
        # fused head timing-neutral vs the separate call (1.582 vs 1.579
        # ms/token) — XLA already overlaps the separate head call's ramp
        # with the last layer's megacall, so there is nothing to recover;
        # the knob keeps the variant runnable (trace-time, process-start)
        return None
    if not _staged_enabled() or not isinstance(oi, int):
        return None
    plan = _mega_stage_plan(m, qd, h, f2, ffn, nv)
    if plan is None:
        return None
    nqc = plan[3]
    # head chunk must actually be streamable (≤ ~4 MB int8 + bf16 dequant
    # working set in VMEM) — bail out on vocab sizes with no good divisor
    if nqc == 0 or (nv // nqc) * h > 4 << 20:
        return None
    if attn_post_w is not None:
        pw = jnp.stack([post_w, attn_post_w, ffn_post_w])
    else:
        pw = post_w.reshape(1, h)
    return _q8_mega_staged_call(
        merged_perm.astype(jnp.bfloat16), resid,
        pw, final_w.reshape(1, h),
        oq, oi, gq, gi, dq, di, hq, hi, eps, plan, interpret, act=act)


# ---------------------------------------------------------------------------
# Staged (pipelined) megacall: the v2 chain over a multi-step grid
# ---------------------------------------------------------------------------
#
# A grid=(1,) megacall serializes its weight DMA against its compute: the
# whole ~21 MB layer must land in VMEM before the body starts. The same
# dequant-dot kernels measured in isolation with a long pipelined grid
# stream at ~710 GB/s — so the staged variant chops the chain into
# weight chunks walked by the grid (o k-chunks → gate_up row-chunks →
# down k-chunks → qkv row-chunks), with the stage logic under pl.when:
# Pallas prefetches step s+1's chunk while step s computes, hiding DMA
# behind dequant+MXU. k-chunks must cover whole block-transpose periods
# (multiples of k/32) so the lane→scale mapping stays the tiled-concat
# pattern; gate_up row-chunks must not straddle the gate/up boundary.


def _mega_stage_plan(m, qd, h, f2, ffn, nq, target=None):
    """Chunk counts (ko, ng, kd, nqc) or None when shapes don't admit
    staging. nq=0 plans the no-qkv (last layer) variant.
    ``FUNASR_Q8_STAGE_TARGET`` (bytes) tunes the per-step chunk size:
    smaller chunks overlap DMA/compute at finer grain but pay more
    per-step fixed cost (measured best ≈ 1.25 MB on v5e)."""
    if target is None:
        import os
        target = float(os.environ.get("FUNASR_Q8_STAGE_TARGET", 0)) \
            or 1.25e6
    def k_chunks(k, n):
        best = 1
        for c in (1, 2, 4, 8, 16, 32):
            if k % c or (k // c) % max(k // 32, 1):
                continue
            if abs(k * n / c - target) < abs(k * n / best - target):
                best = c
        return best

    def n_chunks(n, k, halves=1):
        best = None
        # divisor enumeration (not a fixed candidate list) so vocab-sized
        # n (e.g. 152576 = 2^10 x 149 — the fused lm_head) still admits a
        # ~target-sized chunk; rows per chunk must stay 128-lane-aligned
        # (chunk rows are the qkv/head OUT block's lane dimension)
        for c in range(1, 513):
            if n % c or (n // c) % 128:
                continue
            if halves > 1 and c % halves and c != 1:
                continue
            if halves > 1 and c != 1 and (n // halves) % (n // c):
                continue
            if best is None or abs(n * k / c - target) < \
                    abs(n * k / best - target):
                best = c
        return best or 1

    if min(qd, h, ffn) < 256:          # tiny test shapes: single stage
        return None
    ko = k_chunks(qd, h)
    ng = n_chunks(f2, h, halves=2)
    kd = k_chunks(ffn, h)
    nqc = n_chunks(nq, h) if nq else 0
    if ko + ng + kd + nqc < 4:
        return None
    return (ko, ng, kd, nqc)


def _deq_chunk_dot(x, qchunk, dfull):
    """dot(x_chunk, dequant(q_chunk).T) for a k-chunk covering whole
    block-transpose periods: scales = dfull tiled (chunk/(k/32))×."""
    reps = qchunk.shape[-1] // dfull.shape[-1]
    dexp = jnp.concatenate([dfull.astype(jnp.bfloat16)] * reps, axis=1)
    deq = qchunk.astype(jnp.bfloat16) * dexp
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), deq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q8_mega_staged_kernel(xm_ref, res_ref, pw_ref, nw_ref,
                           oq_ref, od_ref, gq_ref, gd_ref, dq_ref, dd_ref,
                           qq_ref, qd_ref, o_ref, qkv_ref,
                           acc_ref, h1_ref, nhb_ref, gu_ref, act_ref,
                           *, eps, plan, dims, act="silu"):
    ko, ng, kd, nqc = plan
    qd, h, f2, ffn, nq = dims
    s = pl.program_id(0)
    cko, cng, ckd = qd // ko, f2 // ng, ffn // kd
    f = f2 // 2
    sandwich = pw_ref.shape[0] == 3   # [post, attn_post, ffn_post] rows

    for c in range(ko):
        @pl.when(s == c)
        def _(c=c):
            part = _deq_chunk_dot(xm_ref[:, c * cko:(c + 1) * cko],
                                  oq_ref[0], od_ref[0])
            if c == 0:
                acc_ref[:] = part
            else:
                acc_ref[:] += part

    @pl.when(s == ko - 1)
    def _():
        attn = acc_ref[:]
        if sandwich:   # gemma: norm the attention branch BEFORE the add
            attn = _rms_apply(attn, pw_ref[1:2], eps)
        h1 = attn + res_ref[:].astype(jnp.float32)
        nh = _rms_apply(h1, pw_ref[0:1], eps)
        h1_ref[:] = h1
        nhb_ref[:] = nh.astype(jnp.bfloat16)

    for c in range(ng):
        @pl.when(s == ko + c)
        def _(c=c):
            dexp = jnp.concatenate(
                [gd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
            deq = gq_ref[0].astype(jnp.bfloat16) * dexp
            gu_ref[:, c * cng:(c + 1) * cng] = jax.lax.dot_general(
                nhb_ref[:], deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(s == ko + ng - 1)
    def _():
        gu = gu_ref[:]
        act_ref[:] = _gate_act(gu[:, :f], gu[:, f:],
                               act).astype(jnp.bfloat16)

    for c in range(kd):
        @pl.when(s == ko + ng + c)
        def _(c=c):
            part = _deq_chunk_dot(act_ref[:, c * ckd:(c + 1) * ckd],
                                  dq_ref[0], dd_ref[0])
            if c == 0:
                acc_ref[:] = part
            else:
                acc_ref[:] += part

    @pl.when(s == ko + ng + kd - 1)
    def _():
        mlp = acc_ref[:]
        if sandwich:   # gemma: norm the MLP branch BEFORE the add
            mlp = _rms_apply(mlp, pw_ref[2:3], eps)
        out = mlp + h1_ref[:]
        o_ref[:] = out
        if nqc:
            nh2 = _rms_apply(out, nw_ref[:], eps)
            nhb_ref[:] = nh2.astype(jnp.bfloat16)

    if nqc:
        # one body serves every qkv/head chunk: the BlockSpec index_map
        # delivers chunk clamp(s - base) and the out block advances with
        # it, so no per-chunk unroll is needed — this keeps compile time
        # constant even at vocab-head chunk counts (149 chunks)
        @pl.when(s >= ko + ng + kd)
        def _():
            dexp = jnp.concatenate(
                [qd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
            deq = qq_ref[0].astype(jnp.bfloat16) * dexp
            qkv_ref[:] = jax.lax.dot_general(
                nhb_ref[:], deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)


def _q8_mega_staged_call(xm, resid, pw, nw, oq, oi, gq, gi, dq, di,
                         qq, qi, eps, plan, interpret, act="silu"):
    """Build the staged pallas_call. qq/qi may be None (no-qkv variant).
    ``pw``: [1, h] (standard) or [3, h] (sandwich norms, gemma)."""
    ko, ng, kd, nqc = plan
    m, qd = xm.shape
    h = oq.q.shape[1]
    f2 = gq.q.shape[1]
    ffn = dq.q.shape[2]
    nq = qq.q.shape[1] if qq is not None else 0
    cko, cng, ckd = qd // ko, f2 // ng, ffn // kd
    steps = ko + ng + kd + nqc
    base = ko + ng + kd
    pr = pw.shape[0]

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    _o, _g, _d, _q = oi, gi, di, qi
    in_specs = [
        pl.BlockSpec((m, qd), lambda s: (0, 0)),
        pl.BlockSpec((m, h), lambda s: (0, 0)),
        pl.BlockSpec((pr, h), lambda s: (0, 0)),
    ] + ([pl.BlockSpec((1, h), lambda s: (0, 0))] if nqc else []) + [
        pl.BlockSpec((1, h, cko),
                     lambda s, _l=_o: (_l, 0, clamp(s, 0, ko - 1))),
        pl.BlockSpec((1, h, qd // BLOCK), lambda s, _l=_o: (_l, 0, 0)),
        pl.BlockSpec((1, cng, h),
                     lambda s, _l=_g: (_l, clamp(s - ko, 0, ng - 1), 0)),
        pl.BlockSpec((1, cng, h // BLOCK),
                     lambda s, _l=_g: (_l, clamp(s - ko, 0, ng - 1), 0)),
        pl.BlockSpec((1, h, ckd),
                     lambda s, _l=_d: (_l, 0, clamp(s - ko - ng, 0,
                                                    kd - 1))),
        pl.BlockSpec((1, h, ffn // BLOCK), lambda s, _l=_d: (_l, 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((m, h), jnp.float32),      # acc
        pltpu.VMEM((m, h), jnp.float32),      # h1
        pltpu.VMEM((m, h), jnp.bfloat16),     # nhb / nh2b
        pltpu.VMEM((m, f2), jnp.float32),     # gu buffer
        pltpu.VMEM((m, ffn), jnp.bfloat16),   # act
    ]
    dims = (qd, h, f2, ffn, nq)
    kern = functools.partial(_q8_mega_staged_kernel, eps=eps,
                             plan=plan, dims=dims, act=act)
    if nqc:
        cnq = nq // nqc
        in_specs += [
            pl.BlockSpec((1, cnq, h),
                         lambda s, _l=_q: (_l, clamp(s - base, 0,
                                                     nqc - 1), 0)),
            pl.BlockSpec((1, cnq, h // BLOCK),
                         lambda s, _l=_q: (_l, clamp(s - base, 0,
                                                     nqc - 1), 0)),
        ]
        return pl.pallas_call(
            kern,
            grid=(steps,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((m, h), lambda s: (0, 0)),
                pl.BlockSpec((m, cnq),
                             lambda s: (0, clamp(s - base, 0, nqc - 1))),
            ],
            out_shape=(jax.ShapeDtypeStruct((m, h), jnp.float32),
                       jax.ShapeDtypeStruct((m, nq), jnp.float32)),
            scratch_shapes=scratch,
            interpret=interpret,
        )(xm, resid, pw, nw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d,
          qq.q, qq.d)

    def kern_noqkv(xm_ref, res_ref, pw_ref, oq_ref, od_ref, gq_ref,
                   gd_ref, dq_ref, dd_ref, o_ref, acc_ref, h1_ref,
                   nhb_ref, gu_ref, act_ref):
        _q8_mega_staged_kernel(
            xm_ref, res_ref, pw_ref, pw_ref, oq_ref, od_ref, gq_ref,
            gd_ref, dq_ref, dd_ref, None, None, o_ref, None,
            acc_ref, h1_ref, nhb_ref, gu_ref, act_ref,
            eps=eps, plan=plan, dims=dims, act=act)

    return pl.pallas_call(
        kern_noqkv,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, h), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xm, resid, pw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d)


def _staged_enabled() -> bool:
    import os
    return os.environ.get("FUNASR_Q8_STAGED", "1") != "0"


# ---------------------------------------------------------------------------
# int8-dot path ("q8i"): integer MXU matmuls with scales on block partials
# ---------------------------------------------------------------------------
#
# The dequant-in-register kernels above are VPU-bound: every weight element
# pays an int8→bf16 convert plus a scale multiply on the vector unit
# (~31 M element-ops per layer per token — the measured dominant non-DMA
# cost; see docs/PERFORMANCE.md "megacall ladder"). This path removes the
# per-element work entirely, the same way llama.cpp's own q8_0 GEMM does
# (ggml vec_dot_q8_0_q8_0: quantize activations to q8_0, integer dot per
# 32-block, multiply the two block scales into the partial sum):
#
#   1. activations are quantized to q8_0 per 32-block (scale xs[b]);
#   2. the int8 activation column is expanded into a block-diagonal
#      matrix X [k, nb*m], so ONE s8×s8 MXU dot against the raw weight
#      bytes yields ALL per-block partial sums Z [n, nb*m] exactly;
#   3. Z × (weight block scale d[n,b], lane-tiled) on the VPU — n*nb
#      elements instead of n*k (32× less);
#   4. a second small f32 MXU dot against Gx [nb*m, m] (the activation
#      scales arranged to also perform the per-block segment sum) gives
#      the output column [n, m].
#
# Weights here store k in NATURAL order (`QuantTensorN`) — the
# block-transposed trick exists only to make per-lane scale expansion
# concat-shaped, and this path never expands scales over k. Activations
# flow COLUMN-major ([k, m]) so chained matmuls need no transposes.

def _round_away(x):
    """roundf semantics (ties away from zero) — matches ggml quantization
    (quantize_weight above uses the same)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


class QuantTensorN(NamedTuple):
    """q8_0 weight with the contraction dim in natural order, for the
    int8-dot kernels. Same stored numbers as :class:`QuantTensor`."""
    q: jnp.ndarray   # int8  [..., n, k]
    d: jnp.ndarray   # f32   [..., n, k // 32]

    @property
    def shape(self):
        return self.q.shape


def to_natural(qt: QuantTensor) -> QuantTensorN:
    """Undo the k-block-transpose: QuantTensor → QuantTensorN (relabeling
    only; q8_0 bytes/scales unchanged)."""
    return QuantTensorN(q=block_unpermute(qt.q), d=qt.d)


def dequantize_weight_n(qtn: QuantTensorN) -> jnp.ndarray:
    """QuantTensorN → dense [k_in, n_out] f32 (XLA; for prefill-sized
    matmuls where per-element dequant amortizes over many rows)."""
    n, k = qtn.q.shape[-2], qtn.q.shape[-1]
    deq = (qtn.q.astype(jnp.float32)
           .reshape(*qtn.q.shape[:-1], k // BLOCK, BLOCK)
           * qtn.d[..., None]).reshape(*qtn.q.shape[:-2], n, k)
    return jnp.swapaxes(deq, -1, -2)


def quantize_act_q8(x: jnp.ndarray):
    """Quantize activations to q8_0 rows (ggml quantize_row_q8_0):
    x [m, k] → (xq [m, k] int8, xs [m, k//32] f32)."""
    m, k = x.shape
    xf = x.astype(jnp.float32).reshape(m, k // BLOCK, BLOCK)
    amax = jnp.max(jnp.abs(xf), axis=-1)                  # [m, nb]
    d = amax / 127.0
    inv = jnp.where(d == 0, 0.0, 1.0 / d)
    q = _round_away(xf * inv[..., None]).astype(jnp.int8)
    return q.reshape(m, k), d


def _build_x_diag(xq_col, nb: int):
    """xq_col [k, m] s8 → block-diagonal X [k, nb*m] s8, columns mi-major
    (c = mi*nb + b): X[j, mi*nb + b] = xq_col[j, mi] iff j//32 == b."""
    k, m = xq_col.shape
    # 0/1 block mask × implicit-broadcast column: a where() on a
    # broadcast_to'd operand trips Mosaic's relayout ("replicated in
    # destination but not in source"); the multiply form lowers clean
    maski = (jax.lax.broadcasted_iota(jnp.int32, (k, nb), 0) // BLOCK ==
             jax.lax.broadcasted_iota(jnp.int32, (k, nb), 1)
             ).astype(jnp.int32)
    # multiply in i32: Mosaic has no i8 vector multiply (arith.muli on
    # vector<i8> fails to legalize)
    pieces = [(maski * xq_col[:, mi:mi + 1].astype(jnp.int32)
               ).astype(jnp.int8) for mi in range(m)]
    return pieces[0] if m == 1 else jnp.concatenate(pieces, axis=1)


def _build_gx(xs_col, m: int):
    """xs_col [nb, m] f32 → Gx [nb*m, m] f32 with Gx[mi*nb+b, j] =
    xs[b, j]·1[j==mi]: one f32 dot against Gx applies the activation
    scales AND the per-block segment sum."""
    if m == 1:
        return xs_col
    nb = xs_col.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, m), 1)
    pieces = [xs_col * (lane == mi).astype(jnp.float32) for mi in range(m)]
    return jnp.concatenate(pieces, axis=0)


def _q8dot_tile(qrows, drows, X, gx, m: int):
    """One weight tile through the partial-sum dots.
    qrows [tn, k] s8, drows [tn, nb] f32, X [k, nb*m] s8,
    gx [nb*m, m] f32 → [tn, m] f32."""
    z = jax.lax.dot_general(qrows, X, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    dexp = drows if m == 1 else jnp.concatenate([drows] * m, axis=1)
    zd = z.astype(jnp.float32) * dexp
    return jax.lax.dot_general(zd, gx, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _q8dot_kernel(xq_ref, xs_ref, q_ref, d_ref, o_ref, *, m, nb):
    o_ref[:] = _q8dot_tile(q_ref[0], d_ref[0],
                           _build_x_diag(xq_ref[:], nb),
                           _build_gx(xs_ref[:], m), m)


def _q8dot_ref(x, qtn: QuantTensorN, idx):
    """jnp reference (CPU tests / non-TPU): same math, block partials in
    f32. x [m, k] → [m, n] f32."""
    q = jax.lax.dynamic_index_in_dim(qtn.q, idx, 0, keepdims=False) \
        if qtn.q.ndim == 3 else qtn.q
    d = jax.lax.dynamic_index_in_dim(qtn.d, idx, 0, keepdims=False) \
        if qtn.d.ndim == 3 else qtn.d
    m, k = x.shape
    n = q.shape[0]
    nb = k // BLOCK
    xq, xs = quantize_act_q8(x)
    z = jnp.einsum("mbt,nbt->mnb",
                   xq.reshape(m, nb, BLOCK).astype(jnp.float32),
                   q.reshape(n, nb, BLOCK).astype(jnp.float32))
    return jnp.einsum("mnb,nb,mb->mn", z, d, xs)


def q8dot_matmul(x: jnp.ndarray, w, tile_n: int = 0,
                 use_pallas: bool = None,
                 interpret: bool = False) -> jnp.ndarray:
    """x [m, k] × q8_0 weight (natural-k) → [m, n] f32 via int8 MXU dots.

    ``w``: QuantTensorN or IndexedQuant(QuantTensorN, static idx).
    Activations are quantized to q8_0 per 32-block first — the identical
    compute contract to llama.cpp's q8_0×q8_0 vec_dot (the reference's
    entire decode path). Intended for decode-sized m (≤ ~16): the
    block-diagonal expansion scales MXU work by nb, which is free only
    while the MXU is idle waiting on weight DMA.
    """
    if isinstance(w, IndexedQuant):
        qtn, idx = w.qt, w.idx
    else:
        qtn, idx = w, 0
    if use_pallas is None:
        use_pallas = _on_tpu()
    if not use_pallas:
        return _q8dot_ref(x, qtn, idx)
    if not isinstance(idx, int):
        raise NotImplementedError("q8dot_matmul: dynamic layer index "
                                  "unsupported (use the unrolled decode)")

    stacked = qtn.q.ndim == 3
    qs = qtn.q if stacked else qtn.q[None]
    ds = qtn.d if stacked else qtn.d[None]
    n, k = qs.shape[1], qs.shape[2]
    m = x.shape[0]
    nb = k // BLOCK
    tn = _pick_tile(n, k, tile_n)
    if tn == 0:
        return _q8dot_ref(x, qtn, idx)

    xq, xs = quantize_act_q8(x)
    xq_col, xs_col = xq.T, xs.T                      # [k, m], [nb, m]
    kern = functools.partial(_q8dot_kernel, m=m, nb=nb)
    cost = pl.CostEstimate(
        flops=2 * m * n * k * 1,                     # useful MACs
        bytes_accessed=n * k + n * nb * 4 + k * m + n * m * 4,
        transcendentals=0)
    _l = idx
    out_col = pl.pallas_call(
        kern,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((k, m), lambda i: (0, 0)),
            pl.BlockSpec((nb, m), lambda i: (0, 0)),
            pl.BlockSpec((1, tn, k), lambda i, _l=_l: (_l, i, 0)),
            pl.BlockSpec((1, tn, nb), lambda i, _l=_l: (_l, i, 0)),
        ],
        out_specs=pl.BlockSpec((tn, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(xq_col, xs_col, qs, ds)
    return out_col.T


# ---------------------------------------------------------------------------
# Megacall v3: the whole post-attention layer chain via int8 dots
# ---------------------------------------------------------------------------
#
# Combines the two measured wins: ONE Pallas call per layer (megacall v2)
# and zero per-element dequant work (the int8-dot path above). The
# residual stream flows COLUMN-major ([hidden, m]) so every chained
# matmul's output is directly the next one's activation — the int8-dot
# formulation produces [n_out, m] natively and needs no transposes.
# Activation re-quantization between matmuls happens in-kernel on
# sublane-blocked reshapes (q8_0 per-32 groups along the contraction
# dim, identical to ggml's quantize_row_q8_0).


def _rms_col(x, w_col, eps):
    """Column-layout rmsnorm: x [k, m] f32, w_col [k, 1]."""
    var = jnp.mean(x * x, axis=0, keepdims=True)          # [1, m]
    return x * jax.lax.rsqrt(var + eps) * w_col.astype(jnp.float32)


def _quant_cols(x):
    """In-kernel q8_0 activation quant, column layout:
    x [k, m] f32 → (xq [k, m] s8, xs [k//32, m] f32)."""
    k, m = x.shape
    xr = x.reshape(k // BLOCK, BLOCK, m)
    amax = jnp.max(jnp.abs(xr), axis=1)                   # [nb, m]
    d = amax / 127.0
    inv = jnp.where(d == 0, 0.0, 1.0 / d)
    q = _round_away(xr * inv[:, None, :]).astype(jnp.int8)
    return q.reshape(k, m), d


def _q8i_dot_col(qrows, drows, xq_col, xs_col):
    """Full int8-dot matmul, column in/out: weight [n, k] s8 + [n, nb]
    f32 scales × activation [k, m] s8 + [nb, m] f32 scales → [n, m] f32."""
    m = xq_col.shape[1]
    nb = xs_col.shape[0]
    return _q8dot_tile(qrows, drows, _build_x_diag(xq_col, nb),
                       _build_gx(xs_col, m), m)


def _q8i_layer_body(aq, as_, res, pw, nw, oq, od, gq, gd, dq, dd,
                    qq, qd_, o_ref, qkv_ref, eps):
    attn = _q8i_dot_col(oq, od, aq, as_)                  # [h, m]
    h1 = attn + res
    nh = _rms_col(h1, pw, eps)
    hq, hs = _quant_cols(nh)
    gu = _q8i_dot_col(gq, gd, hq, hs)                     # [2f, m]
    ffn = gu.shape[0] // 2
    act = jax.nn.silu(gu[:ffn]) * gu[ffn:]
    aq2, as2 = _quant_cols(act)
    out = _q8i_dot_col(dq, dd, aq2, as2) + h1             # [h, m]
    o_ref[:] = out
    if qkv_ref is not None:
        nh2 = _rms_col(out, nw, eps)
        q2, s2 = _quant_cols(nh2)
        qkv_ref[:] = _q8i_dot_col(qq, qd_, q2, s2)        # [nq, m]


def _q8i_layer_kernel(aq_ref, as_ref, res_ref, pw_ref, nw_ref, oq_ref,
                      od_ref, gq_ref, gd_ref, dq_ref, dd_ref, qq_ref,
                      qd_ref, o_ref, qkv_ref, *, eps):
    _q8i_layer_body(aq_ref[:], as_ref[:], res_ref[:], pw_ref[:], nw_ref[:],
                    oq_ref[0], od_ref[0], gq_ref[0], gd_ref[0], dq_ref[0],
                    dd_ref[0], qq_ref[0], qd_ref[0], o_ref, qkv_ref, eps)


def _q8i_layer_kernel_noqkv(aq_ref, as_ref, res_ref, pw_ref, oq_ref,
                            od_ref, gq_ref, gd_ref, dq_ref, dd_ref,
                            o_ref, *, eps):
    _q8i_layer_body(aq_ref[:], as_ref[:], res_ref[:], pw_ref[:], None,
                    oq_ref[0], od_ref[0], gq_ref[0], gd_ref[0], dq_ref[0],
                    dd_ref[0], None, None, o_ref, None, eps)


def _q8i_layer_ref(aq, as_, res, pw, nw, oq, oi, gq, gi, dq, di,
                   qq, qi, eps, with_qkv):
    """jnp reference for the v3 megacall (CPU tests / non-TPU): identical
    chain with einsum block partials."""
    def sl(qtn, idx):
        if qtn.q.ndim == 2:
            return qtn.q, qtn.d
        return (jax.lax.dynamic_index_in_dim(qtn.q, idx, 0, False),
                jax.lax.dynamic_index_in_dim(qtn.d, idx, 0, False))

    def dot(w, idx, xq, xs):
        q, d = sl(w, idx)
        n, k = q.shape
        nb = k // BLOCK
        m = xq.shape[1]
        z = jnp.einsum("nbt,btm->nbm",
                       q.reshape(n, nb, BLOCK).astype(jnp.float32),
                       xq.reshape(nb, BLOCK, m).astype(jnp.float32))
        return jnp.einsum("nbm,nb,bm->nm", z, d, xs)

    attn = dot(oq, oi, aq, as_)
    h1 = attn + res
    nh = _rms_col(h1, pw, eps)
    hq, hs = _quant_cols(nh)
    gu = dot(gq, gi, hq, hs)
    ffn = gu.shape[0] // 2
    act = jax.nn.silu(gu[:ffn]) * gu[ffn:]
    aq2, as2 = _quant_cols(act)
    out = dot(dq, di, aq2, as2) + h1
    if not with_qkv:
        return out, None
    nh2 = _rms_col(out, nw, eps)
    q2, s2 = _quant_cols(nh2)
    return out, dot(qq, qi, q2, s2)


def q8i_layer_fused(attn_q, attn_s, resid_col, post_w, next_in_w,
                    o_w, gu_w, down_w, next_qkv_w, eps: float,
                    with_qkv: bool = True, use_pallas: bool = None,
                    interpret: bool = False):
    """One transformer layer's post-attention half (+ optionally the next
    layer's input_ln + qkv) in a single Pallas call, all matmuls as
    s8×s8 MXU dots with scales on block partials.

    ``attn_q [qd, m] s8`` / ``attn_s [qd/32, m] f32``: the merged
    attention output, pre-quantized to q8_0 columns (XLA side,
    :func:`quantize_act_q8` + transpose); ``resid_col [h, m] f32``: the
    residual column; ``post_w``/``next_in_w [h]``: natural (unpermuted)
    rmsnorm weights. Weights are QuantTensorN / IndexedQuant(QuantTensorN,
    static idx). Returns ``(out_col [h, m] f32, qkv_col [nq, m] f32 |
    None)``.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()

    (oq, oi), (gq, gi), (dq, di) = (
        _split_indexed(o_w, QuantTensorN),
        _split_indexed(gu_w, QuantTensorN),
        _split_indexed(down_w, QuantTensorN))
    qq, qi = (_split_indexed(next_qkv_w, QuantTensorN)
              if next_qkv_w is not None else (None, 0))
    qd, m = attn_q.shape
    h = oq.q.shape[1]
    f2 = gq.q.shape[1]
    ffn = dq.q.shape[2]
    pw = post_w.reshape(h, 1)
    if not use_pallas:
        return _q8i_layer_ref(
            attn_q, attn_s, resid_col, pw,
            next_in_w.reshape(h, 1) if with_qkv else None,
            oq, oi, gq, gi, dq, di, qq, qi, eps, with_qkv)
    if not all(isinstance(i, int) for i in (oi, gi, di, qi)):
        raise NotImplementedError("q8i_layer_fused: dynamic layer index "
                                  "unsupported (use the unrolled decode)")

    wbytes = h * qd + f2 * h + h * ffn + (qq.q.shape[1] * h if with_qkv
                                          else 0)
    cost = pl.CostEstimate(
        flops=2 * m * wbytes,
        bytes_accessed=wbytes + (wbytes // BLOCK) * 4
        + m * (qd + 2 * h) * 4,
        transcendentals=m * ffn)
    _o, _g, _d, _q = oi, gi, di, qi
    in_specs = [
        pl.BlockSpec((qd, m), lambda i: (0, 0)),
        pl.BlockSpec((qd // BLOCK, m), lambda i: (0, 0)),
        pl.BlockSpec((h, m), lambda i: (0, 0)),
        pl.BlockSpec((h, 1), lambda i: (0, 0)),
    ]
    w_specs = [
        pl.BlockSpec((1, h, qd), lambda i, _l=_o: (_l, 0, 0)),
        pl.BlockSpec((1, h, qd // BLOCK), lambda i, _l=_o: (_l, 0, 0)),
        pl.BlockSpec((1, f2, h), lambda i, _l=_g: (_l, 0, 0)),
        pl.BlockSpec((1, f2, h // BLOCK), lambda i, _l=_g: (_l, 0, 0)),
        pl.BlockSpec((1, h, ffn), lambda i, _l=_d: (_l, 0, 0)),
        pl.BlockSpec((1, h, ffn // BLOCK), lambda i, _l=_d: (_l, 0, 0)),
    ]
    if with_qkv:
        nq = qq.q.shape[1]
        nw = next_in_w.reshape(h, 1)
        return pl.pallas_call(
            functools.partial(_q8i_layer_kernel, eps=eps),
            grid=(1,),
            in_specs=in_specs
            + [pl.BlockSpec((h, 1), lambda i: (0, 0))]
            + w_specs
            + [pl.BlockSpec((1, nq, h), lambda i, _l=_q: (_l, 0, 0)),
               pl.BlockSpec((1, nq, h // BLOCK),
                            lambda i, _l=_q: (_l, 0, 0))],
            out_specs=[pl.BlockSpec((h, m), lambda i: (0, 0)),
                       pl.BlockSpec((nq, m), lambda i: (0, 0))],
            out_shape=(jax.ShapeDtypeStruct((h, m), jnp.float32),
                       jax.ShapeDtypeStruct((nq, m), jnp.float32)),
            cost_estimate=cost,
            interpret=interpret,
        )(attn_q, attn_s, resid_col, pw, nw, oq.q, oq.d, gq.q, gq.d,
          dq.q, dq.d, qq.q, qq.d)
    out = pl.pallas_call(
        functools.partial(_q8i_layer_kernel_noqkv, eps=eps),
        grid=(1,),
        in_specs=in_specs + w_specs,
        out_specs=pl.BlockSpec((h, m), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, m), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(attn_q, attn_s, resid_col, pw, oq.q, oq.d, gq.q, gq.d, dq.q, dq.d)
    return out, None


import functools as _functools


@_functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import os
    if os.environ.get("FUNASR_Q8_PALLAS") == "0":   # debug/bench knob:
        return False                                # force XLA dequant-dot
    return jax.default_backend() in ("tpu", "axon")


def matmul_any(x: jnp.ndarray,
               w: Union[jnp.ndarray, QuantTensor, IndexedQuant, "BlockQuant"],
               use_pallas: bool = None,
               x_preblocked: bool = False) -> jnp.ndarray:
    """Dispatch: dense ``x @ w``, quantized kernel, or layer-indexed
    quantized kernel. Keeps callers (qwen3 _proj) agnostic of the weight
    storage format. Supports leading batch dims on x by flattening. The
    Pallas path engages only on TPU backends unless forced.
    ``x_preblocked`` declares x already block-permuted (quantized paths
    only)."""
    if isinstance(w, BlockQuant):
        lead = x.shape[:-1]
        out = blockquant_matmul(x.reshape(-1, x.shape[-1]), w)
        return out.reshape(*lead, out.shape[-1])
    if isinstance(w, QuantTensorN) or (
            isinstance(w, IndexedQuant) and isinstance(w.qt, QuantTensorN)):
        qtn, idx = (w.qt, w.idx) if isinstance(w, IndexedQuant) else (w, 0)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if use_pallas is None:
            use_pallas = _on_tpu()
        if isinstance(idx, int) and x2.shape[0] <= 16:
            out = q8dot_matmul(x2, IndexedQuant(qtn, idx),
                               use_pallas=use_pallas)
        else:
            # prefill-sized m or a traced (scan) layer index: per-element
            # dequant amortizes / no static index_map available
            q = qtn.q if qtn.q.ndim == 2 else \
                jax.lax.dynamic_index_in_dim(qtn.q, idx, 0, keepdims=False)
            d = qtn.d if qtn.d.ndim == 2 else \
                jax.lax.dynamic_index_in_dim(qtn.d, idx, 0, keepdims=False)
            deq = dequantize_weight_n(QuantTensorN(q=q, d=d))
            out = jnp.dot(x2.astype(jnp.bfloat16), deq.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return out.reshape(*lead, out.shape[-1])
    if isinstance(w, (QuantTensor, IndexedQuant)):
        if use_pallas is None:
            use_pallas = _on_tpu()
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if isinstance(w, IndexedQuant):
            out = quant_matmul_indexed(x2, w.qt, w.idx,
                                       use_pallas=use_pallas,
                                       x_preblocked=x_preblocked)
        else:
            out = quant_matmul(x2, w, use_pallas=use_pallas,
                               x_preblocked=x_preblocked)
        return out.reshape(*lead, out.shape[-1])
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# All-layers decode megakernel: the WHOLE q8_0 decode step in one call
# ---------------------------------------------------------------------------
#
# The per-layer megacall chain still pays two structural costs the staged
# grid can't remove (measured, experiments/q8_probe.py): ~5 us/layer of
# pallas_call boundary, and the XLA attention ops between calls
# serializing against the next call's weight DMA. Folding ATTENTION INTO
# the kernel removes both: ONE pallas_call walks all 28 layers — per layer
# [qkv row-chunks][attention S-chunks][o k-chunks][gate_up][down] — then
# streams the fused lm_head's vocab chunks, so the whole step's weight +
# KV traffic rides a single pipelined grid (pure-stream ceiling measured
# 644 GB/s, experiments/q8_bw_probe.py).
#
# Attention runs in natural head order (GQA per-kv-head 2-row q slices,
# online softmax over cache chunks, the current token's k/v as the
# always-visible init term — validated against XLA in
# experiments/q8_mega_probes.py P12); the merged output enters perm space
# in-kernel via the (64,32)->(32,64) transpose (= block_permute for
# k=2048). The KV cache is HEAD-MAJOR [L, KH, S, D] so per-head chunk
# slices are contiguous; the kernel RETURNS the new per-layer k/v rows
# and the caller scatters them at `slot` (no in-kernel HBM writes).

def q8_mega_cs(s_len: int) -> int:
    """Cache chunk length: largest 128-multiple divisor of S up to 512.
    0 when S admits none (caller falls back / repads)."""
    for cs in (512, 384, 256, 128):
        if s_len % cs == 0:
            return cs
    return 0


def _q8_decode_all_kernel(
        x0_ref, nhb0_ref, post_ref, nnext_ref, qn_ref, kn_ref,
        cos_ref, sin_ref, bias_ref, k_ref, v_ref,
        qq_ref, qd_ref, oq_ref, od_ref, e_ref, gq_ref, gd_ref, dq_ref,
        dd_ref, hq_ref, hd_ref,
        logits_ref, ks_ref, vs_ref,
        qkv_s, xm_s, res_s, h1_s, nhb_s, acc_s, gu_s, act_s,
        q_s, m_s, l_s, aat_s,
        *, eps, plan, dims):
    ko, ng, kd, nqc, nhc, A = plan
    qd, h, f2, ffn, nq, kh, qh, hd_dim, cs = dims
    spl = nqc + A + ko + ng + kd
    s = pl.program_id(0)
    total_layer_steps = pl.num_programs(0) - nhc
    sF = jnp.minimum(s, total_layer_steps - 1)
    st = jax.lax.rem(sF, spl)
    cko, cng, ckd = qd // ko, f2 // ng, ffn // kd
    cnq = nq // nqc
    f = f2 // 2
    scale = hd_dim ** -0.5
    group = qh // kh

    @pl.when(s == 0)
    def _():
        res_s[:] = x0_ref[:]
        nhb_s[:] = nhb0_ref[:]

    # ---- qkv row-chunks (this layer's projection, from nhb);
    # statically unrolled so the scratch store is a static lane slice
    # (a traced pl.ds offset store hits Mosaic's slow unaligned path) ----
    for c in range(nqc):
        @pl.when((st == c) & (s < total_layer_steps))
        def _(c=c):
            dexp = jnp.concatenate(
                [qd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
            deq = qq_ref[0].astype(jnp.bfloat16) * dexp
            part = jax.lax.dot_general(
                nhb_s[:], deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [1, cnq]
            qkv_s[:, c * cnq:(c + 1) * cnq] = part

    # ---- attention S-chunks ----
    for c in range(A):
        @pl.when((st == nqc + c) & (s < total_layer_steps))
        def _(c=c):
            if c == 0:
                # split heads, qk-norm, rope, current-token init
                qkv = qkv_s[:]
                q = qkv[:, :qd].reshape(qh, hd_dim)
                k_cur = qkv[:, qd:qd + kh * hd_dim].reshape(kh, hd_dim)
                v_cur = qkv[:, qd + kh * hd_dim:].reshape(kh, hd_dim)
                qvar = jnp.mean(q * q, axis=-1, keepdims=True)
                q = (q * jax.lax.rsqrt(qvar + eps)
                     ) * qn_ref[0].astype(jnp.float32)
                kvar = jnp.mean(k_cur * k_cur, axis=-1, keepdims=True)
                k_cur = (k_cur * jax.lax.rsqrt(kvar + eps)
                         ) * kn_ref[0].astype(jnp.float32)
                half = hd_dim // 2
                cosr = cos_ref[:]
                sinr = sin_ref[:]

                def rope(x):
                    rot = jnp.concatenate([-x[:, half:], x[:, :half]],
                                          axis=1)
                    return x * cosr + rot * sinr

                q = rope(q)
                k_cur = rope(k_cur)
                q_s[:] = q
                ks_ref[0] = k_cur.astype(ks_ref.dtype)
                vs_ref[0] = v_cur.astype(vs_ref.dtype)
                for hh in range(kh):
                    qhh = q[2 * hh:2 * hh + 2, :]
                    s_cur = jnp.sum(
                        qhh * k_cur[hh:hh + 1, :], axis=1,
                        keepdims=True) * scale
                    m_s[2 * hh:2 * hh + 2, :] = jnp.broadcast_to(
                        s_cur, (group, hd_dim))
                    l_s[2 * hh:2 * hh + 2, :] = jnp.ones(
                        (group, hd_dim), jnp.float32)
                    aat_s[2 * hh:2 * hh + 2, :] = jnp.broadcast_to(
                        v_cur[hh:hh + 1, :], (group, hd_dim))

            # dots run on bf16 operands with f32 accumulation (an f32
            # MXU dot runs at a fraction of the bf16 rate; the cache is
            # bf16 anyway, and XLA's attention computes scores from
            # bf16 k with f32 accum too)
            q = q_s[:].astype(jnp.bfloat16)
            for hh in range(kh):
                qhh = q[2 * hh:2 * hh + 2, :]
                khh = k_ref[0, hh]                       # [CS, D] bf16
                vhh = v_ref[0, hh]
                sc = jax.lax.dot_general(
                    qhh, khh.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                sc = sc + bias_ref[:]
                m_prev = m_s[2 * hh:2 * hh + 2, 0:1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sc, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(sc - m_new)
                l_new = (l_s[2 * hh:2 * hh + 2, 0:1] * alpha
                         + jnp.sum(p, axis=1, keepdims=True))
                aat_s[2 * hh:2 * hh + 2, :] = (
                    aat_s[2 * hh:2 * hh + 2, :] * alpha
                    + jax.lax.dot_general(
                        p.astype(jnp.bfloat16), vhh.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                m_s[2 * hh:2 * hh + 2, :] = jnp.broadcast_to(
                    m_new, (group, hd_dim))
                l_s[2 * hh:2 * hh + 2, :] = jnp.broadcast_to(
                    l_new, (group, hd_dim))

            if c == A - 1:
                # merged heads stay in NATURAL lane order ([QH,D] →
                # [1, qd] is a supported flatten; the perm-space cast
                # [QH,D]→[qd/32,32] is a lane-shrinking shape cast
                # Mosaic rejects on hardware) — the o-stage consumes
                # natural-k weights with an E-matmul scale expansion
                out = aat_s[:] / l_s[:]                  # [QH, D]
                xm_s[:] = out.reshape(1, qd).astype(jnp.bfloat16)

    # ---- o k-chunks (NATURAL k order; scale expansion lane j ↦
    # d[j // 32] is interleave-shaped, which lane concat can't build —
    # an MXU dot against the constant 0/1 expansion matrix E can) ----
    nbo = cko // BLOCK
    for c in range(ko):
        @pl.when((st == nqc + A + c) & (s < total_layer_steps))
        def _(c=c):
            d_chunk = od_ref[0][:, c * nbo:(c + 1) * nbo]
            dexp = jax.lax.dot_general(
                d_chunk.astype(jnp.bfloat16), e_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [h, cko]
            deq = oq_ref[0].astype(jnp.bfloat16) * dexp.astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                xm_s[:, c * cko:(c + 1) * cko], deq,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if c == 0:
                acc_s[:] = part
            else:
                acc_s[:] += part
            if c == ko - 1:
                h1 = acc_s[:] + res_s[:]
                var = jnp.mean(h1 * h1, axis=-1, keepdims=True)
                nh = (h1 * jax.lax.rsqrt(var + eps)
                      ) * post_ref[0].astype(jnp.float32)
                h1_s[:] = h1
                nhb_s[:] = nh.astype(jnp.bfloat16)

    # ---- gate_up row-chunks ----
    for c in range(ng):
        @pl.when((st == nqc + A + ko + c) & (s < total_layer_steps))
        def _(c=c):
            dexp = jnp.concatenate(
                [gd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
            deq = gq_ref[0].astype(jnp.bfloat16) * dexp
            gu_s[:, c * cng:(c + 1) * cng] = jax.lax.dot_general(
                nhb_s[:], deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if c == ng - 1:
                gu = gu_s[:]
                act_s[:] = (jax.nn.silu(gu[:, :f]) * gu[:, f:]
                            ).astype(jnp.bfloat16)

    # ---- down k-chunks (+ next layer's input norm / final norm) ----
    for c in range(kd):
        @pl.when((st == nqc + A + ko + ng + c) & (s < total_layer_steps))
        def _(c=c):
            part = _deq_chunk_dot(act_s[:, c * ckd:(c + 1) * ckd],
                                  dq_ref[0], dd_ref[0])
            if c == 0:
                acc_s[:] = part
            else:
                acc_s[:] += part
            if c == kd - 1:
                x_new = acc_s[:] + h1_s[:]
                res_s[:] = x_new
                var = jnp.mean(x_new * x_new, axis=-1, keepdims=True)
                nh = (x_new * jax.lax.rsqrt(var + eps)
                      ) * nnext_ref[0].astype(jnp.float32)
                nhb_s[:] = nh.astype(jnp.bfloat16)

    # ---- lm_head vocab chunks (after all layers; nhb = final norm) ----
    @pl.when(s >= total_layer_steps)
    def _():
        dexp = jnp.concatenate(
            [hd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
        deq = hq_ref[0].astype(jnp.bfloat16) * dexp
        logits_ref[:] = jax.lax.dot_general(
            nhb_s[:], deq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def q8_decode_all_fused(x0_perm, nhb0, post_lns, norms_next, q_norms,
                        k_norms, cos, sin, bias_row, kv_k, kv_v,
                        qkv_w: QuantTensor, o_w: QuantTensor,
                        gu_w: QuantTensor, down_w: QuantTensor,
                        head_w: QuantTensor, eps: float,
                        interpret: bool = None):
    """One full q8_0 decode step (all layers + attention + lm_head) in a
    single staged Pallas call.

    x0_perm [1, H] f32 (embed, perm space); nhb0 [1, H] bf16
    (= input_ln_0(x0), perm); post_lns/norms_next [L, H] perm
    (norms_next[l] = input_ln_{l+1}, last = final_ln); q_norms/k_norms
    [L, D]; cos/sin [1, D] f32 for THIS position; bias_row [1, S] f32
    (0 where cache slot visible: valid_from <= j < slot); kv_k/kv_v
    [L, KH, S, D] head-major cache (bf16/f32); weights: stacked perm-space
    QuantTensors (the fuse_qwen3_params_q8 convention), head_w the
    quantize_lm_head QuantTensor [VP, H].

    Returns (logits [1, VP] f32, k_new [L, KH, D], v_new [L, KH, D]) —
    the caller scatters k_new/v_new into the cache at `slot`, or None
    when the shapes don't admit the staged plan (caller falls back to
    the per-layer megacall path).
    """
    if interpret is None:
        interpret = not _on_tpu()     # CPU tests run the interpreter
    L, nq, h = qkv_w.q.shape
    # o_w contracts the attention output in NATURAL lane order (the
    # other stages keep the block-transposed convention): undo the
    # storage permutation here — a trace-time relabel of the int8 bytes
    o_q_nat = block_unpermute(o_w.q)
    qd = o_w.q.shape[-1]
    f2 = gu_w.q.shape[-2]
    ffn = down_w.q.shape[-1]
    vp = head_w.q.shape[-2]
    kh, s_len, hd_dim = kv_k.shape[1], kv_k.shape[2], kv_k.shape[3]
    qh = qd // hd_dim
    if qh // kh != 2:
        return None                     # per-head loop is written for GQA 2
    cs = q8_mega_cs(s_len)
    if not cs:
        return None
    A = s_len // cs
    plan_l = _mega_stage_plan(1, qd, h, f2, ffn, nq)
    plan_h = _mega_stage_plan(1, qd, h, f2, ffn, vp)
    if plan_l is None or plan_h is None or plan_h[3] == 0:
        return None
    ko, ng, kd, nqc = plan_l
    nhc = plan_h[3]
    if (vp // nhc) * h > 4 << 20:
        return None
    cnq, cnv = nq // nqc, vp // nhc
    spl = nqc + A + ko + ng + kd
    total = L * spl + nhc
    cko, cng, ckd = qd // ko, f2 // ng, ffn // kd

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    def lay(s):
        return jnp.minimum(s, L * spl - 1) // spl

    def stg(s):
        sF = jnp.minimum(s, L * spl - 1)
        return sF - (sF // spl) * spl

    in_specs = [
        pl.BlockSpec((1, h), lambda s: (0, 0)),                  # x0
        pl.BlockSpec((1, h), lambda s: (0, 0)),                  # nhb0
        pl.BlockSpec((1, 1, h), lambda s: (lay(s), 0, 0)),       # post_ln
        pl.BlockSpec((1, 1, h), lambda s: (lay(s), 0, 0)),       # norms_next
        pl.BlockSpec((1, 1, hd_dim), lambda s: (lay(s), 0, 0)),  # q_norm
        pl.BlockSpec((1, 1, hd_dim), lambda s: (lay(s), 0, 0)),  # k_norm
        pl.BlockSpec((1, hd_dim), lambda s: (0, 0)),             # cos
        pl.BlockSpec((1, hd_dim), lambda s: (0, 0)),             # sin
        pl.BlockSpec((1, cs),
                     lambda s: (0, clamp(stg(s) - nqc, 0, A - 1))),
        pl.BlockSpec((1, kh, cs, hd_dim),
                     lambda s: (lay(s), 0,
                                clamp(stg(s) - nqc, 0, A - 1), 0)),
        pl.BlockSpec((1, kh, cs, hd_dim),
                     lambda s: (lay(s), 0,
                                clamp(stg(s) - nqc, 0, A - 1), 0)),
        pl.BlockSpec((1, cnq, h),
                     lambda s: (lay(s), clamp(stg(s), 0, nqc - 1), 0)),
        pl.BlockSpec((1, cnq, h // BLOCK),
                     lambda s: (lay(s), clamp(stg(s), 0, nqc - 1), 0)),
        pl.BlockSpec((1, h, cko),
                     lambda s: (lay(s), 0,
                                clamp(stg(s) - nqc - A, 0, ko - 1))),
        # full scale row per layer (a 32-lane chunked block violates the
        # 128-lane block rule); the kernel slices the chunk in-register
        pl.BlockSpec((1, h, qd // BLOCK), lambda s: (lay(s), 0, 0)),
        pl.BlockSpec((cko // BLOCK, cko), lambda s: (0, 0)),     # E
        pl.BlockSpec((1, cng, h),
                     lambda s: (lay(s),
                                clamp(stg(s) - nqc - A - ko, 0, ng - 1),
                                0)),
        pl.BlockSpec((1, cng, h // BLOCK),
                     lambda s: (lay(s),
                                clamp(stg(s) - nqc - A - ko, 0, ng - 1),
                                0)),
        pl.BlockSpec((1, h, ckd),
                     lambda s: (lay(s), 0,
                                clamp(stg(s) - nqc - A - ko - ng, 0,
                                      kd - 1))),
        pl.BlockSpec((1, h, ffn // BLOCK), lambda s: (lay(s), 0, 0)),
        pl.BlockSpec((1, cnv, h),
                     lambda s: (0, clamp(s - L * spl, 0, nhc - 1), 0)),
        pl.BlockSpec((1, cnv, h // BLOCK),
                     lambda s: (0, clamp(s - L * spl, 0, nhc - 1), 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, cnv),
                     lambda s: (0, clamp(s - L * spl, 0, nhc - 1))),
        pl.BlockSpec((1, kh, hd_dim), lambda s: (lay(s), 0, 0)),
        pl.BlockSpec((1, kh, hd_dim), lambda s: (lay(s), 0, 0)),
    ]
    out_shape = (jax.ShapeDtypeStruct((1, vp), jnp.float32),
                 jax.ShapeDtypeStruct((L, kh, hd_dim), jnp.float32),
                 jax.ShapeDtypeStruct((L, kh, hd_dim), jnp.float32))
    scratch = [
        pltpu.VMEM((1, nq), jnp.float32),     # qkv_s
        pltpu.VMEM((1, qd), jnp.bfloat16),    # xm_s (perm merged)
        pltpu.VMEM((1, h), jnp.float32),      # res_s
        pltpu.VMEM((1, h), jnp.float32),      # h1_s
        pltpu.VMEM((1, h), jnp.bfloat16),     # nhb_s
        pltpu.VMEM((1, h), jnp.float32),      # acc_s
        pltpu.VMEM((1, f2), jnp.float32),     # gu_s
        pltpu.VMEM((1, ffn), jnp.bfloat16),   # act_s
        pltpu.VMEM((qh, hd_dim), jnp.float32),    # q_s
        pltpu.VMEM((qh, hd_dim), jnp.float32),    # m_s
        pltpu.VMEM((qh, hd_dim), jnp.float32),    # l_s
        pltpu.VMEM((qh, hd_dim), jnp.float32),    # aat_s
    ]
    kern = functools.partial(
        _q8_decode_all_kernel, eps=eps,
        plan=(ko, ng, kd, nqc, nhc, A),
        dims=(qd, h, f2, ffn, nq, kh, qh, hd_dim, cs))
    wbytes = (nq * h + h * qd + f2 * h + h * ffn) * L + vp * h
    cost = pl.CostEstimate(
        flops=2 * (wbytes + L * 2 * s_len * kh * hd_dim),
        bytes_accessed=wbytes + wbytes // BLOCK * 4
        + L * 2 * s_len * kh * hd_dim * 2,
        transcendentals=L * (ffn + 2 * s_len))
    call = pl.pallas_call(
        kern,
        grid=(total,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
    )
    nbo = cko // BLOCK
    e_mat = (jax.lax.broadcasted_iota(jnp.int32, (nbo, cko), 1) // BLOCK
             == jax.lax.broadcasted_iota(jnp.int32, (nbo, cko), 0)
             ).astype(jnp.bfloat16)
    return call(x0_perm, nhb0, post_lns[:, None], norms_next[:, None],
                q_norms[:, None], k_norms[:, None], cos, sin,
                bias_row, kv_k, kv_v, qkv_w.q, qkv_w.d, o_q_nat, o_w.d,
                e_mat, gu_w.q, gu_w.d, down_w.q, down_w.d,
                head_w.q[None], head_w.d[None])

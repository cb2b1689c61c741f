"""Numpy q8_0 quantization, bit-compatible with ggml's Q8_0 layout.

Layout facts (independently implemented from the GGUF format spec; parity
target is the reference's dequant at ``fun_asr_gguf/llama.py:779-784`` and
quant at ``fun_asr_gguf/gguf/quants.py:378-403``):

* block size 32 values -> 34 bytes: 2-byte fp16 scale ``d`` then 32 int8
  quants; ``d = absmax/127``; ``q = round_half_away(x/d)``.

The split representation (int8 values + fp16 scales as separate arrays) is
what the TPU path consumes: int8 tiles feed Pallas dequant-matmuls, scales
ride along in a second operand.
"""

import numpy as np

Q8_0_BLOCK = 32
Q8_0_BLOCK_BYTES = 34


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """C roundf semantics (ties away from zero), unlike np.round's ties-to-even."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def q8_0_quantize(x: np.ndarray):
    """Quantize along the last axis.

    Args:
        x: float array [..., K] with K % 32 == 0.
    Returns:
        (q int8 [..., K], d float16 [..., K//32])
    """
    x = np.asarray(x, dtype=np.float32)
    k = x.shape[-1]
    if k % Q8_0_BLOCK != 0:
        raise ValueError(f"last dim {k} not a multiple of {Q8_0_BLOCK}")
    blocks = x.reshape(*x.shape[:-1], k // Q8_0_BLOCK, Q8_0_BLOCK)
    d = np.abs(blocks).max(axis=-1, keepdims=True) / 127.0
    # ggml stores d as fp16; quantize against the fp16-rounded scale so that
    # dequantization with the stored scale is exact.
    d16 = d.astype(np.float16)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d16 == 0, 0.0, 1.0 / d16.astype(np.float32))
    q = _round_half_away(blocks * inv)
    q = np.clip(q, -127, 127).astype(np.int8)
    return q.reshape(x.shape), d16.squeeze(-1)


def q8_0_dequantize(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Inverse of :func:`q8_0_quantize`. Returns float32 [..., K]."""
    k = q.shape[-1]
    blocks = q.reshape(*q.shape[:-1], k // Q8_0_BLOCK, Q8_0_BLOCK).astype(np.float32)
    out = blocks * d[..., None].astype(np.float32)
    return out.reshape(q.shape)


def q8_0_to_blocks(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Pack (q, d) into the ggml on-disk byte stream (uint8 [n_blocks*34])."""
    k = q.shape[-1]
    nb = int(np.prod(q.shape[:-1], dtype=np.int64)) * (k // Q8_0_BLOCK)
    qb = q.reshape(nb, Q8_0_BLOCK).view(np.uint8)
    db = d.reshape(nb, 1).view(np.uint8)
    return np.concatenate([db, qb], axis=1).reshape(-1)


def q8_0_from_blocks(raw: np.ndarray, shape) -> tuple:
    """Unpack a ggml q8_0 byte stream into (q int8 [shape], d fp16 [..., K//32])."""
    raw = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    nb = raw.size // Q8_0_BLOCK_BYTES
    blocks = raw[: nb * Q8_0_BLOCK_BYTES].reshape(nb, Q8_0_BLOCK_BYTES)
    d = blocks[:, :2].copy().view(np.float16).reshape(nb)
    q = blocks[:, 2:].copy().view(np.int8)
    shape = tuple(int(s) for s in shape)
    k = shape[-1]
    q = q.reshape(*shape[:-1], k)
    d = d.reshape(*shape[:-1], k // Q8_0_BLOCK)
    return q, d


def q8_0_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Dequantize a ggml q8_0 byte stream straight to float32 [shape]."""
    q, d = q8_0_from_blocks(raw, shape)
    return q8_0_dequantize(q, d)


# ---------------------------------------------------------------------------
# Legacy 4/5-bit formats (read-side support for arbitrary llama.cpp GGUFs)
# ---------------------------------------------------------------------------
# Block layouts per the GGUF/ggml spec; all blocks cover 32 values, low
# nibbles hold elements 0..15 and high nibbles 16..31.

def _blocks(raw: np.ndarray, block_bytes: int) -> np.ndarray:
    raw = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    nb = raw.size // block_bytes
    return raw[: nb * block_bytes].reshape(nb, block_bytes)


def _nibbles(qbytes: np.ndarray) -> np.ndarray:
    """[nb, 16] packed bytes -> [nb, 32] int nibble values (0..15)."""
    lo = qbytes & 0x0F
    hi = qbytes >> 4
    return np.concatenate([lo, hi], axis=1).astype(np.int32)


def _high_bits(qh: np.ndarray) -> np.ndarray:
    """[nb] uint32 -> [nb, 32] single-bit values."""
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh[:, None] >> shifts[None, :]) & 1).astype(np.int32)


def q4_0_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q4_0: 18-byte block = f16 d + 16 packed nibbles; v = (q - 8) * d."""
    b = _blocks(raw, 18)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    q = _nibbles(b[:, 2:]) - 8
    return (q * d).astype(np.float32).reshape(shape)


def q4_1_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q4_1: 20-byte block = f16 d + f16 m + 16 nibbles; v = q*d + m."""
    b = _blocks(raw, 20)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    q = _nibbles(b[:, 4:])
    return (q * d + m).astype(np.float32).reshape(shape)


def q5_0_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q5_0: 22-byte block = f16 d + u32 qh + 16 nibbles;
    v = ((q | (hb << 4)) - 16) * d."""
    b = _blocks(raw, 22)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    qh = b[:, 2:6].copy().view(np.uint32).reshape(-1)
    q = _nibbles(b[:, 6:]) | (_high_bits(qh) << 4)
    return ((q - 16) * d).astype(np.float32).reshape(shape)


def q5_1_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q5_1: 24-byte block = f16 d + f16 m + u32 qh + 16 nibbles;
    v = (q | (hb << 4)) * d + m."""
    b = _blocks(raw, 24)
    d = b[:, :2].copy().view(np.float16).astype(np.float32)
    m = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    qh = b[:, 4:8].copy().view(np.uint32).reshape(-1)
    q = _nibbles(b[:, 8:]) | (_high_bits(qh) << 4)
    return (q * d + m).astype(np.float32).reshape(shape)


def q4_0_quantize(x: np.ndarray):
    """Quantize to the q4_0 byte stream (ggml scaling: d = signed-absmax/-8).

    Returns the packed uint8 stream; mainly for tests/export completeness.
    """
    x = np.asarray(x, dtype=np.float32).reshape(-1, Q8_0_BLOCK)
    idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = (maxv / -8.0).astype(np.float16)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d.astype(np.float32))
    q = np.clip(_round_half_away(x * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return np.concatenate([d[:, None].view(np.uint8), packed],
                          axis=1).reshape(-1)

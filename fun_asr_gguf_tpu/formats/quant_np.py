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
    # ggml quantizes against the UNROUNDED f32 scale and only then stores d
    # as fp16 (quantize_row_q8_0_ref); matching that keeps our bytes
    # bit-identical to ggml/gguf-py for every input.
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d)
    q = _round_half_away(blocks * inv)
    q = np.clip(q, -127, 127).astype(np.int8)
    return q.reshape(x.shape), d.astype(np.float16).squeeze(-1)


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


def _signed_absmax(x: np.ndarray) -> np.ndarray:
    """Per-row value with the largest magnitude, sign preserved ([nb, 1])."""
    idx = np.argmax(np.abs(x), axis=1)
    return x[np.arange(x.shape[0]), idx][:, None]


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """[nb, 32] values (low 4 bits used) → [nb, 16] packed bytes."""
    return ((q[:, :16] & 0x0F) | (q[:, 16:] << 4)).astype(np.uint8)


def _pack_high_bits(q: np.ndarray) -> np.ndarray:
    """[nb, 32] 5-bit values → [nb, 4] bytes of bit-4s (little-endian)."""
    bits = ((q >> 4) & 1).astype(np.uint8)
    shifts = np.arange(32, dtype=np.uint32) % 8
    packed = (bits.astype(np.uint32) << shifts[None, :]).reshape(-1, 4, 8)
    return packed.sum(axis=-1).astype(np.uint8)


def _f16_bytes(v: np.ndarray) -> np.ndarray:
    return v.astype(np.float16).view(np.uint8).reshape(-1, 2)


def q4_0_quantize(x: np.ndarray) -> np.ndarray:
    """Quantize to the q4_0 byte stream, bit-exact with ggml.

    d = signed-absmax / -8; q = trunc(x/d + 8.5) clipped to [0, 15]
    (ggml's quantize_row_q4_0_ref rounding), quantized against the
    unrounded f32 scale.
    """
    x = np.asarray(x, dtype=np.float32).reshape(-1, Q8_0_BLOCK)
    d = _signed_absmax(x) / -8.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d)
    q = np.clip(np.trunc(x * inv + np.float32(8.5)), 0, 15).astype(np.uint8)
    return np.concatenate([_f16_bytes(d), _pack_nibbles(q)],
                          axis=1).reshape(-1)


def q4_1_quantize(x: np.ndarray) -> np.ndarray:
    """q4_1 byte stream: d = (max-min)/15, m = min; q = trunc((x-m)/d + .5)."""
    x = np.asarray(x, dtype=np.float32).reshape(-1, Q8_0_BLOCK)
    mx = x.max(axis=1, keepdims=True)
    mn = x.min(axis=1, keepdims=True)
    d = (mx - mn) / 15.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d)
    q = np.clip(np.trunc((x - mn) * inv + np.float32(0.5)), 0,
                15).astype(np.uint8)
    return np.concatenate([_f16_bytes(d), _f16_bytes(mn), _pack_nibbles(q)],
                          axis=1).reshape(-1)


def q5_0_quantize(x: np.ndarray) -> np.ndarray:
    """q5_0 byte stream: d = signed-absmax / -16; 5-bit values, bit 4 in qh."""
    x = np.asarray(x, dtype=np.float32).reshape(-1, Q8_0_BLOCK)
    d = _signed_absmax(x) / -16.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d)
    q = np.clip(np.trunc(x * inv + np.float32(16.5)), 0, 31).astype(np.uint8)
    return np.concatenate(
        [_f16_bytes(d), _pack_high_bits(q), _pack_nibbles(q)],
        axis=1).reshape(-1)


def q5_1_quantize(x: np.ndarray) -> np.ndarray:
    """q5_1 byte stream: d = (max-min)/31, m = min; bit 4 in qh."""
    x = np.asarray(x, dtype=np.float32).reshape(-1, Q8_0_BLOCK)
    mx = x.max(axis=1, keepdims=True)
    mn = x.min(axis=1, keepdims=True)
    d = (mx - mn) / 31.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d == 0, 0.0, 1.0 / d)
    q = np.clip(np.trunc((x - mn) * inv + np.float32(0.5)), 0,
                31).astype(np.uint8)
    return np.concatenate(
        [_f16_bytes(d), _f16_bytes(mn), _pack_high_bits(q),
         _pack_nibbles(q)], axis=1).reshape(-1)


# ---------------------------------------------------------------------------
# K-quants (256-value superblocks) — read support for llama.cpp exports like
# q4_K_M, the most common GGUF quantization in the wild. Layouts per the
# GGUF/ggml spec; parity target is the reference's vendored
# ``gguf/quants.py:404-572`` (tested bit-exactly in test_gguf_interop.py).
# ---------------------------------------------------------------------------

QK_K = 256


def _kquant_scale_min(scales: np.ndarray):
    """Unpack the 12-byte 6-bit scale/min table of Q4_K/Q5_K.

    Bytes 0-3 carry the low 6 bits of scales 0-3 (top 2 bits: high bits of
    scales 4-7); bytes 4-7 the same for mins; bytes 8-11 the low nibbles of
    scales/mins 4-7. Returns (sc [nb, 8], mn [nb, 8]) uint8.
    """
    a = scales[:, 0:4]
    b = scales[:, 4:8]
    c = scales[:, 8:12]
    sc = np.concatenate([a & 0x3F, (c & 0x0F) | ((a >> 2) & 0x30)], axis=1)
    mn = np.concatenate([b & 0x3F, (c >> 4) | ((b >> 2) & 0x30)], axis=1)
    return sc, mn


def _nibble_rows(qs: np.ndarray, group: int) -> np.ndarray:
    """[nb, n_bytes] packed nibbles → [nb, 2*n_bytes//group, group] values,
    sub-block order (chunk-lo, chunk-hi, ...) as ggml stores them."""
    nb = qs.shape[0]
    chunks = qs.reshape(nb, -1, group)            # [nb, C, group]
    lo = chunks & 0x0F
    hi = chunks >> 4
    return np.stack([lo, hi], axis=2).reshape(nb, -1, group)


def q2_k_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q2_K: 84-byte superblock = 16 scale bytes (lo nibble: scale, hi:
    min) + 64 2-bit quant bytes + f16 d + f16 dmin."""
    b = _blocks(raw, 84)
    scales = b[:, :16]
    qs = b[:, 16:80]
    d = b[:, 80:82].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 82:84].copy().view(np.float16).astype(np.float32)
    nb = b.shape[0]
    dl = d * (scales & 0x0F).astype(np.float32)            # [nb, 16]
    ml = dmin * (scales >> 4).astype(np.float32)
    chunks = qs.reshape(nb, 2, 32)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    q = ((chunks[:, :, None, :] >> shifts[None, None, :, None]) & 3)
    q = q.reshape(nb, 16, 16).astype(np.float32)
    out = dl[:, :, None] * q - ml[:, :, None]
    return out.reshape(shape).astype(np.float32)


def q3_k_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q3_K: 110-byte superblock = 32 high-bit-mask bytes + 64 2-bit quant
    bytes + 12 packed 6-bit scale bytes + f16 d. Values are
    (q2 | high<<2 as sign offset) scaled by per-16 6-bit scales - 32."""
    b = _blocks(raw, 110)
    hmask = b[:, :32]
    qs = b[:, 32:96]
    scales = b[:, 96:108]
    d = b[:, 108:110].copy().view(np.float16).astype(np.float32)
    nb = b.shape[0]

    # 6-bit scales: 8 bytes of low nibble pairs + 4 bytes of 2-bit highs
    ls = scales[:, :8]
    hs = scales[:, 8:12]
    lo = np.concatenate([ls & 0x0F, ls >> 4], axis=1)       # [nb, 16]
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    hi = ((hs[:, None, :] >> shifts[None, :, None]) & 3).reshape(nb, 16)
    sc = ((lo | (hi << 4)).astype(np.int8).astype(np.int32) - 32
          ).astype(np.float32)
    dl = d * sc                                             # [nb, 16]

    chunks = qs.reshape(nb, 2, 32)
    ql = ((chunks[:, :, None, :] >> shifts[None, None, :, None]) & 3)
    ql = ql.reshape(nb, 16, 16).astype(np.int32)
    bit_shifts = np.arange(8, dtype=np.uint8)
    qh = ((hmask[:, None, :] >> bit_shifts[None, :, None]) & 1)
    qh = qh.reshape(nb, 16, 16).astype(np.int32)
    q = (ql - ((qh ^ 1) << 2)).astype(np.float32)   # offset 0 when bit set
    out = dl[:, :, None] * q
    return out.reshape(shape).astype(np.float32)


def q4_k_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q4_K: 144-byte superblock = f16 d + f16 dmin + 12 scale bytes + 128
    nibble bytes; v = d·sc·q − dmin·mn per 32-value sub-block."""
    b = _blocks(raw, 144)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mn = _kquant_scale_min(b[:, 4:16])
    q = _nibble_rows(b[:, 16:144], 32).astype(np.float32)   # [nb, 8, 32]
    dl = d * sc.astype(np.float32)                          # [nb, 8]
    ml = dmin * mn.astype(np.float32)
    out = dl[:, :, None] * q - ml[:, :, None]
    return out.reshape(shape).astype(np.float32)


def q5_k_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q5_K: 176-byte superblock = Q4_K header + 32 high-bit bytes + 128
    nibble bytes; q = nibble | (bit<<4)."""
    b = _blocks(raw, 176)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)
    dmin = b[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mn = _kquant_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    ql = _nibble_rows(b[:, 48:176], 32)                     # [nb, 8, 32]
    nb = b.shape[0]
    bit_shifts = np.arange(8, dtype=np.uint8)
    hb = ((qh[:, None, :] >> bit_shifts[None, :, None]) & 1)  # [nb, 8, 32]
    q = (ql | (hb << 4)).astype(np.float32)
    dl = d * sc.astype(np.float32)
    ml = dmin * mn.astype(np.float32)
    out = dl[:, :, None] * q - ml[:, :, None]
    return out.reshape(shape).astype(np.float32)


def q6_k_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """Q6_K: 210-byte superblock = 128 low-nibble bytes + 64 2-bit-high
    bytes + 16 int8 scales + f16 d; v = d·scale[i/16]·(q − 32)."""
    b = _blocks(raw, 210)
    ql = b[:, :128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = b[:, 208:210].copy().view(np.float16).astype(np.float32)
    nb = b.shape[0]
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    chunks = qh.reshape(nb, 2, 32)
    high = ((chunks[:, :, None, :] >> shifts[None, None, :, None]) & 3)
    high = high.reshape(nb, -1, 32).astype(np.int32)
    # low nibbles come in 64-wide chunks (lo then hi per chunk), pairing
    # with the 2-bit highs in stored shift order per chunk
    lo2 = ql.reshape(nb, 2, 64)
    lo_vals = np.stack([lo2 & 0x0F, lo2 >> 4], axis=2)      # [nb, 2, 2, 64]
    q = (lo_vals.reshape(nb, -1, 32).astype(np.int32)
         | (high << 4)) - 32
    q = q.reshape(nb, 16, 16).astype(np.float32)
    dl = d * scales                                         # [nb, 16]
    out = dl[:, :, None] * q
    return out.reshape(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# IQ 4-bit non-linear formats — read support for modern llama.cpp exports
# (iq4_nl / iq4_xs). A shared 16-entry signed codebook replaces the linear
# q = 0..15 mapping; parity target is the reference's vendored
# ``gguf/quants.py:1271-1318``.
# ---------------------------------------------------------------------------

# the ggml IQ4 codebook: non-uniform int8 levels indexed by each nibble
IQ4_KVALUES = np.array([-127, -104, -83, -65, -49, -35, -22, -10,
                        1, 13, 25, 38, 53, 69, 89, 113], dtype=np.int8)


def iq4_nl_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """IQ4_NL: 18-byte block = f16 d + 16 nibble bytes;
    v = d · kvalues[q] with nibbles in (all-lo, all-hi) order."""
    b = _blocks(raw, 18)
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)   # [nb, 1]
    qs = b[:, 2:18]
    nb = b.shape[0]
    idx = np.concatenate([qs & 0x0F, qs >> 4], axis=1)         # [nb, 32]
    vals = IQ4_KVALUES[idx].astype(np.float32)
    return (d * vals).reshape(shape).astype(np.float32)


def iq4_xs_dequantize_blocks(raw: np.ndarray, shape) -> np.ndarray:
    """IQ4_XS: 136-byte superblock = f16 d + u16 scales_h + 4 scales_l
    bytes + 128 nibble bytes; per-32 6-bit scale = (lo | hi<<4) − 32,
    v = d·scale·kvalues[q]."""
    b = _blocks(raw, 136)
    nb = b.shape[0]
    d = b[:, 0:2].copy().view(np.float16).astype(np.float32)   # [nb, 1]
    sh = b[:, 2:4].copy().view(np.uint16)                      # [nb, 1]
    sl = b[:, 4:8]                                             # [nb, 4]
    qs = b[:, 8:136]
    lo = np.stack([sl & 0x0F, sl >> 4], axis=2).reshape(nb, 8)
    shifts = np.arange(0, 16, 2, dtype=np.uint16)
    hi = ((sh >> shifts[None, :]) & 3).astype(np.uint8)        # [nb, 8]
    scales = ((lo | (hi << 4)).astype(np.int8) - np.int8(32)
              ).astype(np.float32)
    dl = d * scales                                            # [nb, 8]
    # each 32-value group is 16 bytes, nibbles in (all-lo, all-hi) order
    g = qs.reshape(nb, 8, 16)
    idx = np.concatenate([g & 0x0F, g >> 4], axis=2)           # [nb, 8, 32]
    vals = IQ4_KVALUES[idx].astype(np.float32)
    out = dl[:, :, None] * vals
    return out.reshape(shape).astype(np.float32)

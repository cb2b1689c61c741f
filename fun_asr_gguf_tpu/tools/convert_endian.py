"""GGUF endianness converter (little ↔ big).

TPU-native replacement for the reference's vendored
``gguf/scripts/gguf_convert_endian.py`` (reference
``fun_asr_gguf/gguf/scripts``): rewrites every multi-byte field — header,
typed KV metadata, tensor infos, and tensor payloads — in the opposite
byte order, so a checkpoint produced on a little-endian host can be
consumed on a big-endian one (s390x conversion hosts) and back.

Quantized payloads are swapped structurally: only the fp16 scale words of
each block are multi-byte (Q8_0: d; Q4_1/Q5_1: d and m); the packed int
values are byte arrays and pass through untouched.

Usage:
    python -m fun_asr_gguf_tpu.tools.convert_endian src.gguf dst.gguf \
        [--order big|little|swap]

Source endianness is auto-detected from the header's version field; with
``--order`` the tool verifies the request (converting to the order the
file already has is an error, like the reference script's check).
"""

import argparse
import struct
import sys
from typing import BinaryIO

import numpy as np

from ..formats.gguf import (DEFAULT_ALIGNMENT, GGUF_MAGIC, GGUF_VERSION,
                            GGMLType, GGUFValueType, _BLOCK_FORMATS,
                            _NUMPY_FOR_TYPE, _type_nbytes)


def _block_bytes(gtype: GGMLType) -> int:
    return _BLOCK_FORMATS[gtype][1]     # single source of truth


# per-block multi-byte words to swap: offsets of fp16 scale words and of
# the u32 high-bit word (Q5_x qh — read native-endian by the dequantizers,
# formats/quant_np.py q5 paths). K-quant scale tables / packed quants are
# plain byte arrays; only the fp16 d/dmin words swap.
_QUANT_SWAP = {
    GGMLType.Q4_0: ((0,), ()),
    GGMLType.Q4_1: ((0, 2), ()),
    GGMLType.Q5_0: ((0,), (2,)),
    GGMLType.Q5_1: ((0, 2), (4,)),
    GGMLType.Q8_0: ((0,), ()),
    GGMLType.Q2_K: ((80, 82), ()),
    GGMLType.Q3_K: ((108,), ()),
    GGMLType.Q4_K: ((0, 2), ()),
    GGMLType.Q5_K: ((0, 2), ()),
    GGMLType.Q6_K: ((208,), ()),
    GGMLType.IQ4_NL: ((0,), ()),
    # IQ4_XS: f16 d at 0 plus the u16 scales_h word at 2 (same 2-byte
    # swap as an fp16 word); scales_l / quant nibbles are byte arrays
    GGMLType.IQ4_XS: ((0, 2), ()),
    # i-quants: the dequantizers read grid/sign words native-endian
    # (u32 code pairs for the XXS family, u16 codes for IQ2_XS, u16
    # qh/scale words for IQ1); index bytes / sign bytes pass through
    GGMLType.IQ2_XXS: ((0,), tuple(range(2, 66, 4))),
    GGMLType.IQ2_XS: ((0,) + tuple(range(2, 66, 2)), ()),
    GGMLType.IQ2_S: ((0,), ()),
    GGMLType.IQ3_XXS: ((0,), tuple(range(66, 98, 4))),
    GGMLType.IQ3_S: ((0,), ()),
    GGMLType.IQ1_S: ((0,) + tuple(range(34, 50, 2)), ()),
    GGMLType.IQ1_M: (tuple(range(48, 56, 2)), ()),
    # ternary: single trailing f16 d; trit bytes pass through
    GGMLType.TQ1_0: ((52,), ()),
    GGMLType.TQ2_0: ((64,), ()),
    GGMLType.MXFP4: ((), ()),   # e8m0 scale is a single byte
}

_SCALAR_SIZE = {
    GGUFValueType.UINT8: ("B", 1), GGUFValueType.INT8: ("b", 1),
    GGUFValueType.UINT16: ("H", 2), GGUFValueType.INT16: ("h", 2),
    GGUFValueType.UINT32: ("I", 4), GGUFValueType.INT32: ("i", 4),
    GGUFValueType.FLOAT32: ("f", 4), GGUFValueType.BOOL: ("?", 1),
    GGUFValueType.UINT64: ("Q", 8), GGUFValueType.INT64: ("q", 8),
    GGUFValueType.FLOAT64: ("d", 8),
}


class _SwapCursor:
    """Reads fields in ``src`` byte order and re-emits them in the
    opposite order. ``buf`` is a uint8 memmap — the source file is never
    copied into RAM wholesale; tensor payloads stream through
    :func:`_swap_payload` one at a time."""

    def __init__(self, buf: np.ndarray, out: BinaryIO, src_order: str):
        self.buf = buf
        self.out = out
        self.pos = 0
        self.src = "<" if src_order == "little" else ">"
        self.dst = ">" if src_order == "little" else "<"

    def raw(self, n: int, emit: bool = True) -> np.ndarray:
        if self.pos + n > len(self.buf):
            raise ValueError(
                f"corrupt GGUF: read of {n} bytes at {self.pos} exceeds "
                f"file size {len(self.buf)}")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        if emit:
            self.out.write(out.tobytes())
        return out

    def scalar(self, code: str, size: int) -> int:
        (val,) = struct.unpack(self.src + code,
                               self.raw(size, emit=False).tobytes())
        self.out.write(struct.pack(self.dst + code, val))
        return val

    def string(self) -> str:
        n = self.scalar("Q", 8)
        return self.raw(n).tobytes().decode("utf-8", errors="replace")

    def value(self, vtype: GGUFValueType):
        """Convert one KV payload; returns scalar/str values (arrays
        return None — nothing needs their contents)."""
        if vtype == GGUFValueType.STRING:
            return self.string()
        if vtype == GGUFValueType.ARRAY:
            etype = GGUFValueType(self.scalar("I", 4))
            count = self.scalar("Q", 8)
            for _ in range(count):
                self.value(etype)
            return None
        code, size = _SCALAR_SIZE[vtype]
        return self.scalar(code, size)


def _swap_payload(raw: np.ndarray, gtype: GGMLType) -> bytes:
    """Byteswap one tensor payload (raw: uint8 view, not copied)."""
    if gtype in _QUANT_SWAP:
        fp16_offsets, u32_offsets = _QUANT_SWAP[gtype]
        blocks = np.array(raw, dtype=np.uint8).reshape(
            -1, _block_bytes(gtype))
        for off in fp16_offsets:
            blocks[:, [off, off + 1]] = blocks[:, [off + 1, off]]
        for off in u32_offsets:
            blocks[:, off:off + 4] = blocks[:, off:off + 4][:, ::-1]
        return blocks.tobytes()
    dtype = _NUMPY_FOR_TYPE[gtype]
    if dtype.itemsize == 1:
        return raw.tobytes()
    return raw.view(dtype).byteswap().tobytes()


def detect_byteorder(path: str) -> str:
    """'little' or 'big', from the header's version field."""
    with open(path, "rb") as f:
        head = f.read(8)
    if len(head) < 8 or struct.unpack("<I", head[:4])[0] != GGUF_MAGIC:
        raise ValueError(f"not a GGUF file: {path}")
    (ver_le,) = struct.unpack("<I", head[4:8])
    (ver_be,) = struct.unpack(">I", head[4:8])
    if ver_le in (2, GGUF_VERSION):
        return "little"
    if ver_be in (2, GGUF_VERSION):
        return "big"
    raise ValueError(f"unrecognized GGUF version field: {head[4:8]!r}")


def convert_endian(src_path: str, dst_path: str, order: str = "swap",
                   verbose: bool = True) -> str:
    """Write ``dst_path`` as ``src_path`` with byte order flipped.

    ``order``: 'big' / 'little' requires the source to be the other
    endianness; 'swap' always flips. Returns the output byte order.
    """
    src_order = detect_byteorder(src_path)
    dst_order = "big" if src_order == "little" else "little"
    if order not in ("swap", dst_order):
        raise ValueError(
            f"{src_path} is already {src_order}-endian; converting to "
            f"{order} is a no-op (the reference script rejects this too)")

    buf = np.memmap(src_path, mode="r", dtype=np.uint8)
    with open(dst_path, "wb") as out:
        cur = _SwapCursor(buf, out, src_order)
        cur.raw(4)                                  # magic, byte string
        version = cur.scalar("I", 4)
        if version not in (2, GGUF_VERSION):
            raise ValueError(f"unsupported GGUF version {version}")
        n_tensors = cur.scalar("Q", 8)
        n_kv = cur.scalar("Q", 8)

        alignment = DEFAULT_ALIGNMENT
        for _ in range(n_kv):
            key = cur.string()
            vtype = GGUFValueType(cur.scalar("I", 4))
            val = cur.value(vtype)
            if key == "general.alignment":
                # any integer KV type is legal here (GGUFReader accepts
                # the same); reject non-int / <1 before it reaches the
                # modulo arithmetic below
                if not isinstance(val, int) or val < 1:
                    raise ValueError(
                        f"corrupt GGUF: general.alignment={val!r}")
                alignment = val

        tensors = []
        for _ in range(n_tensors):
            name = cur.string()
            n_dims = cur.scalar("I", 4)
            n_elem = 1
            for _ in range(n_dims):
                n_elem *= cur.scalar("Q", 8)
            gtype = GGMLType(cur.scalar("I", 4))
            offset = cur.scalar("Q", 8)
            if gtype not in _QUANT_SWAP and gtype not in _NUMPY_FOR_TYPE:
                raise ValueError(
                    f"tensor {name!r}: no byteswap rule for "
                    f"{gtype.name} payloads")
            tensors.append((name, gtype, offset,
                            _type_nbytes(gtype, n_elem)))

        pad = -cur.pos % alignment
        cur.raw(pad)
        data_start = cur.pos
        for name, gtype, offset, nbytes in sorted(tensors,
                                                  key=lambda t: t[2]):
            gap = (data_start + offset) - cur.pos
            if gap < 0:
                raise ValueError(f"corrupt GGUF: tensor {name!r} overlaps "
                                 f"the previous payload")
            cur.raw(gap)                            # inter-tensor padding
            raw = cur.raw(nbytes, emit=False)
            out.write(_swap_payload(raw, gtype))
            if verbose:
                print(f"  {name}: {gtype.name} {nbytes} bytes")
        cur.raw(len(buf) - cur.pos)                 # trailing padding
    return dst_order


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--order", choices=["big", "little", "swap"],
                    default="swap", help="target byte order (default: flip)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)
    out_order = convert_endian(args.src, args.dst, args.order,
                               verbose=not args.quiet)
    print(f"wrote {args.dst} ({out_order}-endian)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

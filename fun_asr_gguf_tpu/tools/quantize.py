"""GGUF quantizer: rewrite a model's matmul weights in a smaller type.

The llama-quantize equivalent (the reference ships it as a prebuilt
``bin/llama-quantize.exe``). 2-D matmul weights are converted; 1-D norms
stay f32 (matching llama.cpp's quantization policy). Every target this
repo has a bit-exact ggml quantizer for is accepted: the legacy 4/5/8-bit
block types, ternary BitNet (tq1_0/tq2_0), MXFP4, and the f16/bf16
half-float stores.

Usage:
    python -m fun_asr_gguf_tpu.tools.quantize in.gguf out.gguf --type q8_0
"""

import argparse

import numpy as np

from ..formats.gguf import GGMLType, GGUFReader, GGUFWriter, _BLOCK_FORMATS

QUANT_TYPES = {
    "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1,
    "q8_0": GGMLType.Q8_0,
    "q2_k": GGMLType.Q2_K, "q3_k": GGMLType.Q3_K,
    "q4_k": GGMLType.Q4_K, "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K,
    "iq4_nl": GGMLType.IQ4_NL, "iq4_xs": GGMLType.IQ4_XS,
    "tq1_0": GGMLType.TQ1_0, "tq2_0": GGMLType.TQ2_0,
    "mxfp4": GGMLType.MXFP4,
}


def quantize_gguf(in_path: str, out_path: str, ttype: str = "q8_0",
                  imatrix: str = None):
    """``imatrix``: path to an .npz from ``tools/imatrix.py`` — tensors
    with a matching row get the importance-weighted scale search (the
    llama-quantize --imatrix behavior); others quantize as before."""
    import os as _os
    if _os.path.abspath(in_path) == _os.path.abspath(out_path):
        # the streamed writer truncates the output BEFORE the lazy
        # producers read from the input's memmap — in-place would
        # feed it zero pages (or SIGBUS)
        raise ValueError(
            "in-place requantization is not supported (the streamed "
            "writer reads the input while writing); use a different "
            "output path and rename afterwards")
    qw_map = {}
    if imatrix:
        from .imatrix import load_imatrix
        qw_map = load_imatrix(imatrix)
    n_weighted = 0
    r = GGUFReader(in_path)
    arch = r.fields.get("general.architecture", "unknown")
    w = GGUFWriter(out_path, arch=arch)
    for key, value in r.fields.items():
        if key in ("general.architecture", "general.alignment"):
            continue
        w.add_kv(key, value)

    if ttype not in QUANT_TYPES and ttype not in ("f16", "bf16"):
        raise ValueError(
            f"unknown quantization target {ttype!r}; expected one of "
            f"{sorted(QUANT_TYPES) + ['f16', 'bf16']}")
    gtype = QUANT_TYPES.get(ttype)
    block = _BLOCK_FORMATS[gtype][0] if gtype is not None else 1
    n_converted = 0
    # STREAMED requantization: register lazy producers; the writer
    # dequantizes, requantizes and writes ONE tensor at a time (peak
    # RSS ~ one f32 tensor — a 0.6B file previously held its entire
    # dequantized model in RAM until write())
    for info in r.tensors:
        name, shape = info.name, tuple(int(x) for x in info.shape)

        def producer(n=name):
            return np.asarray(r.tensor(n), dtype=np.float32)

        quantizable = (len(shape) == 2 and shape[-1] % block == 0
                       and name.endswith(".weight")
                       and "norm" not in name)
        if quantizable and gtype is not None:
            qw = qw_map.get(name)
            if qw is not None and len(qw) != shape[-1]:
                print(f"warning: imatrix row for {name} has "
                      f"{len(qw)} channels, tensor has {shape[-1]} "
                      "— ignoring")
                qw = None
            w.add_tensor_lazy(name, shape, gtype, producer, qw=qw)
            n_weighted += qw is not None
            n_converted += 1
        elif quantizable and ttype == "f16":
            w.add_tensor_lazy(name, shape, GGMLType.F16, producer)
            n_converted += 1
        elif quantizable and ttype == "bf16":
            w.add_tensor_lazy(name, shape, GGMLType.BF16, producer)
            n_converted += 1
        else:
            w.add_tensor_lazy(name, shape, GGMLType.F32, producer)
    w.write()
    extra = f" ({n_weighted} imatrix-weighted)" if qw_map else ""
    try:
        import resource
        peak_mb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0
        extra += f" — peak RSS {peak_mb:.0f} MB [streamed]"
    except Exception:
        pass
    print(f"{out_path}: {n_converted}/{len(r.tensors)} tensors -> "
          f"{ttype}{extra}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--type", default="q8_0",
                    choices=sorted(QUANT_TYPES) + ["f16", "bf16"])
    ap.add_argument("--imatrix", default=None,
                    help=".npz from tools/imatrix.py: importance-weighted "
                         "rounding for matching tensors")
    args = ap.parse_args()
    quantize_gguf(args.input, args.output, args.type, imatrix=args.imatrix)


if __name__ == "__main__":
    main()

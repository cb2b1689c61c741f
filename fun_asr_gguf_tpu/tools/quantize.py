"""GGUF quantizer: rewrite a model with q8_0 (or f16) tensor payloads.

The llama-quantize equivalent (the reference ships it as a prebuilt
``bin/llama-quantize.exe``). 2-D matmul weights are converted; 1-D norms
stay f32 (matching llama.cpp's quantization policy for q8_0 models).

Usage:
    python -m fun_asr_gguf_tpu.tools.quantize in.gguf out.gguf --type q8_0
"""

import argparse

import numpy as np

from ..formats.gguf import GGMLType, GGUFReader, GGUFWriter


def quantize_gguf(in_path: str, out_path: str, ttype: str = "q8_0"):
    r = GGUFReader(in_path)
    arch = r.fields.get("general.architecture", "unknown")
    w = GGUFWriter(out_path, arch=arch)
    for key, value in r.fields.items():
        if key in ("general.architecture", "general.alignment"):
            continue
        w.add_kv(key, value)

    n_converted = 0
    for info in r.tensors:
        data = r.tensor(info.name)          # dequantized f32/f16 view
        arr = np.asarray(data, dtype=np.float32)
        quantizable = (arr.ndim == 2 and arr.shape[-1] % 32 == 0
                       and info.name.endswith(".weight")
                       and "norm" not in info.name)
        if quantizable and ttype == "q8_0":
            w.add_tensor(info.name, arr, ggml_type=GGMLType.Q8_0)
            n_converted += 1
        elif quantizable and ttype == "f16":
            w.add_tensor(info.name, arr.astype(np.float16))
            n_converted += 1
        else:
            w.add_tensor(info.name, arr.astype(np.float32))
    w.write()
    print(f"{out_path}: {n_converted}/{len(r.tensors)} tensors -> {ttype}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--type", default="q8_0", choices=["q8_0", "f16"])
    args = ap.parse_args()
    quantize_gguf(args.input, args.output, args.type)


if __name__ == "__main__":
    main()

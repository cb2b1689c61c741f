"""GGUF inspector: dump header, metadata KV pairs and tensor table.

The gguf_dump equivalent (the reference vendors
``gguf/scripts/gguf_dump.py``).

Usage:
    python -m fun_asr_gguf_tpu.tools.inspect_gguf model.gguf [--tensors]
"""

import argparse

from ..formats.gguf import GGUFReader


def inspect(path: str, show_tensors: bool = True):
    r = GGUFReader(path)
    print(f"GGUF v{r.version}  tensors={len(r.tensors)}  "
          f"kv={len(r.fields)}  alignment={r.alignment}")
    print("\n[metadata]")
    for key, value in r.fields.items():
        text = str(value)
        if len(text) > 80:
            text = text[:77] + f"... ({len(value)} items)" \
                if isinstance(value, list) else text[:77] + "..."
        print(f"  {key} = {text}")
    if show_tensors:
        print("\n[tensors]")
        total = 0
        for t in r.tensors:
            total += t.nbytes
            print(f"  {t.name:<40} {str(t.shape):<20} {t.ggml_type.name:<6} "
                  f"{t.nbytes/1e6:8.2f} MB")
        print(f"\n  total payload: {total/1e6:.2f} MB")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--no-tensors", action="store_true")
    args = ap.parse_args()
    inspect(args.path, show_tensors=not args.no_tensors)


if __name__ == "__main__":
    main()

"""GGUF metadata editor + hasher.

Covers the reference's gguf script suite beyond the dumper
(``gguf/scripts/gguf_set_metadata.py``, ``gguf_new_metadata.py``,
``gguf_hash.py`` — reference SURVEY.md §2.3): rewrite a GGUF with
metadata changed/removed (tensor payloads copied byte-identically,
declared KV types preserved), and print whole-file / per-tensor hashes.

Usage:
    python -m fun_asr_gguf_tpu.tools.gguf_edit hash model.gguf [--tensors]
    python -m fun_asr_gguf_tpu.tools.gguf_edit set in.gguf out.gguf \
        --set general.name="My Model" --set qwen3.rope.freq_base=1e6 \
        --remove tokenizer.chat_template
"""

import argparse
import hashlib
import sys

from ..formats.gguf import GGUFReader, GGUFValueType, GGUFWriter


def _parse_value(text: str, old_value, declared: GGUFValueType):
    """Parse a CLI value string against the key's existing declared type."""
    if declared == GGUFValueType.STRING:
        return text
    if declared == GGUFValueType.BOOL:
        return text.lower() in ("1", "true", "yes")
    if declared in (GGUFValueType.FLOAT32, GGUFValueType.FLOAT64):
        return float(text)
    if declared == GGUFValueType.ARRAY:
        raise ValueError("array values can't be set from the CLI")
    try:
        return int(text)       # exact: 64-bit ints survive (no float64
    except ValueError:         # round-trip that corrupts > 2^53)
        return int(float(text))


def cmd_hash(args) -> int:
    r = GGUFReader(args.path)
    whole = hashlib.sha256()
    with open(args.path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            whole.update(chunk)
    print(f"sha256  {whole.hexdigest()}  {args.path}")
    if args.tensors:
        for t in r.tensors:
            h = hashlib.sha256(bytes(r.tensor_raw(t.name))).hexdigest()
            print(f"  {h[:16]}…  {t.name} [{t.ggml_type.name}]")
    return 0


def cmd_set(args) -> int:
    r = GGUFReader(args.path)
    changes = {}
    for item in args.set or []:
        if "=" not in item:
            print(f"--set expects key=value, got {item!r}", file=sys.stderr)
            return 2
        key, _, val = item.partition("=")
        changes[key] = val
    removals = set(args.remove or [])

    if "general.alignment" in changes or "general.alignment" in removals:
        # the writer owns alignment (it lays out tensor offsets with it);
        # letting an edit through would leave two conflicting KV pairs
        print("general.alignment is managed by the writer and cannot be "
              "edited", file=sys.stderr)
        return 2

    unknown = (set(changes) - set(r.fields)) | (removals - set(r.fields))
    if unknown and not args.add:
        print(f"keys not present (pass --add to create): {sorted(unknown)}",
              file=sys.stderr)
        return 2

    w = GGUFWriter(args.out, arch=None)
    for key, value in r.fields.items():
        if key in removals or key == "general.alignment":
            continue   # alignment is re-added by the writer
        vtype, etype = r.field_types[key]
        if key in changes:
            value = _parse_value(changes.pop(key), value, vtype)
        w.add_kv(key, value, vtype, etype)
    for key, text in changes.items():   # brand-new keys (--add)
        w.add_kv(key, _infer_new(text))
    for t in r.tensors:
        # memmap views stream straight to the output file — no host copy
        w.add_tensor_raw(t.name, r.tensor_raw(t.name), t.shape,
                         t.ggml_type)
    w.write()
    print(f"wrote {args.out} ({len(r.tensors)} tensors copied, "
          f"{len(args.set or [])} set, {len(removals)} removed)")
    return 0


def _infer_new(text: str):
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    if text.lower() in ("true", "false"):
        return text.lower() == "true"
    return text


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    h = sub.add_parser("hash", help="sha256 of the file and its tensors")
    h.add_argument("path")
    h.add_argument("--tensors", action="store_true")
    s = sub.add_parser("set", help="rewrite with metadata changes")
    s.add_argument("path")
    s.add_argument("out")
    s.add_argument("--set", action="append", metavar="KEY=VALUE")
    s.add_argument("--remove", action="append", metavar="KEY")
    s.add_argument("--add", action="store_true",
                   help="allow creating keys that don't exist yet")
    args = ap.parse_args(argv)
    return cmd_hash(args) if args.cmd == "hash" else cmd_set(args)


if __name__ == "__main__":
    sys.exit(main())

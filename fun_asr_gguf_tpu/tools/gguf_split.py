"""GGUF shard splitter / merger (``llama-gguf-split`` equivalent).

The reference ships llama.cpp's prebuilt ``llama-gguf-split.exe``
(``fun_asr_gguf/bin/``) for carving a large GGUF into distributable
shards and re-assembling them; its vendored gguf-py writes the same
shard scheme from conversion (``gguf/gguf_writer.py:38,204-208``,
``gguf/constants.py:198-200``). This tool covers both directions over
this repo's format layer:

- shards are named ``{prefix}-{no:05d}-of-{count:05d}.gguf`` (1-based),
  matching llama.cpp's ``SHARD_NAME_FORMAT``;
- every shard carries ``split.no`` (u16), ``split.count`` (u16) and
  ``split.tensors.count`` (i32); the first shard additionally carries
  the full source metadata — later shards are tensor containers only;
- tensor payloads are copied byte-identically (memmap views stream to
  the output; no dequant/requant round trip).

Usage:
    python -m fun_asr_gguf_tpu.tools.gguf_split split model.gguf \\
        out/model [--max-tensors 128 | --max-size 512M] [--dry-run]
    python -m fun_asr_gguf_tpu.tools.gguf_split merge \\
        out/model-00001-of-00003.gguf merged.gguf
"""

import argparse
import os
import re
import sys
from typing import List

from ..formats.gguf import (GGMLType, GGUFReader, GGUFValueType,
                            GGUFWriter)

SHARD_NAME_FORMAT = "{:s}-{:05d}-of-{:05d}.gguf"
SPLIT_KEYS = ("split.no", "split.count", "split.tensors.count")
_SHARD_RE = re.compile(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$")


def parse_size(text: str) -> int:
    """'512M' / '2G' / '1000000' → bytes."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([KMG]?)", text.strip(),
                     re.IGNORECASE)
    if not m:
        raise ValueError(f"bad size {text!r} (expected e.g. 512M, 2G)")
    mult = {"": 1, "K": 1 << 10, "M": 1 << 20, "G": 1 << 30}[
        m.group(2).upper()]
    return int(float(m.group(1)) * mult)


def plan_shards(reader: GGUFReader, max_tensors: int = 0,
                max_size: int = 0) -> List[List[str]]:
    """Greedy in-order partition of tensor names into shards.

    Same policy as the reference writer (gguf_writer.py:359-366): start
    a new shard when the current one is at the tensor limit, or when
    adding the next tensor would push it over the byte limit — but never
    leave a shard empty.
    """
    shards: List[List[str]] = [[]]
    size = 0
    for t in reader.tensors:
        over_tensors = max_tensors and len(shards[-1]) >= max_tensors
        over_size = (max_size and shards[-1]
                     and size + t.nbytes > max_size)
        if over_tensors or over_size:
            shards.append([])
            size = 0
        shards[-1].append(t.name)
        size += t.nbytes
    return shards


def write_shard(reader: GGUFReader, names: List[str], path: str,
                no: int, count: int, first: bool):
    # carry the source's (possibly non-default) alignment into every shard
    w = GGUFWriter(path, arch=None, alignment=reader.alignment)
    if first:
        for key, value in reader.fields.items():
            if key in SPLIT_KEYS or key == "general.alignment":
                continue
            vtype, etype = reader.field_types[key]
            w.add_kv(key, value, vtype, etype)
    w.add_kv("split.no", no, GGUFValueType.UINT16)
    w.add_kv("split.count", count, GGUFValueType.UINT16)
    w.add_kv("split.tensors.count", len(reader.tensors),
             GGUFValueType.INT32)
    for name in names:
        t = reader.tensor_info(name)
        w.add_tensor_raw(name, reader.tensor_raw(name), t.shape,
                         t.ggml_type)
    w.write()


def cmd_split(args) -> int:
    r = GGUFReader(args.path)
    if args.max_tensors is not None and args.max_size:
        print("pick one of --max-tensors / --max-size", file=sys.stderr)
        return 2
    if args.max_tensors is not None and args.max_tensors < 1:
        print(f"--max-tensors must be >= 1 (got {args.max_tensors})",
              file=sys.stderr)
        return 2
    max_size = parse_size(args.max_size) if args.max_size else 0
    max_tensors = 0 if max_size else (
        128 if args.max_tensors is None else args.max_tensors)
    shards = plan_shards(r, max_tensors=max_tensors, max_size=max_size)
    if len(shards) < 2:
        print("model fails split requirements, not splitting "
              f"({len(r.tensors)} tensors fit one shard)", file=sys.stderr)
        return 1
    out_dir = os.path.dirname(os.path.abspath(args.prefix))
    os.makedirs(out_dir, exist_ok=True)
    for i, names in enumerate(shards):
        path = SHARD_NAME_FORMAT.format(args.prefix, i + 1, len(shards))
        nbytes = sum(r.tensor_info(n).nbytes for n in names)
        print(f"  {os.path.basename(path)}: {len(names)} tensors, "
              f"{nbytes / (1 << 20):.1f} MiB")
        if not args.dry_run:
            write_shard(r, names, path, i, len(shards), first=(i == 0))
    if args.dry_run:
        print(f"dry run: would write {len(shards)} shards")
    else:
        print(f"wrote {len(shards)} shards "
              f"({len(r.tensors)} tensors total)")
    return 0


def shard_paths(first_path: str) -> List[str]:
    """All shard paths implied by the first shard's name + split.count."""
    m = _SHARD_RE.match(os.path.basename(first_path))
    if not m:
        raise ValueError(
            f"{first_path!r} does not look like a first shard "
            "(expected *-00001-of-NNNNN.gguf)")
    prefix = os.path.join(os.path.dirname(first_path), m.group(1))
    count = int(m.group(3))
    if int(m.group(2)) != 1:
        raise ValueError("merge starts from the -00001-of- shard")
    return [SHARD_NAME_FORMAT.format(prefix, i + 1, count)
            for i in range(count)]


def cmd_merge(args) -> int:
    paths = shard_paths(args.path)
    readers = [GGUFReader(p) for p in paths]
    first = readers[0]
    count = int(first.fields.get("split.count", len(readers)))
    total = int(first.fields.get("split.tensors.count", -1))
    if count != len(readers):
        print(f"split.count={count} but filename implies {len(readers)}",
              file=sys.stderr)
        return 1

    w = GGUFWriter(args.out, arch=None, alignment=first.alignment)
    for key, value in first.fields.items():
        if key in SPLIT_KEYS or key == "general.alignment":
            continue
        vtype, etype = first.field_types[key]
        w.add_kv(key, value, vtype, etype)
    n = 0
    for i, r in enumerate(readers):
        no = int(r.fields.get("split.no", i))
        if no != i:
            print(f"{paths[i]}: split.no={no}, expected {i}",
                  file=sys.stderr)
            return 1
        # a foreign shard in position N>1 must not be silently accepted:
        # every shard has to agree with the first on the split totals
        r_count = int(r.fields.get("split.count", count))
        if r_count != count:
            print(f"{paths[i]}: split.count={r_count}, expected {count}",
                  file=sys.stderr)
            return 1
        r_total = int(r.fields.get("split.tensors.count", total))
        if total >= 0 and r_total != total:
            print(f"{paths[i]}: split.tensors.count={r_total}, "
                  f"expected {total}", file=sys.stderr)
            return 1
        for t in r.tensors:
            w.add_tensor_raw(t.name, r.tensor_raw(t.name), t.shape,
                             t.ggml_type)
            n += 1
    if total >= 0 and n != total:
        print(f"split.tensors.count={total} but shards hold {n}",
              file=sys.stderr)
        return 1
    w.write()
    print(f"merged {len(readers)} shards -> {args.out} ({n} tensors)")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("split", help="carve a GGUF into shards")
    s.add_argument("path")
    s.add_argument("prefix", help="output path prefix (no extension)")
    s.add_argument("--max-tensors", type=int, default=None,
                   help="tensors per shard (default 128)")
    s.add_argument("--max-size", default=None,
                   help="max shard payload bytes, e.g. 512M (overrides "
                        "--max-tensors)")
    s.add_argument("--dry-run", action="store_true")
    s.set_defaults(fn=cmd_split)
    m = sub.add_parser("merge", help="reassemble shards into one GGUF")
    m.add_argument("path", help="first shard (*-00001-of-NNNNN.gguf)")
    m.add_argument("out")
    m.set_defaults(fn=cmd_merge)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

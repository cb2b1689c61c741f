"""Tokenizer CLI (``llama-tokenize`` equivalent).

The reference ships llama.cpp's prebuilt ``llama-tokenize.exe``
(``fun_asr_gguf/bin/``) for inspecting how text maps to token ids under
a model's vocab. Same job here over this repo's tokenizer stack
(tokenizer.json → GGUF-embedded vocab → byte fallback, the engine's
resolution chain in ``formats/tokenizer.load_tokenizer``):

    python -m fun_asr_gguf_tpu.tools.tokenize --model model_tpu \\
        --prompt "语音转写：<|im_end|>"
    python -m fun_asr_gguf_tpu.tools.tokenize --model tokenizer.json \\
        --file text.txt --ids

Default output is llama-tokenize's per-line ``id -> 'piece'`` listing;
``--ids`` prints the bare id list, ``--show-count`` appends the total.
"""

import argparse
import sys

from ..formats.tokenizer import load_tokenizer


def format_tokens(tok, ids, bare: bool = False):
    if bare:
        yield str(list(ids))
        return
    for i in ids:
        piece = tok.token_bytes(i).decode("utf-8", errors="replace")
        yield f"{i:>8} -> '{piece}'"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", required=True,
                    help="checkpoint dir, tokenizer.json or .gguf with "
                         "embedded vocab")
    g = ap.add_mutually_exclusive_group()
    g.add_argument("--prompt", help="text to tokenize")
    g.add_argument("--file", help="UTF-8 file to tokenize")
    g.add_argument("--stdin", action="store_true")
    # --decode is an input mode too: combining it with --prompt/--file/
    # --stdin would silently ignore the encode input
    g.add_argument("--decode", metavar="IDS",
                   help="reverse: comma-separated ids -> text")
    ap.add_argument("--ids", action="store_true",
                    help="print the bare id list")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args(argv)

    tok = load_tokenizer(args.model)
    if args.decode is not None:
        ids = [int(x) for x in args.decode.replace(",", " ").split()]
        print(tok.decode(ids))
        return 0

    if args.prompt is not None:
        text = args.prompt
    elif args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    elif args.stdin:
        text = sys.stdin.read()
    else:
        ap.error("one of --prompt / --file / --stdin / --decode required")

    ids = tok.encode(text)
    for line in format_tokens(tok, ids, bare=args.ids):
        print(line)
    if args.show_count:
        print(f"total number of tokens: {len(ids)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

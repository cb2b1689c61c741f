# coding: utf-8
"""Perplexity of a GGUF decoder over a text file — the ``llama-perplexity``
tool's role in the reference's shipped llama.cpp suite (SURVEY §2.5,
``bin/llama-perplexity.exe``): measuring what a weight format does to
model quality, not speed.

Sliding-window evaluation (same scheme as llama.cpp): the text is
tokenized once, cut into windows of ``--window`` tokens advanced by
``--stride``; within each window only the last ``stride`` positions are
scored (earlier positions act as context), except the first window where
every position after the first is scored. One jitted program per window
shape; the final ragged window is left-padded via the attention mask so
the program count stays at one.

Formats: ``bf16`` (dense), ``int8`` (per-channel), ``int4`` (w4a16
group-32), ``q8_0`` (GGUF-byte-exact per-block) — so a quantization's
quality cost is measurable next to its speed (tools/microbench.py) and
size. Example::

    python -m fun_asr_gguf_tpu.tools.perplexity \
        --gguf decoder.gguf --text wiki.txt --format int4
"""

import argparse
import math
import sys

import numpy as np


def _load_params(gguf_path: str, fmt: str, tokenizer_json: str = None):
    import jax.numpy as jnp

    from ..formats.tokenizer import QwenTokenizer
    from ..models.loaders import load_qwen3_from_gguf

    keep_q = fmt == "q8_0"
    params, cfg, _embd = load_qwen3_from_gguf(
        gguf_path, dtype=jnp.bfloat16 if fmt != "f32" else jnp.float32,
        keep_quantized=keep_q)
    if fmt == "int8":
        from ..models.qwen3 import quantize_qwen3_params_int8
        params = quantize_qwen3_params_int8(params, donate=True)
    elif fmt == "int4":
        from ..models.qwen3 import quantize_qwen3_params_int4
        params = quantize_qwen3_params_int4(params, donate=True)
    tok = (QwenTokenizer(tokenizer_json) if tokenizer_json
           else QwenTokenizer.from_gguf(gguf_path))
    return params, cfg, tok


def window_nll(params, cfg, ids: np.ndarray, window: int, stride: int,
               progress=None):
    """Total negative log-likelihood (nats) + scored-token count over a
    token stream, llama.cpp-style sliding windows."""
    import jax
    import jax.numpy as jnp

    from ..models.qwen3 import qwen3_forward_logits

    n = len(ids)
    if n < 2:
        raise ValueError("need at least 2 tokens to score")
    window = min(window, n)
    stride = min(stride, window)

    @jax.jit
    def nll_fn(p, tok_ids, mask, score_mask):
        embeds = p["embed"][tok_ids][None]
        logits = qwen3_forward_logits(p, embeds, mask[None], cfg)[0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # position i predicts token i+1
        tgt = jnp.roll(tok_ids, -1)
        picked = jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        return -jnp.sum(picked * score_mask)

    total_nll, total_cnt = 0.0, 0
    start = 0
    first = True
    while start + 1 < n:
        w_ids = ids[start:start + window]
        w = len(w_ids)
        pad = window - w
        tok_ids = np.zeros(window, np.int64)
        tok_ids[pad:] = w_ids            # left-pad: ragged tail reuses
        mask = np.zeros(window, np.float32)   # the same jitted shape
        mask[pad:] = 1.0
        score = np.zeros(window, np.float32)
        # scored positions: predictors of tokens (context..w-1); ctx >= 1
        # always (a token with no context — or a padded predictor when
        # stride == window — is never scored)
        ctx = 1 if first else max(1, window - stride)
        lo, hi = pad + ctx - 1, pad + w - 1   # predictor index range
        score[lo:hi] = 1.0
        cnt = int(score.sum())
        if cnt > 0:
            total_nll += float(nll_fn(params, jnp.asarray(tok_ids),
                                      jnp.asarray(mask),
                                      jnp.asarray(score)))
            total_cnt += cnt
            if progress:
                progress(start, n, total_nll, total_cnt)
        if start + window >= n:
            break
        start += stride
        first = False
    return total_nll, total_cnt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Perplexity of a GGUF decoder over a text file")
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--text", required=True,
                    help="UTF-8 text file to score")
    ap.add_argument("--format", default="bf16",
                    choices=["bf16", "f32", "int8", "int4", "q8_0"])
    ap.add_argument("--tokenizer-json", default=None,
                    help="optional; default reads the GGUF-embedded vocab")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="truncate the stream (0 = all)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    params, cfg, tok = _load_params(args.gguf, args.format,
                                    args.tokenizer_json)
    with open(args.text, encoding="utf-8") as f:
        ids = np.asarray(tok.encode(f.read()), np.int64)
    if args.max_tokens:
        ids = ids[:args.max_tokens]

    def progress(start, n, nll, cnt):
        if not args.quiet:
            print(f"[ppl] {start}/{n} tokens  "
                  f"ppl so far {math.exp(nll / cnt):.4f}",
                  file=sys.stderr, flush=True)

    nll, cnt = window_nll(params, cfg, ids, args.window, args.stride,
                          progress)
    ppl = math.exp(nll / cnt)
    print(f"format={args.format} tokens={len(ids)} scored={cnt} "
          f"nll/token={nll / cnt:.5f} ppl={ppl:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Quantify imatrix gains: PPL with vs without importance weighting
(VERDICT r3 item 9 — the llama-imatrix workflow's accuracy claim).

Random weights can't show quantization quality (their PPL is noise), so
this trains a small byte-level Qwen3 LM on the reference project's own
documentation until it has real structure, then measures held-out
perplexity of k-quant exports with and without an imatrix collected on
the training split — the exact artifact chain a user runs
(tools/imatrix.py -> tools/quantize.py --imatrix -> tools/perplexity.py's
window_nll).

Usage: python experiments/imatrix_ppl.py [--steps 400] [--out table.md]
"""

import argparse
import glob
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.loaders import save_qwen3_to_gguf
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           qwen3_forward_logits)
from fun_asr_gguf_tpu.tools.imatrix import collect_imatrix
from fun_asr_gguf_tpu.tools.perplexity import window_nll
from fun_asr_gguf_tpu.tools.quantize import quantize_gguf

CTX = 128
BATCH = 16


def load_corpus() -> np.ndarray:
    paths = ["/root/reference/README.md"]
    paths += sorted(glob.glob("/root/reference/experience/*.md"))
    paths += sorted(glob.glob("/root/repo/docs/*.md"))
    blobs = []
    for p in paths:
        if os.path.exists(p):
            with open(p, "rb") as f:
                blobs.append(f.read())
    data = b"\n\n".join(blobs)
    if len(data) < 50_000:
        raise SystemExit(f"corpus too small: {len(data)} bytes")
    return np.frombuffer(data, np.uint8).astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ids = load_corpus()
    split = int(len(ids) * 0.85)
    train_ids, test_ids = ids[:split], ids[split:]
    print(f"corpus: {len(ids)} bytes ({split} train, {len(test_ids)} test)")

    cfg = Qwen3Config(hidden=256, n_layers=4, q_heads=4, kv_heads=2,
                      head_dim=64, ffn_dim=512, vocab_size=512,
                      rope_theta=1e4)
    cache = f"/tmp/imx/trained_{args.steps}.npz"
    if os.path.exists(cache):
        from fun_asr_gguf_tpu.models.loaders import unflatten_tree
        flat = dict(np.load(cache))
        params = unflatten_tree(flat)
        print(f"loaded trained params from {cache}")
        args.steps = 0
    params_pre = init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = params if os.path.exists(cache) else params_pre
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, 3e-3, 20, args.steps), weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(p, tok):
        embeds = p["embed"][tok]
        mask = jnp.ones(tok.shape, jnp.float32)
        logits = qwen3_forward_logits(p, embeds, mask, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tok[:, 1:]
        picked = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                     axis=-1)[..., 0]
        return -jnp.mean(picked)

    @jax.jit
    def step(p, o, tok):
        loss, grads = jax.value_and_grad(loss_fn)(p, tok)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    loss = None
    os.makedirs("/tmp/imx", exist_ok=True)
    for i in range(args.steps):
        starts = rng.integers(0, len(train_ids) - CTX - 1, size=BATCH)
        tok = jnp.asarray(np.stack([train_ids[s:s + CTX] for s in starts]))
        params, opt_state, loss = step(params, opt_state, tok)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"  step {i}: loss {float(loss):.3f} "
                  f"({time.time()-t0:.0f}s)")
    if loss is not None:
        print(f"trained to loss {float(loss):.3f} "
              f"(uniform would be {math.log(256):.3f})")
        from fun_asr_gguf_tpu.models.loaders import flatten_tree
        np.savez(cache, **{k: np.asarray(v) for k, v in
                           flatten_tree(jax.device_get(params)).items()})
    f16 = "/tmp/imx/model_f16.gguf"
    save_qwen3_to_gguf(f16, params, cfg, quantize_q8_0=False)

    # imatrix over the TRAIN split (calibration must not touch test)
    calib = []
    for s in range(0, min(len(train_ids) - CTX, 64 * CTX), CTX):
        calib.append(train_ids[s:s + CTX][None])
    stats = collect_imatrix(params, cfg, np.asarray(params["embed"]),
                            calib)
    np.savez("/tmp/imx/imatrix.npz", **stats)
    print(f"imatrix over {int(stats['__n_tokens__'])} tokens")

    def ppl(gguf):
        from fun_asr_gguf_tpu.models.loaders import load_qwen3_from_gguf
        p, c, _ = load_qwen3_from_gguf(gguf, dtype=jnp.float32)
        nll, cnt = window_nll(p, c, test_ids, window=CTX, stride=CTX // 2)
        return math.exp(nll / cnt)

    rows = [("f16 (baseline)", ppl(f16), None)]
    for ttype in ("q4_k", "q3_k", "q2_k"):
        plain = f"/tmp/imx/{ttype}.gguf"
        weighted = f"/tmp/imx/{ttype}_imx.gguf"
        quantize_gguf(f16, plain, ttype)
        quantize_gguf(f16, weighted, ttype, imatrix="/tmp/imx/imatrix.npz")
        p_plain = ppl(plain)
        p_w = ppl(weighted)
        rows.append((ttype, p_plain, p_w))

    lines = ["| format | PPL (plain) | PPL (imatrix) | delta |",
             "|---|---|---|---|"]
    base = rows[0][1]
    lines.append(f"| f16 | {base:.3f} | — | — |")
    for name, p_plain, p_w in rows[1:]:
        d = (p_plain - p_w) / (p_plain - base) * 100 \
            if p_plain > base else float("nan")
        lines.append(f"| {name} | {p_plain:.3f} | {p_w:.3f} | "
                     f"−{p_plain - p_w:.3f} ({d:.0f}% of the "
                     f"quantization-induced PPL increase recovered) |")
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()

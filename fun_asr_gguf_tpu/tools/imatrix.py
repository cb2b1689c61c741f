# coding: utf-8
"""Importance matrix (imatrix) collection for quantization.

The ``llama-imatrix`` equivalent (the reference ships llama.cpp's
prebuilt tool in ``bin/``; its vendored gguf-py has no counterpart):
runs the decoder over calibration text and records, for every matmul,
the mean squared input activation per input channel. The quantizers'
weighted scale searches (``formats/quant_np.py``, the ggml
``quantize_row_*_impl`` recipes) then spend their rounding budget on
the channels the model actually drives hard.

Output: an ``.npz`` of float32 rows keyed by GGUF tensor names
(``blk.N.attn_q.weight``, ``blk.N.ffn_down.weight``, ``output.weight``,
…) plus ``__n_tokens__``. Feed it to the quantizer:

    python -m fun_asr_gguf_tpu.tools.imatrix \\
        --checkpoint model_tpu --calib calib.txt --out imatrix.npz
    python -m fun_asr_gguf_tpu.tools.quantize in.gguf out.gguf \\
        --type q4_k --imatrix imatrix.npz

Tensors sharing an input (attn_q/attn_k/attn_v; ffn_gate/ffn_up) get
identical rows, as with llama.cpp's collector.
"""

import argparse
import os
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models import qwen3 as Q
from ..models.common import rms_norm
from ..models.config import Qwen3Config


def forward_collect(params, embeds, attn_mask, cfg: Qwen3Config
                    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """One calibration batch → per-projection input sum-of-squares.

    embeds [B, T, H] float32 token embeddings, attn_mask [B, T] (1 =
    valid). Returns ({gguf_tensor_name: [k] f32 sums}, n_valid_tokens).
    Dense (unquantized) params only — the imatrix describes the float
    model the quantizer is about to compress. Mirrors
    ``qwen3_forward_logits``'s layer math (qwen3.py) with a python layer
    loop so each layer's activations can be accumulated under its name.
    """
    b, p, _ = embeds.shape
    x = embeds
    if cfg.embed_scale != 1.0:       # gemma / granite embedding scale
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    prompt_len = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    shift = p - prompt_len
    positions = jnp.maximum(
        jnp.arange(p, dtype=jnp.int32)[None, :] - shift[:, None], 0)
    cos, sin = Q.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                              x.dtype)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    i = jnp.arange(p)[:, None]
    j = jnp.arange(p)[None, :]
    bias = jnp.where((j <= i)[None, None]
                     & (attn_mask[:, None, None, :] > 0),
                     0.0, Q.NEG_INF).astype(jnp.float32)

    mask = attn_mask.astype(jnp.float32)[..., None]          # [B, T, 1]
    stats: Dict[str, jnp.ndarray] = {}

    def acc(name, act):
        s = jnp.sum((act.astype(jnp.float32) ** 2) * mask, axis=(0, 1))
        stats[name] = stats[name] + s if name in stats else s

    layers = params["layers"]
    for l in range(cfg.n_layers):
        lp = {k: w[l] for k, w in layers.items()}
        h = (rms_norm(x, lp["input_ln"], cfg.rms_eps)
             if cfg.pre_norms else x)
        for t in ("attn_q", "attn_k", "attn_v"):
            acc(f"blk.{l}.{t}.weight", h)
        q, k, v = Q._qkv(h, lp, cfg, cos, sin)
        scores = Q._softcap_scores(Q._gqa_scores(q, k, cfg), cfg) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        merged = Q._merge_heads(Q._gqa_mix(probs, v, cfg), cfg)
        acc(f"blk.{l}.attn_output.weight", merged)
        attn = Q._proj(merged, lp["o_w"])
        if cfg.post_norms:   # sandwich (gemma3) / post-only (olmo2)
            attn = rms_norm(attn, lp["attn_post_ln"], cfg.rms_eps)
        x = x + (attn * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else attn).astype(x.dtype)
        h2 = (rms_norm(x, lp["post_ln"], cfg.rms_eps)
              if cfg.pre_norms else x)
        for t in ("ffn_gate", "ffn_up"):
            acc(f"blk.{l}.{t}.weight", h2)
        if "gate_up_w" in lp:
            gu = Q._proj(h2, lp["gate_up_w"])
            f = gu.shape[-1] // 2
            gate, up = gu[..., :f], gu[..., f:]
        else:
            gate = Q._proj(h2, lp["gate_w"])
            up = Q._proj(h2, lp["up_w"])
        act = jax.nn.silu(gate) * up
        acc(f"blk.{l}.ffn_down.weight", act)
        mlp = Q._proj(act, lp["down_w"])
        if cfg.post_norms:
            mlp = rms_norm(mlp, lp["ffn_post_ln"], cfg.rms_eps)
        x = x + (mlp * cfg.residual_scale
                 if cfg.residual_scale != 1.0 else mlp).astype(x.dtype)

    xf = rms_norm(x, params["final_ln"], cfg.rms_eps)
    acc("output.weight", xf)
    return stats, jnp.sum(attn_mask.astype(jnp.float32))


def collect_imatrix(params, cfg: Qwen3Config, embed_table: np.ndarray,
                    token_batches, dtype=jnp.float32) -> Dict[str, np.ndarray]:
    """Accumulate mean squared activations over ``token_batches``
    (iterable of [B, T] int arrays). Returns {name: [k] f32 means} +
    ``__n_tokens__``."""
    fwd = jax.jit(lambda p, e, m: forward_collect(p, e, m, cfg))
    totals: Dict[str, np.ndarray] = {}
    n_tok = 0.0
    for ids in token_batches:
        ids = np.asarray(ids)
        embeds = jnp.asarray(embed_table[ids], dtype)
        mask = jnp.ones(ids.shape, jnp.float32)
        stats, n = fwd(params, embeds, mask)
        n_tok += float(n)
        for name, s in stats.items():
            s = np.asarray(s, np.float32)
            totals[name] = totals.get(name, 0.0) + s
    if n_tok == 0:
        raise ValueError("no calibration tokens")
    out = {name: (s / n_tok).astype(np.float32)
           for name, s in totals.items()}
    out["__n_tokens__"] = np.float32(n_tok)
    return out


def load_imatrix(path: str) -> Dict[str, np.ndarray]:
    """Load an imatrix .npz → {tensor_name: [k] f32}. ``token_embd.weight``
    aliases ``output.weight`` for tied-embedding models (the table is
    read as the logits matmul's weight)."""
    data = dict(np.load(path))
    data.pop("__n_tokens__", None)
    if "output.weight" in data and "token_embd.weight" not in data:
        data["token_embd.weight"] = data["output.weight"]
    return data


def _token_windows(ids, ctx: int, batch: int):
    """Chop a token stream into [batch, ctx] windows (drop remainder)."""
    ids = np.asarray(ids, np.int32)
    n_win = len(ids) // ctx
    wins = ids[:n_win * ctx].reshape(n_win, ctx)
    for i in range(0, n_win, batch):
        yield wins[i:i + batch]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (decoder.gguf + tokenizer.json)")
    ap.add_argument("--calib", required=True,
                    help="UTF-8 calibration text file")
    ap.add_argument("--out", default="imatrix.npz")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args(argv)

    from ..formats.tokenizer import load_tokenizer
    from ..models.loaders import load_qwen3_from_gguf

    gguf = os.path.join(args.checkpoint, "decoder.gguf")
    params, cfg, embed = load_qwen3_from_gguf(gguf, dtype=jnp.float32)
    # same resolution chain as the engine: tokenizer.json → GGUF-embedded
    # vocab → byte fallback
    tok = load_tokenizer(args.checkpoint)
    with open(args.calib, encoding="utf-8") as f:
        ids = tok.encode(f.read())
    mat = collect_imatrix(params, cfg, embed,
                          _token_windows(ids, args.ctx, args.batch))
    np.savez(args.out, **mat)
    print(f"imatrix over {int(mat['__n_tokens__'])} tokens "
          f"({len(mat) - 1} tensors) -> {args.out}")


if __name__ == "__main__":
    main()

"""Where do the T>0 speculative verify rounds spend time? (VERDICT r3
item 3: spec_sampled 1093 vs spec_subst 1818 tok/s — the K-lane verify
sampling costs ~40%.)

Times, chained in a fori_loop with salted inputs (tunnel memoization):

  V0  verify pass + greedy argmax acceptance        (the spec floor)
  V1  + warped_candidates over all K+1 lanes        (today's sampled path)
  V2  + vals-only two-stage top-k (no index plumbing) per lane
  V3  + warped_candidates on ONE selected lane only
  V4  standalone: lax.top_k vs topk_large on [K+1, 152k]

The deltas attribute the sampled-mode overhead to (a) the top-k itself,
(b) the index reconstruction, (c) the K+1-lane fan-out — and pick the
redesign with the best exactness/cost trade.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import fun_asr_gguf_tpu  # noqa: F401
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (embed_tokens,
                                           init_qwen3_params,
                                           pack_qwen3_params,
                                           quantize_qwen3_params_int8,
                                           qwen3_verify_step)
from fun_asr_gguf_tpu.ops.sampling import (_TOPK_BLOCK, topk_large,
                                           warped_candidates)

P_LEN = 204
SPEC_K = 8


def fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def two_point(jfn, args, n1=4, n2=16, label=""):
    def run(n, salt):
        t0 = time.perf_counter()
        fetch(jfn(args, jnp.float32(salt), iters=n))
        return time.perf_counter() - t0
    for i, n in enumerate((n1, n2)):
        run(n, 100 + i)
    t1 = min(run(n1, 10 + i) for i in range(3))
    t2 = min(run(n2, 20 + i) for i in range(3))
    per = max((t2 - t1) / (n2 - n1), 1e-9)
    print(f"[{label}] {per*1e3:.3f} ms/round")
    return per


def topk_vals_only(logits, k):
    """topk_large without the original-index reconstruction."""
    v = logits.shape[-1]
    pad = -v % _TOPK_BLOCK
    if pad:
        logits = jnp.pad(logits, [(0, 0)] * (logits.ndim - 1) + [(0, pad)],
                         constant_values=-1e30)
    nb = logits.shape[-1] // _TOPK_BLOCK
    blocks = logits.reshape(*logits.shape[:-1], nb, _TOPK_BLOCK)
    bmax = jnp.max(blocks, axis=-1)
    _, bidx = jax.lax.top_k(bmax, k)
    cand = jnp.take_along_axis(blocks, bidx[..., None], axis=-2)
    cand = cand.reshape(*logits.shape[:-1], k * _TOPK_BLOCK)
    vals, _ = jax.lax.top_k(cand, k)
    return vals


def main():
    cfg = HybridConfig().llm
    rng = np.random.default_rng(0)
    llm = init_qwen3_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)
    params = quantize_qwen3_params_int8(pack_qwen3_params(llm))
    jax.block_until_ready(params["layers"]["qkv_w"])
    st = prefill_init(params, jnp.asarray(
        rng.normal(size=(1, P_LEN, cfg.hidden)).astype(np.float32) * 0.05,
        jnp.bfloat16), jnp.ones((1, P_LEN), jnp.float32),
        jax.random.PRNGKey(0), cfg, max_len=P_LEN + 128)

    def round_fn(w, kv, i, salt, mode):
        toks = jnp.full((1, SPEC_K + 1), (i % 7).astype(jnp.int32))
        emb = embed_tokens(w, toks[0])[None].astype(jnp.bfloat16)
        emb = emb + salt.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
        positions = P_LEN + jnp.arange(SPEC_K + 1, jnp.int32)[None]
        logits_v, kv = qwen3_verify_step(
            w, kv, emb, jnp.asarray([P_LEN], jnp.int32), positions,
            jnp.asarray([0], jnp.int32), cfg)      # [1, K+1, V]
        if mode == "argmax":
            out = jnp.argmax(logits_v, axis=-1).astype(jnp.float32)
        elif mode == "warped_all":
            p, idx = warped_candidates(logits_v, jnp.asarray(0.4),
                                       jnp.asarray(1.0), 50)
            out = jnp.sum(p) + jnp.sum(idx.astype(jnp.float32))
        elif mode == "vals_only":
            vals = topk_vals_only(logits_v, 50)
            # acceptance needs p(d): threshold + Z + one logit gather
            z = jnp.sum(jnp.exp((vals - vals[..., :1]) / 0.4), axis=-1)
            out = jnp.sum(z)
        elif mode == "warped_one":
            lane = logits_v[:, SPEC_K // 2, :]
            p, idx = warped_candidates(lane, jnp.asarray(0.4),
                                       jnp.asarray(1.0), 50)
            out = jnp.sum(p) + jnp.sum(idx.astype(jnp.float32))
        elif mode == "vals_plus_one":
            vals = topk_vals_only(logits_v, 50)
            z = jnp.sum(jnp.exp((vals - vals[..., :1]) / 0.4), axis=-1)
            lane = logits_v[:, SPEC_K // 2, :]
            p, idx = warped_candidates(lane, jnp.asarray(0.4),
                                       jnp.asarray(1.0), 50)
            out = jnp.sum(z) + jnp.sum(p) + jnp.sum(idx.astype(jnp.float32))
        return jnp.sum(out), kv

    def make(mode):
        def f(w, salt, iters: int):
            def body(i, carry):
                acc, kv = carry
                o, kv = round_fn(w, kv, i, salt, mode)
                return acc + o, kv
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), st.kv))
            return acc
        return jax.jit(f, static_argnames=("iters",))

    base = two_point(make("argmax"), params, label="V0 verify+argmax")
    for mode, lbl in (("warped_all", "V1 +warped K+1 lanes"),
                      ("vals_only", "V2 +vals-only topk K+1"),
                      ("warped_one", "V3 +warped 1 lane"),
                      ("vals_plus_one", "V4 +vals K+1 & warped 1")):
        per = two_point(make(mode), params, label=lbl)
        print(f"    overhead vs V0: {(per-base)*1e3:.3f} ms/round")


if __name__ == "__main__":
    main()

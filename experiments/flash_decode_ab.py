"""Flash-decode kernel A/B on the real chip (VERDICT r3 item 4).

Times the real batched `generate_chunk` decode loop (int8 weights) at
b in {16, 32}, bf16 and int8 KV caches, with the Pallas flash-decode
attention forced OFF vs ON. Same two-point chained-chunk method as
bench.py (per-token = (t(n2)-t(n1)) / Δtokens, min-of-3).
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import fun_asr_gguf_tpu  # noqa: F401
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           pack_qwen3_params,
                                           quantize_qwen3_params_int8)

P_LEN = 204
CHUNK = 64


def fetch(x):
    return float(jax.device_get(jnp.sum(
        jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))


def measure(params, cfg, b, kv_int8, label):
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.normal(size=(b, P_LEN, cfg.hidden))
                         .astype(np.float32) * 0.05, jnp.bfloat16)
    mask = jnp.ones((b, P_LEN), jnp.float32)
    max_len = P_LEN + 4 * CHUNK + 52   # 512: tile-aligned cache

    def gen_chunks(n_chunks, seed):
        st = prefill_init(params, prompt, mask, jax.random.PRNGKey(seed),
                          cfg, max_len=max_len, kv_int8=kv_int8)
        toks = None
        for _ in range(n_chunks):
            st, toks = generate_chunk(
                params, st, cfg, jnp.asarray(0.0), jnp.asarray(1.0), 50,
                chunk_len=CHUNK, stop_tokens=(), fuse_enabled=False,
                greedy=True)
        return toks

    t_c = time.perf_counter()
    fetch(gen_chunks(1, 0))
    print(f"  {label}: compiled ({time.perf_counter()-t_c:.1f}s)",
          file=sys.stderr, flush=True)

    def total(k, seed):
        t0 = time.perf_counter()
        fetch(gen_chunks(k, seed))
        return time.perf_counter() - t0

    n1, n2 = 1, 4
    t1 = min(total(n1, 10 + i) for i in range(3))
    t2 = min(total(n2, 20 + i) for i in range(3))
    per_tok = (t2 - t1) / ((n2 - n1) * CHUNK)
    agg = b / per_tok
    print(f"  {label}: {per_tok*1e3:.3f} ms/step -> {agg:.0f} tok/s agg",
          flush=True)
    return agg


def main():
    cfg = HybridConfig().llm
    params = pack_qwen3_params(quantize_qwen3_params_int8(
        init_qwen3_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    for b in (16, 32):
        for kv_int8 in (False, True):
            kv = "kv8" if kv_int8 else "kvbf16"
            res = {}
            for mode in ("0", "1"):
                os.environ["FUNASR_FLASH_DECODE"] = mode
                # the gate is read at trace time: retrace everything
                jax.clear_caches()
                tag = "flash" if mode == "1" else "xla"
                res[tag] = measure(params, cfg, b, kv_int8,
                                   f"b{b},{kv},{tag}")
            win = (res["flash"] / res["xla"] - 1) * 100
            print(f"b{b} {kv}: xla {res['xla']:.0f} vs flash "
                  f"{res['flash']:.0f} tok/s ({win:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()

"""Gemma3-1B decode throughput on the real chip (random weights).

Proves the gemma graph (sandwich norms, GeGLU, sliding/global
interleave, dual rope) is TPU-production-capable, not just
CPU-parity-tested: times the real chunked generation loop at int8
weights, b=1 and b=8, with the same two-point chained method as
bench.py.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import fun_asr_gguf_tpu  # noqa: F401
from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           pack_qwen3_params,
                                           quantize_qwen3_params_int8)

P_LEN = 64
CHUNK = 64


def fetch(x):
    return float(jax.device_get(jnp.sum(
        jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))


def measure(params, cfg, b):
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.normal(size=(b, P_LEN, cfg.hidden))
                         .astype(np.float32) * 0.05, jnp.bfloat16)
    mask = jnp.ones((b, P_LEN), jnp.float32)
    max_len = P_LEN + 4 * CHUNK + 64

    def gen(n_chunks, seed):
        st = prefill_init(params, prompt, mask, jax.random.PRNGKey(seed),
                          cfg, max_len=max_len)
        toks = None
        for _ in range(n_chunks):
            st, toks = generate_chunk(
                params, st, cfg, jnp.asarray(0.0), jnp.asarray(1.0), 50,
                chunk_len=CHUNK, stop_tokens=(), fuse_enabled=False,
                greedy=True)
        return toks

    t0 = time.perf_counter()
    fetch(gen(1, 0))
    print(f"  b{b}: compiled ({time.perf_counter()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    def total(k, seed):
        t0 = time.perf_counter()
        fetch(gen(k, seed))
        return time.perf_counter() - t0

    t1 = min(total(1, 10 + i) for i in range(3))
    t2 = min(total(4, 20 + i) for i in range(3))
    per_tok = (t2 - t1) / (3 * CHUNK)
    print(f"  gemma3-1b int8 b={b}: {per_tok*1e3:.3f} ms/step -> "
          f"{b/per_tok:.0f} tok/s aggregate", flush=True)


def main():
    cfg = Qwen3Config.gemma3_1b()
    params = pack_qwen3_params(quantize_qwen3_params_int8(
        init_qwen3_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    n = sum(int(np.prod(v.shape)) for v in
            jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e9:.2f}B fields (int8 matmuls)", flush=True)
    for b in (1, 8):
        measure(params, cfg, b)


if __name__ == "__main__":
    main()

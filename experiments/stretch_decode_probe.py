"""Re-measure the stretch decoder presets (BASELINE configs[4]) on one chip.

Source of the numbers cited in README/docs/PERFORMANCE.md ("Stretch
decoders ... re-measured on round-5 code"): Qwen3-1.7B via on-device
init + int8 quantize; Qwen3-4B via DIRECT host-generated int8 upload
(an 8 GB bf16 init plus quantize transients OOMs a 16 GB chip — serving
loads int8/q8 from disk the same way). Two-point chained chunk timing,
identical to bench.py's generation lanes.

Run: python experiments/stretch_decode_probe.py [1.7B|4B|both]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/funasr_bench_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (Int8Weight, init_qwen3_params,
                                           pack_qwen3_params,
                                           quantize_lm_head_per_channel,
                                           quantize_qwen3_params_int8)

log = lambda *a: print("[stretch]", *a, file=sys.stderr, flush=True)
N_PROMPT, N_GEN, CHUNK = 204, 253, 64


def _measure(params, cfg, name):
    nbytes = sum(x.size * x.dtype.itemsize
                 for x in jax.tree_util.tree_leaves(params)
                 if hasattr(x, "dtype"))
    read_b = nbytes
    if any(k in params for k in ("lm_head", "lm_head_i8", "lm_head_q")) \
            and "embed" in params:
        read_b -= params["embed"].size * params["embed"].dtype.itemsize
    rngh = np.random.default_rng(0)
    prompt = jnp.asarray(rngh.normal(
        size=(1, N_PROMPT, cfg.hidden)).astype(np.float32) * 0.05,
        jnp.bfloat16)
    mask = jnp.ones((1, N_PROMPT), jnp.float32)

    def run(k, seed):
        st = prefill_init(params, prompt, mask, jax.random.PRNGKey(seed),
                          cfg, max_len=N_PROMPT + N_GEN + 8)
        toks = None
        for _ in range(k):
            st, toks = generate_chunk(
                params, st, cfg, jnp.asarray(0.0), jnp.asarray(1.0), 50,
                chunk_len=CHUNK, stop_tokens=(), fuse_enabled=False,
                greedy=True)
        return toks

    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(run(1, 0).astype(jnp.float32))))
    log(f"{name}: compiled {time.perf_counter()-t0:.1f}s")

    def total(k, seed):
        t0 = time.perf_counter()
        float(jax.device_get(jnp.sum(run(k, seed).astype(jnp.float32))))
        return time.perf_counter() - t0

    t1 = min(total(1, 10 + i) for i in range(2))
    t2 = min(total(3, 20 + i) for i in range(4))
    per = (t2 - t1) / (2 * CHUNK)
    log(f"{name}: {per*1000:.2f} ms/token -> {1/per:.0f} tok/s "
        f"({nbytes/1e9:.2f} GB footprint, {read_b/1e9:.2f} GB read -> "
        f"{read_b/1e9/per:.0f} GB/s decode-read stream)")


def run_17b():
    cfg = Qwen3Config(hidden=2048, n_layers=28, q_heads=16, kv_heads=8,
                      head_dim=128, ffn_dim=6144)
    t0 = time.perf_counter()
    init = jax.jit(lambda k, c=cfg: init_qwen3_params(
        k, c, dtype=jnp.bfloat16))
    params = init(jax.random.PRNGKey(0))
    jax.block_until_ready(params["embed"])
    log(f"1.7B: init {time.perf_counter()-t0:.1f}s")
    llm = quantize_qwen3_params_int8(
        quantize_lm_head_per_channel(pack_qwen3_params(params), cfg),
        donate=True)
    jax.block_until_ready(jax.tree_util.tree_leaves(llm)[0])
    del params
    _measure(llm, cfg, "1.7B int8")


def run_4b():
    cfg = Qwen3Config(hidden=2560, n_layers=36, q_heads=32, kv_heads=8,
                      head_dim=128, ffn_dim=9728)
    h = cfg.hidden
    qd, kd, fd, n = (cfg.q_heads * cfg.head_dim,
                     cfg.kv_heads * cfg.head_dim, cfg.ffn_dim,
                     cfg.n_layers)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    def i8(shape):
        w8 = np.frombuffer(rng.bytes(int(np.prod(shape))),
                           np.int8).reshape(shape)
        scale = (np.abs(rng.standard_normal(
            (*shape[:-2], 1, shape[-1]))).astype(np.float32) * 1e-4
            + 2e-4)
        return Int8Weight(w8=jnp.asarray(w8),
                          scale=jnp.asarray(scale, jnp.bfloat16))

    layers = {
        "input_ln": jnp.ones((n, h), jnp.bfloat16),
        "post_ln": jnp.ones((n, h), jnp.bfloat16),
        "q_norm": jnp.ones((n, cfg.head_dim), jnp.bfloat16),
        "k_norm": jnp.ones((n, cfg.head_dim), jnp.bfloat16),
        "qkv_w": i8((n, h, qd + 2 * kd)),
        "o_w": i8((n, qd, h)),
        "gate_up_w": i8((n, h, 2 * fd)),
        "down_w": i8((n, fd, h)),
    }
    emb = (np.frombuffer(rng.bytes(cfg.vocab_size * h),
                         np.int8).astype(np.float16) * 2e-4)
    params = {
        "layers": layers,
        "final_ln": jnp.ones((h,), jnp.bfloat16),
        "embed": jnp.asarray(emb.reshape(cfg.vocab_size, h),
                             jnp.bfloat16),
        "lm_head_i8": (
            jnp.asarray(np.frombuffer(rng.bytes(h * cfg.vocab_size),
                                      np.int8).reshape(h,
                                                       cfg.vocab_size)),
            jnp.asarray(np.abs(rng.standard_normal(
                (cfg.vocab_size,))).astype(np.float32) * 1e-4 + 2e-4)),
    }
    jax.block_until_ready(params["layers"]["qkv_w"].w8)
    log(f"4B: host-gen + upload {time.perf_counter()-t0:.1f}s")
    _measure(params, cfg, "4B int8")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1.7B", "both"):
        run_17b()
    if which in ("4B", "both"):
        run_4b()

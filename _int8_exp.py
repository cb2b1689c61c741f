"""XLA-native per-channel int8 LAYER weights: convert fused into dots?"""
import sys, time, jax, jax.numpy as jnp
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params, pack_qwen3_params,
                                           quantize_lm_head_per_channel)
import fun_asr_gguf_tpu.models.qwen3 as q3

def fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

cfg = HybridConfig()
rng = jax.random.PRNGKey(0)
llm = quantize_lm_head_per_channel(
    pack_qwen3_params(init_qwen3_params(rng, cfg.llm, dtype=jnp.bfloat16)),
    cfg.llm)
fetch(llm["embed"][:2, :2])

# quantize each packed layer matmul to int8 + per-out-channel scale
layers = dict(llm["layers"])
for key in ("qkv_w", "o_w", "gate_up_w", "down_w"):
    w = layers[key].astype(jnp.float32)          # [L, k, n]
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0   # [L, 1, n]
    w8 = jnp.round(w / jnp.where(s == 0, 1.0, s)).astype(jnp.int8)
    layers[key] = (w8, s.astype(jnp.bfloat16))
llm = dict(llm); llm["layers"] = layers

# patch _proj to handle the tuple
orig_proj = q3._proj
def proj_i8(x, w):
    if isinstance(w, tuple):
        w8, s = w
        out = jnp.dot(x.astype(jnp.bfloat16), w8.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return (out * s.astype(jnp.float32)).astype(x.dtype)
    return orig_proj(x, w)
q3._proj = proj_i8

N_PROMPT, chunk = 204, 64
prompt = jax.random.normal(rng, (1, N_PROMPT, cfg.llm.hidden), jnp.bfloat16) * 0.05
mask = jnp.ones((1, N_PROMPT), jnp.float32)
max_len = N_PROMPT + 253 + 8

def gen_chunks(n, seed):
    st = prefill_init(llm, prompt, mask, jax.random.PRNGKey(seed), cfg.llm, max_len=max_len)
    toks = None
    for _ in range(n):
        st, toks = generate_chunk(llm, st, cfg.llm, jnp.asarray(0.0), jnp.asarray(1.0),
                                  50, chunk_len=chunk, stop_tokens=(), fuse_enabled=False)
    return toks

t0 = time.perf_counter(); fetch(gen_chunks(1, 0))
print(f"compiled {time.perf_counter()-t0:.1f}s", file=sys.stderr)
def t(k, s):
    t0 = time.perf_counter(); fetch(gen_chunks(k, s)); return time.perf_counter()-t0
t1 = min(t(1, 10+i) for i in range(2)); t2 = min(t(3, 20+i) for i in range(2))
per = (t2-t1)/(2*chunk)
print(f"int8 layers + i8 head: {per*1000:.3f} ms/token -> {1/per:.0f} tok/s")

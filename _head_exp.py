"""bf16 decode with an XLA-native int8 per-channel lm_head."""
import sys, time, jax, jax.numpy as jnp
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params, pack_qwen3_params
import fun_asr_gguf_tpu.models.qwen3 as q3

def fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))

cfg = HybridConfig()
rng = jax.random.PRNGKey(0)
llm = pack_qwen3_params(init_qwen3_params(rng, cfg.llm, dtype=jnp.bfloat16))
fetch(llm["embed"][:2, :2])

mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
if mode == "i8head":
    head = llm["embed"].T.astype(jnp.float32)            # [h, vocab]
    scale = jnp.max(jnp.abs(head), axis=0) / 127.0       # [vocab]
    w_i8 = jnp.round(head / jnp.where(scale == 0, 1, scale)).astype(jnp.int8)
    llm = dict(llm)
    llm["lm_head_i8"] = (w_i8, scale.astype(jnp.float32))
    # monkeypatch _logits to use the int8 head (XLA path, no pallas)
    orig = q3._logits
    def logits_i8(params, x, cfg2):
        if "lm_head_i8" in params:
            w, s = params["lm_head_i8"]
            out = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return out * s[None, :]
        return orig(params, x, cfg2)
    q3._logits = logits_i8

N_PROMPT, chunk = 204, 64
prompt = jax.random.normal(rng, (1, N_PROMPT, cfg.llm.hidden), jnp.bfloat16) * 0.05
mask = jnp.ones((1, N_PROMPT), jnp.float32)
max_len = N_PROMPT + 253 + 8

def gen_chunks(n_chunks, seed):
    st = prefill_init(llm, prompt, mask, jax.random.PRNGKey(seed), cfg.llm, max_len=max_len)
    toks = None
    for _ in range(n_chunks):
        st, toks = generate_chunk(llm, st, cfg.llm, jnp.asarray(0.0), jnp.asarray(1.0),
                                  50, chunk_len=chunk, stop_tokens=(), fuse_enabled=False)
    return toks

fetch(gen_chunks(1, 0))
def t(k, s):
    t0 = time.perf_counter(); fetch(gen_chunks(k, s)); return time.perf_counter()-t0
t1 = min(t(1, 10+i) for i in range(2)); t2 = min(t(3, 20+i) for i in range(2))
per = (t2-t1)/(2*chunk)
print(f"{mode}: {per*1000:.3f} ms/token -> {1/per:.0f} tok/s")

"""Benchmark driver: full-size pipeline on one real TPU chip.

Measures the reference's headline workload (BASELINE.md): 60 s audio
through frontend + SANM encoder + adaptor + CTC, a 204-token embedding-
injection prefill, and 253 generated tokens — the reference GPU numbers are
1.89 s E2E / 219 tok/s generation on an RTX 5050 (README.md:200,268).

Prints ONE JSON line:
  {"metric": "rtf_60s_e2e", "value": <rtf>, "unit": "ratio",
   "vs_baseline": <ref_time / our_time>, ...sub-metrics...}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REF_E2E_S = 1.89          # BASELINE.md: reference E2E on 60 s audio
REF_GEN_TOKS_PER_S = 219.0
AUDIO_SECONDS = 60
N_PROMPT = 204            # 73 prefix + 126 audio + 5 suffix (README.md:267)
N_GEN = 253               # generated tokens in the reference run


def main():
    from fun_asr_gguf_tpu.frontend import FrontendConfig
    from fun_asr_gguf_tpu.models.adaptor import (ctc_head_forward,
                                                 init_ctc_head_params)
    from fun_asr_gguf_tpu.models.audio_encoder import (
        AudioEncoderConfig, audio_encoder_forward, init_audio_encoder_params,
        make_frontend_constants)
    from fun_asr_gguf_tpu.models.config import HybridConfig
    from fun_asr_gguf_tpu.models.generate import generate_chunk, prefill_init
    from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    cfg = HybridConfig()  # full-size Fun-ASR-Nano (SenseVoice + Qwen3-0.6B)
    audio_cfg = AudioEncoderConfig(frontend=FrontendConfig(),
                                   encoder=cfg.encoder, adaptor=cfg.adaptor)
    dtype = jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    t0 = time.perf_counter()
    audio_params = init_audio_encoder_params(k1, audio_cfg, dtype=dtype)
    ctc_params = init_ctc_head_params(k2, cfg.ctc, dtype=dtype)
    llm_params = init_qwen3_params(k3, cfg.llm, dtype=dtype)
    consts = jax.tree_util.tree_map(jnp.asarray,
                                    make_frontend_constants(audio_cfg))
    jax.block_until_ready(llm_params["embed"])
    print(f"[bench] params initialized in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    n = 16000 * AUDIO_SECONDS
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, n)).astype(np.float32) * 0.1)
    ilens = jnp.asarray([n], jnp.int32)

    # NOTE: the runtime memoizes identical dispatches, so every timed
    # iteration must use a distinct input (audio + i·ε, distinct rng seeds).
    def encode(a):
        enc, embd, _ = audio_encoder_forward(
            {"encoder": audio_params["encoder"],
             "adaptor": audio_params["adaptor"]},
            consts, a, ilens, cfg=audio_cfg, compute_dtype=dtype)
        return enc, embd

    ctc_fn = jax.jit(lambda p, e: ctc_head_forward(p, e.astype(dtype),
                                                   cfg.ctc))

    # warm-up compiles
    enc, embd = encode(audio)
    jax.block_until_ready(enc)
    idx = ctc_fn(ctc_params, enc)
    jax.block_until_ready(idx)

    def timeit(fn, iters=3):
        best = float("inf")
        for i in range(iters):
            arg = i + 1
            t0 = time.perf_counter()
            out = fn(arg)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    variants = [audio + 1e-6 * (i + 1) for i in range(4)]
    jax.block_until_ready(variants)
    t_encode = timeit(lambda i: encode(variants[i])[0])
    enc_variants = [encode(v)[0] for v in variants]
    jax.block_until_ready(enc_variants)
    t_ctc = timeit(lambda i: ctc_fn(ctc_params, enc_variants[i]))

    # ---- LLM prefill + generation ----
    prompt = embd[:, :N_PROMPT, :].astype(dtype)
    mask = jnp.ones((1, N_PROMPT), jnp.float32)
    max_len = N_PROMPT + N_GEN + 8
    prompts = [(prompt + 1e-3 * (i + 1)).astype(dtype) for i in range(8)]
    jax.block_until_ready(prompts)

    def prefill(i):
        return prefill_init(llm_params, prompts[i], mask,
                            jax.random.PRNGKey(i), cfg.llm, max_len=max_len)

    state = prefill(0)
    jax.block_until_ready(state.logits)
    t_prefill = timeit(lambda i: prefill(i).logits)

    def gen_full(i):
        st = prefill(i + 4)
        st, toks = generate_chunk(
            llm_params, st, cfg.llm, jnp.asarray(0.0), jnp.asarray(1.0),
            50, chunk_len=N_GEN, stop_tokens=(), fuse_enabled=False)
        return toks

    toks = gen_full(-4)         # compile (prefill(0) memoized anyway)
    jax.block_until_ready(toks)
    t_prefill_plus_gen = timeit(gen_full, iters=3)
    t_gen = max(t_prefill_plus_gen - t_prefill, 1e-9)
    gen_tps = N_GEN / t_gen

    total = t_encode + t_ctc + t_prefill + t_gen
    rtf = total / AUDIO_SECONDS

    result = {
        "metric": "rtf_60s_e2e",
        "value": round(rtf, 5),
        "unit": "ratio",
        "vs_baseline": round(REF_E2E_S / total, 2),
        "encode_ms": round(t_encode * 1000, 2),
        "ctc_ms": round(t_ctc * 1000, 2),
        "prefill_ms": round(t_prefill * 1000, 2),
        "generate_ms": round(t_gen * 1000, 2),
        "generate_tokens_per_s": round(gen_tps, 1),
        "gen_vs_baseline": round(gen_tps / REF_GEN_TOKS_PER_S, 2),
        "total_s": round(total, 4),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

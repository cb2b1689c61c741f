"""Per-op microbenchmarks (the llama-bench / test-backend-ops analogue).

Times the individual hot programs — frontend, one encoder block vs the full
stack, CTC head, prefill, single decode step, dense vs q8_0 matmul — with
the same memoization-safe two-point method as bench.py. Prints one JSON
object per op.

Usage:
    python -m fun_asr_gguf_tpu.tools.microbench [--tiny]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def two_point(rep, n1, n2):
    rep = jax.jit(rep, static_argnames=("iters",))
    for n in (n1, n2):
        _fetch(rep(iters=n))          # compile
    t1 = min(_timed(rep, n1) for _ in range(2))
    t2 = min(_timed(rep, n2) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _timed(rep, n):
    t0 = time.perf_counter()
    _fetch(rep(iters=n))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from ..frontend import FrontendConfig, compute_lfr_features, \
        frontend_constants
    from ..models.adaptor import ctc_head_forward, init_ctc_head_params
    from ..models.config import HybridConfig
    from ..models.generate import prefill_init
    from ..models.qwen3 import (init_qwen3_params, qwen3_decode_step,
                                quantize_qwen3_params)
    from ..models.sanm import encoder_forward, init_encoder_params
    from ..ops.quant_matmul import matmul_any, quantize_weight

    cfg = HybridConfig.tiny() if args.tiny else HybridConfig()
    secs = 2 if args.tiny else 60
    dtype = jnp.bfloat16
    out = []

    def report(name, per_iter_s, note=""):
        rec = {"op": name, "ms": round(per_iter_s * 1000, 3), "note": note}
        out.append(rec)
        print(json.dumps(rec), flush=True)

    fcfg = FrontendConfig()
    consts = jax.tree_util.tree_map(jnp.asarray, frontend_constants(fcfg))
    n = 16000 * secs
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, n)).astype(np.float32) * .1)
    ilens = jnp.asarray([n], jnp.int32)

    def frontend_rep(iters: int):
        def body(i, acc):
            x, _ = compute_lfr_features(
                consts, audio + (i + 1).astype(jnp.float32) * 1e-6, ilens,
                fcfg)
            return acc + jnp.sum(x)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    report("frontend_stft_mel_lfr", two_point(frontend_rep, 1, 4),
           f"{secs}s audio")

    t_lfr = fcfg.n_lfr_frames(n)
    enc_p = init_encoder_params(jax.random.PRNGKey(0), cfg.encoder, dtype)
    feats = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, t_lfr, cfg.encoder.input_size)).astype(np.float32) * 0.1,
        dtype)
    fmask = jnp.ones((1, t_lfr), dtype)

    def encoder_rep(iters: int):
        def body(i, acc):
            y = encoder_forward(enc_p, feats + (i + 1).astype(dtype)
                                * dtype(1e-3), fmask, cfg.encoder)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    n_layers = cfg.encoder.num_blocks + cfg.encoder.tp_blocks
    per = two_point(encoder_rep, 1, 3)
    report("encoder_full", per, f"{n_layers} SANM layers, T={t_lfr}")
    report("encoder_per_layer", per / n_layers)

    ctc_p = init_ctc_head_params(jax.random.PRNGKey(1), cfg.ctc, dtype)
    enc_out = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, t_lfr, cfg.encoder.d_model)).astype(np.float32) * 0.1,
        dtype)

    def ctc_rep(iters: int):
        def body(i, acc):
            idx = ctc_head_forward(
                ctc_p, enc_out + (i + 1).astype(dtype) * dtype(1e-3),
                cfg.ctc)
            return acc + jnp.sum(idx)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    report("ctc_head_argmax", two_point(ctc_rep, 1, 3),
           f"vocab={cfg.ctc.vocab_size}")

    llm_p = init_qwen3_params(jax.random.PRNGKey(2), cfg.llm, dtype)
    p_len = 16 if args.tiny else 204
    prompt = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, p_len, cfg.llm.hidden)).astype(np.float32) * 0.05, dtype)
    pmask = jnp.ones((1, p_len), jnp.float32)
    max_len = p_len + 64

    def prefill_rep(iters: int):
        def body(i, acc):
            st = prefill_init(llm_p, prompt + (i + 1).astype(dtype)
                              * dtype(1e-3), pmask, jax.random.PRNGKey(0),
                              cfg.llm, max_len=max_len)
            return acc + jnp.sum(st.logits)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    report("llm_prefill", two_point(prefill_rep, 1, 3), f"P={p_len}")

    from ..models.qwen3 import embed_tokens, init_kv_cache
    kv = init_kv_cache(cfg.llm, 1, max_len, dtype)
    st = prefill_init(llm_p, prompt, pmask, jax.random.PRNGKey(0), cfg.llm,
                      max_len=max_len)

    def decode_rep(params):
        def rep(iters: int):
            def body(i, carry):
                acc, kv = carry
                emb = embed_tokens(params, jnp.full((1,), i % 7,
                                                    jnp.int32)).astype(dtype)
                logits, kv = qwen3_decode_step(
                    params, kv, emb, jnp.asarray(p_len, jnp.int32) + i,
                    jnp.asarray([p_len], jnp.int32) + i,
                    jnp.asarray([0], jnp.int32), cfg.llm)
                return acc + jnp.sum(logits), kv
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), st.kv))
            return acc
        return rep

    report("llm_decode_step_bf16", two_point(decode_rep(llm_p), 4, 16))
    qp = quantize_qwen3_params(llm_p)
    report("llm_decode_step_q8_0", two_point(decode_rep(qp), 4, 16))

    # raw matmul comparison at the ffn shape
    k_dim, n_dim = cfg.llm.hidden, cfg.llm.ffn_dim
    x1 = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, k_dim)).astype(np.float32), dtype)
    w = jnp.asarray(np.random.default_rng(5).normal(
        size=(k_dim, n_dim)).astype(np.float32))
    qt = quantize_weight(w)
    wb = w.astype(dtype)

    def mm_dense(iters: int):
        def body(i, acc):
            xx = x1 + (i + 1).astype(dtype) * dtype(1e-3)
            return acc + jnp.sum(jnp.dot(
                xx, wb, preferred_element_type=jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def mm_q8(iters: int):
        def body(i, acc):
            xx = x1 + (i + 1).astype(dtype) * dtype(1e-3)
            return acc + jnp.sum(matmul_any(xx, qt))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    report("matvec_dense_bf16", two_point(mm_dense, 8, 64),
           f"[1,{k_dim}]x[{k_dim},{n_dim}]")
    report("matvec_q8_0", two_point(mm_q8, 8, 64))
    return out


if __name__ == "__main__":
    main()

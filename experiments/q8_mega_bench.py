"""Full-size q8 decode megakernel vs the production per-layer megacall
path, on the real chip (VERDICT r3 item 1: q8_0 >= 800 tok/s or a
bandwidth account).

Both paths run the identical chained-step timing harness: per-iteration
varying token embed, in-loop KV scatter, fori_loop two-point timing.
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

import fun_asr_gguf_tpu  # noqa: F401
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.generate import prefill_init
from fun_asr_gguf_tpu.models.qwen3 import (embed_tokens,
                                           fuse_qwen3_params_q8,
                                           init_qwen3_params,
                                           pack_qwen3_params,
                                           qwen3_decode_step,
                                           quantize_lm_head,
                                           quantize_qwen3_params,
                                           rope_cos_sin)
from fun_asr_gguf_tpu.ops.quant_matmul import (block_permute,
                                               q8_decode_all_fused)

P_LEN = 204
S_LEN = 512


def fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def two_point(jfn, args, n1=8, n2=56):
    def run(n, salt):
        t0 = time.perf_counter()
        fetch(jfn(args, jnp.float32(salt), iters=n))
        return time.perf_counter() - t0
    for i, n in enumerate((n1, n2)):
        run(n, 100 + i)
    t1 = min(run(n1, 10 + i) for i in range(5))
    t2 = min(run(n2, 20 + i) for i in range(5))
    per = max((t2 - t1) / (n2 - n1), 1e-9)
    print(f"  t({n1})={t1*1e3:.2f}ms t({n2})={t2*1e3:.2f}ms -> "
          f"{per*1e3:.3f} ms/step ({1/per:.0f} tok/s)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()
    cfg = HybridConfig().llm
    rng = np.random.default_rng(0)
    llm_p = init_qwen3_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)
    qp = fuse_qwen3_params_q8(pack_qwen3_params(
        quantize_qwen3_params(llm_p, mode="pallas")))
    qp = quantize_lm_head(qp, cfg, mode="pallas")
    jax.block_until_ready(qp["layers"]["qkv_w"].q)
    L = cfg.n_layers
    kh, hd = cfg.kv_heads, cfg.head_dim

    prompt = jnp.asarray(rng.normal(size=(1, P_LEN, cfg.hidden))
                         .astype(np.float32) * 0.05, jnp.bfloat16)
    pmask = jnp.ones((1, P_LEN), jnp.float32)
    st = prefill_init(qp, prompt, pmask, jax.random.PRNGKey(0), cfg,
                      max_len=S_LEN)

    # ---- reference: production decode step (per-layer megacalls) ----
    if not args.skip_ref:
        def p0(w, salt, iters: int):
            def body(i, carry):
                acc, kv = carry
                emb = embed_tokens(w, jnp.full((1,), i % 7, jnp.int32)
                                   ).astype(jnp.bfloat16)
                emb = emb + salt.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
                logits, kv = qwen3_decode_step(
                    w, kv, emb, jnp.asarray(P_LEN, jnp.int32),
                    jnp.asarray([P_LEN], jnp.int32),
                    jnp.asarray([0], jnp.int32), cfg)
                return acc + jnp.sum(logits), kv
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), st.kv))
            return acc

        print("[ref] per-layer megacall decode step:")
        two_point(jax.jit(p0, static_argnames=("iters",)), qp)

    # ---- megakernel: all layers + attention + head in one call ----
    # everything flows through jit ARGS (closed-over device arrays bake
    # into the HLO and 413 the remote-compile endpoint)
    ext = dict(
        norms_next=jnp.concatenate(
            [qp["layers"]["input_ln"][1:], qp["final_ln"][None]], axis=0),
        k_hm=jnp.transpose(st.kv.k[:, 0], (0, 2, 1, 3)),
        v_hm=jnp.transpose(st.kv.v[:, 0], (0, 2, 1, 3)))

    def mega(args, salt, iters: int):
        w, ext = args
        layers = w["layers"]
        j = jnp.arange(S_LEN)

        def body(i, carry):
            acc, kk, vv = carry
            slot = P_LEN + jax.lax.rem(i, 64)
            emb = embed_tokens(w, jnp.full((1,), i % 7, jnp.int32)
                               ).astype(jnp.float32)
            emb = emb + salt * 1e-6
            x0 = block_permute(emb)
            var = jnp.mean(x0 * x0, axis=-1, keepdims=True)
            nhb0 = ((x0 * jax.lax.rsqrt(var + cfg.rms_eps))
                    * layers["input_ln"][0][None]).astype(jnp.bfloat16)
            cos, sin = rope_cos_sin(slot[None], cfg.head_dim,
                                    cfg.rope_theta, jnp.float32)
            bias = jnp.where(j < slot, 0.0, -1e30
                             ).astype(jnp.float32)[None]
            out = q8_decode_all_fused(
                x0, nhb0, layers["post_ln"], ext["norms_next"],
                layers["q_norm"], layers["k_norm"], cos, sin, bias,
                kk, vv, layers["qkv_w"], layers["o_w"],
                layers["gate_up_w"], layers["down_w"], w["lm_head_q"],
                cfg.rms_eps)
            logits, kn, vn = out
            kk = jax.lax.dynamic_update_slice(
                kk, kn[:, :, None, :].astype(kk.dtype), (0, 0, slot, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, vn[:, :, None, :].astype(vv.dtype), (0, 0, slot, 0))
            return acc + jnp.sum(logits), kk, vv
        acc, _, _ = jax.lax.fori_loop(0, iters, body,
                                      (jnp.float32(0), ext["k_hm"],
                                       ext["v_hm"]))
        return acc

    print(f"[mega] all-layers fused decode step (S={S_LEN}):")
    two_point(jax.jit(mega, static_argnames=("iters",)), (qp, ext))


if __name__ == "__main__":
    main()

"""Round-3 q8_0 decode probe: where do the 44 us/layer go?

Decomposes the staged-megacall q8_0 decode time (VERDICT r2 item 1) into
  (a) the pipelined DMA floor of one layer's weight bytes,
  (b) per-pallas_call fixed cost (call ramp),
  (c) XLA<->custom-call serialization (attention between megacalls cannot
      overlap the next call's weight DMA).
by timing three configurations with the same bytes:

  P1  28 chained q8_mlp_qkv_fused staged calls, NO attention between
      -> per-layer time with call boundaries but no XLA work between.
  P2  ONE pallas_call with grid=(L*steps,), same stage structure walked
      across all 28 layers -> per-layer time with no call boundaries.
  P0  the real qwen3_decode_step (q8_0 fused path) for reference.

Also feasibility probes:
  P3  in-kernel reshape [1, 2048] -> [16, 128] (head-major qkv for a
      future in-kernel attention stage).
  P4  f16 scale loads in-kernel (d stored f16 halves scale bytes).

Usage: python experiments/q8_probe.py [--skip-real]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fun_asr_gguf_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS vmem limit)
from fun_asr_gguf_tpu.ops.quant_matmul import (
    BLOCK, IndexedQuant, QuantTensor, _mega_stage_plan, q8_mlp_qkv_fused)

L = 28
M = 1
QD, H, F2, FFN, NQ = 2048, 1024, 6144, 3072, 4096
EPS = 1e-6


def _fetch(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def two_point(fn, n1, n2, args):
    """fn(args_dict, iters=n) — weights MUST be jit arguments, not
    closures: closed-over device arrays bake into the lowered HLO and the
    axon remote-compile endpoint rejects >100 MB bodies (413)."""
    jfn = jax.jit(fn, static_argnames=("iters",))
    for n in (n1, n2):
        _fetch(jfn(args, iters=n))
    t1 = min(_timed(jfn, args, n1) for _ in range(3))
    t2 = min(_timed(jfn, args, n2) for _ in range(3))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _timed(fn, args, n):
    t0 = time.perf_counter()
    _fetch(fn(args, iters=n))
    return time.perf_counter() - t0


def rand_qt(rng, n, k):
    return QuantTensor(
        q=jnp.asarray(rng.integers(-127, 128, size=(L, n, k), dtype=np.int8)),
        d=jnp.asarray(rng.random((L, n, k // BLOCK), dtype=np.float32)
                      * 0.01 + 0.001))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-real", action="store_true")
    ap.add_argument("--scale-dtype", default="f32")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    o_w = rand_qt(rng, H, QD)
    gu_w = rand_qt(rng, F2, H)
    dn_w = rand_qt(rng, H, FFN)
    qk_w = rand_qt(rng, NQ, H)
    if args.scale_dtype == "f16":
        o_w, gu_w, dn_w, qk_w = [
            QuantTensor(q=w.q, d=w.d.astype(jnp.float16))
            for w in (o_w, gu_w, dn_w, qk_w)]
    pw = jnp.asarray(rng.random(H, dtype=np.float32))
    nw = jnp.asarray(rng.random(H, dtype=np.float32))
    xm0 = jnp.asarray(rng.random((M, QD), dtype=np.float32) * 0.1,
                      jnp.bfloat16)
    res0 = jnp.asarray(rng.random((M, H), dtype=np.float32) * 0.1)

    wbytes = (H * QD + F2 * H + H * FFN + NQ * H)
    sbytes = wbytes // BLOCK * (2 if args.scale_dtype == "f16" else 4)
    mb = (wbytes + sbytes) / 1e6
    print(f"[shapes] per-layer weights {mb:.2f} MB -> DMA floor "
          f"{mb / 819e3 * 1e3:.1f} us @819GB/s, "
          f"{mb / 740e3 * 1e3:.1f} us @740GB/s")
    W = {"o": o_w, "gu": gu_w, "dn": dn_w, "qk": qk_w,
         "pw": pw, "nw": nw, "xm0": xm0, "res0": res0}

    # ---------------- P1: chained per-layer megacalls, no attention ----
    def p1(w, iters: int):
        def body(i, carry):
            acc, xm, res = carry
            xm = xm + (i % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            for l in range(L):
                res, qkv = q8_mlp_qkv_fused(
                    xm, res, w["pw"], w["nw"],
                    IndexedQuant(w["o"], l), IndexedQuant(w["gu"], l),
                    IndexedQuant(w["dn"], l), IndexedQuant(w["qk"], l), EPS)
                xm = qkv[:, :QD].astype(jnp.bfloat16)
            return acc + jnp.sum(res), w["xm0"], w["res0"]
        acc, _, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), w["xm0"], w["res0"]))
        return acc

    per = two_point(p1, 2, 8, W)
    print(f"[P1] chained megacalls, no attention: {per * 1e6 / L:.1f} "
          f"us/layer ({per * 1e3:.3f} ms / {L} layers)")

    # ---------------- P2: one call, grid=(L*steps,) --------------------
    plan = _mega_stage_plan(M, QD, H, F2, FFN, NQ)
    ko, ng, kd, nqc = plan
    steps = ko + ng + kd + nqc
    print(f"[plan] ko={ko} ng={ng} kd={kd} nqc={nqc} steps/layer={steps}")
    cko, cng, ckd, cnq = QD // ko, F2 // ng, FFN // kd, NQ // nqc
    base = ko + ng + kd

    def clamp(v, lo, hi):
        return jnp.minimum(jnp.maximum(v, lo), hi)

    def kern(xm_ref, res_ref, pw_ref, nw_ref, oq_ref, od_ref, gq_ref,
             gd_ref, dq_ref, dd_ref, qq_ref, qd_ref, o_ref, qkv_ref,
             acc_ref, h1_ref, nhb_ref, gu_ref, act_ref):
        s = pl.program_id(0)
        st = jax.lax.rem(s, steps)
        f = F2 // 2

        def chunk_dot(x, qchunk, dfull):
            reps = qchunk.shape[-1] // dfull.shape[-1]
            dexp = jnp.concatenate([dfull.astype(jnp.bfloat16)] * reps,
                                   axis=1)
            return jax.lax.dot_general(
                x, qchunk.astype(jnp.bfloat16) * dexp,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        for c in range(ko):
            @pl.when(st == c)
            def _(c=c):
                part = chunk_dot(xm_ref[:, c * cko:(c + 1) * cko],
                                 oq_ref[0], od_ref[0])
                if c == 0:
                    acc_ref[:] = part
                else:
                    acc_ref[:] += part

        @pl.when(st == ko - 1)
        def _():
            h1 = acc_ref[:] + res_ref[:].astype(jnp.float32)
            var = jnp.mean(h1 * h1, axis=-1, keepdims=True)
            nh = (h1 * jax.lax.rsqrt(var + EPS)) * pw_ref[:]
            h1_ref[:] = h1
            nhb_ref[:] = nh.astype(jnp.bfloat16)

        for c in range(ng):
            @pl.when(st == ko + c)
            def _(c=c):
                dexp = jnp.concatenate(
                    [gd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
                deq = gq_ref[0].astype(jnp.bfloat16) * dexp
                gu_ref[:, c * cng:(c + 1) * cng] = jax.lax.dot_general(
                    nhb_ref[:], deq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(st == ko + ng - 1)
        def _():
            gu = gu_ref[:]
            act_ref[:] = (jax.nn.silu(gu[:, :f]) * gu[:, f:]
                          ).astype(jnp.bfloat16)

        for c in range(kd):
            @pl.when(st == ko + ng + c)
            def _(c=c):
                part = chunk_dot(act_ref[:, c * ckd:(c + 1) * ckd],
                                 dq_ref[0], dd_ref[0])
                if c == 0:
                    acc_ref[:] = part
                else:
                    acc_ref[:] += part

        @pl.when(st == ko + ng + kd - 1)
        def _():
            out = acc_ref[:] + h1_ref[:]
            o_ref[:] = out
            var = jnp.mean(out * out, axis=-1, keepdims=True)
            nh2 = (out * jax.lax.rsqrt(var + EPS)) * nw_ref[:]
            nhb_ref[:] = nh2.astype(jnp.bfloat16)

        @pl.when(st >= base)
        def _():
            dexp = jnp.concatenate(
                [qd_ref[0].astype(jnp.bfloat16)] * BLOCK, axis=1)
            deq = qq_ref[0].astype(jnp.bfloat16) * dexp
            qkv_ref[:] = jax.lax.dot_general(
                nhb_ref[:], deq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    in_specs = [
        pl.BlockSpec((M, QD), lambda s: (0, 0)),
        pl.BlockSpec((M, H), lambda s: (0, 0)),
        pl.BlockSpec((1, H), lambda s: (0, 0)),
        pl.BlockSpec((1, H), lambda s: (0, 0)),
        pl.BlockSpec((1, H, cko),
                     lambda s: (s // steps, 0,
                                clamp(s % steps, 0, ko - 1))),
        pl.BlockSpec((1, H, QD // BLOCK), lambda s: (s // steps, 0, 0)),
        pl.BlockSpec((1, cng, H),
                     lambda s: (s // steps,
                                clamp(s % steps - ko, 0, ng - 1), 0)),
        pl.BlockSpec((1, cng, H // BLOCK),
                     lambda s: (s // steps,
                                clamp(s % steps - ko, 0, ng - 1), 0)),
        pl.BlockSpec((1, H, ckd),
                     lambda s: (s // steps, 0,
                                clamp(s % steps - ko - ng, 0, kd - 1))),
        pl.BlockSpec((1, H, FFN // BLOCK), lambda s: (s // steps, 0, 0)),
        pl.BlockSpec((1, cnq, H),
                     lambda s: (s // steps,
                                clamp(s % steps - base, 0, nqc - 1), 0)),
        pl.BlockSpec((1, cnq, H // BLOCK),
                     lambda s: (s // steps,
                                clamp(s % steps - base, 0, nqc - 1), 0)),
    ]
    scratch = [
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, H), jnp.float32),
        pltpu.VMEM((M, H), jnp.bfloat16),
        pltpu.VMEM((M, F2), jnp.float32),
        pltpu.VMEM((M, FFN), jnp.bfloat16),
    ]

    def mega_multi(w, xm, res):
        return pl.pallas_call(
            kern,
            grid=(L * steps,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((M, H), lambda s: (0, 0)),
                pl.BlockSpec((M, cnq),
                             lambda s: (0, clamp(s % steps - base, 0,
                                                 nqc - 1))),
            ],
            out_shape=(jax.ShapeDtypeStruct((M, H), jnp.float32),
                       jax.ShapeDtypeStruct((M, NQ), jnp.float32)),
            scratch_shapes=scratch,
        )(xm, res, w["pw"].reshape(1, H), w["nw"].reshape(1, H),
          w["o"].q, w["o"].d, w["gu"].q, w["gu"].d,
          w["dn"].q, w["dn"].d, w["qk"].q, w["qk"].d)

    def p2(w, iters: int):
        def body(i, carry):
            acc, xm, res = carry
            xm = xm + (i % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            out, qkv = mega_multi(w, xm, res)
            return acc + jnp.sum(out) + jnp.sum(qkv), w["xm0"], w["res0"]
        acc, _, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0), w["xm0"], w["res0"]))
        return acc

    per = two_point(p2, 2, 8, W)
    print(f"[P2] one call grid=({L}*{steps}): {per * 1e6 / L:.1f} us/layer "
          f"({per * 1e3:.3f} ms total)")

    # ---------------- P3: in-kernel reshape probes ----------------------
    for shape_in, shape_out in (((1, 2048), (16, 128)),
                                ((1, 512), (4, 128)),
                                ((16, 128), (1, 2048))):
        def rk(i_ref, o_ref, so=shape_out):
            o_ref[:] = i_ref[:].reshape(so)
        try:
            x = jnp.arange(np.prod(shape_in), dtype=jnp.float32
                           ).reshape(shape_in)
            y = pl.pallas_call(
                rk, out_shape=jax.ShapeDtypeStruct(shape_out, jnp.float32),
            )(x)
            ok = np.allclose(np.asarray(y).ravel(), np.asarray(x).ravel())
            print(f"[P3] reshape {shape_in}->{shape_out}: OK exact={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"[P3] reshape {shape_in}->{shape_out}: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")

    # ---------------- P4: f16 scale load in-kernel ----------------------
    def f16k(q_ref, d_ref, o_ref):
        dexp = jnp.concatenate([d_ref[:].astype(jnp.bfloat16)] * BLOCK,
                               axis=1)
        o_ref[:] = (q_ref[:].astype(jnp.bfloat16) * dexp).astype(jnp.float32)

    try:
        q = jnp.asarray(rng.integers(-127, 128, (256, 1024), np.int8))
        d = jnp.asarray(rng.random((256, 32), np.float32), jnp.float16)
        y = pl.pallas_call(
            f16k, out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.float32),
        )(q, d)
        ref = (np.asarray(q, np.float32)
               * np.tile(np.asarray(d, np.float32), (1, BLOCK)))
        err = float(np.max(np.abs(np.asarray(y) - ref)))
        print(f"[P4] f16 scales in-kernel: OK maxerr={err:.4g}")
    except Exception as e:  # noqa: BLE001
        print(f"[P4] f16 scales in-kernel: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}")

    # ---------------- P0: real decode step ------------------------------
    if not args.skip_real:
        from fun_asr_gguf_tpu.models.config import HybridConfig
        from fun_asr_gguf_tpu.models.generate import prefill_init
        from fun_asr_gguf_tpu.models.qwen3 import (
            embed_tokens, fuse_qwen3_params_q8, init_qwen3_params,
            pack_qwen3_params, qwen3_decode_step, quantize_lm_head,
            quantize_qwen3_params)
        cfg = HybridConfig().llm
        llm_p = init_qwen3_params(jax.random.PRNGKey(2), cfg, jnp.bfloat16)
        qp = fuse_qwen3_params_q8(pack_qwen3_params(
            quantize_qwen3_params(llm_p, mode="pallas")))
        qp = quantize_lm_head(qp, cfg, mode="pallas")
        p_len = 204
        prompt = jnp.asarray(rng.normal(size=(1, p_len, cfg.hidden))
                             .astype(np.float32) * 0.05, jnp.bfloat16)
        pmask = jnp.ones((1, p_len), jnp.float32)
        st = prefill_init(qp, prompt, pmask, jax.random.PRNGKey(0), cfg,
                          max_len=p_len + 64)

        def p0(w, iters: int):
            def body(i, carry):
                acc, kv = carry
                emb = embed_tokens(w, jnp.full((1,), i % 7, jnp.int32)
                                   ).astype(jnp.bfloat16)
                logits, kv = qwen3_decode_step(
                    w, kv, emb, jnp.asarray(p_len, jnp.int32),
                    jnp.asarray([p_len], jnp.int32),
                    jnp.asarray([0], jnp.int32), cfg)
                return acc + jnp.sum(logits), kv
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), st.kv))
            return acc

        per = two_point(p0, 4, 16, qp)
        print(f"[P0] real q8_0 decode step: {per * 1e3:.3f} ms/token "
              f"({1 / per:.0f} tok/s)")


if __name__ == "__main__":
    main()

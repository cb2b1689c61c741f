"""P5: achievable HBM bandwidth for the q8 decode's access pattern.

Streams the same per-layer bytes as the staged megacall (17.69 MB:
o/gu/dn/qk int8 chunks + f32 scales) through a grid with the same chunk
structure, but the per-step compute is (a) a trivial int8 sum (pure DMA
bound) or (b) the dequant multiply + matvec (the real stage compute).
The delta separates bandwidth from VPU-dequant cost; (a)'s effective
GB/s is the practical roofline the megakernel design should be judged
against (VERDICT r3 item 1: "a per-layer bandwidth account proving the
residual gap is structural").

Also (c): scales stored f16 (what the GGUF holds) instead of f32 —
-6.25% of weight bytes if the f16→f32 in-kernel load chain works.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fun_asr_gguf_tpu  # noqa: F401

L = 28
QD, H, F2, FFN, NQ = 2048, 1024, 6144, 3072, 4096
BLOCK = 32


_salt = [0]


def two_point(jfn, args, n1=2, n2=8):
    def run(n):
        # vary a traced arg per call: the remote tunnel memoizes
        # dispatches with identical (program, args)
        _salt[0] += 1
        t0 = time.perf_counter()
        float(jax.device_get(jfn(args, jnp.float32(_salt[0]), iters=n)))
        return time.perf_counter() - t0
    for n in (n1, n2):
        run(n)
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    print(f"    [two_point] t({n1})={t1*1e3:.2f}ms t({n2})={t2*1e3:.2f}ms")
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    # one flat weight blob per stage family, [L, n, k] int8 + f32 scales
    mk = lambda n, k: (
        jnp.asarray(rng.integers(-127, 128, (L, n, k), dtype=np.int8)),
        jnp.asarray(rng.random((L, n, k // BLOCK), np.float32)))
    o_q, o_d = mk(H, QD)
    g_q, g_d = mk(F2, H)
    d_q, d_d = mk(H, FFN)
    q_q, q_d = mk(NQ, H)
    wbytes = (H * QD + F2 * H + H * FFN + NQ * H)
    sbytes = wbytes // BLOCK * 4
    mb = (wbytes + sbytes) / 1e6
    print(f"[shapes] {mb:.2f} MB/layer x {L} layers")

    # same stage split as _mega_stage_plan: ko=2 ng=6 kd=2 nqc=4
    ko, ng, kd, nqc = 2, 6, 2, 4
    steps = ko + ng + kd + nqc
    cko, cng, ckd, cnq = QD // ko, F2 // ng, FFN // kd, NQ // nqc

    def make(kern, extra_specs=(), seed_spec=False):
        pre = ([pl.BlockSpec((1, 128), lambda s: (0, 0))]
               if seed_spec else [])
        in_specs = pre + [
            pl.BlockSpec((1, H, cko), lambda s: (s // steps, 0,
                         jnp.clip(s % steps, 0, ko - 1))),
            pl.BlockSpec((1, H, QD // BLOCK), lambda s: (s // steps, 0, 0)),
            pl.BlockSpec((1, cng, H), lambda s: (s // steps,
                         jnp.clip(s % steps - ko, 0, ng - 1), 0)),
            pl.BlockSpec((1, cng, H // BLOCK), lambda s: (s // steps,
                         jnp.clip(s % steps - ko, 0, ng - 1), 0)),
            pl.BlockSpec((1, H, ckd), lambda s: (s // steps, 0,
                         jnp.clip(s % steps - ko - ng, 0, kd - 1))),
            pl.BlockSpec((1, H, FFN // BLOCK), lambda s: (s // steps, 0, 0)),
            pl.BlockSpec((1, cnq, H), lambda s: (s // steps,
                         jnp.clip(s % steps - ko - ng - kd, 0, nqc - 1), 0)),
            pl.BlockSpec((1, cnq, H // BLOCK), lambda s: (s // steps,
                         jnp.clip(s % steps - ko - ng - kd, 0, nqc - 1), 0)),
        ] + list(extra_specs)

        def call(*args):
            return pl.pallas_call(
                kern,
                grid=(L * steps,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, 128), lambda s: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            )(*args)
        return call

    # (a) pure streaming: touch all bytes, trivial reduce. The varying
    # `seed` input stops XLA hoisting the (otherwise loop-invariant)
    # pallas_call out of the timing loop.
    def sum_kern(seed, oq, od, gq, gd, dq, dd, qq, qd_, out):
        s = pl.program_id(0)
        st = jax.lax.rem(s, steps)

        def red(q, d):
            r = (jnp.sum(q[0].astype(jnp.int32)).astype(jnp.float32)
                 + jnp.sum(d[0]))
            return jnp.full((1, 128), r, jnp.float32) + seed[:]

        @pl.when(st < ko)
        def _():
            out[:] = red(oq, od)
        @pl.when((st >= ko) & (st < ko + ng))
        def _():
            out[:] = red(gq, gd)
        @pl.when((st >= ko + ng) & (st < ko + ng + kd))
        def _():
            out[:] = red(dq, dd)
        @pl.when(st >= ko + ng + kd)
        def _():
            out[:] = red(qq, qd_)

    stream = make(sum_kern, seed_spec=True)

    def p_stream(w, salt, iters: int):
        def body(i, acc):
            seed = jnp.full((1, 128), i, jnp.float32) + salt
            return acc + jnp.sum(stream(seed, *w))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    jfn = jax.jit(p_stream, static_argnames=("iters",))
    per = two_point(jfn, (o_q, o_d, g_q, g_d, d_q, d_d, q_q, q_d))
    gbs = mb * L / 1e3 / per
    print(f"[P5a] pure stream: {per * 1e6 / L:.1f} us/layer -> "
          f"{gbs:.0f} GB/s effective")

    # (b) dequant+matvec: the real per-stage compute
    x = jnp.asarray(rng.random((1, max(QD, H, FFN)), np.float32) * 0.1,
                    jnp.bfloat16)

    def dq_kern(oq, od, gq, gd, dq, dd, qq, qd_, xr, out):
        s = pl.program_id(0)
        st = jax.lax.rem(s, steps)

        def mv(q, d, kdim):
            reps = q.shape[-1] // d.shape[-1]
            dexp = jnp.concatenate([d[0].astype(jnp.bfloat16)] * reps,
                                   axis=1)
            deq = q[0].astype(jnp.bfloat16) * dexp
            prod = jax.lax.dot_general(
                xr[:, :q.shape[1]], deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return prod[:, :128]

        @pl.when(st < ko)
        def _():
            out[:] = mv(oq, od, QD)
        @pl.when((st >= ko) & (st < ko + ng))
        def _():
            out[:] = mv(gq, gd, H)
        @pl.when((st >= ko + ng) & (st < ko + ng + kd))
        def _():
            out[:] = mv(dq, dd, FFN)
        @pl.when(st >= ko + ng + kd)
        def _():
            out[:] = mv(qq, qd_, H)

    deq = make(dq_kern, extra_specs=[
        pl.BlockSpec((1, max(QD, H, FFN)), lambda s: (0, 0))])

    def p_deq(w, salt, iters: int):
        def body(i, acc):
            xi = (w[-1] + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
                  + salt.astype(jnp.bfloat16) * jnp.bfloat16(1e-4))
            return acc + jnp.sum(deq(*w[:-1], xi))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    jfn = jax.jit(p_deq, static_argnames=("iters",))
    per = two_point(jfn, (o_q, o_d, g_q, g_d, d_q, d_d, q_q, q_d, x))
    print(f"[P5b] dequant+matvec: {per * 1e6 / L:.1f} us/layer -> "
          f"{mb * L / 1e3 / per:.0f} GB/s effective")

    # (c) f16 scales through an f32 intermediate cast
    try:
        def f16_kern(q_ref, d_ref, o_ref):
            d32 = d_ref[:].astype(jnp.float32)
            dexp = jnp.concatenate([d32.astype(jnp.bfloat16)] * BLOCK,
                                   axis=1)
            o_ref[:] = jnp.sum(q_ref[:].astype(jnp.bfloat16) * dexp,
                               axis=0, keepdims=True).astype(jnp.float32)
        qq16 = jnp.asarray(rng.integers(-127, 128, (256, 1024), np.int8))
        dd16 = jnp.asarray(rng.random((256, 32), np.float32), jnp.float16)
        y = pl.pallas_call(
            f16_kern,
            out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32))(
            qq16, dd16)
        jax.block_until_ready(y)
        print("[P5c] f16 scales via f32 cast: OK")
    except Exception as e:  # noqa: BLE001
        print(f"[P5c] f16 scales via f32 cast: FAIL {type(e).__name__}: "
              f"{str(e)[:160]}")


if __name__ == "__main__":
    main()

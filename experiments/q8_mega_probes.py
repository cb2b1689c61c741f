"""Feasibility probes for the all-layers q8 decode megakernel.

P6  pltpu.repeat scale expansion (natural k order: lane i ↔ scale i//32)
    — if this works, the megakernel keeps activations in NATURAL lane
    order end-to-end (no perm space / block-transpose bookkeeping).
P7  in-kernel small transpose (64,32)->(32,64) (fallback perm path).
P8  rope on [16,128] heads: lane-slice halves + concat, vs the R-matrix
    (one [128,128] constant dot) formulation.
P9  batched dot_general (8,2,128)x(8,CS,128) batch-dim support.
P10 sublane slice read/write q[2h:2h+2, :].
P11 per-head slice of a head-major KV block [8, CS, 128] -> [CS, 128].
P12 one full in-kernel attention stage (online softmax over chunks +
    current-token init) vs an XLA reference.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fun_asr_gguf_tpu  # noqa: F401

BLOCK = 32


def report(name, fn):
    try:
        ok = fn()
        print(f"[{name}] OK {ok if ok is not True else ''}")
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] FAIL {type(e).__name__}: {str(e)[:180]}")


def p6():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-127, 128, (256, 1024), np.int8))
    d = jnp.asarray(rng.random((256, 32), np.float32))

    def kern(q_ref, d_ref, o_ref):
        dexp = pltpu.repeat(d_ref[:].astype(jnp.bfloat16), BLOCK, axis=1)
        o_ref[:] = (q_ref[:].astype(jnp.bfloat16) * dexp
                    ).astype(jnp.float32)

    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 1024), jnp.float32))(q, d)
    ref = np.asarray(q, np.float32) * np.repeat(
        np.asarray(d, np.float32).astype(np.float32), BLOCK, axis=1)
    # bf16 rounding of scales
    err = float(np.max(np.abs(np.asarray(y) - ref) / (np.abs(ref) + 1e-6)))
    assert err < 0.01, f"relerr {err}"
    return f"natural-order repeat works, relerr {err:.2e}"


def p7():
    x = jnp.arange(2048, dtype=jnp.float32).reshape(64, 32)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((32, 64), jnp.float32))(x)
    assert np.array_equal(np.asarray(y), np.asarray(x).T)
    return True


def p8():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    pos = 37
    half = 64
    inv = 1.0 / (1e6 ** (np.arange(half) / half))
    ang = pos * inv
    cos = np.concatenate([np.cos(ang), np.cos(ang)])[None]  # [1,128]
    sin = np.concatenate([np.sin(ang), np.sin(ang)])[None]
    ref = (np.asarray(q) * cos
           + np.concatenate([-np.asarray(q)[:, half:],
                             np.asarray(q)[:, :half]], axis=1) * sin)

    # variant a: lane slice + concat
    def kern_a(q_ref, c_ref, s_ref, o_ref):
        qq = q_ref[:]
        rot = jnp.concatenate([-qq[:, half:], qq[:, :half]], axis=1)
        o_ref[:] = qq * c_ref[:] + rot * s_ref[:]

    ya = pl.pallas_call(
        kern_a, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
        q, jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))
    erra = float(np.max(np.abs(np.asarray(ya) - ref)))

    # variant b: R-matrix dot
    R = np.zeros((128, 128), np.float32)
    for i in range(half):
        R[i, i + half] = 1.0      # x[:, :64] -> out[:, 64:]
        R[i + half, i] = -1.0     # x[:, 64:] -> -out[:, :64]

    def kern_b(q_ref, r_ref, c_ref, s_ref, o_ref):
        qq = q_ref[:]
        rot = jnp.dot(qq, r_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = qq * c_ref[:] + rot * s_ref[:]

    yb = pl.pallas_call(
        kern_b, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(
        q, jnp.asarray(R), jnp.asarray(cos, jnp.float32),
        jnp.asarray(sin, jnp.float32))
    errb = float(np.max(np.abs(np.asarray(yb) - ref)))
    return f"slice-concat err {erra:.2e}; R-matrix err {errb:.2e}"


def p9():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(8, 2, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 2, 256), jnp.float32))(a, b)
    ref = np.einsum("hqd,hsd->hqs", np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(y), ref, atol=1e-3)
    return True


def p10():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))

    def kern(x_ref, o_ref):
        for h in range(8):
            blk = x_ref[2 * h:2 * h + 2, :]
            o_ref[2 * h:2 * h + 2, :] = blk * (h + 1.0)

    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x)
    ref = np.asarray(x) * np.repeat(np.arange(1, 9), 2)[:, None]
    assert np.allclose(np.asarray(y), ref)
    return True


def p11():
    rng = np.random.default_rng(4)
    kv = jnp.asarray(rng.normal(size=(8, 256, 128)).astype(np.float32))

    def kern(kv_ref, o_ref):
        acc = jnp.zeros((256, 128), jnp.float32)
        for h in range(8):
            acc = acc + kv_ref[h] * (h + 1.0)
        o_ref[:] = acc

    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32))(kv)
    ref = sum(np.asarray(kv)[h] * (h + 1.0) for h in range(8))
    assert np.allclose(np.asarray(y), ref, atol=1e-4)
    return True


def p12():
    """Full attention stage over a chunked head-major cache with
    current-token init, vs XLA reference (GQA 16q/8kv heads)."""
    rng = np.random.default_rng(5)
    S, CS, D, QH, KH = 512, 256, 128, 16, 8
    slot = 300                      # cache rows < slot are valid history
    q = jnp.asarray(rng.normal(size=(QH, D)).astype(np.float32)) * 0.3
    K = jnp.asarray(rng.normal(size=(KH, S, D)).astype(np.float32)) * 0.3
    V = jnp.asarray(rng.normal(size=(KH, S, D)).astype(np.float32)) * 0.3
    kc = jnp.asarray(rng.normal(size=(KH, D)).astype(np.float32)) * 0.3
    vc = jnp.asarray(rng.normal(size=(KH, D)).astype(np.float32)) * 0.3
    bias = jnp.where(jnp.arange(S) < slot, 0.0, -1e30
                     ).astype(jnp.float32)[None]                # [1, S]
    scale = D ** -0.5
    A = S // CS

    def kern(q_ref, kc_ref, vc_ref, k_ref, v_ref, b_ref, o_ref,
             m_ref, l_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            # init with the current token (always visible): m = s_cur,
            # l = 1, acc = v_cur per q-head
            for h in range(KH):
                qh = q_ref[2 * h:2 * h + 2, :]
                s_cur = jnp.sum(qh * kc_ref[h:h + 1, :], axis=1,
                                keepdims=True) * scale          # [2,1]
                m_ref[2 * h:2 * h + 2, :] = jnp.broadcast_to(s_cur, (2, D))
                l_ref[2 * h:2 * h + 2, :] = jnp.ones((2, D), jnp.float32)
                acc_ref[2 * h:2 * h + 2, :] = jnp.broadcast_to(
                    vc_ref[h:h + 1, :], (2, D))

        for h in range(KH):
            qh = q_ref[2 * h:2 * h + 2, :]
            kh = k_ref[0, h]                                    # [CS, D]
            vh = v_ref[0, h]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale     # [2, CS]
            s = s + b_ref[:]                                    # [1,CS] bc
            m_prev = m_ref[2 * h:2 * h + 2, 0:1]                # [2,1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)                     # [2,1]
            p = jnp.exp(s - m_new)                              # [2,CS]
            l_new = l_ref[2 * h:2 * h + 2, 0:1] * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            acc_ref[2 * h:2 * h + 2, :] = (
                acc_ref[2 * h:2 * h + 2, :] * alpha
                + jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            m_ref[2 * h:2 * h + 2, :] = jnp.broadcast_to(m_new, (2, D))
            l_ref[2 * h:2 * h + 2, :] = jnp.broadcast_to(l_new, (2, D))

        @pl.when(c == A - 1)
        def _():
            o_ref[:] = acc_ref[:] / l_ref[:]

    y = pl.pallas_call(
        kern,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((QH, D), lambda c: (0, 0)),
            pl.BlockSpec((KH, D), lambda c: (0, 0)),
            pl.BlockSpec((KH, D), lambda c: (0, 0)),
            pl.BlockSpec((1, KH, CS, D), lambda c: (0, 0, c, 0)),
            pl.BlockSpec((1, KH, CS, D), lambda c: (0, 0, c, 0)),
            pl.BlockSpec((1, CS), lambda c: (0, c)),
        ],
        out_specs=pl.BlockSpec((QH, D), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((QH, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((QH, D), jnp.float32),
            pltpu.VMEM((QH, D), jnp.float32),
            pltpu.VMEM((QH, D), jnp.float32),
        ],
    )(q, kc, vc, K[None], V[None], bias)

    # XLA reference
    qn = np.asarray(q)
    out_ref = np.zeros((QH, D), np.float32)
    for h in range(KH):
        kh = np.concatenate([np.asarray(K)[h][:slot],
                             np.asarray(kc)[h][None]], axis=0)
        vh = np.concatenate([np.asarray(V)[h][:slot],
                             np.asarray(vc)[h][None]], axis=0)
        for j in range(2):
            qh = qn[2 * h + j]
            s = kh @ qh * scale
            p = np.exp(s - s.max())
            p /= p.sum()
            out_ref[2 * h + j] = p @ vh
    err = float(np.max(np.abs(np.asarray(y) - out_ref)))
    assert err < 2e-4, f"err {err}"
    return f"flash-decode stage matches XLA, err {err:.2e}"


if __name__ == "__main__":
    report("P6 repeat-scales", p6)
    report("P7 transpose", p7)
    report("P8 rope", p8)
    report("P9 batched-dot", p9)
    report("P10 sublane-slice", p10)
    report("P11 head-slice", p11)
    report("P12 attention-stage", p12)

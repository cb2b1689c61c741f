"""On-device token sampling.

Replaces llama.cpp's sampler chain (reference ``llama.py:577-644``) with a
jittable function reproducing the same pipeline order: top-k → top-p →
temperature → categorical draw, or pure greedy when temperature <= 0
(``llama.py:599-605``). Keeping sampling on-device is what lets the whole
generation loop run without per-token host round-trips.

Temperature / top-p are traced scalars (retry-with-hotter-temperature never
recompiles); top-k is static (it fixes the top_k gather shape).
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30

_TOPK_BLOCK = 128          # two-stage prune block width
_TOPK_MIN_V = 8192         # below this a direct lax.top_k is fine


def topk_large(logits, k: int):
    """Exact ``lax.top_k`` over the last dim, latency-optimized for long
    rows (the [B, 151936] logits rows of the sampler).

    ``lax.top_k`` over 152k lanes costs ~1.6 ms of *latency* inside a
    decode loop (it sits on the serial critical path between verify
    passes, where its throughput-friendly schedule cannot overlap with
    anything). Two-stage prune: reduce to per-block maxima, take the
    top-k blocks, then top-k over only those k·128 candidates.

    Exactness incl. tie-breaking: every top-k element's block has
    block-max ≥ the k-th value, and at most k blocks can have block-max
    ≥ the k-th value (each such max IS a top-k value), so the top-k
    blocks by (max desc, block-index asc) contain every top-k element —
    including the lowest-index tie-winners ``lax.top_k`` would pick.
    Selected blocks are re-sorted by block index so the final top-k's
    positional tie-break equals original-index tie-break.
    """
    v = logits.shape[-1]
    if v <= _TOPK_MIN_V or v <= k * _TOPK_BLOCK:
        return jax.lax.top_k(logits, k)
    pad = -v % _TOPK_BLOCK
    if pad:
        logits = jnp.pad(logits, [(0, 0)] * (logits.ndim - 1) + [(0, pad)],
                         constant_values=NEG_INF)
    nb = logits.shape[-1] // _TOPK_BLOCK
    blocks = logits.reshape(*logits.shape[:-1], nb, _TOPK_BLOCK)
    bmax = jnp.max(blocks, axis=-1)                       # [..., nb]
    _, bidx = jax.lax.top_k(bmax, k)                      # [..., k]
    bidx = jnp.sort(bidx, axis=-1)                        # index-asc order
    cand = jnp.take_along_axis(blocks, bidx[..., None], axis=-2)
    cand = cand.reshape(*logits.shape[:-1], k * _TOPK_BLOCK)
    vals, ci = jax.lax.top_k(cand, k)
    orig = (jnp.take_along_axis(bidx, ci // _TOPK_BLOCK, axis=-1)
            * _TOPK_BLOCK + ci % _TOPK_BLOCK)
    return vals, orig


@partial(jax.jit, static_argnames=("top_k", "greedy"))
def sample_token(logits, rng, temperature, top_p, top_k: int = 50,
                 greedy=None):
    """logits [B, V] f32 → token ids [B] int32.

    llama.cpp parity notes:
    * top-k keeps the k largest logits;
    * top-p runs on the softmax of the *top-k* candidates at temperature 1
      and keeps the smallest prefix of candidates whose cumulative
      probability reaches p (min_keep=1);
    * temperature then rescales the surviving logits for the final draw.

    ``greedy`` (static): when the caller knows at trace time whether
    temperature > 0, passing True/False compiles only that branch —
    inside on-device decode loops the traced ``lax.cond`` acts as a
    scheduling barrier that costs far more than the branch bodies
    (measured ~1.6 ms/verify-round on v5e). None keeps the traced cond.
    """
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    k = min(top_k, v) if top_k > 0 else v

    def sampled(_):
        vals, idx = topk_large(logits, k)                        # [B, k] desc
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep while cumulative prob *before* this candidate is < p;
        # the first candidate always survives (min_keep=1)
        keep = (cum - probs) < top_p
        keep = keep.at[:, 0].set(True)
        masked = jnp.where(keep, vals, NEG_INF)
        t = jnp.maximum(temperature, 1e-6)
        choice = jax.random.categorical(rng, masked / t, axis=-1)  # [B]
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    def greedy_fn(_):
        return jnp.argmax(logits, axis=-1)

    if greedy is None:
        token = jax.lax.cond(temperature > 0, sampled, greedy_fn,
                             operand=None)
    else:
        token = greedy_fn(None) if greedy else sampled(None)
    return token.astype(jnp.int32)


def warped_candidates(logits, temperature, top_p, top_k: int):
    """The sampling distribution :func:`sample_token` draws from.

    logits [..., V] f32 → (probs [..., k], idx [..., k]): the top-k
    candidate ids and their final probabilities after the llama.cpp chain
    (top-k → top-p at T=1 → temperature). Probability mass outside the
    surviving candidates is exactly 0. Used by speculative decoding to
    score drafted tokens (acceptance probability = probs at the draft id).
    Only meaningful for temperature > 0; the greedy path compares argmax
    directly.
    """
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    k = min(top_k, v) if top_k > 0 else v
    vals, idx = topk_large(logits, k)
    p1 = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(p1, axis=-1)
    keep = (cum - p1) < top_p
    keep = keep.at[..., 0].set(True)
    masked = jnp.where(keep, vals, NEG_INF)
    t = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(masked / t, axis=-1)
    # positions masked by top-p must carry exactly zero mass (softmax of
    # NEG_INF underflows to 0 already, but be explicit for the acceptance
    # test's sake)
    probs = jnp.where(keep, probs, 0.0)
    return probs, idx


@partial(jax.jit, static_argnames=("top_k", "greedy"))
def sample_residual(logits, rng, temperature, top_p, top_k: int, forbid,
                    greedy=None):
    """Sample like :func:`sample_token` but excluding one token id per row.

    ``forbid [B] int32`` (-1 = no exclusion) is the draft token that a
    speculative verify step just *probabilistically* rejected. Leviathan
    et al.'s residual distribution for a deterministic (delta) draft is the
    target distribution with the rejected id zeroed and renormalized —
    i.e. excluded from the categorical draw. With forbid = -1 this is
    exactly :func:`sample_token`.
    """
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    k = min(top_k, v) if top_k > 0 else v

    def sampled(_):
        vals, idx = topk_large(logits, k)
        p1 = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(p1, axis=-1)
        keep = (cum - p1) < top_p
        keep = keep.at[:, 0].set(True)
        masked = jnp.where(keep, vals, NEG_INF)
        masked = jnp.where(idx == forbid[:, None], NEG_INF, masked)
        t = jnp.maximum(temperature, 1e-6)
        choice = jax.random.categorical(rng, masked / t, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

    def greedy_fn(_):
        # greedy rejection only happens when the draft != argmax, so the
        # exclusion can never remove the argmax; plain argmax is correct
        return jnp.argmax(logits, axis=-1)

    if greedy is None:        # traced-temperature cond (see sample_token)
        token = jax.lax.cond(temperature > 0, sampled, greedy_fn,
                             operand=None)
    else:
        token = greedy_fn(None) if greedy else sampled(None)
    return token.astype(jnp.int32)

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


@partial(jax.jit, static_argnames=("top_k",))
def sample_token(logits, rng, temperature, top_p, top_k: int = 50):
    """logits [B, V] f32 → token ids [B] int32.

    llama.cpp parity notes:
    * top-k keeps the k largest logits;
    * top-p runs on the softmax of the *top-k* candidates at temperature 1
      and keeps the smallest prefix of candidates whose cumulative
      probability reaches p (min_keep=1);
    * temperature then rescales the surviving logits for the final draw.
    """
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    k = min(top_k, v) if top_k > 0 else v

    def sampled(_):
        vals, idx = jax.lax.top_k(logits, k)                     # [B, k] desc
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

    def greedy(_):
        return jnp.argmax(logits, axis=-1)

    token = jax.lax.cond(temperature > 0, sampled, greedy, operand=None)
    return token.astype(jnp.int32)

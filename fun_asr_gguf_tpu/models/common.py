"""Shared functional building blocks for the JAX models.

Parameters are plain pytrees (nested dicts of jnp arrays). Linear weights
are stored as [in, out] so the forward is ``x @ w + b`` (torch checkpoints
are transposed at load time). Norms and softmax always run in float32 for
stability; matmuls run in the parameter dtype with
``preferred_element_type=float32``.
"""

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, p, eps):
    """LayerNorm over the last axis (affine)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, scale, eps):
    """RMSNorm over the last axis."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def linear(x, p):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def additive_mask_bias(mask):
    """(mask - 1) * 10000 over keys — the reference's DML-friendly additive
    masking (``model_definition.py:72,137``). mask: [B, T] in {0,1}."""
    return ((mask - 1.0) * 10000.0)[:, None, None, :]  # [B, 1, 1, T]


def softmax_f32(scores):
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1)


def split_heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


# ---------------------------------------------------------------------------
# Initialization helpers (random-init configs for tests/benchmarks)
# ---------------------------------------------------------------------------

def init_linear(rng, d_in, d_out, bias=True, dtype=jnp.float32):
    k1, _ = jax.random.split(rng)
    scale = 1.0 / np.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), dtype, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layer_norm(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def tree_cast(tree, dtype):
    """Cast all floating-point leaves of a param pytree."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def tree_size_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size"))

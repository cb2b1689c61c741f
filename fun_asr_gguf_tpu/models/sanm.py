"""SANM encoder (SenseVoiceEncoderSmall) in functional JAX.

Behavioral spec from the reference torch definition
(``fun_asr_gguf/model_definition.py:50-116,191-214``), redesigned for XLA:

* one batched program over static [B, T, 560] inputs with a frame mask;
* SANM attention = fused-QKV 4-head self-attention + a depthwise-conv FSMN
  memory branch over V (kernel 11, zero "fire-wall" masking before the
  conv), summed;
* layer 0 adapts 560→512 and, per the reference control flow, applies *no*
  residual and no FFN (``model_definition.py:105-107``);
* layers are scanned with ``jax.lax.scan`` over stacked parameters so the
  70-layer stack compiles as one loop instead of 70 unrolled blocks;
* additive (mask-1)*1e4 masking and post-stack "mask sweeps" match the
  reference exactly so padded and unpadded runs agree on valid frames.

Sinusoidal position encoding (positions start at 1, input scaled by √512)
follows ``model_definition.py:9-28,205-206``.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .common import (additive_mask_bias, init_layer_norm, init_linear,
                     layer_norm, linear, merge_heads, softmax_f32,
                     split_heads)
from .config import EncoderConfig


def sinusoidal_position_encoding(t_len: int, depth: int, dtype=jnp.float32):
    """positions 1..T, encoding = [sin(pos·inv), cos(pos·inv)]."""
    positions = jnp.arange(1, t_len + 1, dtype=jnp.float32)
    log_timescale_increment = math.log(10000.0) / (depth / 2 - 1)
    inv_timescales = jnp.exp(
        jnp.arange(depth // 2, dtype=jnp.float32) * -log_timescale_increment)
    scaled = positions[:, None] * inv_timescales[None, :]
    enc = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    return enc.astype(dtype)


def fsmn_memory(v, mask, fsmn_w):
    """Depthwise-conv FSMN branch over V with residual.

    v: [B, T, D]; fsmn_w: [K, D] depthwise taps. Zero-masks padding before
    the sliding window (the reference "fire-wall", model_definition.py:60-66)
    then adds the conv output back onto v.
    """
    if mask is not None:
        v = v * mask[:, :, None].astype(v.dtype)
    k = fsmn_w.shape[0]
    lp = (k - 1) // 2
    kernel = fsmn_w[:, None, :].astype(v.dtype)   # [K, 1, D] (WIO, grouped)
    conv = jax.lax.conv_general_dilated(
        v, kernel,
        window_strides=(1,),
        padding=[(lp, k - 1 - lp)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=v.shape[-1],
    )
    return v + conv


def sanm_attention(x, mask, p, n_heads: int, use_flash: bool = False):
    """SANM self-attention: softmax attention + FSMN memory, summed."""
    qkv = linear(x, p["qkv"])                      # [B, T, 3D]
    d = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d_k = d // n_heads
    qh = split_heads(q, n_heads) * (d_k ** -0.5)
    kh = split_heads(k, n_heads)
    vh = split_heads(v, n_heads)

    mem = fsmn_memory(v, mask, p["fsmn_w"])

    if use_flash:
        from ..ops.flash_attention import attention_with_mask
        m = mask if mask is not None else jnp.ones(x.shape[:2], x.dtype)
        out = attention_with_mask(qh, kh, vh, m)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            scores = scores + additive_mask_bias(mask.astype(jnp.float32))
        attn = softmax_f32(scores).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(merge_heads(out), p["out"]) + mem


def feed_forward(x, p):
    return linear(jax.nn.relu(linear(x, p["w1"])), p["w2"])


def sanm_layer(x, mask, p, n_heads: int, adapt_dims: bool = False,
               ln_eps: float = 1e-5, use_flash: bool = False):
    """Pre-norm SANM encoder layer (``model_definition.py:100-116``)."""
    residual = x
    h = layer_norm(x, p["norm1"], ln_eps)
    h = sanm_attention(h, mask, p["attn"], n_heads, use_flash)
    if adapt_dims:
        return h  # 560->512 input block: no residual, no FFN
    x = residual + h
    residual = x
    h = layer_norm(x, p["norm2"], ln_eps)
    return residual + feed_forward(h, p["ffn"])


def _scan_layers(x, mask, stacked, n_heads, ln_eps, use_flash=False):
    """Run a stack of identically-shaped SANM layers via lax.scan."""
    def body(carry, layer_p):
        return sanm_layer(carry, mask, layer_p, n_heads, False, ln_eps,
                          use_flash), None
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def encoder_forward(params, x, mask, cfg: EncoderConfig):
    """x: [B, T, input_size] LFR features; mask: [B, T] → [B, T, d_model].

    Mirrors SenseVoiceEncoderSmall.forward (``model_definition.py:205-214``):
    √d scaling + sinusoidal PE, the 560→512 block, 49 + 20 scanned SANM
    layers with the two post-norm mask sweeps.
    """
    t_len = x.shape[1]
    x = x * (cfg.d_model ** 0.5)
    x = x + sinusoidal_position_encoding(t_len, cfg.input_size, x.dtype)[None]

    flash = cfg.use_flash_attention
    if flash is None:       # auto: trace-time static decision (see config)
        from ..ops.quant_matmul import _on_tpu
        flash = _on_tpu() and x.shape[0] >= 2
    x = sanm_layer(x, mask, params["encoder0"], cfg.heads, adapt_dims=True,
                   ln_eps=cfg.ln_eps, use_flash=flash)
    x = _scan_layers(x, mask, params["encoders"], cfg.heads, cfg.ln_eps,
                     flash)
    x = layer_norm(x, params["after_norm"], cfg.ln_eps)
    if mask is not None:
        x = x * mask[:, :, None].astype(x.dtype)
    x = _scan_layers(x, mask, params["tp_encoders"], cfg.heads, cfg.ln_eps,
                     flash)
    x = layer_norm(x, params["tp_norm"], cfg.ln_eps)
    if mask is not None:
        x = x * mask[:, :, None].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_sanm_layer(rng, in_size, size, ffn_dim, kernel_size,
                     with_ffn=True, dtype=jnp.float32):
    keys = jax.random.split(rng, 5)
    p = {
        "norm1": init_layer_norm(in_size, dtype),
        "attn": {
            "qkv": init_linear(keys[0], in_size, size * 3, dtype=dtype),
            "out": init_linear(keys[1], size, size, dtype=dtype),
            "fsmn_w": (jax.random.normal(keys[2], (kernel_size, size), dtype)
                       * (1.0 / kernel_size)),
        },
    }
    if with_ffn:
        p["norm2"] = init_layer_norm(size, dtype)
        p["ffn"] = {
            "w1": init_linear(keys[3], size, ffn_dim, dtype=dtype),
            "w2": init_linear(keys[4], ffn_dim, size, dtype=dtype),
        }
    return p


def _stack_layers(layers):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_encoder_params(rng, cfg: EncoderConfig, dtype=jnp.float32):
    n_mid = cfg.num_blocks - 1
    keys = jax.random.split(rng, n_mid + cfg.tp_blocks + 1)
    params = {
        "encoder0": _init_sanm_layer(keys[0], cfg.input_size, cfg.d_model,
                                     cfg.ffn_dim, cfg.kernel_size,
                                     with_ffn=False, dtype=dtype),
        "encoders": _stack_layers([
            _init_sanm_layer(keys[1 + i], cfg.d_model, cfg.d_model,
                             cfg.ffn_dim, cfg.kernel_size, dtype=dtype)
            for i in range(n_mid)]),
        "tp_encoders": _stack_layers([
            _init_sanm_layer(keys[1 + n_mid + i], cfg.d_model, cfg.d_model,
                             cfg.ffn_dim, cfg.kernel_size, dtype=dtype)
            for i in range(cfg.tp_blocks)]),
        "after_norm": init_layer_norm(cfg.d_model, dtype),
        "tp_norm": init_layer_norm(cfg.d_model, dtype),
    }
    return params

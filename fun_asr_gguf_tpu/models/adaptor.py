"""Transformer adaptor and CTC head in functional JAX.

Behavioral spec: ``CorrectTransformerAdaptor`` (reference
``fun_asr_gguf/model_definition.py:122-185``) — a linear-ReLU-linear
projection followed by standard pre-norm transformer blocks (separate
q/k/v/out projections, LayerNorm eps 1e-12, FFN dim = out_dim // 4) — used
three ways in the stack:

* audio adaptor 512→1024, 2 blocks, masked (feeds the LLM embeds);
* CTC decoder 512→512, 5 blocks, unmasked (``model_definition.py:228``);
* CTC projection to the 60515 vocab with in-graph argmax
  (``model_definition.py:331-337``), so only int32 indices leave the chip.
"""

import jax
import jax.numpy as jnp

from .common import (additive_mask_bias, init_layer_norm, init_linear,
                     layer_norm, linear, merge_heads, softmax_f32,
                     split_heads)
from .config import AdaptorConfig, CTCHeadConfig


def mha(x, mask, p, n_heads: int):
    """Standard multi-head self-attention with additive masking."""
    d_k = x.shape[-1] // n_heads
    q = split_heads(linear(x, p["q"]), n_heads) * (d_k ** -0.5)
    k = split_heads(linear(x, p["k"]), n_heads)
    v = split_heads(linear(x, p["v"]), n_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + additive_mask_bias(mask.astype(jnp.float32))
    attn = softmax_f32(scores).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(merge_heads(out), p["out"])


def transformer_block(x, mask, p, n_heads: int, ln_eps: float):
    """Pre-norm block (``model_definition.py:147-163``)."""
    x = x + mha(layer_norm(x, p["norm1"], ln_eps), mask, p["attn"], n_heads)
    h = layer_norm(x, p["norm2"], ln_eps)
    h = linear(jax.nn.relu(linear(h, p["ffn"]["w1"])), p["ffn"]["w2"])
    return x + h


def adaptor_forward(params, x, mask, cfg: AdaptorConfig):
    """x: [B, T, in_dim] → [B, T, out_dim].

    downsample_rate is 1 throughout the reference stack, so the chunked
    unflatten (``model_definition.py:180-182``) degenerates to a plain
    projection; we keep the config field for parity but require k == 1.
    """
    assert cfg.downsample == 1, "reference stack uses downsample_rate=1"
    x = linear(jax.nn.relu(linear(x, params["linear1"])), params["linear2"])

    def body(carry, layer_p):
        return transformer_block(carry, mask, layer_p, cfg.heads,
                                 cfg.ln_eps), None
    if cfg.n_layers > 0:
        x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def _ctc_logits(params, enc_output, cfg: CTCHeadConfig):
    from ..ops.quant_matmul import matmul_any
    h = adaptor_forward(params["decoder"], enc_output, None, cfg.adaptor)
    logits = matmul_any(h, params["proj"]["w"])
    return logits + params["proj"]["b"].astype(jnp.float32)


def ctc_head_forward(params, enc_output, cfg: CTCHeadConfig):
    """enc_output [B, T, d] → argmax indices [B, T] int32 (unmasked).

    The projection supports dense or q8_0 QuantTensor weights (the
    reference runs its CTC head int8, ``02-Quantize-ONNX.py:38-45``)."""
    return jnp.argmax(_ctc_logits(params, enc_output, cfg),
                      axis=-1).astype(jnp.int32)


def ctc_logits_forward(params, enc_output, cfg: CTCHeadConfig):
    """Full-logit variant (for training / beam decoding)."""
    return _ctc_logits(params, enc_output, cfg)


def ctc_topk_forward(params, enc_output, cfg: CTCHeadConfig, k: int = 8):
    """Per-frame top-k log-probs + argmax for prefix beam search.

    enc_output [B, T, d] → (logprobs [B, T, k] f32, ids [B, T, k] i32,
    blank_logprob [B, T] f32, argmax [B, T] i32). One device program
    serves both the beam search and the greedy/timestamp path (the
    [B, T, 60515] projection runs once); the blank (= last vocab id,
    reference ``nano_ctc.py:65``) is returned separately so the host
    beam search always has it, even when it falls outside the top-k.
    Only the small tensors leave the chip.
    """
    logits = _ctc_logits(params, enc_output, cfg)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, ids = jax.lax.top_k(logprobs, k)
    blank = logprobs[..., cfg.vocab_size - 1]
    argmax = ids[..., 0]        # top-1 of log-softmax == argmax of logits
    return vals, ids.astype(jnp.int32), blank, argmax.astype(jnp.int32)


def quantize_ctc_params(params):
    """Quantize the vocab projection (the dominant CTC matmul) to q8_0."""
    from ..ops.quant_matmul import QuantTensor, quantize_weight
    proj = dict(params["proj"])
    if not isinstance(proj["w"], QuantTensor):
        proj["w"] = quantize_weight(proj["w"])
    out = dict(params)
    out["proj"] = proj
    return out


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_block(rng, d, ffn_dim, dtype=jnp.float32):
    keys = jax.random.split(rng, 6)
    return {
        "norm1": init_layer_norm(d, dtype),
        "norm2": init_layer_norm(d, dtype),
        "attn": {
            "q": init_linear(keys[0], d, d, dtype=dtype),
            "k": init_linear(keys[1], d, d, dtype=dtype),
            "v": init_linear(keys[2], d, d, dtype=dtype),
            "out": init_linear(keys[3], d, d, dtype=dtype),
        },
        "ffn": {
            "w1": init_linear(keys[4], d, ffn_dim, dtype=dtype),
            "w2": init_linear(keys[5], ffn_dim, d, dtype=dtype),
        },
    }


def _stack(layers):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_adaptor_params(rng, cfg: AdaptorConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, cfg.n_layers + 2)
    params = {
        "linear1": init_linear(keys[0], cfg.in_dim * cfg.downsample,
                               cfg.ffn_dim, dtype=dtype),
        "linear2": init_linear(keys[1], cfg.ffn_dim, cfg.out_dim, dtype=dtype),
    }
    if cfg.n_layers > 0:
        params["blocks"] = _stack([
            _init_block(keys[2 + i], cfg.out_dim, cfg.block_ffn_dim, dtype)
            for i in range(cfg.n_layers)])
    return params


def init_ctc_head_params(rng, cfg: CTCHeadConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "decoder": init_adaptor_params(k1, cfg.adaptor, dtype),
        "proj": init_linear(k2, cfg.adaptor.out_dim, cfg.vocab_size,
                            dtype=dtype),
    }

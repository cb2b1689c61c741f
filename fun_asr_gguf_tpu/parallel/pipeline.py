"""Pipeline parallelism (GPipe schedule) for decoder fine-tuning.

The decoder's stacked layers split into `pp` contiguous stages over a
1-D ``('pp',)`` mesh: stage s holds layers [s·L/pp, (s+1)·L/pp). A
``shard_map``-wrapped schedule walks M microbatches through the stages —
each step every stage applies its local layer shard, then hands its
activation to the next stage over the ICI ring via ``lax.ppermute``
(the scaling-book pipelining recipe). The schedule is a ``lax.scan``
over M+pp−1 ticks, so ``jax.grad`` differentiates straight through it
(the backward pass reverses the ppermutes automatically) — no hand-
written backward schedule.

This complements the Megatron-TP sharding in ``parallel/sharding.py``
(which partitions *within* every matmul): TP spends ICI bandwidth on
per-layer collectives, PP spends it on one activation hop per stage and
suits slower inter-slice links or very deep models. The reference has
no distributed story (single-process llama.cpp); this module exists for
the TPU-native scale-out design and is validated against the unsharded
loss/grads on a virtual mesh (tests/test_parallel.py::TestPipeline).
"""

from typing import Tuple

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import rms_norm
from ..models.config import Qwen3Config
from ..models.qwen3 import (NEG_INF, _attn_out, _gqa_mix, _gqa_scores,
                            _lm_head, _mlp, _qkv, rope_cos_sin)


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:pp]
    if len(devices) < pp:
        raise ValueError(f"need {pp} devices, have {len(devices)}")
    return Mesh(np.array(devices), ("pp",))


def shard_layers_pp(params, mesh: Mesh):
    """Place the stacked [L, ...] layer weights stage-contiguously over
    'pp'; embedding/final_ln stay replicated (they run outside the
    pipelined region)."""
    layer_sh = NamedSharding(mesh, P("pp"))
    repl = NamedSharding(mesh, P())
    out = dict(params)
    out["layers"] = jax.tree_util.tree_map(
        lambda w: jax.device_put(w, layer_sh), params["layers"])
    for key in params:
        if key != "layers":
            out[key] = jax.tree_util.tree_map(
                lambda w: jax.device_put(w, repl), params[key])
    return out


def _block(x, lp, cfg: Qwen3Config, cos, sin, bias):
    """One dense decoder layer (same math as qwen3_prefill's scan body)."""
    h = rms_norm(x, lp["input_ln"], cfg.rms_eps)
    q, k, v = _qkv(h, lp, cfg, cos, sin)
    probs = jax.nn.softmax(_gqa_scores(q, k, cfg) + bias, axis=-1)
    x = x + _attn_out(_gqa_mix(probs, v, cfg), lp, cfg)
    h = rms_norm(x, lp["post_ln"], cfg.rms_eps)
    return x + _mlp(h, lp)


def pp_forward(params, embeds, attn_mask, cfg: Qwen3Config, mesh: Mesh,
               n_micro: int) -> jnp.ndarray:
    """Pipelined decoder forward: [B, T, D] embeds → [B, T, D] hidden
    (pre-final-norm). B must divide into n_micro microbatches and
    cfg.n_layers into mesh.shape['pp'] stages."""
    if (cfg.sliding_pattern or cfg.post_norms or not cfg.pre_norms
            or cfg.residual_scale != 1.0
            or cfg.rope_global_scale != 1.0):
        # _block applies one global-attention bias and one rope table to
        # every layer; sliding-window interleaves (gemma3/phi3-mini/
        # gpt-oss), sandwich norms and post-norm-only layers (olmo2)
        # would be silently wrong here
        raise NotImplementedError(
            "pp_forward supports global-attention llama-family archs "
            "only (no sliding-window pattern / sandwich or post-only "
            "norms / linear rope position scaling)")
    pp = mesh.shape["pp"]
    b, t, d = embeds.shape
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible into {n_micro} "
                         "microbatches")
    if cfg.n_layers % pp != 0:
        raise ValueError(f"{cfg.n_layers} layers not divisible into "
                         f"{pp} stages")
    mb = b // n_micro

    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    causal = (j <= i)[None, None, :, :]

    x_mb = embeds.reshape(n_micro, mb, t, d)
    m_mb = attn_mask.reshape(n_micro, mb, t)

    # per-microbatch RoPE tables + attention bias, computed once ahead of
    # the schedule (each tick just indexes them). Positions follow the
    # left-pad-shift convention of qwen3_forward_logits — RoPE is
    # relative, but matching the absolute angles keeps this path
    # numerically comparable to the unsharded one.
    flat_m = m_mb.reshape(b, t)
    shift = t - jnp.sum(flat_m, axis=1).astype(jnp.int32)          # [B]
    positions = jnp.maximum(
        jnp.arange(t, dtype=jnp.int32)[None, :] - shift[:, None], 0)
    # longrope/YaRN factors, attn-factor and partial rotary dims (phi3 /
    # gpt-oss) apply exactly as in the unsharded graph (_dual_rope)
    rope_dim = cfg.rope_dim or cfg.head_dim
    cos, sin = rope_cos_sin(positions, rope_dim, cfg.rope_theta,
                            embeds.dtype, cfg.active_rope_factors or None,
                            cfg.rope_attn_factor)
    cos_mb = cos.reshape(n_micro, mb, t, 1, rope_dim)
    sin_mb = sin.reshape(n_micro, mb, t, 1, rope_dim)
    bias = jnp.where(causal & (flat_m[:, None, None, :] > 0), 0.0,
                     NEG_INF).astype(jnp.float32)
    bias_mb = bias.reshape(n_micro, mb, 1, t, t)

    def stage_prog(local_layers, x_all, m_consts):
        """Runs on every 'pp' device; local_layers has the stage's
        [L/pp, ...] slice (shard_map hands each device its shard)."""
        stage = jax.lax.axis_index("pp")

        def apply_stage(x, consts):
            cos_, sin_, bias_ = consts

            def body(h, lp):
                return _block(h, lp, cfg, cos_, sin_, bias_), None

            out, _ = jax.lax.scan(body, x, local_layers)
            return out

        def tick(carry, tick_idx):
            held, outs = carry
            # stage 0 ingests microbatch `tick_idx` while it exists;
            # later ticks just flush the pipeline tail
            in_idx = jnp.clip(tick_idx, 0, n_micro - 1)
            inp = jnp.where(stage == 0, x_all[in_idx], held)
            # every stage sees the microbatch that entered the pipe at
            # tick_idx - stage; clip keeps the (masked-out) bubble ticks
            # in range
            m_idx = jnp.clip(tick_idx - stage, 0, n_micro - 1)
            out = apply_stage(inp, jax.tree_util.tree_map(
                lambda a: a[m_idx], m_consts))
            # the last stage owns microbatch tick_idx-(pp-1) when valid
            w = tick_idx - (pp - 1)
            valid = jnp.logical_and(stage == pp - 1,
                                    jnp.logical_and(w >= 0, w < n_micro))
            upd = jnp.where(valid, out,
                            jax.lax.dynamic_index_in_dim(
                                outs, jnp.clip(w, 0, n_micro - 1), 0,
                                keepdims=False))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, upd, jnp.clip(w, 0, n_micro - 1), 0)
            held = jax.lax.ppermute(
                out, "pp", [(s, (s + 1) % pp) for s in range(pp)])
            return (held, outs), None

        held0 = jnp.zeros((mb, t, d), x_all.dtype)
        outs0 = jnp.zeros_like(x_all)
        (_, outs), _ = jax.lax.scan(
            tick, (held0, outs0),
            jnp.arange(n_micro + pp - 1, dtype=jnp.int32))
        # only the last stage holds real outputs; zero elsewhere and
        # psum replicates them to every stage (single contributor)
        outs = jnp.where(stage == pp - 1, outs, 0.0)
        return jax.lax.psum(outs, "pp")

    out = shard_map(
        stage_prog, mesh=mesh,
        in_specs=(P("pp"), P(), (P(), P(), P())),
        out_specs=P(),
        check_vma=False,
    )(params["layers"], x_mb, (cos_mb, sin_mb, bias_mb))
    return out.reshape(b, t, d)


def pp_lm_loss(params, token_ids, attn_mask, cfg: Qwen3Config, mesh: Mesh,
               n_micro: int) -> jnp.ndarray:
    """Next-token cross-entropy through the pipelined decoder.

    token_ids/attn_mask: [B, T]; loss is averaged over positions whose
    *target* (the next token) is valid.
    """
    embeds = params["embed"][token_ids]
    h = pp_forward(params, embeds, attn_mask, cfg, mesh, n_micro)
    h = rms_norm(h, params["final_ln"], cfg.rms_eps)
    logits = jnp.dot(h[:, :-1].astype(jnp.float32),
                     _lm_head(params, cfg).astype(jnp.float32))
    targets = token_ids[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None],
                               axis=-1)[..., 0]
    w = attn_mask[:, 1:].astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_pp_train_step(cfg: Qwen3Config, optimizer, mesh: Mesh,
                       n_micro: int):
    """(params, opt_state, batch) → (params, opt_state, metrics) with the
    decoder forward/backward pipelined over the 'pp' mesh axis."""

    @jax.jit
    def step(params, opt_state, token_ids, attn_mask
             ) -> Tuple[dict, tuple, dict]:
        loss, grads = jax.value_and_grad(pp_lm_loss)(
            params, token_ids, attn_mask, cfg, mesh, n_micro)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return step

"""Full-model fine-tuning step, sharded dp×tp.

The reference is inference-only; this is the TPU-native extension that
makes the stack trainable: a joint objective of (a) CTC loss on the
encoder+CTC head (optax.ctc_loss, blank = last vocab id, matching the
reference's vocab layout, ``01-Export…py:78``) and (b) next-token
cross-entropy on the Qwen3 decoder conditioned on injected audio
embeddings — the same embedding-injection interface the inference prompt
uses. Parameters carry NamedShardings (TP for the LLM + encoder FFNs, see
:mod:`.sharding`); the batch is dp-sharded; jit + XLA insert all
collectives.
"""

from functools import partial
from typing import Dict, NamedTuple, Tuple

import numpy as np
import optax

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.adaptor import adaptor_forward, ctc_logits_forward
from ..models.config import HybridConfig
from ..models.qwen3 import qwen3_forward_logits
from ..models.sanm import encoder_forward
from .sharding import (encoder_param_sharding, llm_param_sharding,
                       replicated)


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def asr_loss(params, batch, cfg: HybridConfig):
    """Joint CTC + LM loss.

    batch:
      feats          [B, T, feat]   LFR features
      feat_mask      [B, T]         1.0 valid
      ctc_labels     [B, N]         int32 CTC targets
      ctc_label_pad  [B, N]         1.0 where padding
      tokens         [B, L]         int32 transcript tokens
      token_mask     [B, L]         1.0 valid
    """
    feats = batch["feats"]
    feat_mask = batch["feat_mask"]
    tokens = batch["tokens"]
    token_mask = batch["token_mask"]

    enc = encoder_forward(params["encoder"], feats, feat_mask, cfg.encoder)

    # CTC branch
    ctc_logits = ctc_logits_forward(params["ctc"], enc, cfg.ctc)
    ctc_losses = optax.ctc_loss(
        ctc_logits.astype(jnp.float32),
        (1.0 - feat_mask).astype(jnp.float32),
        batch["ctc_labels"],
        batch["ctc_label_pad"].astype(jnp.float32),
        blank_id=cfg.ctc.vocab_size - 1)
    ctc_l = jnp.mean(ctc_losses / jnp.maximum(
        jnp.sum(1.0 - batch["ctc_label_pad"], axis=-1), 1.0))

    # LM branch: [audio embeds ++ token embeds], CE on the token part
    audio_emb = adaptor_forward(params["adaptor"], enc, feat_mask,
                                cfg.adaptor)
    tok_emb = params["llm"]["embed"][tokens].astype(audio_emb.dtype)
    embeds = jnp.concatenate([audio_emb, tok_emb], axis=1)
    mask = jnp.concatenate([feat_mask, token_mask], axis=1)
    logits = qwen3_forward_logits(params["llm"], embeds, mask, cfg.llm)

    t_audio = feats.shape[1]
    lm_logits = logits[:, t_audio - 1:-1, :]            # predicts tokens[t]
    logp = jax.nn.log_softmax(lm_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, :, None], axis=-1)[..., 0]
    lm_l = jnp.sum(nll * token_mask) / jnp.maximum(jnp.sum(token_mask), 1.0)

    loss = ctc_l + lm_l
    return loss, {"loss": loss, "ctc_loss": ctc_l, "lm_loss": lm_l}


def make_train_step(cfg: HybridConfig, optimizer):
    """Build the jitted, donate-friendly train step."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(asr_loss, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, cfg)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def prompted_asr_loss(params, consts, batch, cfg: HybridConfig,
                      n_audio: int):
    """Joint CTC + LM loss with the ENGINE'S exact decode conditioning.

    :func:`asr_loss` conditions the LM on ``[audio ++ tokens]``;
    inference conditions on ``[prefix ++ audio ++ suffix ++ generated]``
    (the ChatML embedding-injection prompt, ``prompt_utils.py``) with the
    audio embeds trimmed to :func:`~..frontend.audio_token_length`. A
    model trained with this loss transcribes through the UNMODIFIED
    ``engine.transcribe`` path (the trained-pipeline quality gate,
    tests/test_trained_e2e.py).

    batch:
      audio          [B, N]   float waveform (equal true lengths)
      ilens          [B]      int32 valid samples
      prefix_ids     [P]      int32 prompt prefix token ids
      suffix_ids     [S]      int32 prompt suffix token ids
      ctc_labels     [B, M]   int32 CTC targets
      ctc_label_pad  [B, M]   1.0 where padding
      tokens         [B, L]   int32 transcript tokens (+ stop token)
      token_mask     [B, L]   1.0 valid

    ``n_audio``: static audio-embed token count
    (``audio_token_length(n_samples)``).
    """
    from ..frontend import FrontendConfig, compute_lfr_features
    feats, fmask = compute_lfr_features(consts, batch["audio"],
                                        batch["ilens"], FrontendConfig())
    enc = encoder_forward(params["encoder"], feats, fmask, cfg.encoder)

    ctc_logits = ctc_logits_forward(params["ctc"], enc, cfg.ctc)
    ctc_losses = optax.ctc_loss(
        ctc_logits.astype(jnp.float32),
        (1.0 - fmask).astype(jnp.float32),
        batch["ctc_labels"],
        batch["ctc_label_pad"].astype(jnp.float32),
        blank_id=cfg.ctc.vocab_size - 1)
    ctc_l = jnp.mean(ctc_losses / jnp.maximum(
        jnp.sum(1.0 - batch["ctc_label_pad"], axis=-1), 1.0))

    audio_emb = adaptor_forward(params["adaptor"], enc, fmask,
                                cfg.adaptor)[:, :n_audio]
    embed = params["llm"]["embed"]
    b = audio_emb.shape[0]
    tokens = batch["tokens"]
    token_mask = batch["token_mask"]

    def bcast(ids):
        e = embed[ids].astype(audio_emb.dtype)           # [K, H]
        return jnp.broadcast_to(e[None], (b,) + e.shape)

    pre, suf = bcast(batch["prefix_ids"]), bcast(batch["suffix_ids"])
    tok_emb = embed[tokens].astype(audio_emb.dtype)
    embeds = jnp.concatenate([pre, audio_emb, suf, tok_emb], axis=1)
    ones = lambda k: jnp.ones((b, k), jnp.float32)
    mask = jnp.concatenate(
        [ones(pre.shape[1]), ones(n_audio), ones(suf.shape[1]),
         token_mask], axis=1)
    logits = qwen3_forward_logits(params["llm"], embeds, mask, cfg.llm)

    start = pre.shape[1] + n_audio + suf.shape[1]
    lm_logits = logits[:, start - 1:-1, :]               # predicts tokens[t]
    logp = jax.nn.log_softmax(lm_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, :, None], axis=-1)[..., 0]
    lm_l = jnp.sum(nll * token_mask) / jnp.maximum(jnp.sum(token_mask), 1.0)

    loss = ctc_l + lm_l
    return loss, {"loss": loss, "ctc_loss": ctc_l, "lm_loss": lm_l}


def make_prompted_train_step(cfg: HybridConfig, optimizer, n_audio: int):
    """Jitted train step for :func:`prompted_asr_loss` (consts = frontend
    constants from ``make_frontend_constants``, passed through untrained)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, consts, batch
                   ) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(prompted_asr_loss, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, consts, batch, cfg,
                                      n_audio)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def param_shardings(mesh: Mesh, params) -> Dict:
    """Sharding pytree for the full hybrid param dict."""
    return {
        "encoder": encoder_param_sharding(mesh, params["encoder"]),
        "adaptor": encoder_param_sharding(mesh, params["adaptor"]),
        "ctc": encoder_param_sharding(mesh, params["ctc"]),
        # pass params so the spec mirrors the actual key set (untied
        # decoders carry 'lm_head'; quantized layouts differ)
        "llm": llm_param_sharding(mesh, params["llm"]),
    }


def batch_shardings(mesh: Mesh) -> Dict:
    dp = NamedSharding(mesh, P("dp"))
    return {k: dp for k in ("feats", "feat_mask", "ctc_labels",
                            "ctc_label_pad", "tokens", "token_mask")}


def make_dummy_batch(cfg: HybridConfig, batch: int = 2, t: int = 16,
                     n_labels: int = 6, l_tokens: int = 8, seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "feats": rng.normal(size=(batch, t, cfg.encoder.input_size))
                    .astype(np.float32) * 0.1,
        "feat_mask": np.ones((batch, t), np.float32),
        "ctc_labels": rng.integers(
            0, cfg.ctc.vocab_size - 1, (batch, n_labels)).astype(np.int32),
        "ctc_label_pad": np.zeros((batch, n_labels), np.float32),
        "tokens": rng.integers(0, cfg.llm.vocab_size,
                               (batch, l_tokens)).astype(np.int32),
        "token_mask": np.ones((batch, l_tokens), np.float32),
    }


def save_train_state(path: str, state: TrainState):
    """Checkpoint params + optimizer state + step to one safetensors file.

    Training checkpoint/resume — an aux capability the inference-only
    reference lacks (SURVEY.md §5 'no training checkpoints'). Leaves are
    stored in jax tree_flatten order; the matching ``init_train_state``
    template reconstructs the structure on load.
    """
    from safetensors.numpy import save_file
    leaves = jax.tree_util.tree_leaves(jax.device_get(state))
    save_file({f"leaf_{i:05d}": np.ascontiguousarray(np.asarray(v))
               for i, v in enumerate(leaves)}, path)


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template`` (from ``init_train_state``, same config/optimizer/mesh)
    provides pytree structure and shardings; stored leaves are placed with
    the template leaf's sharding, so a dp×tp-sharded state restores
    sharded.
    """
    from safetensors.numpy import load_file
    flat = load_file(path)
    tpl_leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(flat) == len(tpl_leaves), "checkpoint/template leaf mismatch"
    new_leaves = []
    for i, tpl in enumerate(tpl_leaves):
        arr = flat[f"leaf_{i:05d}"]
        if hasattr(tpl, "shape"):
            arr = np.asarray(arr).reshape(tpl.shape)  # 0-d safetensors quirk
        if hasattr(tpl, "sharding"):
            new_leaves.append(jax.device_put(jnp.asarray(arr, tpl.dtype),
                                             tpl.sharding))
        else:
            new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def init_train_state(rng, cfg: HybridConfig, optimizer, mesh: Mesh = None):
    """Random-init params (+ optional mesh placement) and optimizer state."""
    from ..models.adaptor import init_adaptor_params, init_ctc_head_params
    from ..models.qwen3 import init_qwen3_params
    from ..models.sanm import init_encoder_params
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = {
        "encoder": init_encoder_params(k1, cfg.encoder),
        "adaptor": init_adaptor_params(k2, cfg.adaptor),
        "ctc": init_ctc_head_params(k3, cfg.ctc),
        "llm": init_qwen3_params(k4, cfg.llm),
    }
    if mesh is not None:
        params = jax.device_put(params, param_shardings(mesh, params))
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def warm_start_train_state(ckpt_dir: str, optimizer, mesh: Mesh = None,
                           dtype=jnp.float32):
    """Build a TrainState from an inference checkpoint directory.

    Loads the engine checkpoint (encoder/adaptor/ctc safetensors +
    decoder GGUF, dense f32 — training needs full-precision masters),
    places it on the mesh, and initializes fresh optimizer state.
    Returns (state, HybridConfig).
    """
    from ..models.loaders import load_checkpoint
    cfg, enc_p, ada_p, ctc_p, llm_p, _embed = load_checkpoint(
        ckpt_dir, dtype=dtype, llm_dtype=dtype, llm_keep_quantized=False)
    params = {"encoder": enc_p, "adaptor": ada_p, "ctc": ctc_p,
              "llm": llm_p}
    if mesh is not None:
        params = jax.device_put(params, param_shardings(mesh, params))
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32)), cfg

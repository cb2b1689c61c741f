"""End-to-end audio encoding program: frontend → SANM encoder → adaptor.

The JAX analogue of the reference's Encoder+Adaptor ONNX graph
(``EncoderExportWrapperPaddable``, ``model_definition.py:262-323``) plus the
host-side trim done in ``nano_onnx.encode_audio`` (:124-133): one jitted,
static-shape program per padding window that returns

* ``enc_output`` [B, T_lfr, d_model] — CTC branch input (never trimmed);
* ``audio_embd`` [B, T_lfr, llm_dim] — adaptor output, zeroed past the
  per-sample valid LLM token length (host slices to ``target_len``).
"""

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..frontend import (FrontendConfig, audio_token_length_jnp,
                        compute_lfr_features, frontend_constants)
from .adaptor import adaptor_forward, init_adaptor_params
from .config import AdaptorConfig, EncoderConfig
from .sanm import encoder_forward, init_encoder_params


@dataclass(frozen=True)
class AudioEncoderConfig:
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    adaptor: AdaptorConfig = field(default_factory=AdaptorConfig)


def init_audio_encoder_params(rng, cfg: AudioEncoderConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    return {
        "encoder": init_encoder_params(k1, cfg.encoder, dtype),
        "adaptor": init_adaptor_params(k2, cfg.adaptor, dtype),
    }


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def audio_encoder_forward(params, consts, audio, ilens,
                          cfg: AudioEncoderConfig,
                          compute_dtype=jnp.float32):
    """audio [B, N] f32 (static N), ilens [B] i32 → (enc, audio_embd, mask).

    Features are computed in f32; the transformer stack runs in
    ``compute_dtype`` (bf16 on TPU for MXU throughput, f32 for parity
    testing) and outputs are returned in f32.
    """
    x, mask = compute_lfr_features(consts, audio, ilens, cfg.frontend)
    x = x.astype(compute_dtype)
    mask_c = mask.astype(compute_dtype)

    enc = encoder_forward(params["encoder"], x, mask_c, cfg.encoder)
    adapt = adaptor_forward(params["adaptor"], enc, mask_c, cfg.adaptor)

    # zero beyond the valid LLM token length (model_definition.py:317-321)
    target_len = audio_token_length_jnp(ilens, cfg.frontend)       # [B]
    pos = jnp.arange(adapt.shape[1], dtype=jnp.int32)[None, :]
    keep = (pos < target_len[:, None]).astype(adapt.dtype)
    audio_embd = adapt * keep[:, :, None]
    return (enc.astype(jnp.float32), audio_embd.astype(jnp.float32), mask)


def make_frontend_constants(cfg: AudioEncoderConfig):
    return frontend_constants(cfg.frontend)

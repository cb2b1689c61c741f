"""Artifact conversion: FunASR / HF artifacts → our TPU checkpoint dir.

Replaces the reference's three-stage export toolchain:

* ``01-Export-Encoder-Adaptor-CTC.py`` (torch→ONNX) — here the encoder
  weights go straight from ``model.pt`` into ``encoder.safetensors``
  (there is no intermediate graph format: the JAX model is the runtime);
  the CTC vocab is regenerated from ``multilingual.tiktoken`` with the
  same layout (``01-Export…py:52-79``).
* ``03-Export-Decoder-GGUF.py`` + ``convert_hf_to_gguf.py`` — the
  ``llm.*`` weights from ``model.pt`` (or an HF Qwen3 directory) become a
  llama.cpp-compatible qwen3 GGUF via our writer.

Usage:
    python -m fun_asr_gguf_tpu.tools.convert \
        --model-dir Fun-ASR-Nano-2512 --out model_tpu [--outtype q8_0]
"""

import argparse
import json
import os
import shutil
from dataclasses import asdict
from typing import Dict, Optional

import numpy as np

from ..formats.ctc_vocab import generate_sensevoice_vocab, write_tokens_file
from ..models.config import HybridConfig, Qwen3Config
from ..models.loaders import (flatten_tree, load_encoder_from_pt,
                              save_qwen3_to_gguf)


# archs whose big matmul weights can stream lazily through the exporter
# (standard dense layout: no host-side fusion/permutes/expert stacks)
_LAZY_ARCHS = ("qwen3", "qwen2", "llama", "granite", "olmo2", "gemma3")


def qwen3_params_from_hf_state(sd: Dict[str, np.ndarray],
                               cfg: Qwen3Config, lazy: bool = False) -> dict:
    """HF llama-family key schema → our param pytree (host numpy).

    Covers the archs the config can describe: Qwen3 (qk-norm), Qwen2/2.5
    (attention biases), Llama/Mistral (plain) — the HF module layout is
    identical apart from those two feature axes.

    ``lazy`` (supported for ``_LAZY_ARCHS``) defers every big matmul
    weight behind a :class:`~..formats.lazy.LazyTensor`: nothing is read
    until the GGUF writer streams tensors out one at a time (reference
    ``gguf/lazy.py`` behavior; peak RSS ~ one tensor).
    """
    def t(name):
        return np.ascontiguousarray(sd[name].astype(np.float32).T)

    def np_stack(fmt):
        return np.stack([t(fmt.format(i)) for i in range(cfg.n_layers)])

    lazy = lazy and cfg.arch in _LAZY_ARCHS and not cfg.is_moe
    if lazy:
        from ..formats.lazy import LazyStack, LazyTensor

        def shape_of(name):
            return (sd.shape(name) if hasattr(sd, "shape")
                    else sd[name].shape)

        def t_lazy(name):
            out_dim, in_dim = shape_of(name)        # HF stores [out, in]
            # astype(copy=False): an f32 checkpoint tensor passes through
            # without a second full-size copy (peak-RSS matters here)
            return LazyTensor(
                lambda n=name: np.ascontiguousarray(
                    sd[n].astype(np.float32, copy=False).T),
                shape=(in_dim, out_dim),
                raw_fn=lambda n=name: np.ascontiguousarray(
                    sd[n].astype(np.float32, copy=False)))

        def stack(fmt):
            return LazyStack([t_lazy(fmt.format(i))
                              for i in range(cfg.n_layers)])
    else:
        stack = np_stack

    def stack_vec(fmt):
        return np.stack([sd[fmt.format(i)].astype(np.float32)
                         for i in range(cfg.n_layers)])

    # gemma stores zero-centered norm weights (RMSNorm multiplies by
    # 1+w); shifting at load keeps rms_norm a plain multiply everywhere
    # (the same +1 the reference converter bakes into GGUF exports,
    # convert_hf_to_gguf.py:5898 norm_shift). olmo2 also has post
    # norms but stores plain weights — key the shift on the arch.
    shift = 1.0 if cfg.arch in ("gemma2", "gemma3") else 0.0

    def nvec(fmt):
        return stack_vec(fmt) + shift

    layers = {
        "o_w": stack("model.layers.{}.self_attn.o_proj.weight"),
    }
    if cfg.pre_norms:
        layers["input_ln"] = nvec(
            "model.layers.{}.input_layernorm.weight")
        # gemma's pre-FFN norm lives under a different HF name; in the
        # llama family post_attention_layernorm IS the pre-FFN norm —
        # and in glm4 it is too (glm's attn post norm is
        # post_self_attn_layernorm)
        layers["post_ln"] = nvec(
            "model.layers.{}.pre_feedforward_layernorm.weight"
            if cfg.post_norms and cfg.arch != "glm4" else
            "model.layers.{}.post_attention_layernorm.weight")
    if "model.layers.0.self_attn.kv_a_proj_with_mqa.weight" in sd:
        # deepseek MLA: low-rank kv (+ optional q) with a shared rotary
        # key riding the kv_a projection's tail dims
        if "model.layers.0.self_attn.q_a_proj.weight" in sd:
            layers["q_a_w"] = stack(
                "model.layers.{}.self_attn.q_a_proj.weight")
            layers["q_a_norm"] = stack_vec(
                "model.layers.{}.self_attn.q_a_layernorm.weight")
            layers["q_b_w"] = stack(
                "model.layers.{}.self_attn.q_b_proj.weight")
        else:
            layers["q_w"] = stack(
                "model.layers.{}.self_attn.q_proj.weight")
        layers["kv_a_w"] = stack(
            "model.layers.{}.self_attn.kv_a_proj_with_mqa.weight")
        layers["kv_a_norm"] = stack_vec(
            "model.layers.{}.self_attn.kv_a_layernorm.weight")
        layers["kv_b_w"] = stack(
            "model.layers.{}.self_attn.kv_b_proj.weight")
    elif "model.layers.0.self_attn.qkv_proj.weight" in sd:
        # phi3 stores one fused [q; k; v] projection
        # (reference Phi3MiniModel keeps it fused in GGUF too)
        qd = cfg.q_heads * cfg.head_dim
        kd = cfg.kv_heads * cfg.head_dim
        qkv = [t("model.layers.{}.self_attn.qkv_proj.weight".format(i))
               for i in range(cfg.n_layers)]          # [in, q+2k]
        layers["q_w"] = np.stack([w[:, :qd] for w in qkv])
        layers["k_w"] = np.stack([w[:, qd:qd + kd] for w in qkv])
        layers["v_w"] = np.stack([w[:, qd + kd:] for w in qkv])
    else:
        layers.update({
            "q_w": stack("model.layers.{}.self_attn.q_proj.weight"),
            "k_w": stack("model.layers.{}.self_attn.k_proj.weight"),
            "v_w": stack("model.layers.{}.self_attn.v_proj.weight"),
        })
    pre_mlp = {}
    if cfg.is_moe and cfg.arch == "deepseek2":
        # deepseek MoE: per-expert projections + shared experts; the
        # first ``first_k_dense_replace`` layers carry a plain dense MLP
        # (split into the ``layers_pre`` stack below)
        k0 = cfg.moe_first_dense
        rng_moe = range(k0, cfg.n_layers)

        def estack_r(fmt):
            return np.stack([
                np.stack([t(fmt.format(i, e))
                          for e in range(cfg.n_experts)])
                for i in rng_moe])

        layers["router_w"] = np.stack(
            [t(f"model.layers.{i}.mlp.gate.weight") for i in rng_moe])
        if cfg.router_bias:
            layers["router_b"] = np.stack(
                [sd[f"model.layers.{i}.mlp.gate.e_score_correction_bias"]
                 .astype(np.float32) for i in rng_moe])
        layers["moe_gate_w"] = estack_r(
            "model.layers.{}.mlp.experts.{}.gate_proj.weight")
        layers["moe_up_w"] = estack_r(
            "model.layers.{}.mlp.experts.{}.up_proj.weight")
        layers["moe_down_w"] = estack_r(
            "model.layers.{}.mlp.experts.{}.down_proj.weight")
        if cfg.n_shared_experts:
            for ours, hf in (("shared_gate_w", "gate_proj"),
                             ("shared_up_w", "up_proj"),
                             ("shared_down_w", "down_proj")):
                layers[ours] = np.stack(
                    [t(f"model.layers.{i}.mlp.shared_experts."
                       f"{hf}.weight") for i in rng_moe])
        for ours, hf in (("gate_w", "gate_proj"), ("up_w", "up_proj"),
                         ("down_w", "down_proj")):
            if k0:
                pre_mlp[ours] = np.stack(
                    [t(f"model.layers.{i}.mlp.{hf}.weight")
                     for i in range(k0)])
    elif cfg.is_moe and "model.layers.0.mlp.experts.gate_up_proj" in sd:
        # gpt-oss expert block: stacked fused tensors, gate/up channels
        # INTERLEAVED along the last dim ([E, h, 2f], gate = [..., ::2] —
        # ``GptOssExperts``); biases per expert; biased router
        def egather(fmt, sl):
            return np.stack([
                np.ascontiguousarray(
                    sd[fmt.format(i)].astype(np.float32)[..., sl])
                for i in range(cfg.n_layers)])
        every2, odd2 = slice(None, None, 2), slice(1, None, 2)
        full = slice(None)
        layers["router_w"] = stack("model.layers.{}.mlp.router.weight")
        layers["router_b"] = stack_vec("model.layers.{}.mlp.router.bias")
        layers["moe_gate_w"] = egather(
            "model.layers.{}.mlp.experts.gate_up_proj", every2)
        layers["moe_up_w"] = egather(
            "model.layers.{}.mlp.experts.gate_up_proj", odd2)
        layers["moe_gate_b"] = egather(
            "model.layers.{}.mlp.experts.gate_up_proj_bias", every2)
        layers["moe_up_b"] = egather(
            "model.layers.{}.mlp.experts.gate_up_proj_bias", odd2)
        layers["moe_down_w"] = egather(
            "model.layers.{}.mlp.experts.down_proj", full)
        layers["moe_down_b"] = egather(
            "model.layers.{}.mlp.experts.down_proj_bias", full)
    elif (cfg.is_moe
          and "model.layers.0.block_sparse_moe.gate.weight" in sd):
        # Mixtral sparse block: block_sparse_moe.gate router + per-expert
        # w1 (gate) / w3 (up) / w2 (down) (reference converter remaps
        # the same names into expert stacks,
        # convert_hf_to_gguf.py LlamaModel "block_sparse_moe" handling)
        def estack(fmt):
            return np.stack([
                np.stack([t(fmt.format(i, e))
                          for e in range(cfg.n_experts)])
                for i in range(cfg.n_layers)])
        layers["router_w"] = stack(
            "model.layers.{}.block_sparse_moe.gate.weight")
        layers["moe_gate_w"] = estack(
            "model.layers.{}.block_sparse_moe.experts.{}.w1.weight")
        layers["moe_up_w"] = estack(
            "model.layers.{}.block_sparse_moe.experts.{}.w3.weight")
        layers["moe_down_w"] = estack(
            "model.layers.{}.block_sparse_moe.experts.{}.w2.weight")
    elif cfg.is_moe:
        # Qwen3-MoE sparse block: mlp.gate (router) + per-expert
        # gate/up/down projections (reference converter merges the same
        # expert stacks, convert_hf_to_gguf.py Qwen2MoeModel.modify_tensors)
        def estack(fmt):
            return np.stack([
                np.stack([t(fmt.format(i, e))
                          for e in range(cfg.n_experts)])
                for i in range(cfg.n_layers)])
        layers["router_w"] = stack("model.layers.{}.mlp.gate.weight")
        layers["moe_gate_w"] = estack(
            "model.layers.{}.mlp.experts.{}.gate_proj.weight")
        layers["moe_up_w"] = estack(
            "model.layers.{}.mlp.experts.{}.up_proj.weight")
        layers["moe_down_w"] = estack(
            "model.layers.{}.mlp.experts.{}.down_proj.weight")
        if cfg.n_shared_experts and cfg.arch == "qwen2moe":
            # Qwen2-MoE: one shared expert (own width) + sigmoid gate
            # vector (Linear(h->1), HF shared_expert_gate)
            for ours, hf in (("shared_gate_w", "gate_proj"),
                             ("shared_up_w", "up_proj"),
                             ("shared_down_w", "down_proj")):
                layers[ours] = np.stack(
                    [t(f"model.layers.{i}.mlp.shared_expert.{hf}.weight")
                     for i in range(cfg.n_layers)])
            layers["shexp_gate_w"] = np.stack(
                [sd[f"model.layers.{i}.mlp.shared_expert_gate.weight"]
                 .astype(np.float32).reshape(-1)
                 for i in range(cfg.n_layers)])
    elif "model.layers.0.mlp.gate_up_proj.weight" in sd:
        # phi3 fused [gate; up] MLP input projection
        fd = cfg.ffn_dim
        gu = [t("model.layers.{}.mlp.gate_up_proj.weight".format(i))
              for i in range(cfg.n_layers)]           # [in, 2*ffn]
        layers["gate_w"] = np.stack([w[:, :fd] for w in gu])
        layers["up_w"] = np.stack([w[:, fd:] for w in gu])
        layers["down_w"] = stack("model.layers.{}.mlp.down_proj.weight")
    else:
        layers.update({
            "gate_w": stack("model.layers.{}.mlp.gate_proj.weight"),
            "up_w": stack("model.layers.{}.mlp.up_proj.weight"),
            "down_w": stack("model.layers.{}.mlp.down_proj.weight"),
        })
    if cfg.qk_norm:
        layers["q_norm"] = nvec(
            "model.layers.{}.self_attn.q_norm.weight")
        layers["k_norm"] = nvec(
            "model.layers.{}.self_attn.k_norm.weight")
    if cfg.post_norms:
        if cfg.arch == "glm4":
            layers["attn_post_ln"] = nvec(
                "model.layers.{}.post_self_attn_layernorm.weight")
            layers["ffn_post_ln"] = nvec(
                "model.layers.{}.post_mlp_layernorm.weight")
        else:
            layers["attn_post_ln"] = nvec(
                "model.layers.{}.post_attention_layernorm.weight")
            layers["ffn_post_ln"] = nvec(
                "model.layers.{}.post_feedforward_layernorm.weight")
    if cfg.attn_bias:
        layers["q_b"] = stack_vec("model.layers.{}.self_attn.q_proj.bias")
        layers["k_b"] = stack_vec("model.layers.{}.self_attn.k_proj.bias")
        layers["v_b"] = stack_vec("model.layers.{}.self_attn.v_proj.bias")
    if cfg.arch == "glm4" and cfg.rope_dim:
        # glm applies interleaved ("normal") rope; this graph runs
        # half-split — permute the rope channels once here (the GGUF
        # exporter permutes back to the llama.cpp glm4 layout)
        from ..models.loaders import glm_neox_perm
        pq = glm_neox_perm(cfg.q_heads * cfg.head_dim, cfg.head_dim,
                           cfg.rope_dim)
        pk = glm_neox_perm(cfg.kv_heads * cfg.head_dim, cfg.head_dim,
                           cfg.rope_dim)
        layers["q_w"] = layers["q_w"][..., pq]     # [L, in, out]
        layers["k_w"] = layers["k_w"][..., pk]
        if "q_b" in layers:
            layers["q_b"] = layers["q_b"][..., pq]
            layers["k_b"] = layers["k_b"][..., pk]
    if cfg.attn_out_bias:
        layers["o_b"] = stack_vec("model.layers.{}.self_attn.o_proj.bias")
    if cfg.attn_sinks:
        layers["sinks"] = stack_vec("model.layers.{}.self_attn.sinks")
    if lazy:
        from ..formats.lazy import LazyTensor as _LT
        embed = _LT(lambda: sd["model.embed_tokens.weight"]
                    .astype(np.float32, copy=False),
                    shape_of("model.embed_tokens.weight"))
    else:
        embed = sd["model.embed_tokens.weight"].astype(np.float32)
    params = {
        "layers": layers,
        # granite: fold the HF logits divisor into the head-only norm
        # (output_norm feeds nothing but the lm head — exact)
        "final_ln": (sd["model.norm.weight"].astype(np.float32) + shift)
        / cfg.logit_scale,
        "embed": embed,
    }
    if pre_mlp:
        # heterogeneous stacks: attention/norm keys split at the dense
        # prefix boundary; MoE keys already cover only the main stack
        k0 = cfg.moe_first_dense
        moe_keys = {"router_w", "router_b", "moe_gate_w", "moe_up_w",
                    "moe_down_w", "shared_gate_w", "shared_up_w",
                    "shared_down_w", "shexp_gate_w"}
        pre = {key: w[:k0] for key, w in layers.items()
               if key not in moe_keys}
        pre.update(pre_mlp)
        params["layers"] = {key: (w if key in moe_keys else w[k0:])
                            for key, w in layers.items()}
        params["layers_pre"] = pre
    if "lm_head.weight" in sd and not cfg.tie_embeddings:
        params["lm_head"] = (t_lazy("lm_head.weight") if lazy
                             else t("lm_head.weight"))
    return params


# HF `architectures[0]` → (gguf arch, qk_norm, attn_bias)
_HF_ARCHS = {
    "Qwen3ForCausalLM": ("qwen3", True, False),
    "Qwen3MoeForCausalLM": ("qwen3moe", True, False),
    "Qwen2ForCausalLM": ("qwen2", False, True),
    "LlamaForCausalLM": ("llama", False, False),
    "MistralForCausalLM": ("llama", False, False),
    # mixtral (reference converter: LlamaModel's block_sparse_moe
    # handling in convert_hf_to_gguf.py — llama.cpp serves Mixtral as
    # arch "llama" + expert_* KVs): softmax→top-k→renormalize routing,
    # the same router math as qwen3moe with norm_topk_prob
    "MixtralForCausalLM": ("llama", False, False),
    # gemma3 text (reference converter: Gemma3Model at
    # convert_hf_to_gguf.py:5896): qk-norm, no attention biases,
    # sandwich norms / GeGLU / sliding-window handled via config flags
    "Gemma3ForCausalLM": ("gemma3", True, False),
    "Gemma3TextModel": ("gemma3", True, False),
    # gemma2 (reference converter: Gemma2Model): sandwich norms like
    # gemma3 but NO qk-norm, attention-logit softcapping, alternating
    # sliding/global from layer 0, one rope base for both
    "Gemma2ForCausalLM": ("gemma2", False, False),
    # phi3 family (reference converter: Phi3MiniModel at
    # convert_hf_to_gguf.py:4651): fused qkv/gate_up projections,
    # longrope scaling, optional all-layer sliding window
    "Phi3ForCausalLM": ("phi3", False, False),
    # gpt-oss (reference converter: GptOssModel at
    # convert_hf_to_gguf.py:10123): attention sinks, biased projections
    # and router, interleaved fused gate_up experts, YaRN rope,
    # alternating sliding/full attention
    "GptOssForCausalLM": ("gpt-oss", False, True),
    # deepseek2/3 (reference converter: DeepseekV2Model): MLA attention
    # (low-rank kv + optional q compression, shared rotary key), MoE
    # with shared experts / first-k dense layers / sigmoid+group routing
    "DeepseekV2ForCausalLM": ("deepseek2", False, False),
    "DeepseekV3ForCausalLM": ("deepseek2", False, False),
    # olmo2 (reference converter: Olmo2Model at
    # convert_hf_to_gguf.py:7042): post-norm-only layers, full-width
    # qk-norm applied before the head reshape
    "Olmo2ForCausalLM": ("olmo2", True, False),
    # glm4 / glm-4-0414 (reference converter: Glm4Model at
    # convert_hf_to_gguf.py:8246): sandwich norms under glm names,
    # partial interleaved rotary, fused gate_up MLP; attention_bias
    # comes from the HF config
    "Glm4ForCausalLM": ("glm4", False, False),
    # granite (reference converter: GraniteModel at
    # convert_hf_to_gguf.py:8851): llama structure + four scalar
    # multipliers (attention/embedding/residual/logits)
    "GraniteForCausalLM": ("granite", False, False),
    # qwen2-moe (reference converter: Qwen2MoeModel): qwen2 attention
    # (biases, no qk-norm), softmax top-k WITHOUT renormalization, one
    # sigmoid-gated shared expert with its own intermediate size
    "Qwen2MoeForCausalLM": ("qwen2moe", False, True),
}


def qwen3_config_from_hf(config: dict) -> Qwen3Config:
    hf_arch = (config.get("architectures") or ["Qwen3ForCausalLM"])[0]
    if hf_arch not in _HF_ARCHS:
        raise ValueError(
            f"unsupported HF architecture {hf_arch!r}; supported: "
            f"{sorted(_HF_ARCHS)}")
    arch, qk_norm, attn_bias = _HF_ARCHS[hf_arch]
    moe = {}
    if arch == "qwen3moe":
        if (config.get("mlp_only_layers") or
                config.get("decoder_sparse_step", 1) != 1):
            raise ValueError(
                "qwen3moe with dense interleaved layers (mlp_only_layers/"
                "decoder_sparse_step) is not supported — all layers must "
                "be sparse")
        moe = dict(
            n_experts=config["num_experts"],
            n_experts_per_tok=config["num_experts_per_tok"],
            moe_ffn_dim=config["moe_intermediate_size"],
            norm_topk_prob=bool(config.get("norm_topk_prob", True)))
    if arch == "qwen2moe":
        if (config.get("mlp_only_layers") or
                config.get("decoder_sparse_step", 1) != 1):
            raise ValueError(
                "qwen2moe with dense interleaved layers (mlp_only_layers/"
                "decoder_sparse_step) is not supported — all layers must "
                "be sparse")
        moe = dict(
            n_experts=config["num_experts"],
            n_experts_per_tok=config["num_experts_per_tok"],
            moe_ffn_dim=config["moe_intermediate_size"],
            # HF Qwen2MoeConfig default: no top-k renormalization
            norm_topk_prob=bool(config.get("norm_topk_prob", False)),
            n_shared_experts=1,
            shared_ffn_dim=config["shared_expert_intermediate_size"],
            shared_expert_gate=True)
    if hf_arch == "MistralForCausalLM" and config.get("sliding_window"):
        # llama.cpp serves mistral as arch "llama" and ignores its SWA
        # the same way; only contexts beyond the window (4096 on v0.1)
        # would differ from HF. Warn instead of silently dropping it.
        import logging
        logging.getLogger(__name__).warning(
            "mistral sliding_window=%s ignored (llama.cpp-compatible "
            "global attention; differs from HF only beyond the window)",
            config["sliding_window"])
    if hf_arch == "MixtralForCausalLM":
        if config.get("sliding_window"):
            raise ValueError(
                "mixtral with a sliding window is not supported (arch "
                "\"llama\" attends globally); set sliding_window null")
        # every layer is sparse; intermediate_size IS the expert width,
        # and HF renormalizes the top-k probs unconditionally
        moe = dict(
            n_experts=config["num_local_experts"],
            n_experts_per_tok=config["num_experts_per_tok"],
            moe_ffn_dim=config["intermediate_size"],
            norm_topk_prob=True)
    gemma = {}
    if arch == "gemma2":
        gemma = dict(
            post_norms=True,
            act="gelu_tanh",
            embed_scale=float(config["hidden_size"]) ** 0.5,
            attn_scale=float(config.get("query_pre_attn_scalar", 256))
            ** -0.5,
            sliding_window=int(config.get("sliding_window", 4096) or 0),
            # HF Gemma2: sliding at even layer indices, global at odd;
            # sliding_window: null means global everywhere — pattern 0,
            # or the even layers' empty mask would softmax to NaN
            sliding_pattern=(2 if config.get("sliding_window") else 0),
            # one rope base for both branches — use the SAME fallback as
            # the generic rope_theta below or the two halves split
            rope_local_theta=float(config.get("rope_theta", 1e6)),
            attn_softcap=float(
                config.get("attn_logit_softcapping") or 0.0),
            final_softcap=float(
                config.get("final_logit_softcapping") or 0.0),
        )
    if arch == "gemma3":
        # sliding pattern: every Nth layer is global. HF expresses this
        # as layer_types or sliding_window_pattern; both map to N.
        pattern = config.get("sliding_window_pattern")
        if not pattern and (lt := config.get("layer_types")):
            fulls = [i for i, t in enumerate(lt) if t == "full_attention"]
            pattern = (fulls[0] + 1) if fulls else 0
        rs = config.get("rope_scaling") or {}
        gemma = dict(
            post_norms=True,
            act="gelu_tanh",
            embed_scale=float(config["hidden_size"]) ** 0.5,
            attn_scale=float(config.get("query_pre_attn_scalar", 256))
            ** -0.5,
            sliding_window=int(config.get("sliding_window", 0) or 0),
            sliding_pattern=int(pattern or 0),
            rope_local_theta=float(
                config.get("rope_local_base_freq", 1e4)),
            rope_global_scale=float(rs.get("factor", 1.0))
            if rs.get("rope_type", rs.get("type")) == "linear" else 1.0,
            final_softcap=float(
                config.get("final_logit_softcapping") or 0.0),
        )
        if config.get("attn_logit_softcapping"):
            raise ValueError("attention logit softcapping (gemma2) is "
                             "not supported; gemma3-family only")
    oss = {}
    if arch == "gpt-oss":
        from ..models.config import yarn_rope_params
        rs = config.get("rope_scaling") or {}
        theta = float(config.get("rope_theta", 150000.0))
        hd = config.get("head_dim",
                        config["hidden_size"]
                        // config["num_attention_heads"])
        yf = float(rs.get("factor", 0.0) or 0.0)
        orig = int(rs.get("original_max_position_embeddings", 0) or 0)
        factors, af = (), 1.0
        if yf > 1.0 and orig:
            factors, af = yarn_rope_params(
                hd, theta, yf, orig,
                beta_fast=float(rs.get("beta_fast", 32.0)),
                beta_slow=float(rs.get("beta_slow", 1.0)),
                # HF gpt-oss configs set truncate=False (no floor/ceil
                # on the correction range); default matches HF's True
                truncate=bool(rs.get("truncate", True)),
                attention_factor=rs.get("attention_factor"))
        sw = int(config.get("sliding_window", 0) or 0)
        oss = dict(
            attn_sinks=True, attn_out_bias=True, router_bias=True,
            router_scoring="topk_softmax", moe_bias=True,
            act="swiglu_oai",
            swiglu_limit=float(config.get("swiglu_limit", 7.0)),
            n_experts=config["num_local_experts"],
            n_experts_per_tok=config["num_experts_per_tok"],
            moe_ffn_dim=config["intermediate_size"],
            sliding_window=sw,
            # layer_types alternates sliding/full from layer 0:
            # every 2nd layer attends globally
            sliding_pattern=2 if sw else 0,
            rope_local_theta=theta,
            rope_orig_max_position=orig,
            rope_factors_short=factors,
            rope_attn_factor=af,
            rope_yarn_factor=yf,
        )
    ds = {}
    if arch == "deepseek2":
        rs = config.get("rope_scaling") or {}
        if rs:
            # DeepSeek yarn: factors via the shared NTK-by-parts recipe;
            # attention factor from the mscale pair (HF
            # _compute_yarn_parameters: get_mscale(f, m)/get_mscale(f,
            # m_all) — identical mscales cancel to 1.0)
            import math
            from ..models.config import yarn_rope_params
            f = float(rs.get("factor", 1.0))
            ms = float(rs.get("mscale", 1.0) or 1.0)
            msa = float(rs.get("mscale_all_dim", 0.0) or 0.0)

            def get_mscale(scale, m):
                return (0.1 * m * math.log(scale) + 1.0
                        if scale > 1 and m else 1.0)
            af = (get_mscale(f, ms) / get_mscale(f, msa)
                  if msa else get_mscale(f, ms))
            factors, _ = yarn_rope_params(
                config["qk_rope_head_dim"],
                float(config.get("rope_theta", 1e4)), f,
                int(rs.get("original_max_position_embeddings", 4096)),
                beta_fast=float(rs.get("beta_fast", 32.0)),
                beta_slow=float(rs.get("beta_slow", 1.0)))
            ds.update(rope_factors_short=factors, rope_attn_factor=af,
                      rope_yarn_factor=f,
                      rope_orig_max_position=int(
                          rs.get("original_max_position_embeddings",
                                 4096)))
        moe_cfg = {}
        if config.get("n_routed_experts"):
            scoring = config.get("scoring_func", "softmax")
            moe_cfg = dict(
                n_experts=config["n_routed_experts"],
                n_experts_per_tok=config["num_experts_per_tok"],
                moe_ffn_dim=config["moe_intermediate_size"],
                norm_topk_prob=bool(config.get("norm_topk_prob", False)),
                moe_first_dense=int(
                    config.get("first_k_dense_replace", 0)),
                n_shared_experts=int(
                    config.get("n_shared_experts", 0) or 0),
                routed_scaling_factor=float(
                    config.get("routed_scaling_factor", 1.0)),
                router_scoring=("sigmoid" if scoring == "sigmoid"
                                else "softmax_topk"),
            )
            if config.get("topk_method") == "noaux_tc":
                moe_cfg.update(n_group=int(config.get("n_group", 0) or 0),
                               topk_group=int(
                                   config.get("topk_group", 0) or 0),
                               router_bias=True)
            elif config.get("topk_method") == "group_limited_greedy":
                # full DeepSeek-V2: group-limited softmax routing
                moe_cfg.update(n_group=int(config.get("n_group", 0) or 0),
                               topk_group=int(
                                   config.get("topk_group", 0) or 0))
        ds.update(
            q_lora_rank=int(config.get("q_lora_rank") or 0),
            kv_lora_rank=config["kv_lora_rank"],
            qk_nope_dim=config["qk_nope_head_dim"],
            qk_rope_dim=config["qk_rope_head_dim"],
            v_head_dim=config["v_head_dim"],
            rope_dim=config["qk_rope_head_dim"],
            rope_interleaved=True,
            **moe_cfg)
    phi = {}
    if arch == "phi3":
        import math
        rs = config.get("rope_scaling") or {}
        rtype = rs.get("rope_type", rs.get("type"))
        if rs and rtype not in ("longrope", "su"):
            raise ValueError(
                f"phi3 rope scaling type {rtype!r} not supported "
                "(longrope only)")
        orig = int(config.get("original_max_position_embeddings", 0) or 0)
        maxp = int(config.get("max_position_embeddings", 4096))
        short = tuple(float(x) for x in rs.get("short_factor") or ())
        long_ = tuple(float(x) for x in rs.get("long_factor") or ())
        af = rs.get("attention_factor")
        if af is None:
            scale = (maxp / orig) if orig else 1.0
            af = (math.sqrt(1.0 + math.log(scale) / math.log(orig))
                  if scale > 1.0 else 1.0)
        sw = config.get("sliding_window")
        nl = config["num_hidden_layers"]
        head_dim = config.get("head_dim",
                              config["hidden_size"]
                              // config["num_attention_heads"])
        rot = int(head_dim * config.get("partial_rotary_factor", 1.0))
        phi = dict(
            rope_dim=0 if rot == head_dim else rot,
            rope_orig_max_position=orig,
            rope_factors_short=short,
            rope_factors_long=long_,
            rope_attn_factor=float(af) if (short or long_) else 1.0,
            sliding_window=int(sw or 0),
            # every layer slides (no global layers): see loaders.py
            sliding_pattern=(nl + 1) if sw else 0,
            rope_local_theta=float(config.get("rope_theta", 1e4)),
        )
    gran = {}
    if arch == "granite":
        gran = dict(
            # HF GraniteConfig defaults attention_multiplier to 1.0; a
            # 0 here would silently fall back to head_dim**-0.5
            # (llama.cpp's rule) and diverge from HF logits for configs
            # missing the key
            attn_scale=float(config.get("attention_multiplier", 1.0)
                             or 1.0),
            embed_scale=float(config.get("embedding_multiplier", 1.0)),
            residual_scale=float(config.get("residual_multiplier", 1.0)),
            logit_scale=float(config.get("logits_scaling", 1.0)))
    glm = {}
    if arch == "glm4":
        hd = config.get("head_dim",
                        config["hidden_size"]
                        // config["num_attention_heads"])
        rot = int(hd * config.get("partial_rotary_factor", 0.5))
        glm = dict(post_norms=True,
                   rope_dim=0 if rot == hd else rot)
        attn_bias = bool(config.get("attention_bias", False))
    olmo = {}
    if arch == "olmo2":
        if config.get("sliding_window"):
            raise ValueError(
                "olmo with a sliding window (olmo3-style layer_types) "
                "is not supported; olmo2 attends globally")
        olmo = dict(pre_norms=False, post_norms=True, qk_norm_full=True)
    if arch == "deepseek2":
        # per-head qk dim is nope+rope (v may differ; cache pads)
        head_dim = config["qk_nope_head_dim"] + config["qk_rope_head_dim"]
    else:
        head_dim = config.get("head_dim",
                              config["hidden_size"]
                              // config["num_attention_heads"])
    l3 = {}
    if arch in ("llama", "granite") and config.get("rope_scaling"):
        # Llama-3.1/3.2 class rope scaling on the plain-llama graph.
        # Silently ignoring it would produce wrong logits for every
        # >8k-context Llama-3 checkpoint — handle or refuse loudly.
        rs = config["rope_scaling"]
        rtype = str(rs.get("rope_type") or rs.get("type") or "").lower()
        if rtype == "llama3":
            from ..models.config import llama3_rope_factors
            # SAME rope_theta fallback as the Qwen3Config construction
            # below — factors derived from a different base than the
            # forward pass uses would be silently wrong
            l3 = dict(
                rope_factors_short=llama3_rope_factors(
                    head_dim, float(config.get("rope_theta", 1e6)),
                    float(rs.get("factor", 8.0)),
                    float(rs.get("low_freq_factor", 1.0)),
                    float(rs.get("high_freq_factor", 4.0)),
                    int(rs.get("original_max_position_embeddings",
                               8192))),
                rope_orig_max_position=int(
                    rs.get("original_max_position_embeddings", 8192)))
        elif rtype == "linear":
            l3 = dict(rope_global_scale=float(rs.get("factor", 1.0)))
        elif rtype in ("", "default"):
            pass
        else:
            raise ValueError(
                f"{arch} rope scaling type {rtype!r} is not supported "
                "(llama3 and linear are)")
    return Qwen3Config(
        **moe,
        **gemma,
        **oss,
        **ds,
        **phi,
        **gran,
        **glm,
        **olmo,
        **l3,
        hidden=config["hidden_size"],
        n_layers=config["num_hidden_layers"],
        q_heads=config["num_attention_heads"],
        kv_heads=config["num_key_value_heads"],
        head_dim=head_dim,
        ffn_dim=config["intermediate_size"],
        vocab_size=config["vocab_size"],
        rope_theta=float(config.get("rope_theta", 1e6)),
        rms_eps=float(config.get("rms_norm_eps", 1e-6)),
        tie_embeddings=bool(config.get("tie_word_embeddings", True)),
        max_position=config.get("max_position_embeddings", 40960),
        arch=arch, qk_norm=qk_norm, attn_bias=attn_bias,
    )


def extract_llm_from_model_pt(model_pt: str) -> Dict[str, np.ndarray]:
    """Pull the ``llm.*`` weights out of the FunASR checkpoint
    (``03-Export…py:55-64``)."""
    import torch
    raw = torch.load(model_pt, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k[len("llm."):]: v.detach().cpu().numpy()
            for k, v in raw.items() if k.startswith("llm.")}


def load_hf_safetensors_dir(hf_dir: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    sd: Dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(hf_dir)):
        if name.endswith(".safetensors"):
            sd.update(load_file(os.path.join(hf_dir, name)))
    return sd


def convert_llm(hf_dir: str, out_path: str, outtype: str = "q8_0"):
    """Standalone HF decoder dir → one llama.cpp-compatible GGUF file.

    The direct equivalent of the reference's
    ``convert_hf_to_gguf.py <dir> --outfile x.gguf --outtype ...`` for
    the archs this decode graph runs (qwen3 / qwen2 / llama / mistral /
    qwen3moe / gemma3 / phi3 / gpt-oss / deepseek2/3 / mixtral /
    olmo2 / glm4 / granite): weights + embedded vocab (BPE from
    tokenizer.json or SentencePiece from tokenizer.model) + special
    tokens / chat template + general.* naming metadata.
    """
    with open(os.path.join(hf_dir, "config.json")) as f:
        cfg = qwen3_config_from_hf(json.load(f))
    use_lazy = cfg.arch in _LAZY_ARCHS and not cfg.is_moe
    if use_lazy:
        # streamed conversion: read->quantize->write one tensor at a
        # time; peak RSS ~ one tensor (reference gguf/lazy.py behavior)
        from ..formats.lazy import LazyHFDict
        try:
            sd = LazyHFDict(hf_dir)
        except Exception:
            sd = load_hf_safetensors_dir(hf_dir)
            use_lazy = False
    else:
        sd = load_hf_safetensors_dir(hf_dir)
    if not sd:
        raise FileNotFoundError(f"no .safetensors files in {hf_dir}")
    params = qwen3_params_from_hf_state(sd, cfg, lazy=use_lazy)
    tok_json = os.path.join(hf_dir, "tokenizer.json")
    tok_spm = os.path.join(hf_dir, "tokenizer.model")
    save_qwen3_to_gguf(
        out_path, params, cfg, quantize_q8_0=(outtype == "q8_0"),
        tokenizer_json=tok_json if os.path.exists(tok_json) else None,
        tokenizer_model=(tok_spm if os.path.exists(tok_spm)
                         and not os.path.exists(tok_json) else None),
        hf_dir=hf_dir)
    if outtype not in ("q8_0", "f16"):
        from .quantize import quantize_gguf
        tmp = out_path + ".f16"
        os.replace(out_path, tmp)
        quantize_gguf(tmp, out_path, outtype)
        os.remove(tmp)
    try:
        import resource
        peak_mb = resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024.0
        print(f"{out_path} ({outtype}) — peak RSS {peak_mb:.0f} MB"
              f"{' [streamed]' if use_lazy else ''}")
    except Exception:
        print(f"{out_path} ({outtype})")


def convert(model_dir: str, out_dir: str, outtype: str = "q8_0",
            hf_llm_dir: Optional[str] = None):
    """Produce a complete checkpoint directory from reference artifacts."""
    os.makedirs(out_dir, exist_ok=True)
    cfg = HybridConfig()

    # 1. CTC vocab
    tiktoken = os.path.join(model_dir, "multilingual.tiktoken")
    if os.path.exists(tiktoken):
        tokens = generate_sensevoice_vocab(tiktoken)
        write_tokens_file(tokens, os.path.join(out_dir, "tokens.txt"))
        print(f"tokens.txt: {len(tokens)} tokens")

    # 2. encoder / adaptor / CTC weights
    model_pt = os.path.join(model_dir, "model.pt")
    enc, ada, ctc = load_encoder_from_pt(model_pt, cfg.encoder, cfg.adaptor,
                                         cfg.ctc)
    from safetensors.numpy import save_file
    import jax
    flat = {}
    flat.update(flatten_tree(jax.device_get(enc), "encoder."))
    flat.update(flatten_tree(jax.device_get(ada), "adaptor."))
    flat.update(flatten_tree(jax.device_get(ctc), "ctc."))
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              os.path.join(out_dir, "encoder.safetensors"))
    print(f"encoder.safetensors: {len(flat)} tensors")

    # 3. LLM decoder
    hf_dir = hf_llm_dir or os.path.join(model_dir, "Qwen3-0.6B")
    cfg_path = os.path.join(hf_dir, "config.json")
    with open(cfg_path) as f:
        llm_cfg = qwen3_config_from_hf(json.load(f))
    if os.path.exists(os.path.join(hf_dir, "model.safetensors")):
        sd = load_hf_safetensors_dir(hf_dir)
    else:
        sd = extract_llm_from_model_pt(model_pt)
    params = qwen3_params_from_hf_state(sd, llm_cfg)
    tok_json = os.path.join(hf_dir, "tokenizer.json")
    tok_spm = os.path.join(hf_dir, "tokenizer.model")
    dec = os.path.join(out_dir, "decoder.gguf")
    save_qwen3_to_gguf(dec, params, llm_cfg,
                       quantize_q8_0=(outtype == "q8_0"),
                       tokenizer_json=(tok_json if os.path.exists(tok_json)
                                       else None),
                       # llama/mistral SPM checkpoints carry a
                       # tokenizer.model instead of a tokenizer.json
                       tokenizer_model=(tok_spm
                                        if os.path.exists(tok_spm)
                                        and not os.path.exists(tok_json)
                                        else None),
                       hf_dir=hf_dir)
    if outtype not in ("q8_0", "f16"):
        # other targets (k-quants, iq4, ternary, mxfp4, bf16) go through
        # the generic requantizer over the f16 export
        from .quantize import quantize_gguf
        tmp = dec + ".f16"
        os.replace(dec, tmp)
        quantize_gguf(tmp, dec, outtype)
        os.remove(tmp)
    print(f"decoder.gguf ({outtype})")

    # 4. tokenizer + config
    for name in ("tokenizer.json", "tokenizer_config.json",
                 "tokenizer.model", "added_tokens.json"):
        src = os.path.join(hf_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, name))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"encoder": asdict(cfg.encoder),
                   "adaptor": asdict(cfg.adaptor),
                   "ctc": asdict(cfg.ctc),
                   "llm": asdict(llm_cfg)}, f, indent=1)
    print(f"checkpoint written to {out_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True,
                    help="Fun-ASR-Nano model dir (model.pt, tiktoken, ...)")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    from .quantize import QUANT_TYPES
    ap.add_argument("--outtype", default="q8_0",
                    choices=sorted(QUANT_TYPES) + ["f16", "bf16"])
    ap.add_argument("--hf-llm-dir", default=None,
                    help="optional HF Qwen3 dir overriding model.pt llm.*")
    ap.add_argument("--llm-only", action="store_true",
                    help="treat --model-dir as a standalone HF decoder "
                         "dir and write one GGUF to --out "
                         "(convert_hf_to_gguf equivalent)")
    args = ap.parse_args()
    if args.llm_only:
        convert_llm(args.model_dir, args.out, args.outtype)
    else:
        convert(args.model_dir, args.out, args.outtype, args.hf_llm_dir)


if __name__ == "__main__":
    main()

"""Weight loading: reference artifacts → JAX pytrees, plus our checkpoint IO.

Interop targets:

* **decoder.gguf** — the llama.cpp-format GGUF the reference exports
  (``03-Export-Decoder-GGUF.py``); tensor names follow the llama.cpp qwen3
  schema (``token_embd.weight``, ``blk.N.attn_q.weight``, ...). Loading it
  directly means a user of the reference can point this engine at the same
  artifact.
* **model.pt** — the original FunASR torch checkpoint with
  ``audio_encoder.* / audio_adaptor.* / ctc_decoder.* / ctc.ctc_lo.*`` keys
  (``model_definition.py:231-238``); linear weights are [out, in] in torch
  and transposed into our [in, out] convention.
* **our checkpoint dir** — ``encoder.safetensors`` + ``decoder.gguf`` (or
  ``decoder.safetensors``) + ``config.json`` + tokenizer/vocab files.
"""

import json
import os
from dataclasses import asdict
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..formats.gguf import GGMLType, GGUFReader, GGUFWriter
from .config import (AdaptorConfig, CTCHeadConfig, EncoderConfig,
                     HybridConfig, Qwen3Config)


# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return root


def glm_neox_perm(n_out: int, head_dim: int, rope_dim: int,
                  inverse: bool = False) -> np.ndarray:
    """Output-channel permutation between GLM's interleaved ("normal")
    rope ordering and half-split ("neox") ordering, per head.

    llama.cpp stores glm4 q/k in the HF interleaved ordering and runs
    NORM-type rope at runtime (reference ``convert_hf_to_gguf.py:8283``
    Glm4Model.normal_to_neox documents the mapping; plain glm4 skips
    the permute). This graph runs half-split partial rope, so the rope
    channels are permuted at load and inverse-permuted on export —
    q and k permute consistently, leaving attention scores unchanged.
    """
    idx = np.arange(n_out).reshape(-1, head_dim)
    rot = idx[:, :rope_dim]
    if not inverse:
        rot = np.concatenate([rot[:, 0::2], rot[:, 1::2]], axis=1)
    else:
        half = rope_dim // 2
        out = np.empty_like(rot)
        out[:, 0::2] = rot[:, :half]
        out[:, 1::2] = rot[:, half:]
        rot = out
    return np.concatenate([rot, idx[:, rope_dim:]], axis=1).reshape(-1)


# ---------------------------------------------------------------------------
# GGUF → Qwen3 params
# ---------------------------------------------------------------------------

# GGUF llama-class archs this engine's decoder graph executes (each with
# an HF-parity test in tests/test_multiarch.py or a dedicated suite)
_GGUF_ARCHS = frozenset({
    "qwen3", "qwen3moe", "qwen2", "qwen2moe", "llama", "gemma2", "gemma3",
    "phi3", "gpt-oss", "deepseek2", "olmo2", "glm4", "granite",
})


def qwen3_config_from_gguf(reader: GGUFReader) -> Qwen3Config:
    """Read any llama-class GGUF's hyperparameters (qwen3 / qwen2 /
    llama / mistral — the arch family the reference's llama.dll loads).

    Per-arch structure (qk-norm, attention biases) is detected from the
    tensor set rather than hardcoded per arch name, so fine-tunes that
    deviate from the stock layout still load."""
    f = reader.fields
    arch = f.get("general.architecture", "qwen3")
    if str(arch) not in _GGUF_ARCHS and not str(arch).startswith("gemma"):
        # fail loudly with the supported-family list instead of loading
        # an unknown graph with llama semantics (silently wrong output)
        raise ValueError(
            f"unsupported GGUF architecture {arch!r}; this engine "
            f"implements: {sorted(_GGUF_ARCHS)}. Convert with "
            "tools/convert.py (HF) or use a llama.cpp export of a "
            "supported family.")
    def g(key, default):
        return f.get(f"{arch}.{key}", default)
    vocab, hidden = reader.tensor_info("token_embd.weight").shape
    names = set(reader.tensor_names())
    has_head = "output.weight" in names
    q_heads = int(g("attention.head_count", 16))
    hidden = int(g("embedding_length", hidden))
    moe = {}
    if int(g("expert_count", 0)):
        moe = dict(
            n_experts=int(g("expert_count", 0)),
            n_experts_per_tok=int(g("expert_used_count", 0)),
            moe_ffn_dim=int(g("expert_feed_forward_length", 0)),
            # HF Qwen2MoeConfig defaults norm_topk_prob=False and
            # llama.cpp writes no such KV for qwen2moe exports
            norm_topk_prob=bool(g("norm_topk_prob",
                                  str(arch) != "qwen2moe")))
        if str(arch) == "qwen2moe":
            # one sigmoid-gated shared expert with its own width
            # (reference converter: Qwen2MoeModel KV set)
            shared_ffn = int(g("expert_shared_feed_forward_length", 0))
            moe.update(
                shared_ffn_dim=shared_ffn,
                n_shared_experts=1 if shared_ffn else 0,
                shared_expert_gate=(
                    "blk.0.ffn_gate_inp_shexp.weight" in names))
    head_dim = int(g("attention.key_length", hidden // q_heads))
    gemma = {}
    if str(arch).startswith("gemma") and str(arch) not in ("gemma2",
                                                           "gemma3"):
        # gemma (v1) lacks the sandwich-norm tensors this graph expects
        # — loading it with gemma2/3 semantics would be silently wrong
        raise ValueError(
            f"unsupported arch {arch!r}: gemma2 and gemma3 of the "
            "gemma family are implemented")
    if str(arch) == "gemma2":
        # llama.cpp gemma2 KV set (reference converter: Gemma2Model):
        # sandwich norms, NO qk-norm, attention-logit softcapping,
        # alternating sliding/global, one rope base for both branches
        gemma = dict(
            post_norms=True,
            act="gelu_tanh",
            embed_scale=float(hidden) ** 0.5,
            attn_scale=float(g("attention.query_pre_attn_scalar", 256))
            ** -0.5,
            sliding_window=int(g("attention.sliding_window", 0)),
            sliding_pattern=2 if g("attention.sliding_window", 0) else 0,
            rope_local_theta=float(g("rope.freq_base", 1e4)),
            attn_softcap=float(g("attn_logit_softcapping", 50.0)),
            final_softcap=float(g("final_logit_softcapping", 30.0)),
        )
    if str(arch) == "gemma3":
        # llama.cpp hardcodes the gemma3 local rope base (10k) and the
        # 5-local:1-global pattern; our exporter also writes them as
        # explicit KVs for lossless round-trips
        gemma = dict(
            post_norms=True,
            act="gelu_tanh",
            embed_scale=float(hidden) ** 0.5,
            attn_scale=float(g("attention.query_pre_attn_scalar", 256))
            ** -0.5,
            sliding_window=int(g("attention.sliding_window", 0)),
            sliding_pattern=int(g("attention.sliding_window_pattern",
                                  6 if g("attention.sliding_window", 0)
                                  else 0)),
            rope_local_theta=float(g("rope.local_freq_base", 1e4)),
            rope_global_scale=float(g("rope.scaling.factor", 1.0)),
            final_softcap=float(g("final_logit_softcapping", 0.0)),
        )
    oss = {}
    if str(arch) == "gpt-oss":
        # reference converter: GptOssModel (convert_hf_to_gguf.py:10123).
        # YaRN rope is recomputed from its KVs into the per-frequency
        # divisor form the decode graph consumes (yarn_rope_params).
        from .config import yarn_rope_params
        theta = float(g("rope.freq_base", 150000.0))
        sw = int(g("attention.sliding_window", 0))
        yf = float(g("rope.scaling.factor", 0.0) or 0.0)
        orig = int(g("rope.scaling.original_context_length", 0))
        factors, af = (), 1.0
        if "rope_factors_short.weight" in names:
            # explicit per-frequency divisors (our exports write them;
            # covers YaRN variants the KV recompute can't express, e.g.
            # HF truncate=False correction ranges)
            factors = tuple(float(x) for x in
                            reader.tensor("rope_factors_short.weight"))
            if yf > 1.0:
                import math
                af = 0.1 * math.log(yf) + 1.0
        elif yf > 1.0 and orig:
            factors, af = yarn_rope_params(head_dim, theta, yf, orig)
        if factors:
            explicit = float(f.get(f"{arch}.rope.scaling.attn_factor",
                                   0.0))
            if explicit:
                af = explicit
        oss = dict(
            attn_sinks="blk.0.attn_sinks.weight" in names,
            attn_out_bias="blk.0.attn_output.bias" in names,
            router_bias="blk.0.ffn_gate_inp.bias" in names,
            router_scoring="topk_softmax",
            moe_bias="blk.0.ffn_down_exps.bias" in names,
            act="swiglu_oai",
            n_experts=int(g("expert_count", 0)),
            n_experts_per_tok=int(g("expert_used_count", 0)),
            moe_ffn_dim=int(g("expert_feed_forward_length", 0)),
            sliding_window=sw,
            # gpt-oss alternates sliding/full: every 2nd layer global
            sliding_pattern=2 if sw else 0,
            rope_local_theta=theta,
            rope_orig_max_position=orig,
            rope_factors_short=factors,
            rope_attn_factor=af,
            rope_yarn_factor=yf,
        )
        moe = {}     # the generic expert_count block above is superseded
    dsk = {}
    if str(arch) == "deepseek2":
        # reference converter: DeepseekV2Model. MLA dims ride the
        # standard key/value-length KVs (key = qk_nope + qk_rope);
        # llama.cpp's expert_* KV family carries the MoE structure.
        from .config import yarn_rope_params
        rp = int(g("rope.dimension_count", 0))
        gating = int(g("expert_gating_func", 1))
        k0 = int(g("leading_dense_block_count", 0))
        theta_ds = float(g("rope.freq_base", 1e4))
        factors, af = (), 1.0
        yf = float(g("rope.scaling.factor", 0.0) or 0.0)
        orig = int(g("rope.scaling.original_context_length", 0))
        if "rope_factors_short.weight" in names:
            factors = tuple(float(x) for x in
                            reader.tensor("rope_factors_short.weight"))
        elif yf > 1.0 and orig:
            # upstream llama.cpp converters write yarn via KVs only —
            # recompute the per-frequency divisors (same fallback as
            # the gpt-oss block above)
            factors, af = yarn_rope_params(rp, theta_ds, yf, orig)
        if factors:
            explicit = float(f.get(f"{arch}.rope.scaling.attn_factor",
                                   0.0))
            if explicit:
                af = explicit
        dsk = dict(
            q_lora_rank=int(g("attention.q_lora_rank", 0) or 0),
            kv_lora_rank=int(g("attention.kv_lora_rank", 0)),
            qk_nope_dim=head_dim - rp,
            qk_rope_dim=rp,
            v_head_dim=int(g("attention.value_length", head_dim)),
            rope_dim=rp,
            rope_interleaved=True,
            n_experts=int(g("expert_count", 0)),
            n_experts_per_tok=int(g("expert_used_count", 0)),
            moe_ffn_dim=int(g("expert_feed_forward_length", 0)),
            moe_first_dense=k0,
            n_shared_experts=int(g("expert_shared_count", 0)),
            routed_scaling_factor=float(g("expert_weights_scale", 1.0)),
            norm_topk_prob=bool(g("expert_weights_norm", False)),
            router_scoring=("sigmoid" if gating == 2
                            else "softmax_topk"),
            router_bias=f"blk.{k0}.exp_probs_b.bias" in names,
            n_group=int(g("expert_group_count", 0)),
            topk_group=int(g("expert_group_used_count", 0)),
            rope_factors_short=factors,
            rope_attn_factor=af,
            rope_yarn_factor=yf,
            rope_orig_max_position=orig,
        )
        moe = {}     # the generic expert_count block above is superseded
    phi = {}
    if str(arch) == "phi3":
        # reference converter: Phi3MiniModel (convert_hf_to_gguf.py:4651)
        # writes rope.dimension_count, rope.scaling.original_context_length
        # and the longrope factor tensors; sliding_window=0 marks Phi-4.
        # llama.cpp picks long factors when n_ctx > original and derives
        # the attn factor sqrt(1 + ln(scale)/ln(orig)) — precomputed here
        # (load_qwen3_from_gguf's n_ctx selects the active set).
        import math
        rd = int(g("rope.dimension_count", head_dim))
        orig = int(g("rope.scaling.original_context_length", 0))
        maxp = int(g("context_length", 4096))
        sw = int(g("attention.sliding_window", 0))
        short = long_ = ()
        if "rope_factors_short.weight" in names:
            short = tuple(float(x) for x in
                          reader.tensor("rope_factors_short.weight"))
        if "rope_factors_long.weight" in names:
            long_ = tuple(float(x) for x in
                          reader.tensor("rope_factors_long.weight"))
        af = float(f.get(f"{arch}.rope.scaling.attn_factor", 0.0))
        if not af:
            scale = (maxp / orig) if orig else 1.0
            af = (math.sqrt(1.0 + math.log(scale) / math.log(orig))
                  if scale > 1.0 else 1.0)
        nl = int(g("block_count", 28))
        phi = dict(
            rope_dim=0 if rd == head_dim else rd,
            rope_orig_max_position=orig,
            rope_factors_short=short,
            rope_factors_long=long_,
            rope_attn_factor=af if (short or long_) else 1.0,
            sliding_window=sw,
            # phi3 slides on EVERY layer: no layer index satisfies
            # (l+1) % (n_layers+1) == 0, so none attends globally
            sliding_pattern=(nl + 1) if sw else 0,
            rope_local_theta=float(g("rope.freq_base", 1e4)),
        )
    gran = {}
    if str(arch) == "granite":
        # reference converter: GraniteModel (convert_hf_to_gguf.py:8851)
        # writes the four multipliers as {arch}.attention.scale /
        # embedding_scale / residual_scale / logit_scale
        gran = dict(
            attn_scale=float(g("attention.scale", 0.0)),
            embed_scale=float(g("embedding_scale", 1.0)),
            residual_scale=float(g("residual_scale", 1.0)),
            logit_scale=float(g("logit_scale", 1.0)))
    glm = {}
    if str(arch) == "glm4":
        # reference converter: Glm4Model (convert_hf_to_gguf.py:8246):
        # sandwich norms under glm names, partial rotary dims via
        # rope.dimension_count, fused [gate; up] in ffn_up
        rd = int(g("rope.dimension_count", head_dim))
        glm = dict(post_norms=True,
                   rope_dim=0 if rd == head_dim else rd)
    olmo = {}
    if str(arch) == "olmo2":
        # reference converter: Olmo2Model (convert_hf_to_gguf.py:7042);
        # llama.cpp's olmo2 graph is post-norm-only (no attn_norm/
        # ffn_norm tensors) with full-width qk-norm
        olmo = dict(pre_norms=False, post_norms=True, qk_norm_full=True)
    l3 = {}
    if str(arch) in ("llama", "granite"):
        # Llama-3.1 class per-frequency rope divisors ship as ONE
        # rope_freqs.weight tensor (reference converter: LlamaModel
        # generate_extra_tensors); linear scaling as rope.scaling KVs
        if "rope_freqs.weight" in names:
            l3["rope_factors_short"] = tuple(
                float(x) for x in reader.tensor("rope_freqs.weight"))
            orig = int(g("rope.scaling.original_context_length", 0))
            if orig:
                l3["rope_orig_max_position"] = orig
        if str(f.get(f"{arch}.rope.scaling.type", "")) == "linear":
            l3["rope_global_scale"] = float(g("rope.scaling.factor", 1.0))
    return Qwen3Config(
        **l3,
        **moe,
        **gemma,
        **oss,
        **dsk,
        **phi,
        **gran,
        **glm,
        **olmo,
        hidden=hidden,
        n_layers=int(g("block_count", 28)),
        q_heads=q_heads,
        kv_heads=int(g("attention.head_count_kv", 8)),
        # llama GGUFs typically omit key_length: head_dim = hidden/heads
        head_dim=head_dim,
        ffn_dim=int(g("feed_forward_length", 3072)),
        vocab_size=int(vocab),
        rope_theta=float(g("rope.freq_base", 1e6)),
        rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        tie_embeddings=not has_head,
        max_position=int(g("context_length", 40960)),
        arch=str(arch),
        qk_norm="blk.0.attn_q_norm.weight" in names,
        attn_bias="blk.0.attn_q.bias" in names,
    )


def load_qwen3_from_gguf(path: str, dtype=jnp.bfloat16,
                         keep_quantized: bool = False,
                         n_ctx: Optional[int] = None
                         ) -> Tuple[dict, Qwen3Config, np.ndarray]:
    """Load a llama.cpp-format qwen3 GGUF (f32/f16/bf16/q8_0 tensors).

    Returns (params, config, embedding_table_f32). The embedding table is
    the host-side copy the prompt builder gathers from (the analogue of
    ``get_token_embeddings_gguf``, reference ``llama.py:751-796``).

    With ``keep_quantized=True``, q8_0 matmul weights are loaded straight
    into ``QuantTensor`` (int8 + scales) without dequantizing; the on-disk
    [out, in] blocks get the kernel's block-transposed k ordering applied
    (``ops.quant_matmul.block_permute``), a one-time load-time shuffle.
    """
    from ..formats.gguf import GGMLType
    from ..ops.quant_matmul import QuantTensor, block_permute

    r = GGUFReader(path)
    cfg = qwen3_config_from_gguf(r)
    if (n_ctx and cfg.rope_orig_max_position
            and n_ctx > cfg.rope_orig_max_position
            and cfg.rope_factors_long):
        # llama.cpp longrope rule: serve contexts beyond the original
        # training window with the long factor set
        from dataclasses import replace
        cfg = replace(cfg, rope_long_active=True)

    def t(name):  # dense-dequantized fetch, [out, in] -> [in, out]
        return np.ascontiguousarray(r.tensor(name).astype(np.float32).T)

    # NOTE: every helper below returns NUMPY (incl. ml_dtypes bf16);
    # per-layer eager jnp ops (asarray/stack/reshape) each dispatch an XLA
    # program — on the 1-core build host a single compile costs seconds
    # and a 0.6B load was spending >70 s in them. The finished tree is
    # uploaded in ONE tree_map at the end (pure transfers, no compiles).
    def mat(name):
        info = r.tensor_info(name)
        if keep_quantized and info.ggml_type == GGMLType.Q8_0:
            q, d = r.tensor_q8_0(name)          # [out, in], [out, in/32]
            # QuantTensor stores k block-transposed (kernel layout)
            return QuantTensor(q=np.ascontiguousarray(block_permute(q)),
                               d=d.astype(np.float32))
        return np.asarray(t(name), dtype)

    def mat_rows(name, row_slices):
        """Split a fused [out, in] tensor by output-row ranges (phi3's
        attn_qkv / gate-up-in-ffn_up layouts). q8_0 blocks run along
        ``in``, so a row split never crosses a block: the quantized
        payload slices cleanly."""
        info = r.tensor_info(name)
        if keep_quantized and info.ggml_type == GGMLType.Q8_0:
            q, d = r.tensor_q8_0(name)
            return [QuantTensor(q=np.ascontiguousarray(
                                    block_permute(q[a:b])),
                                d=d[a:b].astype(np.float32))
                    for a, b in row_slices]
        full = r.tensor(name).astype(np.float32)
        return [np.asarray(np.ascontiguousarray(full[a:b].T), dtype)
                for a, b in row_slices]

    def vec(name):
        return r.tensor(name).astype(np.float32)

    embed = r.tensor("token_embd.weight").astype(np.float32)  # [vocab, h]

    n = cfg.n_layers
    def stack(fn):
        items = [fn(i) for i in range(n)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *items)

    def vstack(fmt):
        return np.asarray(
            np.stack([vec(fmt.format(i)) for i in range(n)]), dtype)

    names = set(r.tensor_names())
    layers = {
        "o_w": stack(lambda i: mat(f"blk.{i}.attn_output.weight")),
    }
    if "blk.0.attn_norm.weight" in names:
        layers["input_ln"] = vstack("blk.{}.attn_norm.weight")
        layers["post_ln"] = vstack("blk.{}.ffn_norm.weight")
    if "blk.0.attn_kv_a_mqa.weight" in names:
        # deepseek MLA layout (reference converter: DeepseekV2Model)
        if "blk.0.attn_q_a.weight" in names:
            layers["q_a_w"] = stack(lambda i: mat(f"blk.{i}.attn_q_a.weight"))
            layers["q_a_norm"] = vstack("blk.{}.attn_q_a_norm.weight")
            layers["q_b_w"] = stack(lambda i: mat(f"blk.{i}.attn_q_b.weight"))
        else:
            layers["q_w"] = stack(lambda i: mat(f"blk.{i}.attn_q.weight"))
        layers["kv_a_w"] = stack(
            lambda i: mat(f"blk.{i}.attn_kv_a_mqa.weight"))
        layers["kv_a_norm"] = vstack("blk.{}.attn_kv_a_norm.weight")
        layers["kv_b_w"] = stack(lambda i: mat(f"blk.{i}.attn_kv_b.weight"))
    elif "blk.0.attn_qkv.weight" in names:
        # phi3 layout: one fused [q; k; v] projection per layer
        qd = cfg.q_heads * cfg.head_dim
        kd = cfg.kv_heads * cfg.head_dim
        qkv = [mat_rows(f"blk.{i}.attn_qkv.weight",
                        [(0, qd), (qd, qd + kd), (qd + kd, qd + 2 * kd)])
               for i in range(n)]
        for j, key in enumerate(("q_w", "k_w", "v_w")):
            layers[key] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *[p[j] for p in qkv])
    else:
        layers.update({
            "q_w": stack(lambda i: mat(f"blk.{i}.attn_q.weight")),
            "k_w": stack(lambda i: mat(f"blk.{i}.attn_k.weight")),
            "v_w": stack(lambda i: mat(f"blk.{i}.attn_v.weight")),
        })
    k0 = cfg.moe_first_dense if cfg.is_moe else 0
    pre_mlp = {}
    if cfg.is_moe:
        # llama.cpp MoE layout: ffn_gate_inp (router) + stacked 3-D
        # ffn_{gate,up,down}_exps. Experts dequantize on load (the engine
        # re-quantizes to int8); the 2-D Pallas q8_0 path doesn't apply.
        # deepseek: MoE tensors start at layer ``k0``
        # (leading_dense_block_count); shexp = shared experts.
        moe_rng = range(k0, n)

        def e3(name, swap):
            a = r.tensor(name).astype(np.float32)      # [E, n, k]
            return np.asarray(np.swapaxes(a, -1, -2) if swap else a,
                              dtype)

        def mstack(fn):
            items = [fn(i) for i in moe_rng]
            return jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                          *items)
        layers["router_w"] = mstack(
            lambda i: np.asarray(t(f"blk.{i}.ffn_gate_inp.weight"), dtype))
        layers["moe_gate_w"] = mstack(
            lambda i: e3(f"blk.{i}.ffn_gate_exps.weight", True))
        layers["moe_up_w"] = mstack(
            lambda i: e3(f"blk.{i}.ffn_up_exps.weight", True))
        layers["moe_down_w"] = mstack(
            lambda i: e3(f"blk.{i}.ffn_down_exps.weight", True))
        if f"blk.{k0}.ffn_gate_shexp.weight" in names:
            layers["shared_gate_w"] = mstack(
                lambda i: mat(f"blk.{i}.ffn_gate_shexp.weight"))
            layers["shared_up_w"] = mstack(
                lambda i: mat(f"blk.{i}.ffn_up_shexp.weight"))
            layers["shared_down_w"] = mstack(
                lambda i: mat(f"blk.{i}.ffn_down_shexp.weight"))
        if f"blk.{k0}.ffn_gate_inp_shexp.weight" in names:
            # qwen2moe sigmoid gate: [1, h] matrix -> our [L, h] vector
            layers["shexp_gate_w"] = np.asarray(np.stack(
                [r.tensor(f"blk.{i}.ffn_gate_inp_shexp.weight")
                 .astype(np.float32).reshape(-1) for i in moe_rng]),
                dtype)
        if f"blk.{k0}.exp_probs_b.bias" in names:
            # deepseek3 e-score correction bias (selection only)
            layers["router_b"] = np.asarray(
                np.stack([r.tensor(f"blk.{i}.exp_probs_b.bias")
                          .astype(np.float32) for i in moe_rng]), dtype)
        for key, nm in (("gate_w", "ffn_gate"), ("up_w", "ffn_up"),
                        ("down_w", "ffn_down")):
            if k0:   # dense prefix layers
                items = [mat(f"blk.{i}.{nm}.weight") for i in range(k0)]
                pre_mlp[key] = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *items)
        # gpt-oss carries a router bias + per-expert biases
        # (reference converter: GptOssModel, convert_hf_to_gguf.py:10123)
        if "blk.0.ffn_gate_inp.bias" in names:
            layers["router_b"] = vstack("blk.{}.ffn_gate_inp.bias")
        if "blk.0.ffn_gate_exps.bias" in names:
            def estack_b(fmt):           # per-layer [E, n] → [L, E, n]
                return np.asarray(
                    np.stack([r.tensor(fmt.format(i)).astype(np.float32)
                              for i in range(n)]), dtype)
            layers["moe_gate_b"] = estack_b("blk.{}.ffn_gate_exps.bias")
            layers["moe_up_b"] = estack_b("blk.{}.ffn_up_exps.bias")
            layers["moe_down_b"] = estack_b("blk.{}.ffn_down_exps.bias")
    elif "blk.0.ffn_gate.weight" not in names:
        # phi3 layout: ffn_up holds [gate; up] fused (llama.cpp
        # LLM_FFN_SWIGLU splits it the same way, gate first)
        fd = cfg.ffn_dim
        gu = [mat_rows(f"blk.{i}.ffn_up.weight", [(0, fd), (fd, 2 * fd)])
              for i in range(n)]
        for j, key in enumerate(("gate_w", "up_w")):
            layers[key] = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *[p[j] for p in gu])
        layers["down_w"] = stack(lambda i: mat(f"blk.{i}.ffn_down.weight"))
    else:
        layers.update({
            "gate_w": stack(lambda i: mat(f"blk.{i}.ffn_gate.weight")),
            "up_w": stack(lambda i: mat(f"blk.{i}.ffn_up.weight")),
            "down_w": stack(lambda i: mat(f"blk.{i}.ffn_down.weight")),
        })
    if cfg.qk_norm:
        layers["q_norm"] = vstack("blk.{}.attn_q_norm.weight")
        layers["k_norm"] = vstack("blk.{}.attn_k_norm.weight")
    if cfg.post_norms:
        layers["attn_post_ln"] = vstack("blk.{}.post_attention_norm.weight")
        layers["ffn_post_ln"] = vstack("blk.{}.post_ffw_norm.weight")
    if cfg.attn_bias:
        layers["q_b"] = vstack("blk.{}.attn_q.bias")
        layers["k_b"] = vstack("blk.{}.attn_k.bias")
        layers["v_b"] = vstack("blk.{}.attn_v.bias")
    if cfg.arch == "glm4" and cfg.rope_dim:
        # the file stores q/k in interleaved rope ordering (llama.cpp
        # NORM rope); this graph runs half-split — permute rope channels
        def permute_out(w, perm):
            perm = np.asarray(perm)
            if isinstance(w, QuantTensor):
                # q [L, out, ...] / d [L, out, ...]: out-row reorder is
                # block-safe (q8_0 blocks run along k)
                return QuantTensor(q=w.q[:, perm], d=w.d[:, perm])
            return w[..., perm]          # dense [L, in, out] / [L, out]
        pq = glm_neox_perm(cfg.q_heads * cfg.head_dim, cfg.head_dim,
                           cfg.rope_dim)
        pk = glm_neox_perm(cfg.kv_heads * cfg.head_dim, cfg.head_dim,
                           cfg.rope_dim)
        layers["q_w"] = permute_out(layers["q_w"], pq)
        layers["k_w"] = permute_out(layers["k_w"], pk)
        if "q_b" in layers:
            layers["q_b"] = permute_out(layers["q_b"], pq)
            layers["k_b"] = permute_out(layers["k_b"], pk)
    # gpt-oss extras: per-head attention-sink logits + o_proj bias
    if "blk.0.attn_sinks.weight" in names:
        layers["sinks"] = vstack("blk.{}.attn_sinks.weight")
    if "blk.0.attn_output.bias" in names:
        layers["o_b"] = vstack("blk.{}.attn_output.bias")
    params = {
        "layers": layers,
        # granite: fold the logits divisor into the head-only norm
        # (exact — output_norm feeds nothing but the lm head)
        "final_ln": np.asarray(vec("output_norm.weight")
                               / cfg.logit_scale, dtype),
        "embed": np.asarray(embed, dtype),
    }
    if pre_mlp:
        # heterogeneous stacks (deepseek leading dense layers): split
        # the full-depth attention/norm stacks at k0; MoE keys already
        # cover only the main stack
        moe_keys = {"router_w", "router_b", "moe_gate_w", "moe_up_w",
                    "moe_down_w", "moe_gate_b", "moe_up_b", "moe_down_b",
                    "shared_gate_w", "shared_up_w", "shared_down_w",
                    "shexp_gate_w"}
        sl = lambda w, a, b: jax.tree_util.tree_map(lambda x: x[a:b], w)
        pre = {key: sl(w, 0, k0) for key, w in layers.items()
               if key not in moe_keys}
        pre.update(pre_mlp)
        params["layers"] = {key: (w if key in moe_keys
                                  else sl(w, k0, n))
                            for key, w in layers.items()}
        params["layers_pre"] = pre
    if not cfg.tie_embeddings:
        params["lm_head"] = np.asarray(t("output.weight"), dtype)
    # single upload pass: pure host->device transfers, zero compiles
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        params)
    return params, cfg, embed


class _QD:
    """A pre-quantized q8_0 tensor (split int8 quants + fp16 scales)."""

    __slots__ = ("q", "d")

    def __init__(self, q: np.ndarray, d: np.ndarray):
        self.q, self.d = q, d


class _QDStack:
    """Stacked pre-quantized layers; ``[i]`` yields one layer's _QD."""

    __slots__ = ("q", "d")

    def __init__(self, q: np.ndarray, d: np.ndarray):
        self.q, self.d = q, d

    def __getitem__(self, i) -> _QD:
        return _QD(self.q[i], self.d[i])


# matmul-weight keys of the qwen3-family param tree (everything mat()/mat3()
# exports as q8_0; norms/biases/sinks stay float)
_EXPORT_MAT_KEYS = frozenset({
    "q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w", "router_w",
    "moe_gate_w", "moe_up_w", "moe_down_w",
    "shared_gate_w", "shared_up_w", "shared_down_w",
    "q_a_w", "q_b_w", "kv_a_w", "kv_b_w",
})


def _q8_export_quantize(x, transpose: bool):
    """On-device q8_0: same f32 IEEE ops as formats/quant_np.q8_0_quantize
    (absmax/127 scale, round half away from zero, fp16 RN scale store), so
    the fetched bytes are bit-identical to the host quantizer's."""
    x = x.astype(jnp.float32)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    shape = x.shape
    blocks = x.reshape(*shape[:-1], shape[-1] // 32, 32)
    d = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True) / 127.0
    # subnormal d flushes to a zero block on every path (TPU flushes
    # denormals anyway; numpy/C++ match — see quant_np.q8_0_quantize)
    d = jnp.where(d < np.finfo(np.float32).tiny, 0.0, d)
    inv = jnp.where(d == 0, 0.0, 1.0 / d)
    q = blocks * inv
    q = jnp.where(q >= 0, jnp.floor(q + 0.5), jnp.ceil(q - 0.5))
    q = jnp.clip(q, -127, 127).astype(jnp.int8).reshape(shape)
    return q, d[..., 0].astype(jnp.float16)


_q8_export_jit = jax.jit(_q8_export_quantize, static_argnums=1)


def _params_platform(params) -> Optional[str]:
    for leaf in jax.tree_util.tree_leaves(params):
        if isinstance(leaf, jax.Array):
            try:
                return next(iter(leaf.devices())).platform
            except Exception:
                return None
    return None


def _materialize_for_export(params, cfg: Qwen3Config, quantize_q8_0: bool):
    """Fetch params to host for GGUF export.

    For device-resident params (TPU over a remote tunnel: ~25 MB/s), the
    f32 fetch of a 0.6B model is ~100 s of pure transfer. When the export
    is q8_0 anyway, quantize the big matmul stacks ON DEVICE (transpose +
    block-quant, one jitted program per shape) and fetch int8 quants +
    fp16 scales instead — ~4x less tunnel traffic and no host quantize
    pass at all. Norms/biases/scalars are fetched in bulk as usual.

    phi3/glm4 post-process weight matrices host-side (fusion/permutes), so
    they take the plain fetch path.
    """
    from ..formats.lazy import LazyStack, LazyTensor
    if any(isinstance(leaf, (_QD, _QDStack, LazyTensor, LazyStack))
           for leaf in jax.tree_util.tree_leaves(params)):
        # already host-quantized (fast_q8) or streamed-lazy: passthrough
        return params
    plat = _params_platform(params)
    if (not quantize_q8_0 or plat in (None, "cpu")
            or cfg.arch in ("phi3", "glm4")):
        return jax.device_get(params)

    flat: Dict = {}
    for sect in ("layers", "layers_pre"):
        if sect not in params:
            continue
        sub: Dict = {}
        rest: Dict = {}
        for k, v in params[sect].items():
            if (k in _EXPORT_MAT_KEYS and hasattr(v, "ndim")
                    and v.ndim >= 3 and v.shape[-2] % 32 == 0):
                q, d = _q8_export_jit(v, True)
                sub[k] = _QDStack(np.asarray(q), np.asarray(d))
            else:
                rest[k] = v
        sub.update(jax.device_get(rest))
        flat[sect] = sub
    rest_top = {}
    for k, v in params.items():
        if k in ("layers", "layers_pre"):
            continue
        if (k == "lm_head" and hasattr(v, "ndim") and v.ndim == 2
                and v.shape[0] % 32 == 0):
            q, d = _q8_export_jit(v, True)
            flat[k] = _QD(np.asarray(q), np.asarray(d))
        elif (k == "embed" and hasattr(v, "ndim") and v.ndim == 2
                and v.shape[-1] % 32 == 0):
            q, d = _q8_export_jit(v, False)
            flat[k] = _QD(np.asarray(q), np.asarray(d))
        else:
            rest_top[k] = v
    flat.update(jax.device_get(rest_top))
    return flat


def save_qwen3_to_gguf(path: str, params, cfg: Qwen3Config,
                       quantize_q8_0: bool = True,
                       tokenizer_json: str = None,
                       tokenizer_model: str = None,
                       hf_dir: str = None):
    """Export our params as a llama.cpp-compatible qwen3 GGUF.

    With ``tokenizer_json``, the vocab/merges embed as
    ``tokenizer.ggml.*`` KVs (llama.cpp layout) so the file is
    self-contained — loadable without a separate tokenizer.json
    (QwenTokenizer.from_gguf / llama.cpp itself). ``tokenizer_model``
    embeds a SentencePiece vocab instead (llama/mistral family;
    tokens + scores + token types, ``tokenizer.ggml.model = llama`` —
    reference ``gguf/vocab.py:431-503`` SentencePieceVocab semantics).
    """
    arch = cfg.arch
    w = GGUFWriter(path, arch=arch)
    w.add_kv(f"{arch}.embedding_length", cfg.hidden)
    w.add_kv(f"{arch}.block_count", cfg.n_layers)
    w.add_kv(f"{arch}.attention.head_count", cfg.q_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", cfg.kv_heads)
    w.add_kv(f"{arch}.attention.key_length", cfg.head_dim)
    w.add_kv(f"{arch}.attention.value_length",
             cfg.v_head_dim or cfg.head_dim)
    w.add_kv(f"{arch}.feed_forward_length", cfg.ffn_dim)
    w.add_kv(f"{arch}.rope.freq_base", float(cfg.rope_theta))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", float(cfg.rms_eps))
    w.add_kv(f"{arch}.context_length", cfg.max_position)
    if cfg.is_moe:
        w.add_kv(f"{arch}.expert_count", cfg.n_experts)
        w.add_kv(f"{arch}.expert_used_count", cfg.n_experts_per_tok)
        w.add_kv(f"{arch}.expert_feed_forward_length", cfg.moe_ffn_dim)
        w.add_kv(f"{arch}.norm_topk_prob", cfg.norm_topk_prob)
        if arch == "qwen2moe":
            # reference converter (Qwen2MoeModel): shared-expert width
            w.add_kv(f"{arch}.expert_shared_feed_forward_length",
                     cfg.shared_ffn_dim
                     or cfg.n_shared_experts * cfg.moe_ffn_dim)
    if arch == "gemma2":
        # llama.cpp gemma2 KV set (reference converter: Gemma2Model)
        w.add_kv(f"{arch}.attention.sliding_window", cfg.sliding_window)
        w.add_kv(f"{arch}.attn_logit_softcapping", float(cfg.attn_softcap))
        w.add_kv(f"{arch}.final_logit_softcapping",
                 float(cfg.final_softcap))
        w.add_kv(f"{arch}.attention.query_pre_attn_scalar",
                 float(cfg.attn_scale ** -2) if cfg.attn_scale else 256.0)
    if arch == "gemma3":
        # gemma3-only KV block (llama.cpp hardcodes the pattern/local-
        # theta; we round-trip them losslessly). Gated on the arch, not
        # post_norms: olmo2/glm4 also set post_norms and must not carry
        # spurious gemma keys the reference converter never writes
        w.add_kv(f"{arch}.attention.sliding_window", cfg.sliding_window)
        w.add_kv(f"{arch}.attention.sliding_window_pattern",
                 cfg.sliding_pattern)
        w.add_kv(f"{arch}.attention.query_pre_attn_scalar",
                 float(cfg.attn_scale ** -2) if cfg.attn_scale else 256.0)
        w.add_kv(f"{arch}.rope.local_freq_base", cfg.rope_local_theta)
        w.add_kv(f"{arch}.rope.scaling.factor", cfg.rope_global_scale)
        if cfg.final_softcap:
            w.add_kv(f"{arch}.final_logit_softcapping", cfg.final_softcap)
    if arch == "deepseek2":
        # DeepseekV2Model KV set (reference converter): MLA ranks, the
        # leading dense prefix, shared experts, scoring family (gating
        # func 1=softmax 2=sigmoid), group-limited routing, yarn rope
        w.add_kv(f"{arch}.attention.q_lora_rank", cfg.q_lora_rank)
        w.add_kv(f"{arch}.attention.kv_lora_rank", cfg.kv_lora_rank)
        w.add_kv(f"{arch}.rope.dimension_count", cfg.qk_rope_dim)
        w.add_kv(f"{arch}.leading_dense_block_count", cfg.moe_first_dense)
        w.add_kv(f"{arch}.expert_shared_count", cfg.n_shared_experts)
        w.add_kv(f"{arch}.expert_weights_scale",
                 float(cfg.routed_scaling_factor))
        w.add_kv(f"{arch}.expert_weights_norm", bool(cfg.norm_topk_prob))
        w.add_kv(f"{arch}.expert_gating_func",
                 2 if cfg.router_scoring == "sigmoid" else 1)
        if cfg.n_group:
            w.add_kv(f"{arch}.expert_group_count", cfg.n_group)
            w.add_kv(f"{arch}.expert_group_used_count", cfg.topk_group)
        if cfg.rope_yarn_factor:
            w.add_kv(f"{arch}.rope.scaling.factor",
                     float(cfg.rope_yarn_factor))
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     cfg.rope_orig_max_position)
            w.add_kv(f"{arch}.rope.scaling.attn_factor",
                     float(cfg.rope_attn_factor))
    if arch == "gpt-oss":
        # GptOssModel KV set (reference convert_hf_to_gguf.py:10123):
        # sliding window + YaRN rope scaling; the loader recomputes the
        # per-frequency divisors from these KVs (yarn_rope_params), so
        # the explicit attn_factor keeps round-trips bit-faithful
        w.add_kv(f"{arch}.attention.sliding_window", cfg.sliding_window)
        if cfg.rope_yarn_factor:
            w.add_kv(f"{arch}.rope.scaling.factor",
                     float(cfg.rope_yarn_factor))
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     cfg.rope_orig_max_position)
            w.add_kv(f"{arch}.rope.scaling.attn_factor",
                     float(cfg.rope_attn_factor))
    if arch == "glm4":
        # Glm4Model KV set (reference convert_hf_to_gguf.py:8277):
        # partial rotary dims
        w.add_kv(f"{arch}.rope.dimension_count",
                 cfg.rope_dim or cfg.head_dim)
    if arch == "granite":
        # GraniteModel KV set (reference convert_hf_to_gguf.py:8855)
        if cfg.attn_scale:
            w.add_kv(f"{arch}.attention.scale", float(cfg.attn_scale))
        w.add_kv(f"{arch}.embedding_scale", float(cfg.embed_scale))
        w.add_kv(f"{arch}.residual_scale", float(cfg.residual_scale))
        w.add_kv(f"{arch}.logit_scale", float(cfg.logit_scale))
    if arch == "phi3":
        # Phi3MiniModel KV set (reference convert_hf_to_gguf.py:4760-4785):
        # rope dims, longrope original context, sliding window (0 marks
        # Phi-4); the factor sets ship as tensors below
        w.add_kv(f"{arch}.rope.dimension_count",
                 cfg.rope_dim or cfg.head_dim)
        w.add_kv(f"{arch}.attention.sliding_window", cfg.sliding_window)
        if cfg.rope_orig_max_position:
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     cfg.rope_orig_max_position)
        if cfg.rope_attn_factor != 1.0:
            w.add_kv(f"{arch}.rope.scaling.attn_factor",
                     float(cfg.rope_attn_factor))

    if hf_dir:
        # general.* naming heuristics (reference gguf/metadata.py
        # equivalent): decompose the checkpoint name, size-label from
        # the actual weight count, model-card license/tags
        from ..formats.metadata import metadata_kvs
        n_params = sum(int(np.prod(v.shape))
                       for v in jax.tree_util.tree_leaves(params))
        # MoE size labels need shared+one-expert params: one expert is
        # 3 matmuls of [hidden, moe_ffn] per layer
        per_expert = (3 * cfg.hidden * cfg.moe_ffn_dim * cfg.n_layers
                      if cfg.is_moe else 0)
        for key, val in metadata_kvs(hf_dir, total_params=n_params,
                                     experts=cfg.n_experts,
                                     per_expert_params=per_expert).items():
            w.add_kv(key, val)

    tok_kvs = {}
    tokens = None
    if tokenizer_json:
        from ..formats.tokenizer import gguf_vocab_from_tokenizer_json
        tokens, types, merges = gguf_vocab_from_tokenizer_json(
            tokenizer_json)
        w.add_kv("tokenizer.ggml.model", "gpt2")
        w.add_kv("tokenizer.ggml.pre", "qwen2")
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.token_type", types)
        w.add_kv("tokenizer.ggml.merges", merges)
        by_content = {t: i for i, t in enumerate(tokens)}
        if "<|im_end|>" in by_content:
            tok_kvs["tokenizer.ggml.eos_token_id"] = by_content["<|im_end|>"]
        if "<|endoftext|>" in by_content:
            tok_kvs["tokenizer.ggml.padding_token_id"] = \
                by_content["<|endoftext|>"]
    elif tokenizer_model:
        from ..formats.spm import gguf_vocab_from_spm
        tokens, scores, types, spm = gguf_vocab_from_spm(tokenizer_model)
        w.add_kv("tokenizer.ggml.model", "llama")
        w.add_kv("tokenizer.ggml.tokens", tokens)
        w.add_kv("tokenizer.ggml.scores", [float(s) for s in scores])
        w.add_kv("tokenizer.ggml.token_type", types)
        tok_kvs["tokenizer.ggml.unknown_token_id"] = spm.unk_id
        tok_kvs["tokenizer.ggml.bos_token_id"] = spm.bos_id
        tok_kvs["tokenizer.ggml.eos_token_id"] = spm.eos_id
        if spm.pad_id >= 0:
            tok_kvs["tokenizer.ggml.padding_token_id"] = spm.pad_id
    if tokens is not None:
        if hf_dir:
            # declared special ids / chat template take precedence over
            # the convention-based defaults above (SpecialVocab parity:
            # reference gguf/vocab.py:50-330)
            from ..formats.tokenizer import special_vocab_kvs
            tok_kvs.update(special_vocab_kvs(hf_dir, tokens))
        for key, val in tok_kvs.items():
            w.add_kv(key, val)

    from ..formats.lazy import LazyTensor

    def mat(name, arr2d):
        """our [in, out] -> gguf [out, in]; q8_0 blocks run along `in`."""
        if isinstance(arr2d, LazyTensor):   # streamed conversion: defer
            in_dim, out_dim = arr2d.shape   # read+quantize to write()
            raw = arr2d.raw_fn or (lambda a=arr2d: np.ascontiguousarray(
                np.asarray(a, np.float32).T))
            gt = (GGMLType.Q8_0 if quantize_q8_0 and in_dim % 32 == 0
                  else GGMLType.F16)
            w.add_tensor_lazy(name, (out_dim, in_dim), gt,
                              producer=lambda r=raw: np.asarray(
                                  r(), np.float32))
            return
        if isinstance(arr2d, _QD):     # pre-quantized on device
            w.add_tensor_q8_0(name, np.ascontiguousarray(arr2d.q),
                              np.ascontiguousarray(arr2d.d))
            return
        a32 = np.asarray(arr2d, dtype=np.float32)
        if quantize_q8_0 and a32.ndim == 2 and a32.shape[0] % 32 == 0:
            # fused C++ transpose+quantize: one read pass, no f32
            # transpose materialization (native/quant_kernels.cc)
            from ..native import q8_0_quantize_transpose_native
            out = q8_0_quantize_transpose_native(a32)
            if out is not None:
                w.add_tensor_q8_0(name, out[0], out[1])
                return
        a = a32.T
        if quantize_q8_0 and a.shape[-1] % 32 == 0:
            w.add_tensor(name, a, ggml_type=GGMLType.Q8_0)
        else:
            w.add_tensor(name, a.astype(np.float16))

    def mat3(name, arr3d):
        """stacked expert weights [E, in, out] -> gguf [E, out, in]."""
        if isinstance(arr3d, LazyTensor):
            e_dim, in_dim, out_dim = arr3d.shape
            gt = (GGMLType.Q8_0 if quantize_q8_0 and in_dim % 32 == 0
                  else GGMLType.F16)
            w.add_tensor_lazy(
                name, (e_dim, out_dim, in_dim), gt,
                producer=lambda a=arr3d: np.ascontiguousarray(
                    np.swapaxes(np.asarray(a, np.float32), -1, -2)))
            return
        if isinstance(arr3d, _QD):     # pre-quantized on device
            w.add_tensor_q8_0(name, np.ascontiguousarray(arr3d.q),
                              np.ascontiguousarray(arr3d.d))
            return
        a32 = np.asarray(arr3d, np.float32)
        if quantize_q8_0 and a32.ndim == 3 and a32.shape[-2] % 32 == 0:
            from ..native import q8_0_quantize_transpose_native
            outs = [q8_0_quantize_transpose_native(a32[e])
                    for e in range(a32.shape[0])]
            if all(o is not None for o in outs):
                w.add_tensor_q8_0(name, np.stack([o[0] for o in outs]),
                                  np.stack([o[1] for o in outs]))
                return
        a = np.ascontiguousarray(np.swapaxes(a32, -1, -2))
        if quantize_q8_0 and a.shape[-1] % 32 == 0:
            w.add_tensor(name, a, ggml_type=GGMLType.Q8_0)
        else:
            w.add_tensor(name, a.astype(np.float16))

    flat = _materialize_for_export(params, cfg, quantize_q8_0)
    if isinstance(flat.get("embed"), LazyTensor):
        e = flat["embed"]
        gt = (GGMLType.Q8_0 if quantize_q8_0 and e.shape[-1] % 32 == 0
              else GGMLType.F16)
        w.add_tensor_lazy("token_embd.weight", e.shape, gt,
                          producer=lambda a=e: np.asarray(a, np.float32))
    elif isinstance(flat.get("embed"), _QD):
        emb_qd = flat["embed"]
        w.add_tensor_q8_0("token_embd.weight",
                          np.ascontiguousarray(emb_qd.q),
                          np.ascontiguousarray(emb_qd.d))
    else:
        emb = np.asarray(flat["embed"], dtype=np.float32)
        if quantize_q8_0 and emb.shape[-1] % 32 == 0:
            w.add_tensor("token_embd.weight", emb,
                         ggml_type=GGMLType.Q8_0)
        else:
            w.add_tensor("token_embd.weight", emb.astype(np.float16))
    w.add_tensor("output_norm.weight",
                 np.asarray(flat["final_ln"], np.float32)
                 * cfg.logit_scale)     # unfold the granite logits divisor
    if cfg.rope_factors_short:
        # llama.cpp name conventions: phi3 longrope ships short/long
        # factor tensors; the llama family (Llama-3.1 rope scaling)
        # ships ONE rope_freqs.weight (reference converter:
        # LlamaModel.generate_extra_tensors)
        short_name = ("rope_freqs.weight"
                      if arch in ("llama", "granite")
                      else "rope_factors_short.weight")
        w.add_tensor(short_name,
                     np.asarray(cfg.rope_factors_short, np.float32))
        if arch in ("llama", "granite") and cfg.rope_orig_max_position:
            w.add_kv(f"{arch}.rope.scaling.original_context_length",
                     cfg.rope_orig_max_position)
    if cfg.rope_factors_long:
        w.add_tensor("rope_factors_long.weight",
                     np.asarray(cfg.rope_factors_long, np.float32))
    if cfg.rope_global_scale != 1.0 and arch in ("llama", "granite"):
        w.add_kv(f"{arch}.rope.scaling.type", "linear")
        w.add_kv(f"{arch}.rope.scaling.factor",
                 float(cfg.rope_global_scale))
    fuse_phi3 = cfg.arch == "phi3"
    # glm4 fuses [gate; up] in ffn_up like phi3 but keeps q/k/v split,
    # and stores q/k rope channels interleaved (inverse of the load
    # permute)
    fuse_ffn = cfg.arch in ("phi3", "glm4")
    inv_q = inv_k = None
    if cfg.arch == "glm4" and cfg.rope_dim:
        inv_q = glm_neox_perm(cfg.q_heads * cfg.head_dim, cfg.head_dim,
                              cfg.rope_dim, inverse=True)
        inv_k = glm_neox_perm(cfg.kv_heads * cfg.head_dim, cfg.head_dim,
                              cfg.rope_dim, inverse=True)

    def outp(wv, perm):
        return np.asarray(wv)[..., perm] if perm is not None else wv
    L_main = flat["layers"]
    L_pre = flat.get("layers_pre")
    k0 = L_pre["input_ln"].shape[0] if L_pre is not None else 0
    for i in range(cfg.n_layers):
        # heterogeneous stacks (deepseek): dense-prefix layers live in
        # layers_pre with their own local index
        L, li = (L_pre, i) if i < k0 else (L_main, i - k0)
        if "input_ln" in L:       # post-norm-only archs (olmo2) omit them
            w.add_tensor(f"blk.{i}.attn_norm.weight",
                         np.asarray(L["input_ln"][li], np.float32))
            w.add_tensor(f"blk.{i}.ffn_norm.weight",
                         np.asarray(L["post_ln"][li], np.float32))
        if "q_norm" in L:
            w.add_tensor(f"blk.{i}.attn_q_norm.weight",
                         np.asarray(L["q_norm"][li], np.float32))
            w.add_tensor(f"blk.{i}.attn_k_norm.weight",
                         np.asarray(L["k_norm"][li], np.float32))
        if "attn_post_ln" in L:
            w.add_tensor(f"blk.{i}.post_attention_norm.weight",
                         np.asarray(L["attn_post_ln"][li], np.float32))
            w.add_tensor(f"blk.{i}.post_ffw_norm.weight",
                         np.asarray(L["ffn_post_ln"][li], np.float32))
        if "q_b" in L:
            w.add_tensor(f"blk.{i}.attn_q.bias",
                         np.asarray(outp(L["q_b"][li], inv_q), np.float32))
            w.add_tensor(f"blk.{i}.attn_k.bias",
                         np.asarray(outp(L["k_b"][li], inv_k), np.float32))
            w.add_tensor(f"blk.{i}.attn_v.bias",
                         np.asarray(L["v_b"][li], np.float32))
        if "sinks" in L:
            w.add_tensor(f"blk.{i}.attn_sinks.weight",
                         np.asarray(L["sinks"][li], np.float32))
        if "o_b" in L:
            w.add_tensor(f"blk.{i}.attn_output.bias",
                         np.asarray(L["o_b"][li], np.float32))
        if "kv_a_w" in L:
            # deepseek MLA (llama.cpp deepseek2 names)
            if "q_a_w" in L:
                mat(f"blk.{i}.attn_q_a.weight", L["q_a_w"][li])
                w.add_tensor(f"blk.{i}.attn_q_a_norm.weight",
                             np.asarray(L["q_a_norm"][li], np.float32))
                mat(f"blk.{i}.attn_q_b.weight", L["q_b_w"][li])
            else:
                mat(f"blk.{i}.attn_q.weight", L["q_w"][li])
            mat(f"blk.{i}.attn_kv_a_mqa.weight", L["kv_a_w"][li])
            w.add_tensor(f"blk.{i}.attn_kv_a_norm.weight",
                         np.asarray(L["kv_a_norm"][li], np.float32))
            mat(f"blk.{i}.attn_kv_b.weight", L["kv_b_w"][li])
        elif fuse_phi3:
            # llama.cpp phi3 layout: fused [q; k; v] and [gate; up]
            mat(f"blk.{i}.attn_qkv.weight",
                np.concatenate([np.asarray(L["q_w"][li], np.float32),
                                np.asarray(L["k_w"][li], np.float32),
                                np.asarray(L["v_w"][li], np.float32)],
                               axis=1))
        else:
            mat(f"blk.{i}.attn_q.weight", outp(L["q_w"][li], inv_q))
            mat(f"blk.{i}.attn_k.weight", outp(L["k_w"][li], inv_k))
            mat(f"blk.{i}.attn_v.weight", L["v_w"][li])
        mat(f"blk.{i}.attn_output.weight", L["o_w"][li])
        if fuse_ffn:
            mat(f"blk.{i}.ffn_up.weight",
                np.concatenate([np.asarray(L["gate_w"][li], np.float32),
                                np.asarray(L["up_w"][li], np.float32)],
                               axis=1))
            mat(f"blk.{i}.ffn_down.weight", L["down_w"][li])
        elif cfg.is_moe and i >= k0:
            mat(f"blk.{i}.ffn_gate_inp.weight", L["router_w"][li])
            mat3(f"blk.{i}.ffn_gate_exps.weight", L["moe_gate_w"][li])
            mat3(f"blk.{i}.ffn_up_exps.weight", L["moe_up_w"][li])
            mat3(f"blk.{i}.ffn_down_exps.weight", L["moe_down_w"][li])
            if "shared_gate_w" in L:
                mat(f"blk.{i}.ffn_gate_shexp.weight",
                    L["shared_gate_w"][li])
                mat(f"blk.{i}.ffn_up_shexp.weight", L["shared_up_w"][li])
                mat(f"blk.{i}.ffn_down_shexp.weight",
                    L["shared_down_w"][li])
            if "shexp_gate_w" in L:
                # qwen2moe shared-expert gate: Linear(h->1), llama.cpp
                # stores it as a [1, h] matrix named ffn_gate_inp_shexp
                w.add_tensor(f"blk.{i}.ffn_gate_inp_shexp.weight",
                             np.asarray(L["shexp_gate_w"][li],
                                        np.float32)[None, :])
            if "router_b" in L:
                # deepseek3's e-score bias vs gpt-oss's logit bias
                name = ("exp_probs_b.bias" if arch == "deepseek2"
                        else "ffn_gate_inp.bias")
                w.add_tensor(f"blk.{i}.{name}",
                             np.asarray(L["router_b"][li], np.float32))
            if "moe_gate_b" in L:
                w.add_tensor(f"blk.{i}.ffn_gate_exps.bias",
                             np.asarray(L["moe_gate_b"][li], np.float32))
                w.add_tensor(f"blk.{i}.ffn_up_exps.bias",
                             np.asarray(L["moe_up_b"][li], np.float32))
                w.add_tensor(f"blk.{i}.ffn_down_exps.bias",
                             np.asarray(L["moe_down_b"][li], np.float32))
        else:
            mat(f"blk.{i}.ffn_gate.weight", L["gate_w"][li])
            mat(f"blk.{i}.ffn_up.weight", L["up_w"][li])
            mat(f"blk.{i}.ffn_down.weight", L["down_w"][li])
    if not cfg.tie_embeddings:
        mat("output.weight", flat["lm_head"])
    w.write()


# ---------------------------------------------------------------------------
# torch model.pt → encoder/adaptor/CTC params
# ---------------------------------------------------------------------------

def _lin(sd, name, bias=True):
    p = {"w": np.ascontiguousarray(
        sd[f"{name}.weight"].astype(np.float32).T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def _sanm_layer_from_sd(sd, prefix, with_ffn=True):
    p = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _lin(sd, f"{prefix}.self_attn.linear_q_k_v"),
            "out": _lin(sd, f"{prefix}.self_attn.linear_out"),
            # torch depthwise Conv1d weight [C, 1, K] -> our [K, C]
            "fsmn_w": np.ascontiguousarray(
                sd[f"{prefix}.self_attn.fsmn_block.weight"]
                .astype(np.float32)[:, 0, :].T),
        },
    }
    if with_ffn:
        p["norm2"] = _ln(sd, f"{prefix}.norm2")
        p["ffn"] = {"w1": _lin(sd, f"{prefix}.feed_forward.w_1"),
                    "w2": _lin(sd, f"{prefix}.feed_forward.w_2")}
    return p


def _block_from_sd(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "attn": {
            "q": _lin(sd, f"{prefix}.self_attn.linear_q"),
            "k": _lin(sd, f"{prefix}.self_attn.linear_k"),
            "v": _lin(sd, f"{prefix}.self_attn.linear_v"),
            "out": _lin(sd, f"{prefix}.self_attn.linear_out"),
        },
        "ffn": {"w1": _lin(sd, f"{prefix}.feed_forward.w_1"),
                "w2": _lin(sd, f"{prefix}.feed_forward.w_2")},
    }


def _adaptor_from_sd(sd, prefix, n_layers):
    p = {
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
    }
    if n_layers > 0:
        blocks = [_block_from_sd(sd, f"{prefix}.blocks.{i}")
                  for i in range(n_layers)]
        p["blocks"] = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *blocks)
    return p


def load_encoder_from_pt(model_pt_path: str,
                         enc_cfg: EncoderConfig = EncoderConfig(),
                         ad_cfg: AdaptorConfig = AdaptorConfig(),
                         ctc_cfg: CTCHeadConfig = CTCHeadConfig(),
                         dtype=jnp.float32):
    """Load the FunASR torch checkpoint into our param pytrees.

    Handles the ``ctc.ctc_lo`` → ctc projection rename done by the reference
    loader (``model_definition.py:231-238``).
    """
    import torch
    raw = torch.load(model_pt_path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in raw.items()
          if hasattr(v, "detach")}

    n_mid = enc_cfg.num_blocks - 1
    mids = [_sanm_layer_from_sd(sd, f"audio_encoder.encoders.{i}")
            for i in range(n_mid)]
    tps = [_sanm_layer_from_sd(sd, f"audio_encoder.tp_encoders.{i}")
           for i in range(enc_cfg.tp_blocks)]
    encoder = {
        "encoder0": _sanm_layer_from_sd(sd, "audio_encoder.encoders0.0",
                                        with_ffn=False),
        "encoders": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *mids),
        "tp_encoders": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *tps),
        "after_norm": _ln(sd, "audio_encoder.after_norm"),
        "tp_norm": _ln(sd, "audio_encoder.tp_norm"),
    }
    adaptor = _adaptor_from_sd(sd, "audio_adaptor", ad_cfg.n_layers)
    ctc_proj_key = "ctc.ctc_lo" if "ctc.ctc_lo.weight" in sd else "ctc_proj.ctc_lo"
    ctc = {
        "decoder": _adaptor_from_sd(sd, "ctc_decoder",
                                    ctc_cfg.adaptor.n_layers),
        "proj": _lin(sd, ctc_proj_key),
    }
    to_dev = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), tree)
    return to_dev(encoder), to_dev(adaptor), to_dev(ctc)


# ---------------------------------------------------------------------------
# Our checkpoint directory
# ---------------------------------------------------------------------------

_CONFIG_FILE = "config.json"
_ENCODER_FILE = "encoder.safetensors"
_DECODER_GGUF = "decoder.gguf"


def save_checkpoint(ckpt_dir: str, cfg: HybridConfig, encoder_params,
                    adaptor_params, ctc_params, llm_params,
                    quantize_q8_0: bool = True):
    """Write a complete engine checkpoint directory."""
    from safetensors.numpy import save_file
    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, _CONFIG_FILE), "w") as f:
        json.dump({
            "encoder": asdict(cfg.encoder),
            "adaptor": asdict(cfg.adaptor),
            "ctc": asdict(cfg.ctc),
            "llm": asdict(cfg.llm),
        }, f, indent=1)
    flat = {}
    flat.update(flatten_tree(jax.device_get(encoder_params), "encoder."))
    flat.update(flatten_tree(jax.device_get(adaptor_params), "adaptor."))
    flat.update(flatten_tree(jax.device_get(ctc_params), "ctc."))
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              os.path.join(ckpt_dir, _ENCODER_FILE))
    save_qwen3_to_gguf(os.path.join(ckpt_dir, _DECODER_GGUF), llm_params,
                       cfg.llm, quantize_q8_0=quantize_q8_0)


def _cfg_from_dict(d):
    ad = d["ctc"].pop("adaptor")
    return HybridConfig(
        encoder=EncoderConfig(**d["encoder"]),
        adaptor=AdaptorConfig(**d["adaptor"]),
        ctc=CTCHeadConfig(adaptor=AdaptorConfig(**ad), **d["ctc"]),
        llm=Qwen3Config(**d["llm"]),
    )


def load_checkpoint(ckpt_dir: str, dtype=jnp.float32,
                    llm_dtype=jnp.bfloat16, llm_keep_quantized: bool = False):
    """Load a checkpoint directory.

    Returns (cfg, encoder_params, adaptor_params, ctc_params, llm_params,
    embedding_table_f32). With ``llm_keep_quantized``, q8_0 GGUF weights
    stay int8 (QuantTensor) for the Pallas dequant-matmul path.
    """
    from safetensors.numpy import load_file
    with open(os.path.join(ckpt_dir, _CONFIG_FILE)) as f:
        cfg = _cfg_from_dict(json.load(f))
    flat = load_file(os.path.join(ckpt_dir, _ENCODER_FILE))
    groups: Dict[str, Dict[str, np.ndarray]] = {"encoder": {}, "adaptor": {},
                                                "ctc": {}}
    for k, v in flat.items():
        head, rest = k.split(".", 1)
        groups[head][rest] = v
    enc = _cast(unflatten_tree(groups["encoder"]), dtype)
    ada = _cast(unflatten_tree(groups["adaptor"]), dtype)
    ctc = _cast(unflatten_tree(groups["ctc"]), dtype)
    enc = _relist_stacked(enc)
    llm_params, llm_cfg, embed = load_qwen3_from_gguf(
        os.path.join(ckpt_dir, _DECODER_GGUF), dtype=llm_dtype,
        keep_quantized=llm_keep_quantized)
    cfg = HybridConfig(encoder=cfg.encoder, adaptor=cfg.adaptor, ctc=cfg.ctc,
                       llm=llm_cfg)
    return cfg, enc, ada, ctc, llm_params, embed


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else jnp.asarray(x), tree)


def _relist_stacked(tree):
    """safetensors round-trip keeps stacked layers as dict-of-arrays; ensure
    integer-keyed dicts (from lists) become stacked arrays again."""
    if isinstance(tree, dict):
        keys = list(tree.keys())
        if keys and all(k.isdigit() for k in keys):
            items = [(_relist_stacked(tree[k])) for k in
                     sorted(keys, key=int)]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
        return {k: _relist_stacked(v) for k, v in tree.items()}
    return tree


def _random_q8_llm_tree(cfg: Qwen3Config, seed: int):
    """Random decoder weights generated DIRECTLY in q8_0 space (int8
    quants + fp16 scales), host-only — no device init, no f32 pass, no
    quantizer. For bench/test checkpoints where only the weight *scale*
    matters: the r4 bench lost its driver artifact to a 354 s random-
    checkpoint write (2.4 GB f32 tunnel fetch + host quantize); this
    path writes the same-format checkpoint in seconds.

    Supports the standard dense attention/FFN layout (qwen3-class).
    Returns None for MoE/MLA or non-32-multiple dims (callers fall back
    to the full init+quantize path).
    """
    if (cfg.is_moe or cfg.kv_lora_rank or not cfg.pre_norms
            or cfg.post_norms or cfg.arch not in ("qwen3", "qwen2",
                                                  "llama")):
        # only the plain dense layouts; fused/permuted/sandwich-norm
        # archs would write structurally incomplete checkpoints
        return None
    n, h = cfg.n_layers, cfg.hidden
    qd = cfg.q_heads * cfg.head_dim
    kd = cfg.kv_heads * cfg.head_dim
    if any(dim % 32 for dim in (h, qd, cfg.ffn_dim)):
        return None
    rng = np.random.default_rng(seed)

    def qstack(in_dim, out_dim, stacked=True):
        shape = (n, out_dim, in_dim) if stacked else (out_dim, in_dim)
        dshape = shape[:-1] + (in_dim // 32,)
        # raw-bytes int8 (uniform [-128,127]) — ~5x faster than
        # rng.integers on the 1-core host; dequant handles -128 fine
        q = np.frombuffer(rng.bytes(int(np.prod(shape))),
                          np.int8).reshape(shape)
        # weight std ~0.02: uniform int8 * d with d ~ 2.7e-4
        d = rng.uniform(2e-4, 3.5e-4, size=dshape).astype(np.float16)
        cls = _QDStack if stacked else _QD
        return cls(q, d)

    layers = {
        "input_ln": np.ones((n, h), np.float32),
        "post_ln": np.ones((n, h), np.float32),
        "q_w": qstack(h, qd),
        "k_w": qstack(h, kd),
        "v_w": qstack(h, kd),
        "o_w": qstack(qd, h),
        "gate_w": qstack(h, cfg.ffn_dim),
        "up_w": qstack(h, cfg.ffn_dim),
        "down_w": qstack(cfg.ffn_dim, h),
    }
    if cfg.qk_norm:
        nd = (qd if cfg.qk_norm_full else cfg.head_dim)
        kn = (kd if cfg.qk_norm_full else cfg.head_dim)
        layers["q_norm"] = np.ones((n, nd), np.float32)
        layers["k_norm"] = np.ones((n, kn), np.float32)
    if cfg.attn_bias:
        layers["q_b"] = rng.normal(0, 0.02, (n, qd)).astype(np.float32)
        layers["k_b"] = rng.normal(0, 0.02, (n, kd)).astype(np.float32)
        layers["v_b"] = rng.normal(0, 0.02, (n, kd)).astype(np.float32)
        if cfg.attn_out_bias:
            layers["o_b"] = rng.normal(0, 0.02, (n, h)).astype(np.float32)
    params = {
        "layers": layers,
        "final_ln": np.ones((h,), np.float32),
        "embed": qstack(h, cfg.vocab_size, stacked=False),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = qstack(h, cfg.vocab_size, stacked=False)
    return params


def create_random_checkpoint(ckpt_dir: str, cfg: Optional[HybridConfig] = None,
                             seed: int = 0, quantize_q8_0: bool = True,
                             fast_q8: bool = False):
    """Random-init checkpoint for tests/benchmarks (no artifacts required).

    ``fast_q8`` generates the decoder directly in q8_0 space on the host
    (seconds instead of minutes on a tunneled device; see
    :func:`_random_q8_llm_tree`) and pins the tiny encoder init to the
    CPU backend so no remote compile/transfer happens at all.
    """
    from .adaptor import init_adaptor_params, init_ctc_head_params
    from .qwen3 import init_qwen3_params
    from .sanm import init_encoder_params
    cfg = cfg or HybridConfig.tiny()
    rng = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    llm = _random_q8_llm_tree(cfg.llm, seed) \
        if (fast_q8 and quantize_q8_0) else None
    if llm is not None:
        # no-jax encoder init: on this host every XLA compile costs
        # seconds (1 slow core), and init_* triggers dozens of tiny
        # jax.random programs. eval_shape traces the exact tree
        # structure without compiling anything; numpy fills the values.
        rng_np = np.random.default_rng(seed + 1)

        def np_fill(tree_shapes):
            def fill(path, s):
                name = str(path[-1]) if path else ""
                if not np.issubdtype(s.dtype, np.floating):
                    return np.zeros(s.shape, s.dtype)
                if "norm" in name or "scale" in name or "ln" in name:
                    return np.ones(s.shape, s.dtype)
                return rng_np.uniform(-0.05, 0.05,
                                      s.shape).astype(s.dtype)
            return jax.tree_util.tree_map_with_path(fill, tree_shapes)

        enc = np_fill(jax.eval_shape(
            lambda k: init_encoder_params(k, cfg.encoder), k1))
        ada = np_fill(jax.eval_shape(
            lambda k: init_adaptor_params(k, cfg.adaptor), k2))
        ctc = np_fill(jax.eval_shape(
            lambda k: init_ctc_head_params(k, cfg.ctc), k3))
        save_checkpoint(ckpt_dir, cfg, enc, ada, ctc, llm,
                        quantize_q8_0=True)
        return cfg
    enc = init_encoder_params(k1, cfg.encoder)
    ada = init_adaptor_params(k2, cfg.adaptor)
    ctc = init_ctc_head_params(k3, cfg.ctc)
    llm = init_qwen3_params(k4, cfg.llm)
    save_checkpoint(ckpt_dir, cfg, enc, ada, ctc, llm,
                    quantize_q8_0=quantize_q8_0)
    return cfg

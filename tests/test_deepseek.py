"""DeepSeek-family (deepseek2/3) decoder support, verified against HF.

The MLA/MoE structural family the qwen/llama graph lacks: Multi-head
Latent Attention (low-rank compressed kv + optionally q, per-head keys
split into content dims and a SHARED rotary key, v_head_dim != qk dim),
interleaved-pair rope, MoE with a dense first-k-layer prefix
(heterogeneous layer stacks), always-on shared experts, and V3's
sigmoid scoring with a selection-only correction bias and group-limited
top-k. Reference coverage: ``convert_hf_to_gguf.py`` DeepseekV2Model —
the reference's runtime for this arch is llama.dll.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fun_asr_gguf_tpu.tools.convert import (qwen3_config_from_hf,
                                            qwen3_params_from_hf_state)

V2_CFG = dict(
    architectures=["DeepseekV2ForCausalLM"],
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,          # dense-layer MLP width
    moe_intermediate_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    n_routed_experts=4,
    num_experts_per_tok=2,
    n_shared_experts=1,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    q_lora_rank=None,              # V2-Lite: dense q
    kv_lora_rank=32,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    norm_topk_prob=False,
    scoring_func="softmax",
    topk_method="greedy",
    routed_scaling_factor=1.0,
    rope_theta=10_000.0,
    rms_norm_eps=1e-6,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    attention_bias=False,
)

V3_CFG = dict(
    V2_CFG,
    architectures=["DeepseekV3ForCausalLM"],
    n_routed_experts=8,
    q_lora_rank=24,
    norm_topk_prob=True,
    scoring_func="sigmoid",
    topk_method="noaux_tc",
    n_group=4,
    topk_group=2,
    routed_scaling_factor=2.5,
)


def _hf_model(hf_cfg, seed=1):
    from transformers import (DeepseekV2Config, DeepseekV2ForCausalLM,
                              DeepseekV3Config, DeepseekV3ForCausalLM)
    v3 = hf_cfg["architectures"][0].startswith("DeepseekV3")
    kw = {k: v for k, v in hf_cfg.items() if k != "architectures"}
    torch.manual_seed(seed)
    cls_c, cls_m = ((DeepseekV3Config, DeepseekV3ForCausalLM) if v3
                    else (DeepseekV2Config, DeepseekV2ForCausalLM))
    return cls_m(cls_c(attention_dropout=0.0, use_cache=True,
                       attn_implementation="eager",
                       pad_token_id=0, bos_token_id=1, eos_token_id=2,
                       **kw)).eval()


def _jax_params(model, cfg):
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return jax.tree_util.tree_map(
        jnp.asarray, qwen3_params_from_hf_state(sd, cfg))


@pytest.fixture(scope="module", params=["v2", "v3"])
def pair(request):
    hf_cfg = V2_CFG if request.param == "v2" else V3_CFG
    model = _hf_model(hf_cfg)
    cfg = qwen3_config_from_hf(dict(hf_cfg))
    return model, cfg, _jax_params(model, cfg)


def _cos(a, b):
    return np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_config_mapping_v2():
    cfg = qwen3_config_from_hf(dict(V2_CFG))
    assert cfg.arch == "deepseek2"
    assert cfg.kv_lora_rank == 32 and cfg.q_lora_rank == 0
    assert cfg.qk_nope_dim == 16 and cfg.qk_rope_dim == 8
    assert cfg.head_dim == 24 and cfg.v_head_dim == 16
    assert cfg.rope_dim == 8 and cfg.rope_interleaved
    assert cfg.is_moe and cfg.moe_first_dense == 1
    assert cfg.n_shared_experts == 1
    assert cfg.router_scoring == "softmax_topk"
    assert not cfg.norm_topk_prob


def test_config_mapping_v3():
    cfg = qwen3_config_from_hf(dict(V3_CFG))
    assert cfg.q_lora_rank == 24
    assert cfg.router_scoring == "sigmoid" and cfg.router_bias
    assert cfg.n_group == 4 and cfg.topk_group == 2
    assert cfg.routed_scaling_factor == pytest.approx(2.5)
    assert cfg.norm_topk_prob


def test_params_structure(pair):
    _m, cfg, params = pair
    assert "layers_pre" in params          # first_k_dense_replace=1
    assert params["layers_pre"]["input_ln"].shape[0] == 1
    assert "gate_w" in params["layers_pre"]
    assert "router_w" in params["layers"]
    assert "shared_gate_w" in params["layers"]
    assert params["layers"]["input_ln"].shape[0] == cfg.n_layers - 1
    lp = params["layers"]
    assert ("q_a_w" in lp) == (cfg.q_lora_rank > 0)
    assert "kv_a_w" in lp and "kv_b_w" in lp


def test_logits_match_hf(pair):
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 16))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_greedy_ids_match_hf_generate(pair):
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)

    model, cfg, params = pair
    rng = np.random.default_rng(2)
    p, n_new = 10, 8
    ids = rng.integers(0, cfg.vocab_size, size=(1, p))
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
            use_cache=True).numpy()[0, p:]

    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones((1, p), jnp.float32)
    logits, kv = qwen3_prefill(params, embeds.astype(jnp.float32), mask,
                               cfg, kv_max_len=p + n_new)
    out = [int(jnp.argmax(logits[0]))]
    for t in range(n_new - 1):
        emb = params["embed"][jnp.asarray([out[-1]])].astype(jnp.float32)
        logits, kv = qwen3_decode_step(
            params, kv, emb, jnp.asarray(p + t, jnp.int32),
            jnp.asarray([p + t], jnp.int32), jnp.asarray([0], jnp.int32),
            cfg)
        out.append(int(jnp.argmax(logits[0])))
    assert out == list(ref)


def test_verify_step_matches_decode(pair):
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill,
                                               qwen3_verify_step)

    _model, cfg, params = pair
    rng = np.random.default_rng(8)
    p, t = 8, 4
    ids = rng.integers(0, cfg.vocab_size, size=(1, p))
    draft = rng.integers(0, cfg.vocab_size, size=(1, t))
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones((1, p), jnp.float32)
    _, kv0 = qwen3_prefill(params, embeds.astype(jnp.float32), mask, cfg,
                           kv_max_len=p + t)
    dembs = params["embed"][jnp.asarray(draft)].astype(jnp.float32)
    vlog, _ = qwen3_verify_step(
        params, kv0, dembs, jnp.asarray([p], jnp.int32),
        jnp.asarray([[p + i for i in range(t)]], jnp.int32),
        jnp.asarray([0], jnp.int32), cfg)
    kv = kv0
    for i in range(t):
        slog, kv = qwen3_decode_step(
            params, kv, dembs[:, i], jnp.asarray(p + i, jnp.int32),
            jnp.asarray([p + i], jnp.int32), jnp.asarray([0], jnp.int32),
            cfg)
        np.testing.assert_allclose(np.asarray(vlog[0, i]),
                                   np.asarray(slog[0]),
                                   rtol=2e-3, atol=2e-3)


def test_logits_match_hf_yarn():
    """DeepSeek YaRN (factors + the mscale/mscale_all_dim attention
    factor pair) through the longrope machinery."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    hf = dict(V2_CFG)
    hf["rope_scaling"] = {
        "rope_type": "yarn", "factor": 4.0,
        "original_max_position_embeddings": 32,
        "beta_fast": 32.0, "beta_slow": 1.0,
        "mscale": 0.707, "mscale_all_dim": 0.707,
    }
    model = _hf_model(hf, seed=3)
    cfg = qwen3_config_from_hf(hf)
    assert len(cfg.rope_factors_short) == 4       # qk_rope_dim // 2
    params = _jax_params(model, cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 20))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)],
        jnp.ones(ids.shape, jnp.float32), cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_int8_quantized_close(pair):
    """The engine's int8 auto path covers MLA/shared-expert/dense-prefix
    weights (layers_pre rides every quantizer)."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_forward_logits,
                                               quantize_qwen3_params_int8)

    _m, cfg, params = pair
    q = quantize_qwen3_params_int8(
        jax.tree_util.tree_map(lambda x: x, params))
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        q, q["embed"][jnp.asarray(ids)], mask, cfg))
    # near-tied top-k routing can flip experts under int8 on random
    # weights (discrete jumps, esp. v3's biased sigmoid selection) —
    # gate on closeness and overwhelming argmax agreement
    assert _cos(a, b) > 0.99
    agree = np.mean(np.argmax(a, -1) == np.argmax(b, -1))
    assert agree >= 0.9, agree


def test_gguf_round_trip(pair, tmp_path):
    """deepseek2 GGUF export/import in llama.cpp layout: MLA tensors
    (attn_kv_a_mqa / attn_kv_b / q_a+q_b), leading dense block, shared
    experts, exp_probs_b bias and the expert_* KV family."""
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    _model, cfg, params = pair
    path = str(tmp_path / "ds_tiny.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = GGUFReader(path)
    names = set(r.tensor_names())
    assert "blk.0.attn_kv_a_mqa.weight" in names
    assert "blk.0.attn_kv_b.weight" in names
    assert "blk.0.ffn_gate.weight" in names          # dense prefix
    assert "blk.1.ffn_gate_exps.weight" in names
    assert "blk.1.ffn_gate_shexp.weight" in names
    if cfg.q_lora_rank:
        assert "blk.0.attn_q_a.weight" in names
        assert "blk.1.exp_probs_b.bias" in names
    fd = r.fields
    assert fd["deepseek2.leading_dense_block_count"] == 1
    assert fd["deepseek2.attention.kv_lora_rank"] == 32
    assert fd["deepseek2.attention.value_length"] == 16
    assert fd["deepseek2.rope.dimension_count"] == 8

    params2, cfg2, _embed = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.arch == "deepseek2"
    assert cfg2.kv_lora_rank == cfg.kv_lora_rank
    assert cfg2.q_lora_rank == cfg.q_lora_rank
    assert cfg2.qk_nope_dim == cfg.qk_nope_dim
    assert cfg2.v_head_dim == cfg.v_head_dim
    assert cfg2.moe_first_dense == 1
    assert cfg2.n_shared_experts == 1
    assert cfg2.router_scoring == cfg.router_scoring
    assert cfg2.norm_topk_prob == cfg.norm_topk_prob
    assert cfg2.routed_scaling_factor == pytest.approx(
        cfg.routed_scaling_factor)
    assert cfg2.n_group == cfg.n_group
    assert "layers_pre" in params2

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)  # f16 weights


def test_logits_match_hf_v2_group_limited():
    """Full DeepSeek-V2's group_limited_greedy softmax routing (groups
    ranked by their max score) — regression for the softmax branch
    ignoring n_group/topk_group."""
    hf = dict(V2_CFG)
    # real V2/V2-Chat checkpoints: norm_topk_prob=False (HF's V2 gate
    # stores the flag but never applies it)
    hf.update(n_routed_experts=8, topk_method="group_limited_greedy",
              n_group=4, topk_group=2, norm_topk_prob=False,
              routed_scaling_factor=1.5)
    model = _hf_model(hf, seed=6)
    cfg = qwen3_config_from_hf(hf)
    assert cfg.n_group == 4 and cfg.topk_group == 2
    assert cfg.router_scoring == "softmax_topk" and not cfg.router_bias
    assert not cfg.norm_topk_prob
    params = _jax_params(model, cfg)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
    rng = np.random.default_rng(11)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 14))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)],
        jnp.ones(ids.shape, jnp.float32), cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

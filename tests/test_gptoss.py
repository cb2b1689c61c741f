"""GPT-OSS-family decoder support, verified against HF transformers.

gpt-oss differs from the qwen/llama family on five axes this suite
exercises end to end: attention sinks (a learned per-head logit that
joins the softmax and is then dropped), biases on every attention
projection AND the MoE router/experts, clamped-SwiGLU experts with
INTERLEAVED fused gate_up weights (``GptOssExperts``: gate =
``gate_up[..., ::2]``), top-k-then-softmax routing
(``GptOssTopKRouter``), and YaRN rope expressed through the longrope
factor machinery. Reference coverage: ``convert_hf_to_gguf.py:10123``
(GptOssModel) — the reference's runtime for this arch is llama.dll.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fun_asr_gguf_tpu.tools.convert import (qwen3_config_from_hf,
                                            qwen3_params_from_hf_state)

HF_CFG = dict(
    architectures=["GptOssForCausalLM"],
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,          # per-expert ffn dim
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    num_local_experts=4,
    num_experts_per_tok=2,
    rope_theta=10_000.0,
    rms_norm_eps=1e-5,
    max_position_embeddings=256,
    sliding_window=8,
    tie_word_embeddings=False,
    # real gpt-oss checkpoints ship YaRN with truncate=False
    rope_scaling={"rope_type": "yarn", "factor": 4.0,
                  "original_max_position_embeddings": 64,
                  "beta_fast": 32.0, "beta_slow": 1.0, "truncate": False},
)


def _hf_model(seed=1, **overrides):
    from transformers import GptOssConfig, GptOssForCausalLM
    kw = {k: v for k, v in HF_CFG.items() if k != "architectures"}
    kw.update(overrides)
    torch.manual_seed(seed)
    return GptOssForCausalLM(
        GptOssConfig(attention_dropout=0.0, use_cache=True,
                     attn_implementation="eager",
                     pad_token_id=0, bos_token_id=1, eos_token_id=2, **kw)
    ).eval()


def _jax_params(model, cfg):
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return jax.tree_util.tree_map(
        jnp.asarray, qwen3_params_from_hf_state(sd, cfg))


@pytest.fixture(scope="module")
def pair():
    model = _hf_model()
    cfg = qwen3_config_from_hf(dict(HF_CFG))
    return model, cfg, _jax_params(model, cfg)


def _cos(a, b):
    return np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_config_mapping():
    cfg = qwen3_config_from_hf(dict(HF_CFG))
    assert cfg.arch == "gpt-oss"
    assert cfg.attn_sinks and cfg.attn_bias and cfg.attn_out_bias
    assert cfg.router_bias and cfg.moe_bias
    assert cfg.router_scoring == "topk_softmax"
    assert cfg.act == "swiglu_oai" and cfg.swiglu_limit == 7.0
    assert cfg.is_moe and cfg.n_experts == 4 and cfg.n_experts_per_tok == 2
    assert cfg.moe_ffn_dim == 96
    assert cfg.sliding_window == 8 and cfg.sliding_pattern == 2
    assert cfg.rope_yarn_factor == 4.0
    assert cfg.rope_orig_max_position == 64
    assert len(cfg.rope_factors_short) == 8
    # YaRN attention factor: 0.1*ln(4)+1
    assert cfg.rope_attn_factor == pytest.approx(0.1 * np.log(4.0) + 1.0)
    assert not cfg.tie_embeddings


def test_logits_match_hf(pair):
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_sliding_layers_alternate(pair):
    """Changing token 0 must still reach the last position through the
    GLOBAL (odd) layers — but through them only: with the window at 8
    and 24 positions, a prompt edit changes the last logits (unlike
    phi3's all-layer sliding), and HF agrees exactly."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 24))
    ids2 = ids.copy()
    ids2[0, 0] = (ids[0, 0] + 1) % cfg.vocab_size
    mask = jnp.ones(ids.shape, jnp.float32)
    with torch.no_grad():
        r1 = model(torch.tensor(ids)).logits.numpy()[0, -1]
        r2 = model(torch.tensor(ids2)).logits.numpy()[0, -1]
    g1 = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))[0, -1]
    g2 = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids2)], mask, cfg))[0, -1]
    assert np.abs(r2 - r1).max() > 1e-5      # global layers see token 0
    np.testing.assert_allclose(g2 - g1, r2 - r1, rtol=5e-2, atol=1e-4)


def test_greedy_ids_match_hf_generate(pair):
    """Prompt 12 + 10 new crosses the window (8), so the decode step's
    per-layer sliding bias is exercised, sinks and all."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)

    model, cfg, params = pair
    rng = np.random.default_rng(2)
    p, n_new = 12, 10
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
    p, t = 10, 4
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


def test_gguf_round_trip(pair, tmp_path):
    """gpt-oss GGUF export/import: sinks + o-bias + router/expert bias
    tensors, YaRN KVs, sliding window — logits must survive the trip
    (this is the loader-completeness gate: a file that loads without
    these tensors would be silently wrong)."""
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    _model, cfg, params = pair
    path = str(tmp_path / "gptoss_tiny.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = GGUFReader(path)
    names = set(r.tensor_names())
    for t in ("blk.0.attn_sinks.weight", "blk.0.attn_output.bias",
              "blk.0.ffn_gate_inp.bias", "blk.0.ffn_gate_exps.bias",
              "blk.0.ffn_up_exps.bias", "blk.0.ffn_down_exps.bias",
              "blk.0.attn_q.bias", "rope_factors_short.weight"):
        assert t in names, t
    fd = r.fields
    assert fd["gpt-oss.rope.scaling.factor"] == pytest.approx(4.0)
    assert fd["gpt-oss.rope.scaling.original_context_length"] == 64
    assert fd["gpt-oss.attention.sliding_window"] == 8

    params2, cfg2, _embed = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.arch == "gpt-oss"
    assert cfg2.attn_sinks and cfg2.attn_out_bias
    assert cfg2.router_bias and cfg2.moe_bias
    assert cfg2.router_scoring == "topk_softmax"
    assert cfg2.act == "swiglu_oai"
    assert cfg2.sliding_window == 8 and cfg2.sliding_pattern == 2
    assert cfg2.rope_factors_short == pytest.approx(cfg.rope_factors_short)
    assert cfg2.rope_attn_factor == pytest.approx(cfg.rope_attn_factor)
    for key in ("sinks", "o_b", "router_b", "moe_gate_b", "moe_up_b",
                "moe_down_b", "q_b"):
        assert key in params2["layers"], key

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)  # f16 weights


def test_gguf_q8_0_round_trip_still_decodes(pair, tmp_path):
    """The q8_0 export must also reload and produce close logits (the
    wire format the reference serves)."""
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    _model, cfg, params = pair
    path = str(tmp_path / "gptoss_q8.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=True)
    params2, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    assert _cos(a, b) > 0.999
    assert np.array_equal(np.argmax(a, -1), np.argmax(b, -1))


@pytest.mark.slow   # gate-trim: HF greedy parity above covers decode
def test_tiny_gptoss_decode_consistency():
    """The random-init tiny_gptoss config must agree between the full
    forward and prefill+decode (covers the sinks/bias/topk-router path
    without HF in the loop)."""
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                               qwen3_decode_step,
                                               qwen3_forward_logits,
                                               qwen3_prefill)

    cfg = Qwen3Config.tiny_gptoss(vocab_size=101)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    p, n_new = 9, 4
    ids = rng.integers(0, cfg.vocab_size, size=(1, p + n_new))
    embeds = params["embed"][jnp.asarray(ids)].astype(jnp.float32)
    mask_full = jnp.ones((1, p + n_new), jnp.float32)
    full = np.asarray(qwen3_forward_logits(params, embeds, mask_full, cfg))

    logits, kv = qwen3_prefill(params, embeds[:, :p],
                               jnp.ones((1, p), jnp.float32), cfg,
                               kv_max_len=p + n_new)
    np.testing.assert_allclose(np.asarray(logits[0]), full[0, p - 1],
                               rtol=2e-3, atol=2e-3)
    for t in range(n_new):
        logits, kv = qwen3_decode_step(
            params, kv, embeds[:, p + t], jnp.asarray(p + t, jnp.int32),
            jnp.asarray([p + t], jnp.int32), jnp.asarray([0], jnp.int32),
            cfg)
        np.testing.assert_allclose(np.asarray(logits[0]), full[0, p + t],
                                   rtol=2e-3, atol=2e-3)

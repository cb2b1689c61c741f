# coding: utf-8
"""Mixtral decoder support: HF parity, GGUF round-trip, config mapping.

llama.cpp serves Mixtral as arch "llama" + ``expert_*`` KVs (reference
``convert_hf_to_gguf.py`` LlamaModel's ``block_sparse_moe`` expert-stack
merging); this stack decodes the same family natively — the router math
(softmax over all experts → top-k → renormalize, HF
``MixtralSparseMoeBlock``) is the existing softmax_topk path with
``norm_topk_prob``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

torch = pytest.importorskip("torch")


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _hf_mixtral(cfg: Qwen3Config, seed=1):
    from transformers import MixtralConfig, MixtralForCausalLM
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.moe_ffn_dim,
        num_local_experts=cfg.n_experts,
        num_experts_per_tok=cfg.n_experts_per_tok,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.q_heads,
        num_key_value_heads=cfg.kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position,
        sliding_window=None,
        router_aux_loss_coef=0.0,
        router_jitter_noise=0.0,
        use_cache=True,
    )
    torch.manual_seed(seed)
    return MixtralForCausalLM(hf_cfg).eval()


def _my_params(model, cfg):
    from fun_asr_gguf_tpu.tools.convert import qwen3_params_from_hf_state
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return jax.tree_util.tree_map(
        jnp.asarray, qwen3_params_from_hf_state(sd, cfg))


def _greedy_jax(params, cfg, prompt_ids, n_new):
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)
    p = len(prompt_ids)
    embeds = params["embed"][jnp.asarray(prompt_ids)][None]
    mask = jnp.ones((1, p), jnp.float32)
    logits, kv = qwen3_prefill(params, embeds.astype(jnp.float32), mask,
                               cfg, kv_max_len=p + n_new)
    out = [int(jnp.argmax(logits[0]))]
    for t in range(n_new - 1):
        emb = params["embed"][jnp.asarray([out[-1]])].astype(jnp.float32)
        logits, kv = qwen3_decode_step(
            params, kv, emb,
            jnp.asarray(p + t, jnp.int32),
            jnp.asarray([p + t], jnp.int32),
            jnp.asarray([0], jnp.int32), cfg)
        out.append(int(jnp.argmax(logits[0])))
    return out


@pytest.fixture(scope="module")
def tiny_mixtral():
    cfg = Qwen3Config.tiny_mixtral(vocab_size=512)
    model = _hf_mixtral(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestHFParity:
    def test_full_logits_match(self, tiny_mixtral):
        model, params, cfg = tiny_mixtral
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids[0])][None]
        mask = jnp.ones((1, ids.shape[1]), jnp.float32)
        got = np.asarray(qwen3_forward_logits(
            params, embeds.astype(jnp.float32), mask, cfg))
        assert _cos(got, want) > 0.99999
        assert (np.argmax(got[0, -1]) == np.argmax(want[0, -1]))

    def test_greedy_ids_match_hf_generate(self, tiny_mixtral):
        model, params, cfg = tiny_mixtral
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, size=(1, 7))
        n_new = 8
        with torch.no_grad():
            want = model.generate(
                torch.from_numpy(ids), max_new_tokens=n_new,
                do_sample=False, use_cache=True,
                pad_token_id=0).numpy()[0, ids.shape[1]:]
        got = _greedy_jax(params, cfg, ids[0].tolist(), n_new)
        assert got == want.tolist()


class TestConfigAndGGUF:
    def test_config_from_hf_dict(self):
        from fun_asr_gguf_tpu.tools.convert import qwen3_config_from_hf
        cfg = qwen3_config_from_hf({
            "architectures": ["MixtralForCausalLM"],
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 96, "vocab_size": 512,
            "rope_theta": 1e4, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False,
            "max_position_embeddings": 4096,
            "num_local_experts": 8, "num_experts_per_tok": 2,
            "sliding_window": None,
        })
        assert cfg.arch == "llama" and not cfg.qk_norm
        assert cfg.n_experts == 8 and cfg.n_experts_per_tok == 2
        assert cfg.moe_ffn_dim == 96 and cfg.norm_topk_prob

    def test_sliding_window_rejected(self):
        from fun_asr_gguf_tpu.tools.convert import qwen3_config_from_hf
        with pytest.raises(ValueError, match="sliding"):
            qwen3_config_from_hf({
                "architectures": ["MixtralForCausalLM"],
                "hidden_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "intermediate_size": 96, "vocab_size": 512,
                "num_local_experts": 8, "num_experts_per_tok": 2,
                "sliding_window": 4096,
            })

    def test_save_load_roundtrip(self, tiny_mixtral, tmp_path):
        """GGUF round-trip in the llama.cpp mixtral layout (arch llama
        + expert stacks): config survives and logits agree to f16
        storage rounding."""
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _model, params, cfg = tiny_mixtral
        path = str(tmp_path / "mixtral.gguf")
        np_params = jax.tree_util.tree_map(np.asarray, params)
        save_qwen3_to_gguf(path, np_params, cfg, quantize_q8_0=False)
        params2, cfg2, _tok = load_qwen3_from_gguf(path,
                                                   dtype=jnp.float32)
        assert cfg2.arch == "llama" and cfg2.n_experts == cfg.n_experts
        assert cfg2.n_experts_per_tok == cfg.n_experts_per_tok
        assert cfg2.moe_ffn_dim == cfg.moe_ffn_dim
        assert cfg2.norm_topk_prob
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        mask = jnp.ones((1, ids.shape[1]), jnp.float32)
        a = np.asarray(qwen3_forward_logits(
            params, params["embed"][jnp.asarray(ids[0])][None]
            .astype(jnp.float32), mask, cfg))
        b = np.asarray(qwen3_forward_logits(
            params2, params2["embed"][jnp.asarray(ids[0])][None]
            .astype(jnp.float32), mask, cfg2))
        assert _cos(a, b) > 0.9999
        np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))

# coding: utf-8
"""Granite decoder support: HF parity, GGUF round-trip, config mapping.

llama.cpp serves IBM Granite as arch "granite" (reference
``convert_hf_to_gguf.py:8851`` GraniteModel): a llama structure plus
four scalar multipliers — attention_multiplier (the score scale, rides
``attn_scale``), embedding_multiplier (rides ``embed_scale``),
residual_multiplier (new ``residual_scale``: x = x + s*f(x)), and
logits_scaling (a divisor; folded into ``final_ln`` at load since
output_norm feeds nothing but the lm head, unfolded on export so the
GGUF matches the llama.cpp layout).
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


def _hf_granite(cfg: Qwen3Config, seed=1):
    from transformers import GraniteConfig, GraniteForCausalLM
    hf_cfg = GraniteConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.q_heads,
        num_key_value_heads=cfg.kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position,
        attention_multiplier=cfg.attn_scale,
        embedding_multiplier=cfg.embed_scale,
        residual_multiplier=cfg.residual_scale,
        logits_scaling=cfg.logit_scale,
        attention_bias=False,
        use_cache=True,
    )
    torch.manual_seed(seed)
    return GraniteForCausalLM(hf_cfg).eval()


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
def tiny_granite():
    cfg = Qwen3Config.tiny_granite(vocab_size=512)
    model = _hf_granite(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestHFParity:
    def test_full_logits_match(self, tiny_granite):
        """Logits (incl. the folded logits_scaling divisor) must match
        HF exactly — the fold is algebraically exact, not approximate."""
        model, params, cfg = tiny_granite
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        with torch.no_grad():
            want = model(torch.from_numpy(ids)).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids[0])][None]
        mask = jnp.ones((1, ids.shape[1]), jnp.float32)
        got = np.asarray(qwen3_forward_logits(
            params, embeds.astype(jnp.float32), mask, cfg))
        assert _cos(got, want) > 0.99999
        np.testing.assert_allclose(got[0, -1], want[0, -1],
                                   rtol=2e-3, atol=2e-3)

    def test_greedy_ids_match_hf_generate(self, tiny_granite):
        model, params, cfg = tiny_granite
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

    def test_verify_pass_matches_prefill(self, tiny_granite):
        from fun_asr_gguf_tpu.models.qwen3 import (qwen3_prefill,
                                                   qwen3_verify_step)
        _model, params, cfg = tiny_granite
        rng = np.random.default_rng(3)
        ids = rng.integers(0, cfg.vocab_size, size=9)
        embeds = params["embed"][jnp.asarray(ids)][None].astype(jnp.float32)
        mask = jnp.ones((1, 9), jnp.float32)
        want, _ = qwen3_prefill(params, embeds, mask, cfg, kv_max_len=16)
        _, kv0 = qwen3_prefill(params, embeds[:, :4], mask[:, :4], cfg,
                               kv_max_len=16)
        vlogits, _ = qwen3_verify_step(
            params, kv0, embeds[:, 4:],
            jnp.asarray([4], jnp.int32),
            (4 + jnp.arange(5, dtype=jnp.int32))[None, :],
            jnp.asarray([0], jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(vlogits[:, -1]),
                                   np.asarray(want), rtol=2e-3, atol=2e-3)


class TestConfigAndGGUF:
    def test_config_from_hf_dict(self):
        from fun_asr_gguf_tpu.tools.convert import qwen3_config_from_hf
        cfg = qwen3_config_from_hf({
            "architectures": ["GraniteForCausalLM"],
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 128, "vocab_size": 512,
            "rope_theta": 1e4, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": True,
            "max_position_embeddings": 4096,
            "attention_multiplier": 0.0078125,
            "embedding_multiplier": 12.0,
            "residual_multiplier": 0.22,
            "logits_scaling": 8.0,
        })
        assert cfg.arch == "granite"
        assert cfg.attn_scale == 0.0078125
        assert cfg.embed_scale == 12.0
        assert cfg.residual_scale == 0.22
        assert cfg.logit_scale == 8.0

    def test_save_load_roundtrip(self, tiny_granite, tmp_path):
        """GGUF round-trip: the four multiplier KVs survive, the
        on-disk output_norm is UNFOLDED (llama.cpp layout), and the
        re-loaded model reproduces the original logits."""
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _model, params, cfg = tiny_granite
        path = str(tmp_path / "granite.gguf")
        np_params = jax.tree_util.tree_map(np.asarray, params)
        save_qwen3_to_gguf(path, np_params, cfg, quantize_q8_0=False)
        r = GGUFReader(path)
        assert float(r.fields["granite.logit_scale"]) == 8.0
        assert float(r.fields["granite.residual_scale"]) == \
            pytest.approx(0.22)
        # the stored norm is logit_scale x the folded in-memory one
        np.testing.assert_allclose(
            r.tensor("output_norm.weight"),
            np.asarray(params["final_ln"], np.float32) * 8.0,
            rtol=1e-6)
        params2, cfg2, _tok = load_qwen3_from_gguf(path,
                                                   dtype=jnp.float32)
        assert cfg2.arch == "granite"
        assert cfg2.residual_scale == pytest.approx(0.22)
        assert cfg2.logit_scale == 8.0
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

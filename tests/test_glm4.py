# coding: utf-8
"""GLM4 (glm-4-0414) decoder support: HF parity, GGUF round-trip,
config mapping, rope-ordering permutation.

llama.cpp serves GLM4 as arch "glm4" (reference ``convert_hf_to_gguf
.py:8246`` Glm4Model): sandwich norms under glm-specific HF names
(post_self_attn_layernorm / post_mlp_layernorm, with
post_attention_layernorm as the pre-FFN norm), partial rotary dims
(``rope.dimension_count`` = head_dim x partial_rotary_factor) applied
in GLM's interleaved ("normal") ordering, qkv biases, and a fused
[gate; up] ffn_up. This stack permutes the rope channels to half-split
order at load (``loaders.glm_neox_perm``) so the shared partial-rope
graph serves the family, and inverse-permutes on export so the GGUF
matches the llama.cpp layout byte-for-byte.
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


def _hf_glm4(cfg: Qwen3Config, seed=1):
    from transformers import Glm4Config, Glm4ForCausalLM
    hf_cfg = Glm4Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.q_heads,
        num_key_value_heads=cfg.kv_heads,
        head_dim=cfg.head_dim,
        partial_rotary_factor=cfg.rope_dim / cfg.head_dim,
        attention_bias=cfg.attn_bias,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position,
        use_cache=True,
        pad_token_id=0, eos_token_id=1, bos_token_id=2,
    )
    torch.manual_seed(seed)
    return Glm4ForCausalLM(hf_cfg).eval()


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
def tiny_glm4():
    cfg = Qwen3Config.tiny_glm4(vocab_size=512)
    model = _hf_glm4(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestNeoxPerm:
    def test_perm_roundtrips(self):
        from fun_asr_gguf_tpu.models.loaders import glm_neox_perm
        fwd = glm_neox_perm(64, 16, 8)
        inv = glm_neox_perm(64, 16, 8, inverse=True)
        x = np.random.default_rng(0).normal(size=(5, 64))
        np.testing.assert_array_equal(x[..., fwd][..., inv], x)
        # non-rope channels stay in place
        assert fwd.reshape(4, 16)[:, 8:].tolist() == \
            np.arange(64).reshape(4, 16)[:, 8:].tolist()


class TestHFParity:
    def test_full_logits_match(self, tiny_glm4):
        model, params, cfg = tiny_glm4
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

    def test_greedy_ids_match_hf_generate(self, tiny_glm4):
        model, params, cfg = tiny_glm4
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

    def test_verify_pass_matches_prefill(self, tiny_glm4):
        from fun_asr_gguf_tpu.models.qwen3 import (qwen3_prefill,
                                                   qwen3_verify_step)
        _model, params, cfg = tiny_glm4
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
            "architectures": ["Glm4ForCausalLM"],
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "partial_rotary_factor": 0.5,
            "attention_bias": True,
            "intermediate_size": 128, "vocab_size": 512,
            "rope_theta": 1e4, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False,
            "max_position_embeddings": 4096,
        })
        assert cfg.arch == "glm4" and cfg.post_norms and cfg.pre_norms
        assert cfg.rope_dim == 8 and cfg.attn_bias
        assert not cfg.qk_norm

    def test_save_load_roundtrip(self, tiny_glm4, tmp_path):
        """GGUF round-trip in the llama.cpp glm4 layout: fused ffn_up,
        interleaved rope ordering on disk (the load permute must undo
        the save permute), rope.dimension_count KV."""
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _model, params, cfg = tiny_glm4
        path = str(tmp_path / "glm4.gguf")
        np_params = jax.tree_util.tree_map(np.asarray, params)
        save_qwen3_to_gguf(path, np_params, cfg, quantize_q8_0=False)
        r = GGUFReader(path)
        names = set(r.tensor_names())
        assert "blk.0.ffn_up.weight" in names          # fused [gate; up]
        assert "blk.0.ffn_gate.weight" not in names
        assert "blk.0.post_attention_norm.weight" in names
        assert int(r.fields["glm4.rope.dimension_count"]) == 8
        params2, cfg2, _tok = load_qwen3_from_gguf(path,
                                                   dtype=jnp.float32)
        assert cfg2.arch == "glm4" and cfg2.rope_dim == 8
        assert cfg2.post_norms and cfg2.pre_norms and cfg2.attn_bias
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

    def test_q8_0_roundtrip_runs(self, tiny_glm4, tmp_path):
        """q8_0 export + keep-quantized reload: the out-channel permute
        must ride the quantized block rows."""
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _model, params, cfg = tiny_glm4
        path = str(tmp_path / "glm4_q8.gguf")
        np_params = jax.tree_util.tree_map(np.asarray, params)
        save_qwen3_to_gguf(path, np_params, cfg, quantize_q8_0=True)
        loaded, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
        rng = np.random.default_rng(7)
        ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
        mask = jnp.ones((1, ids.shape[1]), jnp.float32)
        a = np.asarray(qwen3_forward_logits(
            params, params["embed"][jnp.asarray(ids[0])][None]
            .astype(jnp.float32), mask, cfg))
        b = np.asarray(qwen3_forward_logits(
            loaded, loaded["embed"][jnp.asarray(ids[0])][None]
            .astype(jnp.float32), mask, cfg2))
        assert _cos(a, b) > 0.999

# coding: utf-8
"""OLMo2 decoder support: HF parity, GGUF round-trip, config mapping.

llama.cpp serves OLMo2 as arch "olmo2" (reference ``convert_hf_to_gguf
.py:7042`` Olmo2Model; tensor set in ``gguf/constants.py`` MODEL_ARCH.
OLMO2): post-norm-only layers — x = x + norm(f(x)), with NO input
norms — and a full-width qk-RMSNorm applied to the whole projected
vector before the head reshape (HF ``Olmo2Attention``). This stack
expresses both via ``pre_norms=False`` + ``qk_norm_full``.
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


def _hf_olmo2(cfg: Qwen3Config, seed=1):
    from transformers import Olmo2Config, Olmo2ForCausalLM
    hf_cfg = Olmo2Config(
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
        use_cache=True,
    )
    torch.manual_seed(seed)
    return Olmo2ForCausalLM(hf_cfg).eval()


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
def tiny_olmo2():
    cfg = Qwen3Config.tiny_olmo2(vocab_size=512)
    model = _hf_olmo2(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestHFParity:
    def test_param_structure(self, tiny_olmo2):
        _model, params, cfg = tiny_olmo2
        L = params["layers"]
        assert "input_ln" not in L and "post_ln" not in L
        assert "attn_post_ln" in L and "ffn_post_ln" in L
        # full-width qk-norm vectors
        assert L["q_norm"].shape[-1] == cfg.q_heads * cfg.head_dim
        assert L["k_norm"].shape[-1] == cfg.kv_heads * cfg.head_dim

    def test_full_logits_match(self, tiny_olmo2):
        model, params, cfg = tiny_olmo2
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

    def test_greedy_ids_match_hf_generate(self, tiny_olmo2):
        model, params, cfg = tiny_olmo2
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

    def test_verify_pass_matches_prefill(self, tiny_olmo2):
        """The multi-token verify pass (spec decode / streaming extend)
        must agree with prefill logits under post-only norms."""
        from fun_asr_gguf_tpu.models.qwen3 import (qwen3_prefill,
                                                   qwen3_verify_step)
        _model, params, cfg = tiny_olmo2
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
            "architectures": ["Olmo2ForCausalLM"],
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "intermediate_size": 128, "vocab_size": 512,
            "rope_theta": 1e4, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False,
            "max_position_embeddings": 4096,
        })
        assert cfg.arch == "olmo2"
        assert not cfg.pre_norms and cfg.post_norms
        assert cfg.qk_norm and cfg.qk_norm_full

    def test_save_load_roundtrip(self, tiny_olmo2, tmp_path):
        """GGUF round-trip in the llama.cpp olmo2 layout (post norms +
        full-width qk-norms, no attn_norm/ffn_norm tensors)."""
        from fun_asr_gguf_tpu.formats.gguf import GGUFReader
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _model, params, cfg = tiny_olmo2
        path = str(tmp_path / "olmo2.gguf")
        np_params = jax.tree_util.tree_map(np.asarray, params)
        save_qwen3_to_gguf(path, np_params, cfg, quantize_q8_0=False)
        names = set(GGUFReader(path).tensor_names())
        assert "blk.0.post_attention_norm.weight" in names
        assert "blk.0.attn_norm.weight" not in names
        params2, cfg2, _tok = load_qwen3_from_gguf(path,
                                                   dtype=jnp.float32)
        assert cfg2.arch == "olmo2"
        assert not cfg2.pre_norms and cfg2.post_norms and cfg2.qk_norm_full
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


class TestGuards:
    def test_fused_q8_rejects_post_only_norms(self):
        from fun_asr_gguf_tpu.models.qwen3 import (fuse_qwen3_params_q8,
                                                   fuse_qwen3_params_q8i)
        fake = {"layers": {"qkv_w": None}, "final_ln": None}
        with pytest.raises(ValueError, match="olmo2|input_ln|post-norm"):
            fuse_qwen3_params_q8(fake)
        with pytest.raises(ValueError, match="olmo2|input_ln|post-norm"):
            fuse_qwen3_params_q8i(fake)

    def test_pp_forward_rejects(self):
        from fun_asr_gguf_tpu.parallel.pipeline import pp_forward
        cfg = Qwen3Config.tiny_olmo2()
        with pytest.raises((NotImplementedError, ValueError)):
            pp_forward(None, None, None, cfg, None, n_micro=1)

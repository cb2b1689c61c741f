"""Qwen3-MoE decoder support: parity vs HF, GGUF round-trip, quantized
paths, gather-vs-dense dispatch agreement.

Reference: the converter registers Qwen3MoeForCausalLM
(``convert_hf_to_gguf.py:4328``, Qwen2MoeModel expert-stack merging) and
llama.cpp serves the resulting ``qwen3moe`` GGUF; this stack decodes the
same family natively (``models/qwen3.py:_moe_mlp``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                           pack_qwen3_params,
                                           qwen3_forward_logits,
                                           quantize_qwen3_params_int8)

torch = pytest.importorskip("torch")


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _hf_qwen3_moe(cfg: Qwen3Config, seed=1):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    hf_cfg = Qwen3MoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.ffn_dim,
        moe_intermediate_size=cfg.moe_ffn_dim,
        num_experts=cfg.n_experts,
        num_experts_per_tok=cfg.n_experts_per_tok,
        norm_topk_prob=cfg.norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.q_heads,
        num_key_value_heads=cfg.kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position,
        router_aux_loss_coef=0.0,
        use_cache=True,
    )
    torch.manual_seed(seed)
    return Qwen3MoeForCausalLM(hf_cfg).eval()


def _my_params(model, cfg):
    from fun_asr_gguf_tpu.tools.convert import qwen3_params_from_hf_state
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = qwen3_params_from_hf_state(sd, cfg)
    return jax.tree_util.tree_map(jnp.asarray, params)


def _greedy_jax(params, cfg, prompt_ids, n_new):
    """Greedy ids via prefill + per-token KV decode steps (same recipe as
    tests/test_torch_parity.py)."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)
    p = len(prompt_ids)
    embeds = params["embed"][jnp.asarray(prompt_ids)][None]
    mask = jnp.ones((1, p), jnp.float32)
    logits, kv = qwen3_prefill(params, embeds.astype(jnp.float32), mask, cfg,
                               kv_max_len=p + n_new)
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
def tiny_moe():
    cfg = Qwen3Config.tiny_moe(vocab_size=512)
    model = _hf_qwen3_moe(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestHFParity:
    def test_full_logits_match(self, tiny_moe):
        model, params, cfg = tiny_moe
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=24)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.from_numpy(ids)[None],
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            ).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids)][None]
        my_logits = np.asarray(qwen3_forward_logits(
            params, embeds, jnp.ones((1, len(ids)), jnp.float32), cfg))
        assert _cos(hf_logits, my_logits) > 0.99999
        np.testing.assert_allclose(my_logits, hf_logits, rtol=3e-4,
                                   atol=3e-4)

    def test_greedy_ids_match_hf_generate(self, tiny_moe):
        model, params, cfg = tiny_moe
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, size=12)
        n_new = 16
        with torch.no_grad():
            hf_ids = model.generate(
                input_ids=torch.from_numpy(ids)[None],
                do_sample=False, max_new_tokens=n_new, eos_token_id=None,
                pad_token_id=0,
            )[0, len(ids):].numpy().tolist()
        my_ids = _greedy_jax(pack_qwen3_params(params), cfg,
                             ids.tolist(), n_new)
        assert my_ids == hf_ids


class TestDispatchModes:
    def test_gather_matches_dense_dispatch(self, tiny_moe):
        """The decode-time gather strategy and the prefill dense-dispatch
        strategy are the same function (one token → gather; crossing the
        N*K > E threshold → dense)."""
        from fun_asr_gguf_tpu.models.qwen3 import _moe_dense_dispatch, _moe_mlp
        _, params, cfg = tiny_moe
        lp = {k: v[0] for k, v in params["layers"].items()}
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 3, cfg.hidden)) * 0.3,
                        jnp.float32)
        few = np.asarray(_moe_mlp(x, lp, cfg))          # N*K = 6 <= 8 experts

        xf = x.reshape(-1, cfg.hidden)
        logits = xf @ lp["router_w"]
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, cfg.n_experts_per_tok)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        dense = np.asarray(_moe_dense_dispatch(
            xf, topv, topi, lp["moe_gate_w"], lp["moe_up_w"],
            lp["moe_down_w"], cfg)).reshape(few.shape)
        np.testing.assert_allclose(few, dense, rtol=2e-5, atol=2e-5)

    def test_int8_expert_weights_close(self, tiny_moe):
        _, params, cfg = tiny_moe
        rng = np.random.default_rng(4)
        ids = rng.integers(0, cfg.vocab_size, size=16)
        embeds = params["embed"][jnp.asarray(ids)][None]
        mask = jnp.ones((1, len(ids)), jnp.float32)
        ref = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
        q = quantize_qwen3_params_int8(params)
        assert not isinstance(q["layers"]["router_w"], tuple)  # stays dense
        got = np.asarray(qwen3_forward_logits(q, embeds, mask, cfg))
        assert _cos(ref, got) > 0.999
        # greedy decisions preserved at most positions (int8 rounding)
        agree = (ref.argmax(-1) == got.argmax(-1)).mean()
        assert agree > 0.9


class TestDecodeStep:
    def test_decode_matches_forward(self, tiny_moe):
        """prefill + per-token decode steps == all-at-once forward."""
        from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                                   qwen3_prefill)
        _, params, cfg = tiny_moe
        params = pack_qwen3_params(params)
        rng = np.random.default_rng(5)
        ids = rng.integers(0, cfg.vocab_size, size=10)
        p = len(ids)
        embeds = params["embed"][jnp.asarray(ids)][None]
        mask = jnp.ones((1, p), jnp.float32)
        logits, kv = qwen3_prefill(params, embeds.astype(jnp.float32), mask,
                                   cfg, kv_max_len=p + 4)
        seq = [int(jnp.argmax(logits[0]))]
        for t in range(3):
            emb = params["embed"][jnp.asarray([seq[-1]])].astype(jnp.float32)
            logits, kv = qwen3_decode_step(
                params, kv, emb, jnp.asarray(p + t, jnp.int32),
                jnp.asarray([p + t], jnp.int32),
                jnp.asarray([0], jnp.int32), cfg)
            seq.append(int(jnp.argmax(logits[0])))

        full = np.concatenate([ids, seq[:-1]])
        embeds_f = params["embed"][jnp.asarray(full)][None]
        ref = np.asarray(qwen3_forward_logits(
            params, embeds_f.astype(jnp.float32),
            jnp.ones((1, len(full)), jnp.float32), cfg))
        ref_ids = ref[0, p - 1:].argmax(-1).tolist()
        assert seq == ref_ids


class TestGGUFRoundTrip:
    def test_save_load_roundtrip(self, tiny_moe, tmp_path):
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _, params, cfg = tiny_moe
        path = str(tmp_path / "moe.gguf")
        save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
        loaded, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
        assert cfg2.n_experts == cfg.n_experts
        assert cfg2.n_experts_per_tok == cfg.n_experts_per_tok
        assert cfg2.moe_ffn_dim == cfg.moe_ffn_dim
        assert cfg2.arch == "qwen3moe"

        rng = np.random.default_rng(6)
        ids = rng.integers(0, cfg.vocab_size, size=12)
        mask = jnp.ones((1, len(ids)), jnp.float32)
        ref = np.asarray(qwen3_forward_logits(
            params, params["embed"][jnp.asarray(ids)][None], mask, cfg))
        got = np.asarray(qwen3_forward_logits(
            loaded, loaded["embed"][jnp.asarray(ids)][None], mask, cfg2))
        # f16 storage rounding only
        assert _cos(ref, got) > 0.9999
        np.testing.assert_array_equal(ref.argmax(-1), got.argmax(-1))

    def test_q8_0_roundtrip_runs(self, tiny_moe, tmp_path):
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        _, params, cfg = tiny_moe
        path = str(tmp_path / "moe_q8.gguf")
        save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=True)
        loaded, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
        rng = np.random.default_rng(7)
        ids = rng.integers(0, cfg.vocab_size, size=12)
        mask = jnp.ones((1, len(ids)), jnp.float32)
        ref = np.asarray(qwen3_forward_logits(
            params, params["embed"][jnp.asarray(ids)][None], mask, cfg))
        got = np.asarray(qwen3_forward_logits(
            loaded, loaded["embed"][jnp.asarray(ids)][None], mask, cfg2))
        assert _cos(ref, got) > 0.999


class TestGuards:
    def test_fused_q8_paths_reject_moe(self, tiny_moe):
        from fun_asr_gguf_tpu.models.qwen3 import (fuse_qwen3_params_q8,
                                                   fuse_qwen3_params_q8i)
        _, params, cfg = tiny_moe
        packed = pack_qwen3_params(params)
        with pytest.raises(ValueError, match="MoE"):
            fuse_qwen3_params_q8(packed)
        with pytest.raises(ValueError, match="MoE"):
            fuse_qwen3_params_q8i(packed)

    def test_init_params_shapes(self):
        cfg = Qwen3Config.tiny_moe()
        p = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        L = p["layers"]
        assert L["router_w"].shape == (cfg.n_layers, cfg.hidden,
                                       cfg.n_experts)
        assert L["moe_gate_w"].shape == (cfg.n_layers, cfg.n_experts,
                                         cfg.hidden, cfg.moe_ffn_dim)
        assert L["moe_down_w"].shape == (cfg.n_layers, cfg.n_experts,
                                         cfg.moe_ffn_dim, cfg.hidden)
        assert "gate_w" not in L


# ---------------------------------------------------------------------------
# Qwen2-MoE (reference converter: Qwen2MoeModel in convert_hf_to_gguf.py):
# qwen2 attention (biases, no qk-norm), softmax top-k WITHOUT
# renormalization, one sigmoid-gated shared expert with its own width.
# ---------------------------------------------------------------------------

def _hf_qwen2_moe(cfg: Qwen3Config, seed=1):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    hf_cfg = Qwen2MoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.ffn_dim,
        moe_intermediate_size=cfg.moe_ffn_dim,
        shared_expert_intermediate_size=cfg.shared_ffn_dim,
        num_experts=cfg.n_experts,
        num_experts_per_tok=cfg.n_experts_per_tok,
        norm_topk_prob=cfg.norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.q_heads,
        num_key_value_heads=cfg.kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=cfg.max_position,
        router_aux_loss_coef=0.0,
        use_cache=True,
    )
    torch.manual_seed(seed)
    return Qwen2MoeForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def tiny_qwen2moe():
    cfg = Qwen3Config.tiny_qwen2moe(vocab_size=512)
    model = _hf_qwen2_moe(cfg)
    params = _my_params(model, cfg)
    return model, params, cfg


class TestQwen2MoeParity:
    def test_param_structure(self, tiny_qwen2moe):
        _, params, cfg = tiny_qwen2moe
        L = params["layers"]
        assert "shexp_gate_w" in L
        assert L["shared_gate_w"].shape == (cfg.n_layers, cfg.hidden,
                                            cfg.shared_ffn_dim)
        assert L["shexp_gate_w"].shape == (cfg.n_layers, cfg.hidden)
        assert "q_b" in L and "q_norm" not in L

    def test_full_logits_match(self, tiny_qwen2moe):
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        model, params, cfg = tiny_qwen2moe
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=24)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.from_numpy(ids)[None],
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            ).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids)][None]
        my_logits = np.asarray(qwen3_forward_logits(
            params, embeds, jnp.ones((1, len(ids)), jnp.float32), cfg))
        assert _cos(hf_logits, my_logits) > 0.99999
        np.testing.assert_allclose(my_logits, hf_logits, rtol=3e-4,
                                   atol=3e-4)

    def test_greedy_ids_match_hf_generate(self, tiny_qwen2moe):
        model, params, cfg = tiny_qwen2moe
        rng = np.random.default_rng(3)
        ids = rng.integers(0, cfg.vocab_size, size=12)
        n_new = 16
        with torch.no_grad():
            hf_ids = model.generate(
                input_ids=torch.from_numpy(ids)[None],
                do_sample=False, max_new_tokens=n_new, eos_token_id=None,
                pad_token_id=0,
            )[0, len(ids):].numpy().tolist()
        assert _greedy_jax(params, cfg, ids.tolist(), n_new) == hf_ids

    def test_gguf_roundtrip(self, tiny_qwen2moe, tmp_path):
        from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                     save_qwen3_to_gguf)
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        _, params, cfg = tiny_qwen2moe
        path = str(tmp_path / "q2moe.gguf")
        save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
        params2, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
        assert cfg2.arch == "qwen2moe"
        assert cfg2.shared_ffn_dim == cfg.shared_ffn_dim
        assert cfg2.shared_expert_gate
        assert not cfg2.norm_topk_prob
        rng = np.random.default_rng(5)
        ids = rng.integers(0, cfg.vocab_size, size=10)
        embeds = params["embed"][jnp.asarray(ids)][None]
        mask = jnp.ones((1, len(ids)), jnp.float32)
        a = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
        e2 = params2["embed"][jnp.asarray(ids)][None]
        b = np.asarray(qwen3_forward_logits(params2, e2, mask, cfg2))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_hf_config_mapping(self):
        from fun_asr_gguf_tpu.tools.convert import qwen3_config_from_hf
        cfg = qwen3_config_from_hf({
            "architectures": ["Qwen2MoeForCausalLM"],
            "hidden_size": 2048, "num_hidden_layers": 24,
            "num_attention_heads": 16, "num_key_value_heads": 16,
            "intermediate_size": 5632, "vocab_size": 151936,
            "num_experts": 60, "num_experts_per_tok": 4,
            "moe_intermediate_size": 1408,
            "shared_expert_intermediate_size": 5632,
            "rope_theta": 1e6, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False,
        })
        assert cfg.arch == "qwen2moe"
        assert cfg.attn_bias and not cfg.qk_norm
        assert not cfg.norm_topk_prob       # HF default
        assert cfg.shared_ffn_dim == 5632
        assert cfg.shared_expert_gate and cfg.n_shared_experts == 1


class TestQwen2MoeSharding:
    def test_tp_spec_covers_every_param_key(self, tiny_qwen2moe):
        """Every layer key (incl. the shexp gate vector) must get a
        sharding rule — a missing key crashes device_put with a
        spec-tree mismatch instead of degrading to replication."""
        from jax.sharding import Mesh
        from fun_asr_gguf_tpu.parallel.sharding import llm_param_sharding
        _, params, cfg = tiny_qwen2moe
        devs = np.array(jax.devices()[:2]).reshape(1, 2)
        mesh = Mesh(devs, ("dp", "tp"))
        spec = llm_param_sharding(mesh, params)
        assert set(spec["layers"].keys()) == set(params["layers"].keys())
        sharded = jax.device_put(params, spec)
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, size=8)
        mask = jnp.ones((1, len(ids)), jnp.float32)
        a = np.asarray(qwen3_forward_logits(
            sharded, sharded["embed"][jnp.asarray(ids)][None]
            .astype(jnp.float32), mask, cfg))
        b = np.asarray(qwen3_forward_logits(
            params, params["embed"][jnp.asarray(ids)][None]
            .astype(jnp.float32), mask, cfg))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

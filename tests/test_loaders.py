"""Checkpoint IO tests: GGUF round-trip, safetensors round-trip, torch import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import HybridConfig, Qwen3Config
from fun_asr_gguf_tpu.models.loaders import (create_random_checkpoint,
                                             flatten_tree, load_checkpoint,
                                             load_qwen3_from_gguf,
                                             save_qwen3_to_gguf,
                                             unflatten_tree)
from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params, qwen3_prefill)


class TestFlatten:
    def test_roundtrip(self):
        tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)},
                "d": np.arange(4)}
        flat = flatten_tree(tree)
        assert set(flat) == {"a.b", "a.c", "d"}
        back = unflatten_tree(flat)
        np.testing.assert_array_equal(np.asarray(back["a"]["b"]), tree["a"]["b"])


class TestQwen3GGUF:
    def test_roundtrip_f16(self, tmp_path):
        cfg = Qwen3Config.tiny(vocab_size=96)
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "d.gguf")
        save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
        p2, cfg2, embed = load_qwen3_from_gguf(path, dtype=jnp.float32)
        assert cfg2.hidden == cfg.hidden
        assert cfg2.n_layers == cfg.n_layers
        assert cfg2.q_heads == cfg.q_heads
        assert cfg2.kv_heads == cfg.kv_heads
        assert cfg2.vocab_size == 96
        assert cfg2.tie_embeddings
        np.testing.assert_allclose(
            embed, np.asarray(params["embed"]), atol=2e-3)
        # same logits from original and round-tripped weights (f16 noise)
        rng = np.random.default_rng(0)
        e = jnp.asarray(rng.normal(size=(1, 4, cfg.hidden)), jnp.float32) * 0.1
        m = jnp.ones((1, 4), jnp.float32)
        l1, _ = qwen3_prefill(params, e, m, cfg)
        l2, _ = qwen3_prefill(p2, e, m, cfg2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=5e-2, atol=5e-2)

    def test_roundtrip_q8_0(self, tmp_path):
        cfg = Qwen3Config.tiny(vocab_size=96)
        params = init_qwen3_params(jax.random.PRNGKey(1), cfg)
        path = str(tmp_path / "d8.gguf")
        save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=True)
        p2, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
        # q8_0 error ~0.4% of absmax per block
        w1 = np.asarray(params["layers"]["q_w"])
        w2 = np.asarray(p2["layers"]["q_w"])
        assert np.abs(w1 - w2).max() < np.abs(w1).max() * 0.01
        rng = np.random.default_rng(1)
        e = jnp.asarray(rng.normal(size=(1, 4, cfg.hidden)), jnp.float32) * 0.1
        m = jnp.ones((1, 4), jnp.float32)
        l1, _ = qwen3_prefill(params, e, m, cfg)
        l2, _ = qwen3_prefill(p2, e, m, cfg2)
        # logits close enough for identical argmax almost surely
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0.2, atol=0.2)


class TestCheckpointDir:
    def test_random_checkpoint_roundtrip(self, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=7)
        cfg2, enc, ada, ctc, llm, embed = load_checkpoint(ckpt)
        assert cfg2.encoder == cfg.encoder
        assert cfg2.adaptor == cfg.adaptor
        assert cfg2.llm.hidden == cfg.llm.hidden
        # encoder params usable in a forward pass
        from fun_asr_gguf_tpu.models.sanm import encoder_forward
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 12, cfg.encoder.input_size)),
                        jnp.float32)
        mask = jnp.ones((1, 12), jnp.float32)
        y = encoder_forward(enc, x, mask, cfg2.encoder)
        assert y.shape == (1, 12, cfg.encoder.d_model)
        assert np.isfinite(np.asarray(y)).all()
        assert embed.shape == (cfg.llm.vocab_size, cfg.llm.hidden)


class TestTorchImport:
    def test_load_encoder_from_pt(self, tmp_path):
        """Build a torch state dict shaped like the FunASR checkpoint and
        verify key mapping + transposition."""
        torch = pytest.importorskip("torch")
        from fun_asr_gguf_tpu.models.config import (AdaptorConfig,
                                                    CTCHeadConfig,
                                                    EncoderConfig)
        from fun_asr_gguf_tpu.models.loaders import load_encoder_from_pt

        enc_cfg = EncoderConfig.tiny()
        ad_cfg = AdaptorConfig.tiny(in_dim=enc_cfg.d_model, out_dim=64)
        ctc_cfg = CTCHeadConfig.tiny(d=enc_cfg.d_model, vocab_size=17)
        d = enc_cfg.d_model

        sd = {}
        def lin(name, i, o):
            sd[f"{name}.weight"] = torch.randn(o, i)
            sd[f"{name}.bias"] = torch.randn(o)
        def ln(name, dim):
            sd[f"{name}.weight"] = torch.randn(dim)
            sd[f"{name}.bias"] = torch.randn(dim)
        def sanm(prefix, in_size):
            ln(f"{prefix}.norm1", in_size)
            ln(f"{prefix}.norm2", d)
            lin(f"{prefix}.self_attn.linear_q_k_v", in_size, 3 * d)
            lin(f"{prefix}.self_attn.linear_out", d, d)
            sd[f"{prefix}.self_attn.fsmn_block.weight"] = torch.randn(
                d, 1, enc_cfg.kernel_size)
            lin(f"{prefix}.feed_forward.w_1", d, enc_cfg.ffn_dim)
            lin(f"{prefix}.feed_forward.w_2", enc_cfg.ffn_dim, d)
        def block(prefix, dim, ffn):
            ln(f"{prefix}.norm1", dim)
            ln(f"{prefix}.norm2", dim)
            for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
                lin(f"{prefix}.self_attn.{nm}", dim, dim)
            lin(f"{prefix}.feed_forward.w_1", dim, ffn)
            lin(f"{prefix}.feed_forward.w_2", ffn, dim)

        sanm("audio_encoder.encoders0.0", enc_cfg.input_size)
        for i in range(enc_cfg.num_blocks - 1):
            sanm(f"audio_encoder.encoders.{i}", d)
        for i in range(enc_cfg.tp_blocks):
            sanm(f"audio_encoder.tp_encoders.{i}", d)
        ln("audio_encoder.after_norm", d)
        ln("audio_encoder.tp_norm", d)
        lin("audio_adaptor.linear1", d, ad_cfg.ffn_dim)
        lin("audio_adaptor.linear2", ad_cfg.ffn_dim, ad_cfg.out_dim)
        for i in range(ad_cfg.n_layers):
            block(f"audio_adaptor.blocks.{i}", ad_cfg.out_dim,
                  ad_cfg.block_ffn_dim)
        lin("ctc_decoder.linear1", d, ctc_cfg.adaptor.ffn_dim)
        lin("ctc_decoder.linear2", ctc_cfg.adaptor.ffn_dim, d)
        for i in range(ctc_cfg.adaptor.n_layers):
            block(f"ctc_decoder.blocks.{i}", d, ctc_cfg.adaptor.block_ffn_dim)
        lin("ctc.ctc_lo", d, ctc_cfg.vocab_size)

        pt = tmp_path / "model.pt"
        torch.save(sd, str(pt))
        enc, ada, ctc = load_encoder_from_pt(str(pt), enc_cfg, ad_cfg, ctc_cfg)

        # spot-check a transposition
        np.testing.assert_allclose(
            np.asarray(enc["encoder0"]["attn"]["qkv"]["w"]),
            sd["audio_encoder.encoders0.0.self_attn.linear_q_k_v.weight"]
            .numpy().T, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ctc["proj"]["w"]),
            sd["ctc.ctc_lo.weight"].numpy().T, atol=1e-6)
        # fsmn [C,1,K] -> [K,C]
        np.testing.assert_allclose(
            np.asarray(enc["encoders"]["attn"]["fsmn_w"][0]),
            sd["audio_encoder.encoders.0.self_attn.fsmn_block.weight"]
            .numpy()[:, 0, :].T, atol=1e-6)

        # forward runs
        from fun_asr_gguf_tpu.models.sanm import encoder_forward
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(1, 10, enc_cfg.input_size)), jnp.float32)
        y = encoder_forward(enc, x, jnp.ones((1, 10), jnp.float32), enc_cfg)
        assert np.isfinite(np.asarray(y)).all()

"""All-layers q8 decode megakernel vs the production decode step.

Runs at a reduced-but-plan-admitting size (hidden 256, 2 layers,
head_dim 128, GQA 4/2) in Pallas interpret mode on CPU; the same
comparison at full Qwen3-0.6B size runs on the real chip via
experiments/q8_mega_bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.models.config import Qwen3Config
from fun_asr_gguf_tpu.models.qwen3 import (fuse_qwen3_params_q8,
                                           init_qwen3_params,
                                           pack_qwen3_params,
                                           qwen3_decode_step, qwen3_prefill,
                                           quantize_lm_head,
                                           quantize_qwen3_params,
                                           rope_cos_sin)
from fun_asr_gguf_tpu.ops.quant_matmul import (block_permute,
                                               q8_decode_all_fused,
                                               q8_mega_cs)


def _mini_cfg():
    return Qwen3Config(hidden=256, n_layers=2, q_heads=4, kv_heads=2,
                       head_dim=128, ffn_dim=512, vocab_size=2048,
                       rope_theta=1e4)


@pytest.fixture(scope="module")
def mega_setup():
    cfg = _mini_cfg()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    qp = fuse_qwen3_params_q8(pack_qwen3_params(
        quantize_qwen3_params(params, mode="pallas")))
    qp = quantize_lm_head(qp, cfg, mode="pallas")
    return cfg, params, qp


def _mega_inputs(qp, cfg, kv, slot, position, valid_from, embed_row):
    """Assemble the megakernel's inputs from fused params + a standard
    [L, B, S, kh, D] cache (B = 1)."""
    L = cfg.n_layers
    layers = qp["layers"]
    x0 = block_permute(embed_row.astype(jnp.float32))        # [1, H]
    in_ln = layers["input_ln"]                               # [L, H] perm
    var = jnp.mean(x0 * x0, axis=-1, keepdims=True)
    nhb0 = ((x0 * jax.lax.rsqrt(var + cfg.rms_eps))
            * in_ln[0][None]).astype(jnp.bfloat16)
    norms_next = jnp.concatenate(
        [in_ln[1:], qp["final_ln"][None]], axis=0)           # [L, H]
    cos, sin = rope_cos_sin(jnp.asarray([position], jnp.int32),
                            cfg.head_dim, cfg.rope_theta, jnp.float32)
    k_hm = jnp.transpose(kv.k[:, 0], (0, 2, 1, 3))           # [L,kh,S,D]
    v_hm = jnp.transpose(kv.v[:, 0], (0, 2, 1, 3))
    s_len = k_hm.shape[2]
    j = jnp.arange(s_len)
    bias = jnp.where((j >= valid_from) & (j < slot), 0.0, -1e30
                     ).astype(jnp.float32)[None]
    return dict(
        x0_perm=x0, nhb0=nhb0, post_lns=layers["post_ln"],
        norms_next=norms_next, q_norms=layers["q_norm"],
        k_norms=layers["k_norm"], cos=cos, sin=sin, bias_row=bias,
        kv_k=k_hm, kv_v=v_hm, qkv_w=layers["qkv_w"], o_w=layers["o_w"],
        gu_w=layers["gate_up_w"], down_w=layers["down_w"],
        head_w=qp["lm_head_q"], eps=cfg.rms_eps)


class TestMegaKernel:
    def test_matches_decode_step(self, mega_setup):
        cfg, params, qp = mega_setup
        rng = np.random.default_rng(1)
        p = 6
        s_len = 256
        assert q8_mega_cs(s_len) == 256
        ids = rng.integers(0, cfg.vocab_size, size=p)
        embeds = qp["embed"][jnp.asarray(ids)][None].astype(jnp.float32)
        mask = jnp.ones((1, p), jnp.float32)
        # reference prefill + decode step (CPU: XLA reference path of the
        # same fused q8 params)
        logits_p, kv = qwen3_prefill(qp, embeds, mask, cfg,
                                     kv_max_len=s_len)
        tok = int(jnp.argmax(logits_p[0]))
        emb = qp["embed"][jnp.asarray([tok])].astype(jnp.float32)
        ref_logits, ref_kv = qwen3_decode_step(
            qp, kv, emb, jnp.asarray(p, jnp.int32),
            jnp.asarray([p], jnp.int32), jnp.asarray([0], jnp.int32), cfg)

        ins = _mega_inputs(qp, cfg, kv, slot=p, position=p, valid_from=0,
                           embed_row=emb)
        out = q8_decode_all_fused(**ins, interpret=True)
        assert out is not None, "mini config must admit the staged plan"
        logits, k_new, v_new = out
        got = np.asarray(logits)[0, :cfg.vocab_size]
        ref = np.asarray(ref_logits)[0]
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        assert int(got.argmax()) == int(ref.argmax())
        # new cache rows match what the reference decode step wrote
        # (k tolerances are looser: the kernel's qkv dot runs bf16 on the
        # MXU while the CPU reference path dequantizes and dots in f32 —
        # per-element drift up to ~bf16 epsilon stackup on tiny values)
        ref_k_row = np.asarray(ref_kv.k)[:, 0, p]            # [L, kh, D]
        ref_v_row = np.asarray(ref_kv.v)[:, 0, p]
        k_got = np.asarray(k_new)

        def _cos(a, b):
            a, b = a.ravel(), b.ravel()
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        assert _cos(k_got, ref_k_row) > 0.99995
        np.testing.assert_allclose(k_got, ref_k_row, rtol=0.1, atol=0.1)
        np.testing.assert_allclose(np.asarray(v_new), ref_v_row,
                                   rtol=2e-2, atol=2e-2)

    @pytest.mark.slow   # gate-trim: decode-step parity covers the kernel
    def test_left_padded_window(self, mega_setup):
        """valid_from > 0 (left-padded prompt) masks the pad slots."""
        cfg, params, qp = mega_setup
        rng = np.random.default_rng(2)
        p, pad = 8, 3
        s_len = 256
        ids = rng.integers(0, cfg.vocab_size, size=p - pad)
        embeds = jnp.concatenate([
            jnp.zeros((1, pad, cfg.hidden), jnp.float32),
            qp["embed"][jnp.asarray(ids)][None].astype(jnp.float32)],
            axis=1)
        mask = jnp.concatenate([jnp.zeros((1, pad)), jnp.ones((1, p - pad))],
                               axis=1).astype(jnp.float32)
        logits_p, kv = qwen3_prefill(qp, embeds, mask, cfg,
                                     kv_max_len=s_len)
        tok = int(jnp.argmax(logits_p[0]))
        emb = qp["embed"][jnp.asarray([tok])].astype(jnp.float32)
        ref_logits, _ = qwen3_decode_step(
            qp, kv, emb, jnp.asarray(p, jnp.int32),
            jnp.asarray([p - pad], jnp.int32),
            jnp.asarray([pad], jnp.int32), cfg)
        ins = _mega_inputs(qp, cfg, kv, slot=p, position=p - pad,
                           valid_from=pad, embed_row=emb)
        out = q8_decode_all_fused(**ins, interpret=True)
        logits, _, _ = out
        got = np.asarray(logits)[0, :cfg.vocab_size]
        ref = np.asarray(ref_logits)[0]
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
        assert int(got.argmax()) == int(ref.argmax())

    @pytest.mark.slow   # gate-trim: decode-step parity covers the kernel
    def test_generate_chunk_matches_nonmega(self, mega_setup):
        """End-to-end integration: prefill_init + generate_chunk with the
        q8_mega marker (head-major cache + megakernel decode steps) emits
        the same greedy tokens as the per-layer megacall params."""
        from fun_asr_gguf_tpu.models.generate import (generate_chunk,
                                                      prefill_init)
        from fun_asr_gguf_tpu.models.qwen3 import fuse_qwen3_params_q8_mega
        cfg, params, qp = mega_setup
        mega = fuse_qwen3_params_q8_mega(qp, cfg)
        assert "q8_mega" in mega, "mini config must admit the megakernel"
        rng = np.random.default_rng(3)
        p = 8
        embeds = qp["embed"][jnp.asarray(
            rng.integers(0, cfg.vocab_size, size=p))][None].astype(
            jnp.float32)
        mask = jnp.ones((1, p), jnp.float32)

        def run(pp):
            st = prefill_init(pp, embeds, mask, jax.random.PRNGKey(5),
                              cfg, max_len=p + 12)
            st, toks = generate_chunk(pp, st, cfg, jnp.asarray(0.0),
                                      jnp.asarray(1.0), 50, chunk_len=6,
                                      stop_tokens=(), fuse_enabled=False,
                                      greedy=True)
            st, toks2 = generate_chunk(pp, st, cfg, jnp.asarray(0.0),
                                       jnp.asarray(1.0), 50, chunk_len=6,
                                       stop_tokens=(), fuse_enabled=False,
                                       greedy=True)
            return ([int(t) for t in np.asarray(toks)[0]]
                    + [int(t) for t in np.asarray(toks2)[0]])

        base = run(qp)
        got = run(mega)
        assert got == base

    @pytest.mark.slow   # gate-trim: compile-heavy negative case
    def test_fuse_mega_skips_tiny_shapes(self):
        from fun_asr_gguf_tpu.models.qwen3 import fuse_qwen3_params_q8_mega
        cfg = Qwen3Config.tiny(vocab_size=512)
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        qp = fuse_qwen3_params_q8(pack_qwen3_params(
            quantize_qwen3_params(params, mode="pallas")))
        qp = quantize_lm_head(qp, cfg, mode="pallas")
        out = fuse_qwen3_params_q8_mega(qp, cfg)
        assert "q8_mega" not in out      # no staged plan at tiny widths

    def test_rejects_unsupported_shapes(self, mega_setup):
        cfg, params, qp = mega_setup
        layers = qp["layers"]
        # S with no 128-multiple divisor chunking
        assert q8_mega_cs(300) == 0
        kv_k = jnp.zeros((cfg.n_layers, cfg.kv_heads, 300, cfg.head_dim),
                         jnp.float32)
        out = q8_decode_all_fused(
            jnp.zeros((1, cfg.hidden)), jnp.zeros((1, cfg.hidden),
                                                  jnp.bfloat16),
            layers["post_ln"], layers["post_ln"], layers["q_norm"],
            layers["k_norm"], jnp.zeros((1, cfg.head_dim)),
            jnp.zeros((1, cfg.head_dim)), jnp.zeros((1, 300)),
            kv_k, kv_k, layers["qkv_w"], layers["o_w"],
            layers["gate_up_w"], layers["down_w"], qp["lm_head_q"],
            cfg.rms_eps, interpret=True)
        assert out is None

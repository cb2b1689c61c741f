"""Phi-3-family decoder support, verified against HF transformers.

Phi3 differs from the qwen/llama family on four axes this suite
exercises end to end: fused qkv / gate_up projections (kept fused in
the llama.cpp GGUF layout: ``blk.N.attn_qkv.weight``, gate+up inside
``blk.N.ffn_up.weight``), longrope scaling (short/long per-frequency
factor sets + the sqrt(1+ln(scale)/ln(orig)) attention factor),
optional all-layer sliding-window attention (Phi-3-mini; absent marks
Phi-4), and partial rotary dims (``rope.dimension_count`` <
head_dim). Reference coverage: ``convert_hf_to_gguf.py:4651``
(Phi3MiniModel) — the reference's runtime for this arch is llama.dll.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fun_asr_gguf_tpu.tools.convert import (qwen3_config_from_hf,
                                            qwen3_params_from_hf_state)

# head_dim 16 -> 8 longrope factors per set; max_pos 64 over orig 32
# makes the attention factor sqrt(1 + ln(2)/ln(32)) != 1
HF_CFG = dict(
    architectures=["Phi3ForCausalLM"],
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_theta=10_000.0,
    rms_norm_eps=1e-5,
    max_position_embeddings=64,
    original_max_position_embeddings=32,
    rope_scaling={                 # Phi3Config validation wants `type`
        "type": "longrope",
        "short_factor": [1.0, 1.2, 1.4, 1.1, 1.3, 1.05, 1.25, 1.15],
        "long_factor": [2.0, 2.5, 3.0, 2.2, 2.8, 2.1, 2.4, 2.6],
    },
    tie_word_embeddings=False,
    sliding_window=None,
)

ATTN_FACTOR = math.sqrt(1.0 + math.log(2.0) / math.log(32.0))


def _hf_model(seed=1, **overrides):
    from transformers import Phi3Config, Phi3ForCausalLM
    kw = {k: v for k, v in HF_CFG.items() if k != "architectures"}
    kw.update(overrides)
    torch.manual_seed(seed)
    # Phi3Config defaults pad/eos to 32000+, beyond the tiny vocab
    return Phi3ForCausalLM(
        Phi3Config(attention_dropout=0.0, use_cache=True,
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


@pytest.fixture(scope="module")
def sliding_pair():
    """Phi-3-mini shape: sliding window on EVERY layer."""
    hf = dict(HF_CFG)
    hf["sliding_window"] = 8
    model = _hf_model(seed=2, sliding_window=8)
    cfg = qwen3_config_from_hf(hf)
    return model, cfg, _jax_params(model, cfg)


def _cos(a, b):
    return np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_config_mapping():
    cfg = qwen3_config_from_hf(dict(HF_CFG))
    assert cfg.arch == "phi3"
    assert not cfg.qk_norm and not cfg.attn_bias and not cfg.post_norms
    assert cfg.rope_orig_max_position == 32
    assert len(cfg.rope_factors_short) == 8
    assert len(cfg.rope_factors_long) == 8
    assert cfg.rope_attn_factor == pytest.approx(ATTN_FACTOR)
    assert not cfg.rope_long_active          # short set by default
    assert cfg.sliding_window == 0 and cfg.sliding_pattern == 0
    assert not cfg.tie_embeddings


def test_config_mapping_sliding():
    hf = dict(HF_CFG)
    hf["sliding_window"] = 8
    cfg = qwen3_config_from_hf(hf)
    assert cfg.sliding_window == 8
    # every layer slides: no l satisfies (l+1) % pattern == 0
    assert cfg.sliding_pattern == cfg.n_layers + 1
    assert cfg.rope_local_theta == pytest.approx(cfg.rope_theta)


def test_logits_match_hf_short_factors(pair):
    """Sequences within the original context use the short factor set
    with the attention factor applied (HF longrope_frequency_update)."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))   # 24 <= 32
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_logits_match_hf_long_factors(pair):
    """Past the original context HF flips to the long factor set; our
    equivalent is the rope_long_active config switch."""
    from dataclasses import replace

    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 40))   # 40 > 32
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    cfg_long = replace(cfg, rope_long_active=True)
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg_long))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # and the factor sets must actually differ
    short = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    assert np.abs(short - got).max() > 1e-3


def test_logits_match_hf_sliding(sliding_pair):
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = sliding_pair
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 24))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    assert _cos(ref, got) > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_sliding_window_actually_masks(sliding_pair):
    """A token beyond every layer's window must not affect the last
    position at all (phi3 has NO global layers, unlike gemma)."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = sliding_pair
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
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g2, g1, rtol=1e-5, atol=1e-5)


def test_greedy_ids_match_hf_generate(pair):
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


def test_greedy_ids_match_hf_generate_sliding(sliding_pair):
    """Decode must honor the window once generation crosses it (prompt
    12 + 10 new > window 8)."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)

    model, cfg, params = sliding_pair
    rng = np.random.default_rng(3)
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
    """The multi-token verify pass (spec decoding) must reproduce
    sequential decode under longrope."""
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
    """phi3 GGUF export/import in llama.cpp layout: fused attn_qkv,
    gate+up fused inside ffn_up, rope factor tensors, longrope KVs."""
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    _model, cfg, params = pair
    path = str(tmp_path / "phi3_tiny.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)

    r = GGUFReader(path)
    names = set(r.tensor_names())
    assert "blk.0.attn_qkv.weight" in names          # fused, llama.cpp
    assert "blk.0.attn_q.weight" not in names
    assert "blk.0.ffn_gate.weight" not in names      # gate rides ffn_up
    assert "rope_factors_short.weight" in names
    assert "rope_factors_long.weight" in names
    fd = r.fields
    assert fd["phi3.rope.scaling.original_context_length"] == 32
    assert fd["phi3.attention.sliding_window"] == 0   # Phi-4 marker

    params2, cfg2, _embed = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.arch == "phi3"
    assert cfg2.rope_factors_short == pytest.approx(cfg.rope_factors_short)
    assert cfg2.rope_factors_long == pytest.approx(cfg.rope_factors_long)
    assert cfg2.rope_attn_factor == pytest.approx(cfg.rope_attn_factor)
    assert not cfg2.rope_long_active

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)  # f16 weights

    # n_ctx beyond the original context must activate the long set
    _p3, cfg3, _e3 = load_qwen3_from_gguf(path, dtype=jnp.float32,
                                          n_ctx=48)
    assert cfg3.rope_long_active


def test_gguf_q8_0_fused_split(pair, tmp_path):
    """q8_0 phi3 GGUF with keep_quantized: the fused attn_qkv/ffn_up
    row split must not cross quant blocks (blocks run along `in`)."""
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
    from fun_asr_gguf_tpu.ops.quant_matmul import QuantTensor

    _model, cfg, params = pair
    path = str(tmp_path / "phi3_q8.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=True)
    qparams, qcfg, _ = load_qwen3_from_gguf(path, dtype=jnp.float32,
                                            keep_quantized=True)
    assert isinstance(qparams["layers"]["q_w"], QuantTensor)
    dparams, _, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        dparams, dparams["embed"][jnp.asarray(ids)], mask, qcfg))
    assert _cos(a, b) > 0.999                         # q8_0 quant error
    assert np.argmax(a[0, -1]) == np.argmax(b[0, -1])


def test_partial_rotary_round_trip(tmp_path):
    """rope_dim < head_dim (phi-4-mini's partial_rotary_factor) is
    load-bearing and survives the GGUF round trip."""
    from dataclasses import replace

    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                               qwen3_forward_logits)
    from fun_asr_gguf_tpu.models.config import Qwen3Config

    cfg = replace(Qwen3Config.tiny_llama(vocab_size=64), arch="phi3",
                  rope_dim=12)                        # head_dim 16
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(13)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
    mask = jnp.ones(ids.shape, jnp.float32)
    emb = params["embed"][jnp.asarray(ids)]
    a = np.asarray(qwen3_forward_logits(params, emb, mask, cfg))
    # the rotary width changes the math
    full = np.asarray(qwen3_forward_logits(
        params, emb, mask, replace(cfg, rope_dim=0)))
    assert np.abs(a - full).max() > 1e-4

    path = str(tmp_path / "phi3_partial.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
    params2, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.rope_dim == 12
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)


def test_mega_fuse_rejects_longrope(pair):
    """fuse_qwen3_params_q8_mega must decline phi3 params (the in-kernel
    rope has no factor/attn-factor support) instead of mis-decoding."""
    from fun_asr_gguf_tpu.models.qwen3 import fuse_qwen3_params_q8_mega

    _model, cfg, params = pair
    out = fuse_qwen3_params_q8_mega(dict(params), cfg)
    assert "q8_mega" not in out

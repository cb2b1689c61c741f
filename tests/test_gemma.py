"""Gemma3-family decoder support, verified against HF transformers.

Gemma3 text differs from the qwen/llama family on six axes this suite
exercises end to end: zero-centered (1+w) RMSNorm weights, sandwich
norms (post-attention + post-FFN), GeGLU activation, sqrt(hidden)
embedding scaling, query_pre_attn_scalar attention scaling, and
interleaved sliding-window/global attention with split local/global
rope bases. Reference coverage: ``convert_hf_to_gguf.py:5896``
(Gemma3Model) — the reference's runtime for this arch is llama.dll.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fun_asr_gguf_tpu.tools.convert import (qwen3_config_from_hf,
                                            qwen3_params_from_hf_state)

HF_CFG = dict(
    architectures=["Gemma3ForCausalLM"],
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=32,
    query_pre_attn_scalar=32,
    sliding_window=8,
    sliding_window_pattern=2,
    rope_theta=1_000_000.0,
    rope_local_base_freq=10_000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    max_position_embeddings=512,
)


def _hf_model(seed=1):
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig
    kw = {k: v for k, v in HF_CFG.items() if k != "architectures"}
    torch.manual_seed(seed)
    return Gemma3ForCausalLM(
        Gemma3TextConfig(attention_dropout=0.0, use_cache=True, **kw)
    ).eval()


@pytest.fixture(scope="module")
def pair():
    model = _hf_model()
    cfg = qwen3_config_from_hf(dict(HF_CFG))
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, qwen3_params_from_hf_state(sd, cfg))
    return model, cfg, params


def test_config_mapping():
    cfg = qwen3_config_from_hf(dict(HF_CFG))
    assert cfg.arch == "gemma3" and cfg.post_norms and cfg.qk_norm
    assert cfg.act == "gelu_tanh"
    assert cfg.embed_scale == pytest.approx(8.0)
    assert cfg.attn_scale == pytest.approx(32 ** -0.5)
    assert (cfg.sliding_window, cfg.sliding_pattern) == (8, 2)
    assert cfg.rope_local_theta == pytest.approx(10_000.0)


def test_config_mapping_layer_types():
    hf = dict(HF_CFG)
    del hf["sliding_window_pattern"]
    hf["layer_types"] = ["sliding_attention", "full_attention"] * 2
    cfg = qwen3_config_from_hf(hf)
    assert cfg.sliding_pattern == 2


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
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_sliding_window_actually_masks(pair):
    """Zeroing a key OUTSIDE every sliding layer's window must change
    global-layer outputs only; the config's window is load-bearing."""
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    model, cfg, params = pair
    assert cfg.sliding_window < 20
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 24))
    ids2 = ids.copy()
    ids2[0, 0] = (ids[0, 0] + 1) % cfg.vocab_size   # beyond window of last
    mask = jnp.ones(ids.shape, jnp.float32)
    with torch.no_grad():
        r1 = model(torch.tensor(ids)).logits.numpy()[0, -1]
        r2 = model(torch.tensor(ids2)).logits.numpy()[0, -1]
    g1 = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))[0, -1]
    g2 = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids2)], mask, cfg))[0, -1]
    # both stacks must agree on the DELTA a far-away token causes
    np.testing.assert_allclose(g2 - g1, r2 - r1, rtol=5e-2, atol=5e-3)


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


def test_verify_step_matches_decode(pair):
    """The multi-token verify pass must reproduce T sequential decode
    steps (spec decoding reuses the gemma graph unchanged)."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill,
                                               qwen3_verify_step)

    _model, cfg, params = pair
    rng = np.random.default_rng(3)
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
    """gemma3 GGUF export/import: llama.cpp tensor names (sandwich norms
    as post_attention_norm / post_ffw_norm), config KVs, f16 weights —
    logits must survive the round trip."""
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits

    _model, cfg, params = pair
    path = str(tmp_path / "gemma3_tiny.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
    params2, cfg2, _embed = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.arch == "gemma3" and cfg2.post_norms
    assert cfg2.act == "gelu_tanh"
    assert (cfg2.sliding_window, cfg2.sliding_pattern) == (
        cfg.sliding_window, cfg.sliding_pattern)
    assert cfg2.attn_scale == pytest.approx(cfg.attn_scale)
    assert cfg2.embed_scale == pytest.approx(cfg.embed_scale)

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        params2, params2["embed"][jnp.asarray(ids)], mask, cfg2))
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)  # f16 weights


def test_generate_chunk_matches_stepwise(pair):
    """The chunked device-generation loop (the serving path) must emit
    the same greedy ids as manual step-by-step decode for gemma."""
    from fun_asr_gguf_tpu.models.generate import (generate_chunk,
                                                  prefill_init)
    from fun_asr_gguf_tpu.models.qwen3 import (pack_qwen3_params,
                                               qwen3_decode_step,
                                               qwen3_prefill)

    _model, cfg, params = pair
    rng = np.random.default_rng(7)
    p, n_new = 10, 8
    ids = rng.integers(0, cfg.vocab_size, size=(1, p))
    embeds = params["embed"][jnp.asarray(ids)].astype(jnp.float32)
    mask = jnp.ones((1, p), jnp.float32)

    logits, kv = qwen3_prefill(params, embeds, mask, cfg,
                               kv_max_len=p + n_new)
    want = [int(jnp.argmax(logits[0]))]
    for t in range(n_new - 1):
        emb = params["embed"][jnp.asarray([want[-1]])].astype(jnp.float32)
        logits, kv = qwen3_decode_step(
            params, kv, emb, jnp.asarray(p + t, jnp.int32),
            jnp.asarray([p + t], jnp.int32), jnp.asarray([0], jnp.int32),
            cfg)
        want.append(int(jnp.argmax(logits[0])))

    packed = pack_qwen3_params(params)
    st = prefill_init(packed, embeds, mask, jax.random.PRNGKey(0), cfg,
                      max_len=p + n_new)
    st, toks = generate_chunk(packed, st, cfg, jnp.asarray(0.0),
                              jnp.asarray(1.0), 50, chunk_len=n_new,
                              stop_tokens=(), greedy=True)
    got = [int(t) for t in np.asarray(toks)[0] if t >= 0]
    assert got == want


def test_int8_quantized_close_to_fp32(pair):
    """The serving default (per-channel int8 weights) must track the
    fp32 gemma logits closely."""
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_forward_logits,
                                               quantize_qwen3_params_int8)

    _model, cfg, params = pair
    qp = quantize_qwen3_params_int8(params)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    mask = jnp.ones(ids.shape, jnp.float32)
    a = np.asarray(qwen3_forward_logits(
        params, params["embed"][jnp.asarray(ids)], mask, cfg))
    b = np.asarray(qwen3_forward_logits(
        qp, params["embed"][jnp.asarray(ids)], mask, cfg))
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
    assert np.array_equal(a[0, -1].argmax(), b[0, -1].argmax())


def test_final_softcap_applied():
    from fun_asr_gguf_tpu.models.config import Qwen3Config
    from fun_asr_gguf_tpu.models.qwen3 import _logits, init_qwen3_params

    cfg = Qwen3Config(hidden=32, n_layers=1, q_heads=2, kv_heads=1,
                      head_dim=16, ffn_dim=48, vocab_size=16,
                      final_softcap=5.0)
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jnp.ones((1, 32), jnp.float32) * 100.0
    out = np.asarray(_logits(params, x, cfg))
    assert np.all(np.abs(out) <= 5.0 + 1e-5)


# ---------------------------------------------------------------------------
# Gemma2 (reference converter: Gemma2Model): sandwich norms like gemma3
# but NO qk-norm, ATTENTION-logit softcapping (cap·tanh(s/cap) on the
# scaled scores, pre-mask), alternating sliding/global from layer 0, and
# one rope base for both branches.
# ---------------------------------------------------------------------------

HF_CFG2 = dict(
    architectures=["Gemma2ForCausalLM"],
    vocab_size=97,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=2,
    num_key_value_heads=1,
    head_dim=32,
    query_pre_attn_scalar=32,
    sliding_window=8,
    attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0,
    rope_theta=10_000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    max_position_embeddings=512,
)


def _hf_model2(seed=3):
    from transformers import Gemma2Config, Gemma2ForCausalLM
    kw = {k: v for k, v in HF_CFG2.items() if k != "architectures"}
    torch.manual_seed(seed)
    return Gemma2ForCausalLM(
        Gemma2Config(attention_dropout=0.0, use_cache=True,
                     hidden_activation="gelu_pytorch_tanh", **kw)
    ).eval()


@pytest.fixture(scope="module")
def pair2():
    model = _hf_model2()
    cfg = qwen3_config_from_hf(dict(HF_CFG2))
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, qwen3_params_from_hf_state(sd, cfg))
    return model, cfg, params


def test_gemma2_config_mapping():
    cfg = qwen3_config_from_hf(dict(HF_CFG2))
    assert cfg.arch == "gemma2" and cfg.post_norms and not cfg.qk_norm
    assert cfg.act == "gelu_tanh"
    assert cfg.attn_softcap == pytest.approx(50.0)
    assert cfg.final_softcap == pytest.approx(30.0)
    assert (cfg.sliding_window, cfg.sliding_pattern) == (8, 2)
    assert cfg.rope_local_theta == pytest.approx(cfg.rope_theta)
    assert cfg.attn_scale == pytest.approx(32 ** -0.5)


def test_gemma2_logits_match_hf(pair2):
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
    model, cfg, params = pair2
    rng = np.random.default_rng(0)
    # sequence longer than the sliding window so BOTH the softcap and
    # the alternating mask bite
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    got = np.asarray(qwen3_forward_logits(params, embeds, mask, cfg))
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99999
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_gemma2_greedy_ids_match_hf_generate(pair2):
    from fun_asr_gguf_tpu.models.qwen3 import (qwen3_decode_step,
                                               qwen3_prefill)
    model, cfg, params = pair2
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


def test_gemma2_attn_softcap_actually_bites(pair2):
    """Zeroing attn_softcap must CHANGE the logits — guards against the
    softcap silently not being applied on some path."""
    from dataclasses import replace
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
    _, cfg, params = pair2
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16))
    embeds = params["embed"][jnp.asarray(ids)]
    mask = jnp.ones(ids.shape, jnp.float32)
    # random tiny weights keep scores << 50, where tanh is ~identity;
    # a small cap makes any missing-application bug unmissable
    with_cap = np.asarray(qwen3_forward_logits(
        params, embeds, mask, replace(cfg, attn_softcap=0.05)))
    without = np.asarray(qwen3_forward_logits(
        params, embeds, mask, replace(cfg, attn_softcap=0.0)))
    assert not np.allclose(with_cap, without, atol=1e-4)


def test_gemma2_gguf_round_trip(pair2, tmp_path):
    from fun_asr_gguf_tpu.formats.gguf import GGUFReader
    from fun_asr_gguf_tpu.models.loaders import (load_qwen3_from_gguf,
                                                 save_qwen3_to_gguf)
    from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
    _, cfg, params = pair2
    path = str(tmp_path / "gemma2_tiny.gguf")
    save_qwen3_to_gguf(path, params, cfg, quantize_q8_0=False)
    fields = GGUFReader(path).fields
    assert fields["gemma2.attn_logit_softcapping"] == pytest.approx(50.0)
    params2, cfg2, _ = load_qwen3_from_gguf(path, dtype=jnp.float32)
    assert cfg2.arch == "gemma2" and cfg2.post_norms
    assert cfg2.attn_softcap == pytest.approx(50.0)
    assert cfg2.sliding_pattern == 2
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 10))
    e1 = params["embed"][jnp.asarray(ids)]
    e2 = params2["embed"][jnp.asarray(ids)]
    m = jnp.ones(ids.shape, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(qwen3_forward_logits(params, e1, m, cfg)),
        np.asarray(qwen3_forward_logits(params2, e2, m, cfg2)),
        rtol=2e-3, atol=2e-3)


def test_gemma2_null_sliding_window_is_global():
    """HF sliding_window: null means global attention everywhere; the
    converter must not leave pattern=2 with window=0 (empty masks ->
    NaN logits)."""
    hf = dict(HF_CFG2)
    hf["sliding_window"] = None
    cfg = qwen3_config_from_hf(hf)
    assert cfg.sliding_pattern == 0 and cfg.sliding_window == 0

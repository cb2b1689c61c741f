# coding: utf-8
"""Cross-implementation parity vs the reference torch stack.

Round-1 review finding: every numerical test compared the JAX code against
itself. These tests load *identical* weights into the reference's own torch
model definitions (``/root/reference/fun_asr_gguf/model_definition.py``,
imported as-is) / HF ``transformers`` Qwen3 and into our JAX stack, then
assert the outputs agree to the experience docs' criterion
(cosine > 0.99999, ``experience/02…md §1``). A transposed weight, wrong
norm placement, wrong mel filterbank, or wrong rope convention anywhere
fails here.

Layers covered:
* frontend (mean-norm, pre-emphasis, STFT-conv, log-mel, LFR, trim) vs
  ``EncoderExportWrapperPaddable`` steps 0-3 (model_definition.py:269-311);
* full-size 70-layer SANM encoder + adaptor vs the torch wrapper;
* CTC decoder+projection vs ``CTCHeadExportWrapper``;
* Qwen3 (prefill, KV decode steps, logits) vs ``transformers`` Qwen3;
* engine-level end-to-end equivalence (slow): same weights → identical CTC
  text and identical greedy token ids.

The mel filterbank itself cannot be cross-checked here (torchaudio is not
installed in this environment); its construction mirrors
``torchaudio.functional.melscale_fbanks(..., 'htk')`` per
``01-Export-Encoder-Adaptor-CTC.py:102`` and both sides below consume OUR
fbank matrix, so everything downstream of it is covered.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

_REF = "/root/reference/fun_asr_gguf/model_definition.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference model_definition.py absent")


def _cos(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 1.0 if np.allclose(a, b) else 0.0
    return float(a @ b / denom)


@pytest.fixture(scope="module")
def md():
    spec = importlib.util.spec_from_file_location("ref_model_definition",
                                                  _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Frontend: STFT → mel → LFR → trim   (model_definition.py:262-323)
# ---------------------------------------------------------------------------

class _IdEncoder(torch.nn.Module):
    def forward(self, x, mask):
        return x


class _IdAdaptor(torch.nn.Module):
    def forward(self, x, mask):
        return x, mask


class _IdHybrid(torch.nn.Module):
    """Identity encoder/adaptor: the wrapper output becomes the frontend's
    LFR features (masked) and the target-length-trimmed copy."""

    def __init__(self):
        super().__init__()
        self.audio_encoder = _IdEncoder()
        self.audio_adaptor = _IdAdaptor()


def _torch_wrapper(md, hybrid):
    from fun_asr_gguf_tpu.frontend import FrontendConfig, mel_filterbank
    stft = md.STFT_Process(n_fft=400, win_length=400, hop_len=160).eval()
    fbank = torch.from_numpy(mel_filterbank(FrontendConfig())[None])
    return md.EncoderExportWrapperPaddable(hybrid, stft, fbank).eval()


def _mk_audio(n_window, n_valid, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_valid) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 880 * t + 0.7)
           + 0.05 * rng.normal(size=n_valid)).astype(np.float32)
    buf = np.zeros(n_window, np.float32)
    buf[:n_valid] = sig
    return buf


class TestFrontendParity:
    def test_lfr_features_match_torch(self, md):
        from fun_asr_gguf_tpu.frontend import (FrontendConfig,
                                               compute_lfr_features,
                                               frontend_constants)
        cfg = FrontendConfig()
        n_window, n_valid = 32000, 25600
        buf = _mk_audio(n_window, n_valid)

        wrapper = _torch_wrapper(md, _IdHybrid())
        with torch.no_grad():
            enc_t, final_t = wrapper(
                torch.from_numpy(buf)[None, None, :],
                torch.tensor([n_valid], dtype=torch.long))

        consts = jax.tree_util.tree_map(jnp.asarray, frontend_constants(cfg))
        x, mask = compute_lfr_features(consts, jnp.asarray(buf)[None],
                                       jnp.asarray([n_valid], jnp.int32),
                                       cfg)

        enc_t = enc_t.numpy()
        x = np.asarray(x)
        assert enc_t.shape == x.shape
        assert _cos(enc_t, x) > 0.99999
        np.testing.assert_allclose(x, enc_t, rtol=2e-4, atol=2e-4)

        # trim masking (target_len formula, model_definition.py:317-321)
        from fun_asr_gguf_tpu.frontend import audio_token_length
        tl = audio_token_length(n_valid, cfg)
        final_t = final_t.numpy()
        keep = (np.arange(x.shape[1]) < tl).astype(np.float32)
        np.testing.assert_allclose(x * keep[None, :, None], final_t,
                                   rtol=2e-4, atol=2e-4)

    def test_frame_counts_and_mask(self, md):
        from fun_asr_gguf_tpu.frontend import (FrontendConfig,
                                               compute_lfr_features,
                                               frontend_constants)
        cfg = FrontendConfig()
        consts = jax.tree_util.tree_map(jnp.asarray, frontend_constants(cfg))
        wrapper = _torch_wrapper(md, _IdHybrid())
        for n_valid in (4000, 16000, 31999):
            buf = _mk_audio(32000, n_valid, seed=n_valid)
            with torch.no_grad():
                enc_t, _ = wrapper(torch.from_numpy(buf)[None, None, :],
                                   torch.tensor([n_valid], dtype=torch.long))
            x, mask = compute_lfr_features(
                consts, jnp.asarray(buf)[None],
                jnp.asarray([n_valid], jnp.int32), cfg)
            assert enc_t.shape[1] == x.shape[1]
            # valid frame count: ceil((n//160+1)/6), mask zeros the rest
            t_valid = (n_valid // 160 + 1 + 5) // 6
            assert int(np.asarray(mask).sum()) == t_valid
            np.testing.assert_allclose(np.asarray(x), enc_t.numpy(),
                                       rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Reduced-width encoder + adaptor + CTC head (default-run parity)
# ---------------------------------------------------------------------------

class TestReducedEncoderParity:
    """Per-layer math parity at reduced width (in 72, d 64, 2+1 layers),
    assembled from the REFERENCE's own modules (EncoderLayerSANM,
    MultiHeadedAttentionSANM, CorrectTransformerAdaptor, CTC) so the
    default run keeps torch-vs-JAX coverage while the 200 M-param
    full-size fixtures live behind ``--runslow`` (they cost ~4.5 min of
    CPU per suite run). Weights travel through the production
    ``load_encoder_from_pt`` mapping, same as the full-size test."""

    IN, D, HEADS, FFN, KERNEL = 72, 64, 4, 128, 11
    N_MID, N_TP = 1, 1
    VOCAB = 97

    @pytest.fixture(scope="class")
    def mini(self, md, tmp_path_factory):
        from fun_asr_gguf_tpu.models.config import (AdaptorConfig,
                                                    CTCHeadConfig,
                                                    EncoderConfig)
        from fun_asr_gguf_tpu.models.loaders import load_encoder_from_pt
        torch.manual_seed(3)
        IN, D, H, F, K = self.IN, self.D, self.HEADS, self.FFN, self.KERNEL

        def sanm(in_size):
            return md.EncoderLayerSANM(
                in_size, D,
                md.MultiHeadedAttentionSANM(H, in_size, D, 0.0, K),
                md.PositionwiseFeedForward(D, F, 0.0), 0.0)

        class MiniHybrid(torch.nn.Module):
            def __init__(s):
                super().__init__()
                enc = torch.nn.Module()
                enc.embed = md.SinusoidalPositionEncoder()
                enc.encoders0 = torch.nn.ModuleList([sanm(IN)])
                enc.encoders = torch.nn.ModuleList(
                    [sanm(D) for _ in range(self.N_MID)])
                enc.tp_encoders = torch.nn.ModuleList(
                    [sanm(D) for _ in range(self.N_TP)])
                enc.after_norm = md.LayerNorm(D)
                enc.tp_norm = md.LayerNorm(D)
                s.audio_encoder = enc
                s.audio_adaptor = md.CorrectTransformerAdaptor(1, D, D, 96, 2)
                s.ctc_decoder = md.CorrectTransformerAdaptor(1, D, D, 96, 2)
                s.ctc_proj = md.CTC(self.VOCAB, D)

            def encode(s, x, mask):
                # mirrors SenseVoiceEncoderSmall.forward with d_model = D
                e = s.audio_encoder
                x = e.embed(x * (D ** 0.5), mask)
                for layer in e.encoders0:
                    x, _ = layer(x, mask)
                for layer in e.encoders:
                    x, _ = layer(x, mask)
                x = e.after_norm(x)
                if mask is not None:
                    x = x * mask.unsqueeze(-1)
                for layer in e.tp_encoders:
                    x, _ = layer(x, mask)
                x = e.tp_norm(x)
                if mask is not None:
                    x = x * mask.unsqueeze(-1)
                return x

        hyb = MiniHybrid().eval()
        pt = str(tmp_path_factory.mktemp("mini_sd") / "model.pt")
        torch.save(hyb.state_dict(), pt)
        enc_cfg = EncoderConfig(input_size=IN, d_model=D, heads=H,
                                ffn_dim=F, num_blocks=1 + self.N_MID,
                                tp_blocks=self.N_TP, kernel_size=K)
        ad_cfg = AdaptorConfig(in_dim=D, out_dim=D, ffn_dim=96, n_layers=2)
        ctc_cfg = CTCHeadConfig(
            adaptor=AdaptorConfig(in_dim=D, out_dim=D, ffn_dim=96,
                                  n_layers=2),
            vocab_size=self.VOCAB)
        params = load_encoder_from_pt(pt, enc_cfg=enc_cfg, ad_cfg=ad_cfg,
                                      ctc_cfg=ctc_cfg, dtype=jnp.float32)
        return hyb, params, enc_cfg, ad_cfg, ctc_cfg

    @pytest.fixture(scope="class")
    def features(self):
        rng = np.random.default_rng(11)
        t, t_valid = 48, 37
        x = rng.normal(size=(1, t, self.IN)).astype(np.float32) * 0.5
        mask = (np.arange(t) < t_valid).astype(np.float32)[None]
        return x, mask

    def test_encoder_matches_torch(self, mini, features):
        from fun_asr_gguf_tpu.models.sanm import encoder_forward
        hyb, (enc_p, _, _), enc_cfg, _, _ = mini
        x, mask = features
        with torch.no_grad():
            enc_t = hyb.encode(torch.from_numpy(x),
                               torch.from_numpy(mask)).numpy()
        enc_j = np.asarray(encoder_forward(
            enc_p, jnp.asarray(x), jnp.asarray(mask), enc_cfg))
        assert enc_t.shape == enc_j.shape
        assert _cos(enc_t, enc_j) > 0.99999
        np.testing.assert_allclose(enc_j, enc_t, rtol=2e-4, atol=2e-4)

    def test_adaptor_matches_torch(self, mini, features):
        from fun_asr_gguf_tpu.models.adaptor import adaptor_forward
        hyb, (enc_p, ada_p, _), enc_cfg, ad_cfg, _ = mini
        x, mask = features
        with torch.no_grad():
            enc_t = hyb.encode(torch.from_numpy(x), torch.from_numpy(mask))
            out_t, _ = hyb.audio_adaptor(enc_t, torch.from_numpy(mask))
        out_j = np.asarray(adaptor_forward(
            ada_p, jnp.asarray(enc_t.numpy()), jnp.asarray(mask), ad_cfg))
        assert _cos(out_t.numpy(), out_j) > 0.99999

    def test_ctc_head_matches_torch(self, mini, features):
        from fun_asr_gguf_tpu.models.adaptor import (ctc_head_forward,
                                                     ctc_logits_forward)
        hyb, (enc_p, _, ctc_p), enc_cfg, _, ctc_cfg = mini
        x, mask = features
        with torch.no_grad():
            enc_t = hyb.encode(torch.from_numpy(x), torch.from_numpy(mask))
            h, _ = hyb.ctc_decoder(enc_t, None)
            logits_t = hyb.ctc_proj(h).numpy()
        logits_j = np.asarray(ctc_logits_forward(
            ctc_p, jnp.asarray(enc_t.numpy()), ctc_cfg))
        assert _cos(logits_t, logits_j) > 0.99999
        np.testing.assert_array_equal(
            np.argmax(logits_t, -1), np.asarray(ctc_head_forward(
                ctc_p, jnp.asarray(enc_t.numpy()), ctc_cfg)))


# ---------------------------------------------------------------------------
# Full-size encoder + adaptor + CTC head, identical weights
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def torch_hybrid(md):
    torch.manual_seed(0)
    h = md.HybridSenseVoice()
    h.eval()
    return h


@pytest.fixture(scope="module")
def jax_encoder_params(torch_hybrid, tmp_path_factory):
    """Weights travel through the PRODUCTION loader (torch sd → model.pt →
    load_encoder_from_pt) so the key mapping itself is under test."""
    from fun_asr_gguf_tpu.models.loaders import load_encoder_from_pt
    pt = str(tmp_path_factory.mktemp("ref_sd") / "model.pt")
    torch.save(torch_hybrid.state_dict(), pt)
    return load_encoder_from_pt(pt, dtype=jnp.float32)


@pytest.mark.slow
class TestEncoderParity:
    """70-layer SANM + adaptor vs the reference torch classes (full size;
    slow — building + running the 200 M-param torch fixture costs ~4.5 min
    of CPU; TestReducedEncoderParity keeps the same math under the default
    run)."""

    @pytest.fixture(scope="class")
    def outputs(self, md, torch_hybrid, jax_encoder_params):
        from fun_asr_gguf_tpu.models.audio_encoder import (
            AudioEncoderConfig, audio_encoder_forward,
            make_frontend_constants)
        enc_p, ada_p, _ = jax_encoder_params
        cfg = AudioEncoderConfig()
        n_window, n_valid = 32000, 25600
        buf = _mk_audio(n_window, n_valid, seed=7)

        wrapper = _torch_wrapper(md, torch_hybrid)
        with torch.no_grad():
            enc_t, final_t = wrapper(
                torch.from_numpy(buf)[None, None, :],
                torch.tensor([n_valid], dtype=torch.long))

        consts = jax.tree_util.tree_map(
            jnp.asarray, make_frontend_constants(cfg))
        enc_j, embd_j, _ = audio_encoder_forward(
            {"encoder": enc_p, "adaptor": ada_p}, consts,
            jnp.asarray(buf)[None], jnp.asarray([n_valid], jnp.int32),
            cfg=cfg, compute_dtype=jnp.float32)
        return (enc_t.numpy(), final_t.numpy(), np.asarray(enc_j),
                np.asarray(embd_j))

    def test_encoder_output_cosine(self, outputs):
        enc_t, _, enc_j, _ = outputs
        assert enc_t.shape == enc_j.shape
        assert _cos(enc_t, enc_j) > 0.99999
        # per-frame agreement too, not just global average
        for f in range(0, enc_t.shape[1], 7):
            assert _cos(enc_t[0, f], enc_j[0, f]) > 0.9999

    def test_adaptor_output_cosine(self, outputs):
        _, final_t, _, embd_j = outputs
        assert final_t.shape == embd_j.shape
        assert _cos(final_t, embd_j) > 0.99999

    def test_ctc_head_matches(self, torch_hybrid, jax_encoder_params,
                              outputs):
        from fun_asr_gguf_tpu.models.adaptor import (ctc_head_forward,
                                                     ctc_logits_forward)
        from fun_asr_gguf_tpu.models.config import CTCHeadConfig
        _, _, _, ctc_p = (*jax_encoder_params, None)[:4]
        ctc_p = jax_encoder_params[2]
        enc_t = outputs[0]
        cfg = CTCHeadConfig()
        with torch.no_grad():
            enc_tt = torch.from_numpy(enc_t)
            h, _ = torch_hybrid.ctc_decoder(enc_tt, None)
            logits_t = torch_hybrid.ctc_proj(h).numpy()
            idx_t = np.argmax(logits_t, axis=-1).astype(np.int32)

        logits_j = np.asarray(
            ctc_logits_forward(ctc_p, jnp.asarray(enc_t), cfg))
        idx_j = np.asarray(ctc_head_forward(ctc_p, jnp.asarray(enc_t), cfg))
        assert _cos(logits_t, logits_j) > 0.99999
        # argmax indices identical (timestamps + hotword recall depend on
        # these exact ids)
        np.testing.assert_array_equal(idx_t, idx_j)

    @pytest.mark.slow
    def test_full_60s_window(self, md, torch_hybrid, jax_encoder_params):
        """One full-size 60 s static-window run (the production shape)."""
        from fun_asr_gguf_tpu.models.audio_encoder import (
            AudioEncoderConfig, audio_encoder_forward,
            make_frontend_constants)
        enc_p, ada_p, _ = jax_encoder_params
        cfg = AudioEncoderConfig()
        n_window, n_valid = 16000 * 60, 16000 * 53
        buf = _mk_audio(n_window, n_valid, seed=9)
        wrapper = _torch_wrapper(md, torch_hybrid)
        with torch.no_grad():
            enc_t, final_t = wrapper(
                torch.from_numpy(buf)[None, None, :],
                torch.tensor([n_valid], dtype=torch.long))
        consts = jax.tree_util.tree_map(
            jnp.asarray, make_frontend_constants(cfg))
        enc_j, embd_j, _ = audio_encoder_forward(
            {"encoder": enc_p, "adaptor": ada_p}, consts,
            jnp.asarray(buf)[None], jnp.asarray([n_valid], jnp.int32),
            cfg=cfg, compute_dtype=jnp.float32)
        assert _cos(enc_t.numpy(), np.asarray(enc_j)) > 0.99999
        assert _cos(final_t.numpy(), np.asarray(embd_j)) > 0.99999


# ---------------------------------------------------------------------------
# Qwen3 vs HF transformers
# ---------------------------------------------------------------------------

def _hf_qwen3(my_cfg, seed=1):
    from transformers import Qwen3Config as HFConfig
    from transformers import Qwen3ForCausalLM
    hf_cfg = HFConfig(
        vocab_size=my_cfg.vocab_size,
        hidden_size=my_cfg.hidden,
        intermediate_size=my_cfg.ffn_dim,
        num_hidden_layers=my_cfg.n_layers,
        num_attention_heads=my_cfg.q_heads,
        num_key_value_heads=my_cfg.kv_heads,
        head_dim=my_cfg.head_dim,
        rope_theta=my_cfg.rope_theta,
        rms_norm_eps=my_cfg.rms_eps,
        tie_word_embeddings=my_cfg.tie_embeddings,
        attention_dropout=0.0,
        max_position_embeddings=my_cfg.max_position,
        use_cache=True,
    )
    torch.manual_seed(seed)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    return model


def _my_params_from_hf(model, my_cfg):
    from fun_asr_gguf_tpu.tools.convert import qwen3_params_from_hf_state
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params = qwen3_params_from_hf_state(sd, my_cfg)
    return jax.tree_util.tree_map(jnp.asarray, params)


def _greedy_jax(params, cfg, prompt_ids, n_new):
    """Greedy ids via prefill + per-token KV decode steps (the production
    decode primitive, ``models/qwen3.py``)."""
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


class TestQwen3Parity:
    @pytest.fixture(scope="class")
    def tiny(self):
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        cfg = Qwen3Config.tiny(vocab_size=512)
        model = _hf_qwen3(cfg)
        params = _my_params_from_hf(model, cfg)
        return model, params, cfg

    def test_full_logits_match(self, tiny):
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        model, params, cfg = tiny
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
        np.testing.assert_allclose(my_logits, hf_logits, rtol=2e-4,
                                   atol=2e-4)

    def test_left_padded_logits_match(self, tiny):
        """Left-padded prompts (our static prefill buckets) must agree with
        HF run on the unpadded sequence."""
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        model, params, cfg = tiny
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, size=10)
        pad = 6
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.from_numpy(ids)[None],
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            ).logits.numpy()
        padded = np.concatenate([np.zeros(pad, np.int64), ids])
        mask = np.concatenate([np.zeros(pad), np.ones(len(ids))])
        embeds = params["embed"][jnp.asarray(padded)][None]
        my_logits = np.asarray(qwen3_forward_logits(
            params, embeds, jnp.asarray(mask)[None].astype(jnp.float32),
            cfg))[:, pad:]
        assert _cos(hf_logits, my_logits) > 0.99999
        np.testing.assert_allclose(my_logits, hf_logits, rtol=3e-4,
                                   atol=3e-4)

    def test_greedy_ids_match_hf_generate(self, tiny):
        model, params, cfg = tiny
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, size=12)
        n_new = 16
        with torch.no_grad():
            hf_ids = model.generate(
                input_ids=torch.from_numpy(ids)[None],
                do_sample=False, max_new_tokens=n_new, eos_token_id=None,
                pad_token_id=0,
            )[0, len(ids):].numpy().tolist()
        my_ids = _greedy_jax(params, cfg, ids.tolist(), n_new)
        assert my_ids == hf_ids

    @pytest.mark.slow
    def test_fullsize_qwen3_0_6b_logits(self):
        """Qwen3-0.6B production dims (28 layers, GQA 16/8, head_dim 128,
        vocab 151936) vs HF, random weights."""
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models.qwen3 import qwen3_forward_logits
        cfg = Qwen3Config()
        model = _hf_qwen3(cfg, seed=3)
        params = _my_params_from_hf(model, cfg)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 150000, size=16)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.from_numpy(ids)[None],
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            ).logits.numpy()
        embeds = params["embed"][jnp.asarray(ids)][None]
        my_logits = np.asarray(qwen3_forward_logits(
            params, embeds, jnp.ones((1, len(ids)), jnp.float32), cfg))
        assert _cos(hf_logits, my_logits) > 0.99999
        # greedy next-token decisions identical at every position
        np.testing.assert_array_equal(my_logits.argmax(-1),
                                      hf_logits.argmax(-1))


# ---------------------------------------------------------------------------
# End-to-end engine equivalence (the CER-parity proxy): same weights →
# identical CTC text + identical greedy LLM ids/text.
# Real-weight CER remains blocked on the missing model blobs
# (reference .MISSING_LARGE_BLOBS) — this is the strongest available
# accuracy evidence: the engine computes the same function as the
# reference-style torch pipeline.
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestEndToEndEquivalence:
    @pytest.fixture(scope="class")
    def setup(self, md, torch_hybrid, jax_encoder_params, tmp_path_factory):
        import base64

        from fun_asr_gguf_tpu.models.config import HybridConfig, Qwen3Config
        from fun_asr_gguf_tpu.models.loaders import save_checkpoint
        from fun_asr_gguf_tpu.tools.convert import qwen3_params_from_hf_state

        llm_cfg = Qwen3Config(hidden=1024, n_layers=2, q_heads=8,
                              kv_heads=4, head_dim=64, ffn_dim=512,
                              vocab_size=4096, rope_theta=1e6)
        hf = _hf_qwen3(llm_cfg, seed=5)
        # round both sides through f16 so the GGUF (f16 tensors) and the
        # HF model consume bit-identical weights
        sd16 = {k: v.detach().half().float()
                for k, v in hf.state_dict().items()}
        hf.load_state_dict(sd16, strict=False)
        llm_params = qwen3_params_from_hf_state(
            {k: v.numpy() for k, v in sd16.items()}, llm_cfg)

        enc_p, ada_p, ctc_p = jax_encoder_params
        cfg = HybridConfig(llm=llm_cfg)
        ckpt = str(tmp_path_factory.mktemp("xckpt") / "model")
        save_checkpoint(ckpt, cfg, enc_p, ada_p, ctc_p,
                        jax.tree_util.tree_map(jnp.asarray, llm_params),
                        quantize_q8_0=False)

        # synthetic CTC vocab, full 60515 layout (blank last)
        lines = []
        for i in range(cfg.ctc.vocab_size):
            if i == cfg.ctc.vocab_size - 1:
                tok = "<blk>"
            else:
                tok = base64.b64encode(
                    f"<{i}>".encode()).decode()
            lines.append(f"{tok} {i}")
        with open(os.path.join(ckpt, "tokens.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        return ckpt, cfg, hf

    def test_engine_matches_torch_pipeline(self, setup, md, torch_hybrid,
                                           tmp_path):
        from fun_asr_gguf_tpu.audio import write_wav
        n_valid = int(16000 * 3.5)
        window = 16000 * 4
        buf = _mk_audio(window, n_valid, seed=21)
        wav = str(tmp_path / "x.wav")
        write_wav(wav, buf[:n_valid], 16000)
        self._check_equivalence(setup, md, torch_hybrid, wav, buf, n_valid)

    def test_engine_matches_torch_on_reference_mp3(self, setup, md,
                                                   torch_hybrid, tmp_path):
        """The same cross-implementation equivalence on the reference's
        real 60 s Chinese clip (decoded through the engine's audio path,
        native FFmpeg decoder when built) instead of synthetic tones.
        First 3.5 s only — the torch stack is CPU-bound. The slice
        round-trips through write_wav/load_audio so both stacks consume
        bit-identical PCM (write_wav quantizes to int16)."""
        mp3 = "/root/reference/input.mp3"
        if not os.path.exists(mp3):
            pytest.skip("reference input.mp3 not present")
        from fun_asr_gguf_tpu.audio import load_audio, write_wav
        from fun_asr_gguf_tpu.native import audio_decoder_available
        if not audio_decoder_available():
            # the decoder .so is built, not checked in — build it here so
            # a fresh clone's --runslow run doesn't fail on a make step
            import subprocess
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           capture_output=True, timeout=300)
            import fun_asr_gguf_tpu.native as native_mod
            native_mod._audio_lib = None   # drop the cached miss
        try:
            audio = load_audio(mp3, 16000)
        except RuntimeError as e:
            pytest.skip(f"no mp3 decoder available in this env: {e}")
        n_valid = int(16000 * 3.5)
        window = 16000 * 4
        wav = str(tmp_path / "ref.wav")
        write_wav(wav, audio[:n_valid], 16000)
        pcm = load_audio(wav, 16000)        # engine-identical samples
        assert len(pcm) == n_valid
        buf = np.zeros(window, np.float32)
        buf[:n_valid] = pcm
        self._check_equivalence(setup, md, torch_hybrid, wav, buf, n_valid)

    def _check_equivalence(self, setup, md, torch_hybrid, wav, buf, n_valid):
        ckpt, cfg, hf = setup
        _engine_torch_equivalence(
            md, torch_hybrid, hf, ckpt, wav, buf, n_valid,
            engine_kwargs=dict(segment_pad_seconds=4.0,
                               prefill_buckets=(192,)))


def _engine_torch_equivalence(md, hybrid, hf, ckpt, wav, buf, n_valid, *,
                              n_new=24, engine_kwargs=None):
    """Engine transcribe(wav) vs the reference-style torch pipeline on
    ``buf`` (the same samples the engine loads): identical CTC text,
    identical greedy token ids, identical final text."""
    from fun_asr_gguf_tpu.ctc import decode_ctc
    from fun_asr_gguf_tpu.formats.ctc_vocab import load_ctc_tokens
    from fun_asr_gguf_tpu.frontend import audio_token_length
    from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager

    reset_hotword_manager()
    from fun_asr_gguf_tpu import create_asr_engine
    kwargs = dict(checkpoint_dir=ckpt, verbose=False,
                  compute_dtype="float32", n_predict=n_new,
                  speculative=False)
    kwargs.update(engine_kwargs or {})
    eng = create_asr_engine(**kwargs)
    try:
        res = eng.transcribe(wav, verbose=False, temperature=0.0)

        # ---- reference-style torch pipeline on the same weights ----
        wrapper = _torch_wrapper(md, hybrid)
        with torch.no_grad():
            enc_t, final_t = wrapper(
                torch.from_numpy(buf)[None, None, :],
                torch.tensor([n_valid], dtype=torch.long))
            ctc_idx = md.CTCHeadExportWrapper(hybrid)(
                enc_t)[0].numpy()

        id2tok = load_ctc_tokens(os.path.join(ckpt, "tokens.txt"))
        ctc_text_t, _, _ = decode_ctc(ctc_idx, id2tok)
        assert res.ctc_text == ctc_text_t

        # prompt identical to the engine's (no hotwords present)
        p_embd, s_embd, _, _, _ = \
            eng.models.prompt_builder.build_prompt([], None, None)
        tl = audio_token_length(n_valid)
        audio_embd_t = final_t[0, :tl].numpy()
        full_embd = np.concatenate(
            [p_embd, audio_embd_t, s_embd], axis=0).astype(np.float32)

        stop_set = set(eng.models.stop_tokens) | {eng.models.eos_token}
        with torch.no_grad():
            hf_ids = hf.generate(
                inputs_embeds=torch.from_numpy(full_embd)[None],
                attention_mask=torch.ones(1, full_embd.shape[0],
                                          dtype=torch.long),
                do_sample=False, max_new_tokens=n_new,
                eos_token_id=sorted(stop_set), pad_token_id=0,
            )[0].numpy().tolist()

        # (a) my generate stack on the SAME embeds → identical ids
        my_ids = _engine_greedy_ids(eng, full_embd, n_new=n_new)
        assert my_ids[:len(hf_ids)] == hf_ids

        # (b) engine text == HF text (engine uses its own JAX audio
        # embeds — cosine ≈ 1 vs torch — so the greedy path must land
        # on the same tokens)
        gen_ids = [t for t in hf_ids if t not in stop_set]
        hf_text = eng.models.tokenizer.decode(gen_ids).strip()
        assert res.text == hf_text
    finally:
        eng.cleanup()
        reset_hotword_manager()


def _engine_greedy_ids(eng, full_embd, n_new):
    state = eng.models.prefill(full_embd, rng_seed=0)
    out = []
    while len(out) < n_new:
        state, tokens = eng.models.generate(
            state, temperature=0.0, top_p=1.0, top_k=50,
            chunk_len=eng.models._default_chunk_len(),
            limit=min(eng.models._default_chunk_len(),
                      n_new - len(out)))
        toks = [t for t in np.asarray(tokens)[0].tolist() if t >= 0]
        out.extend(toks)
        if bool(np.asarray(state.done)[0]):
            break
    return out


class TestTinyEndToEndEquivalence:
    """The same engine-vs-torch E2E equivalence as
    :class:`TestEndToEndEquivalence`, at reduced width, in the DEFAULT
    gate: a tiny SANM hybrid (560→64, 2+1 layers) + a tiny Qwen3 decode
    through the full engine pipeline vs the reference-style torch
    pipeline (``model_definition.py`` modules) on the same weights.
    Asserts identical CTC text, identical greedy ids vs HF ``generate``,
    identical final text — so every default ``pytest -q`` run exercises
    the encoder-parity and greedy-id-equality paths end-to-end
    (the full-size twin stays behind ``--runslow``)."""

    D, HEADS, FFN, KERNEL = 64, 4, 128, 11

    @pytest.fixture(scope="class")
    def setup(self, md, tmp_path_factory):
        import base64

        from fun_asr_gguf_tpu.models.config import (AdaptorConfig,
                                                    CTCHeadConfig,
                                                    EncoderConfig,
                                                    HybridConfig,
                                                    Qwen3Config)
        from fun_asr_gguf_tpu.models.loaders import (load_encoder_from_pt,
                                                     save_checkpoint)
        from fun_asr_gguf_tpu.tools.convert import qwen3_params_from_hf_state

        torch.manual_seed(7)
        D, H, F, K = self.D, self.HEADS, self.FFN, self.KERNEL
        IN = 560                    # the real frontend's LFR feature width

        def sanm(in_size):
            return md.EncoderLayerSANM(
                in_size, D,
                md.MultiHeadedAttentionSANM(H, in_size, D, 0.0, K),
                md.PositionwiseFeedForward(D, F, 0.0), 0.0)

        class TinyEncoder(torch.nn.Module):
            """SenseVoiceEncoderSmall.forward at reduced width — a real
            forward() so EncoderExportWrapperPaddable can call it."""

            def __init__(s):
                super().__init__()
                s.embed = md.SinusoidalPositionEncoder()
                s.encoders0 = torch.nn.ModuleList([sanm(IN)])
                s.encoders = torch.nn.ModuleList([sanm(D)])
                s.tp_encoders = torch.nn.ModuleList([sanm(D)])
                s.after_norm = md.LayerNorm(D)
                s.tp_norm = md.LayerNorm(D)

            def forward(s, x, mask):
                x = s.embed(x * (D ** 0.5), mask)
                for layer in s.encoders0:
                    x, _ = layer(x, mask)
                for layer in s.encoders:
                    x, _ = layer(x, mask)
                x = s.after_norm(x)
                if mask is not None:
                    x = x * mask.unsqueeze(-1)
                for layer in s.tp_encoders:
                    x, _ = layer(x, mask)
                x = s.tp_norm(x)
                if mask is not None:
                    x = x * mask.unsqueeze(-1)
                return x

        class TinyHybrid(torch.nn.Module):
            def __init__(s):
                super().__init__()
                s.audio_encoder = TinyEncoder()
                s.audio_adaptor = md.CorrectTransformerAdaptor(
                    1, D, D, 96, 2)
                s.ctc_decoder = md.CorrectTransformerAdaptor(
                    1, D, D, 96, 2)
                s.ctc_proj = md.CTC(257, D)

            def encode(s, x, mask):
                return s.audio_encoder(x, mask)

        hybrid = TinyHybrid().eval()
        pt = str(tmp_path_factory.mktemp("tiny_sd") / "model.pt")
        torch.save(hybrid.state_dict(), pt)
        enc_cfg = EncoderConfig(input_size=IN, d_model=D, heads=H,
                                ffn_dim=F, num_blocks=2, tp_blocks=1,
                                kernel_size=K)
        ad_cfg = AdaptorConfig(in_dim=D, out_dim=D, ffn_dim=96, n_layers=2)
        ctc_cfg = CTCHeadConfig(
            adaptor=AdaptorConfig(in_dim=D, out_dim=D, ffn_dim=96,
                                  n_layers=2),
            vocab_size=257)
        enc_p, ada_p, ctc_p = load_encoder_from_pt(
            pt, enc_cfg=enc_cfg, ad_cfg=ad_cfg, ctc_cfg=ctc_cfg,
            dtype=jnp.float32)

        llm_cfg = Qwen3Config.tiny(vocab_size=4096)
        assert llm_cfg.hidden == D, "adaptor out must equal LLM hidden"
        hf = _hf_qwen3(llm_cfg, seed=9)
        sd16 = {k: v.detach().half().float()
                for k, v in hf.state_dict().items()}
        hf.load_state_dict(sd16, strict=False)
        llm_params = qwen3_params_from_hf_state(
            {k: v.numpy() for k, v in sd16.items()}, llm_cfg)

        cfg = HybridConfig(encoder=enc_cfg, adaptor=ad_cfg, ctc=ctc_cfg,
                           llm=llm_cfg)
        ckpt = str(tmp_path_factory.mktemp("tiny_ckpt") / "model")
        save_checkpoint(ckpt, cfg, enc_p, ada_p, ctc_p,
                        jax.tree_util.tree_map(jnp.asarray, llm_params),
                        quantize_q8_0=False)
        lines = []
        for i in range(ctc_cfg.vocab_size):
            tok = ("<blk>" if i == ctc_cfg.vocab_size - 1 else
                   base64.b64encode(f"<{i}>".encode()).decode())
            lines.append(f"{tok} {i}")
        with open(os.path.join(ckpt, "tokens.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        return ckpt, hybrid, hf

    def test_tiny_engine_matches_torch_pipeline(self, setup, md, tmp_path):
        from fun_asr_gguf_tpu.audio import write_wav
        ckpt, hybrid, hf = setup
        n_valid = int(16000 * 1.5)
        window = 16000 * 2
        buf = _mk_audio(window, n_valid, seed=33)
        wav = str(tmp_path / "tiny.wav")
        write_wav(wav, buf[:n_valid], 16000)
        _engine_torch_equivalence(
            md, hybrid, hf, ckpt, wav, buf, n_valid, n_new=16,
            engine_kwargs=dict(segment_pad_seconds=2.0,
                               prefill_buckets=(128,)))

"""Frontend tests: STFT/mel/LFR shapes, formulas, padded-vs-valid parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from fun_asr_gguf_tpu.frontend import (FrontendConfig, audio_token_length,
                                       compute_lfr_features, dft_kernels,
                                       frontend_constants,
                                       hamming_window_periodic,
                                       mel_filterbank)

CFG = FrontendConfig()


class TestConstants:
    def test_hamming_periodic(self):
        w = hamming_window_periodic(400)
        assert w.shape == (400,)
        # periodic window: w[0] = 0.54 - 0.46 = 0.08, and w[200] = 1.0 (peak)
        assert abs(w[0] - 0.08) < 1e-6
        assert abs(w[200] - 1.0) < 1e-6
        # exact parity with torch.hamming_window(400, periodic=True), the
        # window the reference exports into its STFT kernels
        torch = pytest.importorskip("torch")
        ref = torch.hamming_window(400, periodic=True).numpy()
        np.testing.assert_allclose(w, ref, atol=5e-7)

    def test_mel_filterbank_properties(self):
        fb = mel_filterbank(CFG)
        assert fb.shape == (80, 201)
        assert np.all(fb >= 0)
        # each filter is a triangle with a single peak; filters tile 20-8000Hz
        peaks = fb.argmax(axis=1)
        assert np.all(np.diff(peaks) >= 0)
        freqs = np.linspace(0, 8000, 201)
        active = fb.sum(axis=0) > 0
        assert freqs[active].min() >= 20.0 - 40.1  # one bin tolerance
        # no normalization: peak amplitudes near 1 for narrow filters
        assert fb.max() <= 1.0 + 1e-6

    def test_dft_kernels_vs_rfft(self):
        """Windowed DFT matmul must equal windowed rfft."""
        cos_k, sin_k = dft_kernels(CFG)
        rng = np.random.default_rng(0)
        frame = rng.normal(size=(3, 400)).astype(np.float32)
        real = frame @ cos_k
        imag = frame @ sin_k
        w = hamming_window_periodic(400)
        ref = np.fft.rfft(frame * w, n=400, axis=1)
        np.testing.assert_allclose(real, ref.real, atol=2e-3)
        # kernel is -sin, which matches rfft's imag sign convention
        np.testing.assert_allclose(imag, ref.imag, atol=2e-3)


class TestFeatures:
    def test_shapes_60s(self):
        n = 16000 * 60
        cfg = CFG
        assert cfg.n_mel_frames(n) == 6001
        assert cfg.n_lfr_frames(n) == 1001
        assert audio_token_length(n) == 126  # README.md:267 — 60s → 126 tokens

    def test_token_length_table(self):
        # target_len formula spot-checks (nano_onnx.py:124-127)
        for secs, expect in [(1, 3), (10, 21), (30, 63), (60, 126)]:
            n = 16000 * secs
            t_mel = n // 160 + 1
            t_lfr = (t_mel + 5) // 6
            olens1 = 1 + (t_lfr - 3 + 2) // 2
            ref = (1 + (olens1 - 3 + 2) // 2 - 1) // 2 + 1
            assert audio_token_length(n) == ref == expect

    def test_padded_vs_exact_consistency(self):
        """Features of 3s audio padded to 8s must equal the exact-3s run on
        the valid frames — the static-shape correctness invariant
        (experience docs' cosine criterion, here exact equality)."""
        rng = np.random.default_rng(1)
        secs, pad_secs = 3, 8
        n, n_pad = 16000 * secs, 16000 * pad_secs
        audio = rng.normal(size=n).astype(np.float32) * 0.1
        consts = frontend_constants(CFG)

        exact, mask_e = compute_lfr_features(
            consts, jnp.asarray(audio[None]), jnp.asarray([n]), CFG)
        padded_audio = np.zeros(n_pad, dtype=np.float32)
        padded_audio[:n] = audio
        padded, mask_p = compute_lfr_features(
            consts, jnp.asarray(padded_audio[None]), jnp.asarray([n]), CFG)

        t_valid = int(np.asarray(mask_e).sum())
        assert t_valid == (n // 160 + 1 + 5) // 6
        np.testing.assert_allclose(np.asarray(padded)[0, :t_valid],
                                   np.asarray(exact)[0, :t_valid],
                                   rtol=1e-4, atol=1e-4)
        # padding region fully zeroed
        assert np.all(np.asarray(padded)[0, int(np.asarray(mask_p).sum()):] == 0)

    def test_mean_normalization_and_mask(self):
        rng = np.random.default_rng(2)
        n = 16000
        audio = (rng.normal(size=n) + 5.0).astype(np.float32)  # big DC offset
        consts = frontend_constants(CFG)
        x, mask = compute_lfr_features(
            consts, jnp.asarray(audio[None]), jnp.asarray([n]), CFG)
        assert x.shape == (1, CFG.n_lfr_frames(n), 560)
        assert np.isfinite(np.asarray(x)).all()
        # garbage in the padding samples must not change valid output
        audio2 = np.concatenate([audio, rng.normal(size=n).astype(np.float32)])
        x2, _ = compute_lfr_features(
            consts, jnp.asarray(audio2[None]), jnp.asarray([n]), CFG)
        t_valid = int(np.asarray(mask).sum())
        np.testing.assert_allclose(np.asarray(x2)[0, :t_valid],
                                   np.asarray(x)[0, :t_valid],
                                   rtol=1e-4, atol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(3)
        n = 16000 * 2
        audio = rng.normal(size=(2, n)).astype(np.float32)
        ilens = np.array([n, n // 2], dtype=np.int32)
        consts = frontend_constants(CFG)
        x, mask = compute_lfr_features(consts, jnp.asarray(audio),
                                       jnp.asarray(ilens), CFG)
        # row 1 matches its solo run
        x1, _ = compute_lfr_features(consts, jnp.asarray(audio[1:2]),
                                     jnp.asarray(ilens[1:]), CFG)
        np.testing.assert_allclose(np.asarray(x)[1], np.asarray(x1)[0],
                                   rtol=1e-5, atol=1e-5)
        assert int(np.asarray(mask)[1].sum()) == (n // 2 // 160 + 1 + 5) // 6

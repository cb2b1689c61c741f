"""Native C++ kernel tests (skipped when the library isn't built)."""

import numpy as np
import pytest

from fun_asr_gguf_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


class TestFuzzyDistance:
    def test_matches_python(self):
        rng = np.random.default_rng(0)
        for _ in range(25):
            m, n = int(rng.integers(1, 30)), int(rng.integers(1, 10))
            main = rng.integers(1, 6, m).astype(np.int32)
            sub = rng.integers(1, 6, n).astype(np.int32)
            got = native.fuzzy_substring_distance_native(main, sub)
            assert got == _naive(sub.tolist(), main.tolist())

    def test_batch_matches_single(self):
        rng = np.random.default_rng(1)
        main = rng.integers(1, 5, 40).astype(np.int32)
        subs = [rng.integers(1, 5, int(rng.integers(1, 8))).astype(np.int32)
                for _ in range(7)]
        batch = native.fuzzy_substring_distance_batch_native(main, subs)
        for s, d in zip(subs, batch):
            assert d == native.fuzzy_substring_distance_native(main, s)


def _naive(sub, main):
    n, m = len(sub), len(main)
    dp = [[0.0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        dp[i][0] = float(i)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0.0 if sub[i - 1] == main[j - 1] else 1.0
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + cost)
    return min(dp[n])


class TestNWAlign:
    def test_matches_python_reference(self):
        rng = np.random.default_rng(2)
        alphabet = list("abcdef国中文试")
        for _ in range(20):
            s1 = [alphabet[i] for i in rng.integers(0, len(alphabet),
                                                    rng.integers(1, 12))]
            s2 = [alphabet[i] for i in rng.integers(0, len(alphabet),
                                                    rng.integers(1, 12))]
            got = native.nw_align_native(s1, s2)
            # compare against the pure-python reference from test_ctc_align
            from tests.test_ctc_align import _ref_nw
            assert got == _ref_nw(s1, s2)

    def test_case_insensitive(self):
        got = native.nw_align_native(list("ABC"), list("abc"))
        assert got == [0, 1, 2]


class TestWavLoad:
    def test_load_and_resample(self, tmp_path):
        from fun_asr_gguf_tpu.audio import write_wav
        sr = 8000
        t = np.linspace(0, 1.0, sr, endpoint=False)
        sig = 0.5 * np.sin(2 * np.pi * 300 * t)
        path = str(tmp_path / "n.wav")
        write_wav(path, sig, sr)
        out = native.load_wav_mono_native(path, 16000)
        assert out is not None
        assert abs(len(out) - 16000) <= 2
        assert abs(np.std(out) - np.std(sig)) < 0.02

    def test_same_rate_identity(self, tmp_path):
        from fun_asr_gguf_tpu.audio import write_wav
        sig = np.random.default_rng(0).normal(size=16000) * 0.1
        path = str(tmp_path / "s.wav")
        write_wav(path, sig, 16000)
        out = native.load_wav_mono_native(path, 16000)
        np.testing.assert_allclose(out, np.clip(sig, -1, 1), atol=1e-4)

    def test_missing_file(self):
        assert native.load_wav_mono_native("/nonexistent.wav", 16000) is None


@pytest.mark.skipif(not native.audio_decoder_available(),
                    reason="libfunasr_audio not built")
class TestUniversalDecode:
    """MP3 round-trip: lame encode → FFmpeg-lib decode → correlate."""

    def _sine(self, sr, seconds=2.0, freq=440.0):
        t = np.arange(int(sr * seconds)) / sr
        return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float64)

    def test_mp3_roundtrip_correlation(self, tmp_path):
        sr = 16000
        sig = self._sine(sr)
        path = str(tmp_path / "t.mp3")
        assert native.encode_mp3_native(sig, sr, path)
        out = native.decode_audio_native(path, sr)
        assert out is not None
        # mp3 adds codec delay; length within ±0.15 s
        assert abs(len(out) - len(sig)) < 0.15 * sr
        # align by cross-correlation, then demand high similarity
        m = min(len(out), len(sig)) - 4000
        best = max(
            float(np.dot(out[lag:lag + m], sig[:m])
                  / (np.linalg.norm(out[lag:lag + m])
                     * np.linalg.norm(sig[:m]) + 1e-9))
            for lag in range(0, 3000, 8))
        assert best > 0.95

    def test_mp3_resample_to_16k(self, tmp_path):
        sr = 44100
        sig = self._sine(sr, seconds=1.0)
        path = str(tmp_path / "t44.mp3")
        assert native.encode_mp3_native(sig, sr, path)
        out = native.decode_audio_native(path, 16000)
        assert out is not None
        assert abs(len(out) - 16000) < 0.15 * 16000
        assert float(np.abs(out).max()) <= 1.0

    def test_wav_agrees_with_native_wav_loader(self, tmp_path):
        from fun_asr_gguf_tpu.audio import write_wav
        sig = np.random.default_rng(3).normal(size=24000) * 0.2
        path = str(tmp_path / "x.wav")
        write_wav(path, sig, 16000)
        a = native.decode_audio_native(path, 16000)
        b = native.load_wav_mono_native(path, 16000)
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_load_audio_uses_decoder_for_mp3(self, tmp_path):
        from fun_asr_gguf_tpu.audio import load_audio
        sr = 16000
        sig = self._sine(sr)
        path = str(tmp_path / "l.mp3")
        assert native.encode_mp3_native(sig, sr, path)
        out = load_audio(path, sample_rate=sr)
        assert out is not None and len(out) > sr
        # start_second/duration slicing applies post-decode
        sliced = load_audio(path, sample_rate=sr, start_second=0.5,
                            duration=1.0)
        assert len(sliced) == sr

    def test_reference_input_mp3(self):
        import os
        path = "/root/reference/input.mp3"
        if not os.path.exists(path):
            pytest.skip("reference input.mp3 not present")
        out = native.decode_audio_native(path, 16000)
        assert out is not None
        assert abs(len(out) / 16000 - 60.0) < 0.5   # known 60 s clip
        rms = float(np.sqrt(np.mean(out ** 2)))
        assert 0.01 < rms < 0.9

    def test_missing_file(self):
        assert native.decode_audio_native("/nonexistent.mp3", 16000) is None


class TestQ8QuantKernels:
    """native/quant_kernels.cc vs the numpy reference quantizer."""

    def _numpy_ref(self, x):
        # the pre-native numpy path, inlined (q8_0_quantize now prefers
        # the C++ kernel, so the reference is reproduced here)
        x = np.asarray(x, dtype=np.float32)
        k = x.shape[-1]
        blocks = x.reshape(*x.shape[:-1], k // 32, 32)
        d = np.abs(blocks).max(axis=-1, keepdims=True) / 127.0
        # subnormal d flushes to a zero block (shared contract across
        # numpy/C++/on-device paths: 1/d would overflow to inf — UB in
        # ggml's own reference — and the stored fp16 scale underflows
        # to 0 anyway)
        d = np.where(d < np.finfo(np.float32).tiny, 0.0, d)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(d == 0, 0.0, 1.0 / d)
        q = np.where(blocks * inv >= 0, np.floor(blocks * inv + 0.5),
                     np.ceil(blocks * inv - 0.5))
        q = np.clip(q, -127, 127).astype(np.int8)
        return q.reshape(x.shape), d.astype(np.float16).squeeze(-1)

    def test_contiguous_bit_parity(self):
        from fun_asr_gguf_tpu.native import q8_0_quantize_native
        x = np.random.default_rng(0).standard_normal((37, 96)).astype(
            np.float32) * 0.3
        out = q8_0_quantize_native(x)
        if out is None:
            import pytest
            pytest.skip("native library not built")
        qr, dr = self._numpy_ref(x)
        assert np.array_equal(out[0], qr)
        assert np.array_equal(out[1].view(np.uint16), dr.view(np.uint16))

    def test_edge_values_parity(self):
        from fun_asr_gguf_tpu.native import q8_0_quantize_native
        # zero block, subnormal-fp16 scales, fp16-overflow scale, exact
        # rounding ties
        e = np.array([[0.0] * 32,
                      [1e-30] * 32,
                      [70000.0] * 32,
                      [5e-8] * 32,
                      [1e-40] * 32,     # subnormal absmax -> zero block
                      [1e-37] * 32,     # subnormal d (absmax/127)
                      [0.5, -0.5, 1.5, -1.5] * 8], np.float32)
        out = q8_0_quantize_native(e)
        if out is None:
            import pytest
            pytest.skip("native library not built")
        qr, dr = self._numpy_ref(e)
        assert np.array_equal(out[0], qr)
        assert np.array_equal(out[1].view(np.uint16), dr.view(np.uint16))

    def test_transpose_variant(self):
        from fun_asr_gguf_tpu.native import q8_0_quantize_transpose_native
        x = np.random.default_rng(1).standard_normal((64, 41)).astype(
            np.float32)
        out = q8_0_quantize_transpose_native(x)
        if out is None:
            import pytest
            pytest.skip("native library not built")
        qr, dr = self._numpy_ref(np.ascontiguousarray(x.T))
        assert np.array_equal(out[0], qr)
        assert np.array_equal(out[1].view(np.uint16), dr.view(np.uint16))

    def test_pack_blocks(self):
        from fun_asr_gguf_tpu.native import (q8_0_pack_blocks_native,
                                             q8_0_quantize_native)
        from fun_asr_gguf_tpu.formats.quant_np import q8_0_to_blocks
        x = np.random.default_rng(2).standard_normal((8, 64)).astype(
            np.float32)
        out = q8_0_quantize_native(x)
        if out is None:
            import pytest
            pytest.skip("native library not built")
        packed = q8_0_pack_blocks_native(*out)
        assert np.array_equal(packed, q8_0_to_blocks(*out))


class TestDeviceExportQuantize:
    """models/loaders._q8_export_quantize (the on-device export path)
    must produce the same bytes as the host quantizer."""

    def test_matches_host_quantizer(self):
        import jax
        from fun_asr_gguf_tpu.formats.quant_np import q8_0_quantize
        from fun_asr_gguf_tpu.models.loaders import _q8_export_jit
        x = np.random.default_rng(3).standard_normal((48, 64)).astype(
            np.float32)
        q, d = jax.device_get(_q8_export_jit(x, False))
        qr, dr = q8_0_quantize(x)
        assert np.array_equal(q, qr)
        assert np.array_equal(d.view(np.uint16), dr.view(np.uint16))

    def test_transpose_matches(self):
        import jax
        from fun_asr_gguf_tpu.formats.quant_np import q8_0_quantize
        from fun_asr_gguf_tpu.models.loaders import _q8_export_jit
        x = np.random.default_rng(4).standard_normal((64, 48)).astype(
            np.float32)
        q, d = jax.device_get(_q8_export_jit(x, True))
        qr, dr = q8_0_quantize(np.ascontiguousarray(x.T))
        assert np.array_equal(q, qr)
        assert np.array_equal(d.view(np.uint16), dr.view(np.uint16))

    def test_device_export_file_identical(self, tmp_path, monkeypatch):
        """Force the device pre-quantize path on the CPU backend and
        check the written GGUF is byte-identical to the host path."""
        import jax
        from fun_asr_gguf_tpu.models import loaders
        from fun_asr_gguf_tpu.models.config import Qwen3Config
        from fun_asr_gguf_tpu.models.qwen3 import init_qwen3_params
        cfg = Qwen3Config.tiny()
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        f_host = tmp_path / "host.gguf"
        f_dev = tmp_path / "dev.gguf"
        loaders.save_qwen3_to_gguf(str(f_host), params, cfg)
        monkeypatch.setattr(loaders, "_params_platform", lambda p: "tpu")
        loaders.save_qwen3_to_gguf(str(f_dev), params, cfg)
        assert f_host.read_bytes() == f_dev.read_bytes()


class TestFastQ8Checkpoint:
    def test_roundtrip_and_shapes(self, tmp_path):
        from fun_asr_gguf_tpu.models.config import HybridConfig
        from fun_asr_gguf_tpu.models.loaders import (create_random_checkpoint,
                                                     load_checkpoint)
        cfg = HybridConfig.tiny()
        create_random_checkpoint(str(tmp_path), cfg, seed=0, fast_q8=True)
        cfg2, enc, ada, ctc, llm, emb = load_checkpoint(
            str(tmp_path), llm_keep_quantized=True)
        assert cfg2.llm.n_layers == cfg.llm.n_layers
        assert llm["layers"]["q_w"].q.shape[0] == cfg.llm.n_layers
        assert emb.shape == (cfg.llm.vocab_size, cfg.llm.hidden)
        # weights must have a sane scale (std ~0.02) for engine warmup
        import jax
        dq = np.asarray(llm["layers"]["q_w"].q, np.float32)
        assert 0 < np.abs(dq).max() <= 128


class TestQuantizerFuzz:
    def test_random_shapes_and_scales_parity(self):
        """Fuzz numpy-vs-C++ bit parity across shapes and magnitude
        regimes (incl. fp16-overflow and subnormal-scale blocks)."""
        from fun_asr_gguf_tpu.native import q8_0_quantize_native
        from fun_asr_gguf_tpu.formats.quant_np import q8_0_quantize
        if q8_0_quantize_native(np.zeros((1, 32), np.float32)) is None:
            import pytest
            pytest.skip("native library not built")
        rng = np.random.default_rng(123)
        for trial in range(20):
            rows = int(rng.integers(1, 40))
            k = 32 * int(rng.integers(1, 9))
            scale = 10.0 ** rng.uniform(-41, 5)
            x = (rng.standard_normal((rows, k)) * scale).astype(np.float32)
            # sprinkle exact ties and zeros
            x[rng.random(x.shape) < 0.05] = 0.0
            qn, dn = q8_0_quantize_native(x)
            qr, dr = q8_0_quantize(x)
            assert np.array_equal(qn, qr), f"trial {trial} scale {scale}"
            assert np.array_equal(dn.view(np.uint16), dr.view(np.uint16))

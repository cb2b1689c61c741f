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

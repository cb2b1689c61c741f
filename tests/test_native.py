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

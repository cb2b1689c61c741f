"""CTC decode, NW timestamp alignment, text merge, SRT, audio IO tests."""

import numpy as np

from fun_asr_gguf_tpu.audio import load_audio, write_wav
from fun_asr_gguf_tpu.ctc import Token, align_timestamps, decode_ctc, _nw_align
from fun_asr_gguf_tpu.srt_utils import compose_srt, generate_srt_file
from fun_asr_gguf_tpu.text_merge import merge_transcription_results


class TestDecodeCTC:
    ID2TOK = {0: "你", 1: "好", 2: "世", 3: "界", 9: "<blk>"}

    def test_collapse_and_blank(self):
        idx = np.array([9, 9, 0, 0, 9, 1, 1, 1, 9, 9, 2, 3, 9])
        text, toks, _ = decode_ctc(idx, self.ID2TOK)
        assert text == "你好世界"
        assert [t.text for t in toks] == ["你", "好", "世", "界"]

    def test_frame_times(self):
        idx = np.array([0, 9, 9, 9, 9, 9, 1])
        _, toks, _ = decode_ctc(idx, self.ID2TOK)
        # frame 0: max((0*60-240)/1000, 0) = 0; frame 6: (360-240)/1000=0.12
        assert toks[0].start == 0.0
        assert abs(toks[1].start - 0.12) < 1e-9

    def test_logits_path(self):
        logits = np.full((4, 10), -5.0, dtype=np.float16)
        logits[0, 0] = 5.0
        logits[1, 9] = 5.0
        logits[2, 1] = 5.0
        logits[3, 1] = 5.0
        text, toks, times = decode_ctc(logits, self.ID2TOK)
        assert text == "你好"
        assert times["argmax"] > 0

    def test_repeated_separated_tokens_kept(self):
        idx = np.array([0, 9, 0])
        text, _, _ = decode_ctc(idx, self.ID2TOK)
        assert text == "你你"

    def test_empty(self):
        text, toks, _ = decode_ctc(np.array([], dtype=np.int64), self.ID2TOK)
        assert text == "" and toks == []


class TestNWAlign:
    def test_exact_match(self):
        a = _nw_align(list("abcd"), list("abcd"))
        assert a == [0, 1, 2, 3]

    def test_case_insensitive(self):
        a = _nw_align(list("AbCd"), list("aBcD"))
        assert a == [0, 1, 2, 3]

    def test_insertion_in_llm(self):
        # llm has one extra char; others align in order
        a = _nw_align(list("abc"), list("abxc"))
        assert a[0] == 0 and a[1] == 1 and a[3] == 2
        assert a[2] is None

    def test_deletion_in_llm(self):
        a = _nw_align(list("abxc"), list("abc"))
        assert a == [0, 1, 3]

    def test_vectorized_matches_reference_dp(self):
        """Cross-check against a direct O(nm) python NW with the reference's
        scoring and tie-breaks on random strings."""
        rng = np.random.default_rng(0)
        alphabet = list("abcdef")
        for _ in range(20):
            s1 = [alphabet[i] for i in rng.integers(0, 6, rng.integers(1, 15))]
            s2 = [alphabet[i] for i in rng.integers(0, 6, rng.integers(1, 15))]
            assert _nw_align(s1, s2) == _ref_nw(s1, s2)


def _ref_nw(ctc_chars, llm_chars):
    """Straightforward NW (reference semantics, nano_ctc.py:141-187)."""
    n, m = len(ctc_chars) + 1, len(llm_chars) + 1
    score = np.zeros((n, m), dtype=np.float32)
    trace = np.zeros((n, m), dtype=np.int8)
    for i in range(n):
        score[i][0] = -i
    for j in range(m):
        score[0][j] = -j
    for i in range(1, n):
        for j in range(1, m):
            s = 1.0 if ctc_chars[i - 1].lower() == llm_chars[j - 1].lower() \
                else -1.0
            s_diag = score[i - 1][j - 1] + s
            s_up = score[i - 1][j] - 1
            s_left = score[i][j - 1] - 1
            best = max(s_diag, s_up, s_left)
            score[i][j] = best
            trace[i][j] = 1 if best == s_diag else (2 if best == s_up else 3)
    out = [None] * len(llm_chars)
    i, j = n - 1, m - 1
    while i > 0 or j > 0:
        if i > 0 and j > 0 and trace[i][j] == 1:
            out[j - 1] = i - 1
            i -= 1
            j -= 1
        elif i > 0 and (j == 0 or trace[i][j] == 2):
            i -= 1
        else:
            j -= 1
    return out


class TestAlignTimestamps:
    def test_basic(self):
        ctc = [Token("你好", 0.5), Token("吗", 1.0)]
        out = align_timestamps(ctc, "你好吗")
        assert [c["char"] for c in out] == ["你", "好", "吗"]
        assert abs(out[0]["start"] - 0.5) < 1e-9
        assert abs(out[1]["start"] - 0.58) < 1e-9  # +80ms per char in token
        assert abs(out[2]["start"] - 1.0) < 1e-9

    def test_interpolation(self):
        ctc = [Token("a", 0.0), Token("d", 0.9)]
        out = align_timestamps(ctc, "axyd")
        # x,y unanchored → interpolated between 0.0 and 0.9
        assert out[0]["start"] == 0.0
        assert out[3]["start"] == 0.9
        assert 0.0 < out[1]["start"] < out[2]["start"] < 0.9

    def test_empty_inputs(self):
        assert align_timestamps([], "abc") == []
        assert align_timestamps([Token("a", 0)], "") == []


class TestMerge:
    def seg(self, text, t0=0.0, dt=0.5):
        return [{"char": c, "start": t0 + i * dt} for i, c in enumerate(text)]

    def test_single_segment(self):
        res = [{"text": "你好", "segments": self.seg("你好")}]
        text, segs = merge_transcription_results(res, [10.0], 4.0)
        assert text == "你好"
        assert segs[0]["start"] == 10.0

    def test_overlap_splice(self):
        # seg1: 0-6s "abcdef"; seg2 starts at 4s with "efgh" overlap 2s
        r1 = {"text": "abcdef", "segments": self.seg("abcdef", 0.0, 1.0)}
        r2 = {"text": "efgh", "segments": self.seg("efgh", 0.0, 1.0)}
        text, segs = merge_transcription_results([r1, r2], [0.0, 4.0], 2.0)
        assert text == "abcdefgh"
        starts = [s["start"] for s in segs]
        assert starts == sorted(starts)

    def test_no_anchor_hard_concat(self):
        r1 = {"text": "abcd", "segments": self.seg("abcd", 0.0, 1.0)}
        r2 = {"text": "wxyz", "segments": self.seg("wxyz", 0.0, 1.0)}
        text, _ = merge_transcription_results([r1, r2], [0.0, 4.0], 2.0)
        assert "abcd" in text and text.endswith("z")

    def test_punctuation_dedup(self):
        r1 = {"text": "a，", "segments": self.seg("a，", 0.0, 1.0)}
        r2 = {"text": "，b", "segments": self.seg("，b", 0.0, 1.0)}
        text, _ = merge_transcription_results([r1, r2], [0.0, 1.5], 0.5)
        assert "，，" not in text


class TestSRT:
    def test_compose_format(self):
        srt = compose_srt([{"start": 0.0, "end": 1.25, "content": "你好"},
                           {"start": 61.5, "end": 62.0, "content": "世界"}])
        assert "1\n00:00:00,000 --> 00:00:01,250\n你好" in srt
        assert "2\n00:01:01,500 --> 00:01:02,000\n世界" in srt

    def test_generate_splits_on_punctuation(self, tmp_path):
        segs = [{"char": c, "start": 0.2 * i}
                for i, c in enumerate("你好，世界。")]
        path = str(tmp_path / "out.srt")
        generate_srt_file(segs, path)
        content = open(path, encoding="utf-8").read()
        assert "你好" in content and "世界" in content
        assert "，" not in content  # trailing punctuation stripped
        assert content.count("-->") == 2


class TestAudioIO:
    def test_wav_roundtrip_and_resample(self, tmp_path):
        sr = 8000
        t = np.linspace(0, 1.0, sr, endpoint=False)
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        path = str(tmp_path / "a.wav")
        write_wav(path, sig, sr)
        out = load_audio(path, sample_rate=16000)
        assert abs(len(out) - 16000) <= 2
        assert np.abs(out).max() <= 1.0
        # energy preserved through resampling
        assert abs(np.std(out) - np.std(sig)) < 0.02

    def test_slicing(self, tmp_path):
        sr = 16000
        sig = np.random.default_rng(0).normal(size=sr * 2) * 0.1
        path = str(tmp_path / "b.wav")
        write_wav(path, sig, sr)
        out = load_audio(path, sample_rate=sr, start_second=0.5, duration=1.0)
        assert len(out) == sr


class TestCTCDecoderDraft:
    """The speculative-decoding draft must be the hotword-corrected
    transcript when correction ran (core/decoder.py CTCDecoder.decode)."""

    def _models(self, corrector):
        import types

        from fun_asr_gguf_tpu.hotword.hot_phoneme import CorrectionResult

        m = types.SimpleNamespace()
        m.ctc_id2token = {0: "撒", 1: "贝", 2: "你", 9: "<blk>"}
        m.beam_recall_enabled = False
        m.ctc_indices = lambda enc: np.array([0, 9, 1, 9, 2])
        m.corrector = corrector
        return m, CorrectionResult

    def test_corrected_text_becomes_draft(self):
        from fun_asr_gguf_tpu.core.decoder import CTCDecoder

        m, CorrectionResult = self._models(None)

        class FakeCorrector:
            hotwords = ["撒贝宁"]

            def correct(self, text, k=10):
                assert text == "撒贝你"
                return CorrectionResult(
                    text="撒贝宁", matchs=[("撒贝你", "撒贝宁", 0.9)],
                    similars=[])

        m.corrector = FakeCorrector()
        results, hotwords, draft, _ = CTCDecoder(m).decode(
            enc_output=None, enable_ctc=True, max_hotwords=10)
        assert "".join(r.text for r in results) == "撒贝你"   # timestamps
        assert draft == "撒贝宁"                               # LLM draft
        assert hotwords == ["撒贝宁"]

    def test_uncorrected_draft_is_recall_text(self):
        from fun_asr_gguf_tpu.core.decoder import CTCDecoder

        m, _ = self._models(None)
        _, hotwords, draft, _ = CTCDecoder(m).decode(
            enc_output=None, enable_ctc=True, max_hotwords=10)
        assert draft == "撒贝你"
        assert hotwords == []

    def test_disabled_ctc_has_no_draft(self):
        from fun_asr_gguf_tpu.core.decoder import CTCDecoder

        m, _ = self._models(None)
        results, hotwords, draft, _ = CTCDecoder(m).decode(
            enc_output=None, enable_ctc=False, max_hotwords=10)
        assert results == [] and hotwords == [] and draft is None


class TestIncrementalMerge:
    """merge_step/finalize_merge (the streaming rollover path) must fold
    to exactly what the batch merge_transcription_results produces."""

    def _mk(self, text, t0=0.0, dt=0.5):
        return {"text": text,
                "segments": [{"char": c, "start": t0 + i * dt}
                             for i, c in enumerate(text)]}

    def test_fold_equals_batch(self):
        from fun_asr_gguf_tpu.text_merge import (finalize_merge, merge_step,
                                                 merge_transcription_results)
        results = [self._mk("今天天气很好，阳光明媚"),
                   self._mk("阳光明媚，适合出门散步"),
                   self._mk("出门散步，心情愉快。。")]
        offsets = [0.0, 4.0, 8.0]
        overlap = 2.0
        import copy
        batch = merge_transcription_results(copy.deepcopy(results),
                                            offsets, overlap)
        acc = []
        for i, r in enumerate(copy.deepcopy(results)):
            acc = merge_step(acc, r, offsets[i], overlap, first=(i == 0))
        assert finalize_merge(acc) == batch

    def test_fold_with_empty_segment(self):
        from fun_asr_gguf_tpu.text_merge import (finalize_merge, merge_step,
                                                 merge_transcription_results)
        results = [self._mk("第一段文本"), {"text": "x", "segments": []},
                   self._mk("完全不同的内容")]
        offsets = [0.0, 3.0, 6.0]
        import copy
        batch = merge_transcription_results(copy.deepcopy(results),
                                            offsets, 1.0)
        acc = []
        for i, r in enumerate(copy.deepcopy(results)):
            acc = merge_step(acc, r, offsets[i], 1.0, first=(i == 0))
        assert finalize_merge(acc) == batch

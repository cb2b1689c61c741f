# coding: utf-8
"""Dataclass parity tests (reference ``nano_dataclass.py``).

Field sets, defaults and the Statistics report format must match the
reference byte-for-byte — downstream scripts parse these.
"""

import numpy as np

from fun_asr_gguf_tpu.datatypes import (ASREngineConfig, RecognitionStream,
                                        Statistics, Timings)


class TestStatisticsFormat:
    def test_str_matches_reference_layout(self):
        s = Statistics(audio_duration=60.0, n_input_tokens=204,
                       n_prefix_tokens=73, n_audio_tokens=126,
                       n_suffix_tokens=5, n_generated_tokens=253,
                       tps_in=24689.0, tps_out=219.0)
        # byte-for-byte the reference __str__ (nano_dataclass.py:205-213)
        expected = (
            "  音频长度:  60.00s\n"
            "  Decoder输入:  24689 tokens/s "
            "(总: 204, prefix:73, audio:126, suffix:5)\n"
            "  Decoder输出:    219 tokens/s (总: 253)")
        assert str(s) == expected


class TestReferenceDefaults:
    def test_config_behavioral_defaults(self):
        """Pinned reference defaults (nano_dataclass.py:145-157)."""
        c = ASREngineConfig()
        assert c.n_predict == 512
        assert c.similar_threshold == 0.6
        assert c.max_hotwords == 10
        assert c.sample_rate == 16000
        assert c.enable_ctc is True

    def test_timings_micro_stats_present(self):
        """The reference Timings micro-stats (nano_dataclass.py:96-101)."""
        t = Timings()
        for f in ("encode", "ctc", "ctc_infer", "ctc_decode", "ctc_cast",
                  "ctc_argmax", "ctc_loop", "hotword_verify", "prepare",
                  "inject", "llm_generate", "align", "total"):
            assert hasattr(t, f), f
            assert getattr(t, f) == 0.0


class TestRecognitionStream:
    def test_accept_waveform_stores_as_float32(self):
        """Reference parity: the stream stores the waveform as-is in
        float32 (nano_dataclass.py:45-54) — no resampling, no scaling."""
        s = RecognitionStream()
        sr = 8000
        audio = (np.sin(np.linspace(0, 100, sr)) * 0.5).astype(np.float64)
        s.accept_waveform(sr, audio)
        assert s.sample_rate == sr
        assert s.audio_data.dtype == np.float32
        assert len(s.audio_data) == sr
        np.testing.assert_allclose(s.audio_data, audio.astype(np.float32))

    def test_result_roundtrip(self):
        s = RecognitionStream()
        assert s.result.text == ""           # lazily-created empty result
        s.set_result("你好", [0.0, 0.5], ["你", "好"])
        assert s.result.text == "你好"
        assert s.result.timestamps == [0.0, 0.5]
        assert s.result.tokens == ["你", "好"]

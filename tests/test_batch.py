# coding: utf-8
"""Batched multi-stream decoding tests (tiny random checkpoint, CPU)."""

import base64
import os

import numpy as np
import pytest

from fun_asr_gguf_tpu.audio import write_wav
from fun_asr_gguf_tpu.datatypes import RecognitionStream
from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("bckpt") / "model")
    cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=3)
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")

    reset_hotword_manager()
    from fun_asr_gguf_tpu import create_asr_engine
    eng = create_asr_engine(
        checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
        segment_pad_seconds=1.0, n_predict=8, prefill_buckets=(64,))
    yield eng
    eng.cleanup()
    reset_hotword_manager()


def make_stream(seconds, seed):
    sr = 16000
    rng = np.random.default_rng(seed)
    s = RecognitionStream()
    s.accept_waveform(sr, rng.normal(size=int(sr * seconds)) * 0.05)
    return s


class TestBatchDecode:
    def test_batch_matches_single_greedy(self, engine):
        streams_b = [make_stream(0.8, 1), make_stream(0.5, 2)]
        streams_s = [make_stream(0.8, 1), make_stream(0.5, 2)]
        batch = engine.decode_streams(streams_b, temperature=0.0)
        singles = [engine.decode_stream(s, verbose=False, temperature=0.0)
                   for s in streams_s]
        assert len(batch) == 2
        for b, s in zip(batch, singles):
            assert b.text == s.text
            assert b.n_gen == s.n_gen
            assert [seg["char"] for seg in (b.aligned or [])] == \
                   [seg["char"] for seg in (s.aligned or [])]

    def test_stream_results_set(self, engine):
        streams = [make_stream(0.6, 4), make_stream(0.7, 5),
                   make_stream(0.4, 6)]
        out = engine.decode_streams(streams, temperature=0.0)
        for st, d in zip(streams, out):
            assert st.result.text == d.text

    def test_single_element_batch(self, engine):
        out = engine.decode_streams([make_stream(0.5, 7)], temperature=0.0)
        assert len(out) == 1

    def test_transcribe_batch_files(self, engine, tmp_path):
        paths = []
        for i in range(2):
            p = str(tmp_path / f"b{i}.wav")
            rng = np.random.default_rng(10 + i)
            write_wav(p, rng.normal(size=12000) * 0.05, 16000)
            paths.append(p)
        results = engine.transcribe_batch(paths, temperature=0.0)
        assert len(results) == 2
        for r in results:
            assert isinstance(r.text, str)
            assert isinstance(r.segments, list)


class TestParallelSegments:
    """Batched long-audio mode (`transcribe(parallel_segments=True)`)."""

    def _make_long_wav(self, tmp_path, seconds=2.5, seed=20):
        sr = 16000
        rng = np.random.default_rng(seed)
        p = str(tmp_path / "long.wav")
        write_wav(p, rng.normal(size=int(sr * seconds)) * 0.05, sr)
        return p

    def test_matches_sequential_greedy(self, engine, tmp_path):
        path = self._make_long_wav(tmp_path)
        seq = engine.transcribe(path, verbose=False, segment_size=1.0,
                                overlap=0.2, temperature=0.0)
        par = engine.transcribe(path, verbose=False, segment_size=1.0,
                                overlap=0.2, temperature=0.0,
                                parallel_segments=True)
        assert par.text == seq.text
        assert [s["char"] for s in par.segments] == \
               [s["char"] for s in seq.segments]
        starts_p = [s["start"] for s in par.segments]
        starts_s = [s["start"] for s in seq.segments]
        assert np.allclose(starts_p, starts_s)

    def test_timings_accumulated(self, engine, tmp_path):
        path = self._make_long_wav(tmp_path, seed=21)
        res = engine.transcribe(path, verbose=False, segment_size=1.0,
                                overlap=0.2, temperature=0.0,
                                parallel_segments=True)
        assert res.timings.encode > 0
        assert res.timings.llm_generate > 0

    def test_short_audio_ignores_flag(self, engine, tmp_path):
        sr = 16000
        rng = np.random.default_rng(22)
        p = str(tmp_path / "short.wav")
        write_wav(p, rng.normal(size=int(sr * 0.5)) * 0.05, sr)
        res = engine.transcribe(p, verbose=False, segment_size=1.0,
                                temperature=0.0, parallel_segments=True)
        assert isinstance(res.text, str)

    def test_first_segment_streams_before_batch_finishes(self, engine,
                                                         tmp_path):
        """Latency-to-first-text: segment 1's tokens must reach the
        decode loop's on_chunk callback while later chunks are still
        decoding (the orchestrator wires this to the console reporter)."""
        from fun_asr_gguf_tpu.core.batch import (BatchStreamDecoder,
                                                 pad_streams_to_bucket)
        from fun_asr_gguf_tpu.datatypes import RecognitionStream
        sr = 16000
        rng = np.random.default_rng(23)
        streams = []
        for i in range(3):
            s = RecognitionStream()
            s.accept_waveform(sr, rng.normal(size=sr) * 0.05)
            streams.append(s)
        padded, n_real = pad_streams_to_bucket(streams, sr)
        seen = []
        dec = BatchStreamDecoder(engine.models)
        results = dec.decode_streams(padded, temperature=0.0,
                                     n_real=n_real,
                                     on_chunk=lambda t: seen.append(t))
        assert seen, "on_chunk never fired"
        # the callback's row-0 tokens reassemble to result 0's ids
        stops = set(engine.models.stop_tokens) | {engine.models.eos_token}
        toks = [int(t) for chunk in seen for t in chunk[0].tolist()
                if t >= 0 and t not in stops]
        txt = engine.models.tokenizer.decode(toks).strip()
        assert engine.models.apply_rules(txt) == results[0].text


class TestBatchInt8KV:
    def test_batched_int8_kv_deterministic(self, engine):
        """decode_streams with kv_cache_dtype='int8': the batched device
        program stores the cache quantized; greedy decode stays
        deterministic (exact bf16-KV text equality is NOT asserted —
        random tiny-model logits are near-tied, so the ~0.4% cache
        perturbation may legitimately flip a token)."""
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        eng8 = create_asr_engine(
            checkpoint_dir=engine.config.checkpoint_dir, verbose=False,
            compute_dtype="float32", segment_pad_seconds=1.0, n_predict=8,
            prefill_buckets=(64,), kv_cache_dtype="int8")
        try:
            def run():
                return [r.text for r in eng8.decode_streams(
                    [make_stream(0.6, 71), make_stream(0.8, 72)],
                    temperature=0.0)]
            a, b = run(), run()
            assert a == b
            assert all(isinstance(t, str) for t in a)
        finally:
            eng8.cleanup()
            reset_hotword_manager()

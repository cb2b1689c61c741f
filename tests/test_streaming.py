# coding: utf-8
"""Streaming (incremental) transcription tests.

Covers: the prefill-extend math (extension via the verify pass must
reproduce full-prompt prefill logits exactly), pad-tail safety (the
extension bucket's junk slots must never influence output), the engine
session surface (partials while feeding, exact batch-path equality at
``finish()``), and latency accounting.
"""

import base64
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_gguf_tpu.audio import write_wav
from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
from fun_asr_gguf_tpu.models.config import HybridConfig, Qwen3Config
from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint


class TestExtendMath:
    """qwen3_verify_step as prefill-extend: [prefix-KV] ++ [chunk]
    must equal one full prefill, including with a padded tail."""

    def _setup(self, t_pad=0):
        from fun_asr_gguf_tpu.models.qwen3 import (init_qwen3_params,
                                                   qwen3_prefill)
        cfg = Qwen3Config.tiny()
        params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        n_pre, n_chunk = 6, 9
        full = jnp.asarray(rng.normal(
            size=(1, n_pre + n_chunk, cfg.hidden)).astype(np.float32) * 0.3)
        cap = n_pre + n_chunk + t_pad + 8
        mask_p = jnp.ones((1, n_pre), jnp.float32)
        _, kv_pre = qwen3_prefill(params, full[:, :n_pre], mask_p, cfg,
                                  kv_max_len=cap)
        mask_f = jnp.ones((1, n_pre + n_chunk), jnp.float32)
        want_logits, kv_full = qwen3_prefill(params, full, mask_f, cfg,
                                             kv_max_len=cap)
        return cfg, params, full, kv_pre, want_logits, kv_full, n_pre, \
            n_chunk, cap

    @pytest.mark.parametrize("t_pad", [0, 7])
    def test_extension_matches_full_prefill(self, t_pad):
        from fun_asr_gguf_tpu.streaming import _extend_prefix
        (cfg, params, full, kv_pre, want, _kv_full, n_pre, n_chunk,
         _cap) = self._setup(t_pad)
        t_ext = n_chunk + t_pad
        chunk = jnp.zeros((1, t_ext, cfg.hidden), jnp.float32)
        if t_pad:   # junk in the pad tail must be invisible
            junk = jax.random.normal(jax.random.PRNGKey(5),
                                     (1, t_pad, cfg.hidden)) * 9.0
            chunk = chunk.at[:, n_chunk:].set(junk)
        chunk = chunk.at[:, :n_chunk].set(full[:, n_pre:])
        positions = (n_pre + jnp.arange(t_ext, dtype=jnp.int32))[None, :]
        logits, _kv = _extend_prefix(
            params, kv_pre, chunk, jnp.asarray([n_pre], jnp.int32),
            positions, jnp.asarray([0], jnp.int32),
            jnp.asarray(n_chunk - 1, jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)

    def test_decode_continuation_matches(self):
        """Greedy continuation from the extended state must equal the
        continuation from a full prefill (junk tail overwritten before
        it becomes visible)."""
        from fun_asr_gguf_tpu.models.generate import (RING, GenState,
                                                      generate_chunk)
        from fun_asr_gguf_tpu.streaming import _extend_prefix
        (cfg, params, full, kv_pre, want, kv_full, n_pre, n_chunk,
         cap) = self._setup(t_pad=5)
        t_ext = n_chunk + 5
        chunk = jnp.zeros((1, t_ext, cfg.hidden), jnp.float32)
        chunk = chunk.at[:, :n_chunk].set(full[:, n_pre:])
        chunk = chunk.at[:, n_chunk:].set(3.0)      # junk
        positions = (n_pre + jnp.arange(t_ext, dtype=jnp.int32))[None, :]
        logits, kv = _extend_prefix(
            params, kv_pre, chunk, jnp.asarray([n_pre], jnp.int32),
            positions, jnp.asarray([0], jnp.int32),
            jnp.asarray(n_chunk - 1, jnp.int32), cfg)

        def mkstate(lg, kvx, p):
            return GenState(
                kv=kvx, logits=lg,
                prompt_len=jnp.asarray([p], jnp.int32),
                valid_from=jnp.zeros((1,), jnp.int32),
                step=jnp.asarray(0, jnp.int32),
                rng=jax.random.PRNGKey(0),
                ring=jnp.full((1, RING), -1, jnp.int32),
                n_gen=jnp.zeros((1,), jnp.int32),
                done=jnp.zeros((1,), bool),
                aborted=jnp.zeros((1,), bool),
                forbid=jnp.full((1,), -1, jnp.int32),
                prompt_slots=jnp.asarray(p, jnp.int32))

        p = n_pre + n_chunk
        _, toks_ext = generate_chunk(
            params, mkstate(logits, kv, p), cfg, jnp.asarray(0.0),
            jnp.asarray(1.0), 50, chunk_len=6, stop_tokens=(),
            greedy=True)
        _, toks_full = generate_chunk(
            params, mkstate(want, kv_full, p), cfg, jnp.asarray(0.0),
            jnp.asarray(1.0), 50, chunk_len=6, stop_tokens=(),
            greedy=True)
        assert np.asarray(toks_ext).tolist() == \
            np.asarray(toks_full).tolist()


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    reset_hotword_manager()
    ckpt = str(tmp_path_factory.mktemp("stream") / "model")
    cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=0)
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    from fun_asr_gguf_tpu import create_asr_engine
    eng = create_asr_engine(
        ckpt, verbose=False, compute_dtype="float32",
        segment_pad_seconds=2.0, n_predict=16, prefill_buckets=(64,))
    yield eng
    eng.cleanup()
    reset_hotword_manager()


class TestStreamingSession:
    def _chunks(self, seconds=1.5, chunk_s=0.5, seed=0):
        rng = np.random.default_rng(seed)
        n = int(16000 * seconds)
        audio = (rng.normal(size=n) * 0.05).astype(np.float32)
        step = int(16000 * chunk_s)
        return audio, [audio[i:i + step] for i in range(0, n, step)]

    def test_partials_and_final_equals_batch(self, engine):
        audio, chunks = self._chunks()
        sess = engine.create_streaming_session(partial_tokens=8)
        partials = [sess.feed(c) for c in chunks]
        assert partials[-1].seconds == pytest.approx(1.5, abs=0.01)
        for p in partials:
            assert isinstance(p.text, str)
            assert isinstance(p.ctc_text, str)
            assert p.latency_ms > 0
        assert sess.stats.ticks and len(sess.stats.ticks) == len(chunks)

        final = sess.finish(temperature=0.0)
        stream = engine.create_stream()
        stream.accept_waveform(16000, audio)
        direct = engine.decode_stream(stream, verbose=False,
                                      temperature=0.0)
        assert final.text == direct.text

    def test_extend_bucket_invariance(self, engine):
        """Different pad-tail sizes must produce identical partials —
        the junk tail is provably outside the attention window."""
        _audio, chunks = self._chunks(seconds=1.0, seed=3)
        from fun_asr_gguf_tpu.streaming import StreamingSession
        texts = []
        for bucket in (None, 96):
            sess = StreamingSession(engine.models, partial_tokens=8,
                                    extend_bucket=bucket)
            last = None
            for c in chunks:
                last = sess.feed(c)
            texts.append(last.text)
        assert texts[0] == texts[1]

    def test_latency_stats_recorded(self, engine):
        _audio, chunks = self._chunks(seconds=0.5, seed=4)
        sess = engine.create_streaming_session(partial_tokens=8)
        p = sess.feed(chunks[0])
        if p.text:
            assert sess.stats.first_text_ms is not None
        if p.ctc_text:
            assert sess.stats.first_ctc_ms is not None


    def test_rollover_matches_long_batch_path(self, engine):
        """A session fed past one window must take the orchestrator's
        exact segment boundaries: final merged text == the long-audio
        batch path on the same audio."""
        rng = np.random.default_rng(7)
        audio = (rng.normal(size=16000 * 5) * 0.05).astype(np.float32)
        sess = engine.create_streaming_session(
            partial_tokens=8, segment_size=2.0, overlap=0.5,
            temperature=0.0)
        step = int(16000 * 0.7)
        last = None
        for i in range(0, len(audio), step):
            last = sess.feed(audio[i:i + step])
        assert last.seconds == pytest.approx(5.0, abs=0.01)
        assert last.committed_text == sess.committed_text
        assert last.full_text.startswith(last.committed_text)
        final = sess.finish(temperature=0.0)

        batch = engine.transcribe(
            "mem.wav", preloaded_audio=audio, verbose=False,
            segment_size=2.0, overlap=0.5, temperature=0.0)
        assert final.text == batch.text
        # absolute-time alignment survives the merge
        segs = [(s["char"], s["start"]) for s in final.aligned]
        want = [(s["char"], s["start"]) for s in batch.segments]
        assert segs == want

    def test_rollover_memory_bounded(self, engine):
        """An unbounded session keeps O(window) audio: the buffer never
        exceeds one segment and committed results drop their embeds."""
        sess = engine.create_streaming_session(
            partial_tokens=8, segment_size=2.0, overlap=0.5,
            temperature=0.0)
        rng = np.random.default_rng(9)
        for _ in range(8):                      # 8 × 0.9 s = 7.2 s fed
            sess.feed((rng.normal(size=int(16000 * 0.9)) * 0.05)
                      .astype(np.float32))
        assert len(sess._buf) <= sess._seg_samples
        assert len(sess._committed) >= 3
        assert sess.seconds == pytest.approx(7.2, abs=0.01)

    def test_single_window_exact_boundary_stays_single_segment(self, engine):
        """Audio ending exactly at the window boundary must NOT roll
        over (matches the orchestrator's `end >= duration` break): the
        finish() result is the plain single-segment decode."""
        rng = np.random.default_rng(11)
        audio = (rng.normal(size=16000 * 2) * 0.05).astype(np.float32)
        sess = engine.create_streaming_session(
            partial_tokens=8, segment_size=2.0, overlap=0.5)
        sess.feed(audio)
        assert not sess._committed
        final = sess.finish(temperature=0.0)
        stream = engine.create_stream()
        stream.accept_waveform(16000, audio)
        direct = engine.decode_stream(stream, verbose=False,
                                      temperature=0.0)
        assert final.text == direct.text


class TestAdvisorFixes:
    def test_oversize_segment_size_raises(self, engine):
        # pad window is 2.0 s; a larger segment_size must be rejected,
        # not silently clamped (boundaries would diverge from a batch
        # run with the same segment_size)
        with pytest.raises(ValueError, match="segment_pad_seconds"):
            engine.create_streaming_session(segment_size=5.0)

    def test_full_text_dedups_exact_overlap(self):
        from fun_asr_gguf_tpu.streaming import StreamingPartial
        p = StreamingPartial(text="明媚，出门走走", ctc_text="",
                             seconds=6.0, latency_ms=1.0,
                             committed_text="今天阳光明媚，")
        assert p.full_text == "今天阳光明媚，出门走走"
        # no exact anchor -> plain concatenation (documented transient)
        p2 = StreamingPartial(text="出门走走", ctc_text="", seconds=6.0,
                              latency_ms=1.0, committed_text="今天阳光")
        assert p2.full_text == "今天阳光出门走走"

    def test_incremental_commit_matches_finish_merge(self, engine):
        """A rolled-over session's committed_text (incremental merge)
        must equal the full merge finish() computes over the same
        committed segments."""
        rng = np.random.default_rng(7)
        sess = engine.create_streaming_session(segment_size=2.0,
                                               overlap=0.5)
        sr = 16000
        audio = (rng.normal(size=int(sr * 5.2)) * 0.1).astype(np.float32)
        for i in range(0, len(audio), sr // 2):
            sess.feed(audio[i:i + sr // 2])
        committed_incremental = sess.committed_text
        from fun_asr_gguf_tpu.text_merge import merge_transcription_results
        full, _ = merge_transcription_results(
            [{"text": r["text"], "segments": r["segments"],
              "duration": r["duration"]} for r in sess._committed],
            sess._offsets, sess.overlap)
        if len(sess._committed) == 1:
            assert committed_incremental == sess._committed[0]["text"]
        else:
            assert committed_incremental == full


@pytest.mark.slow
class TestUnboundedSoak:
    def test_many_rollovers_bounded_and_merge_equal(self, engine):
        """~30 rollovers through the frozen-head incremental merge: the
        committed text must equal the authoritative full merge and the
        active tail must stay O(window)."""
        rng = np.random.default_rng(11)
        sess = engine.create_streaming_session(segment_size=2.0,
                                               overlap=0.5)
        sr = 16000
        step = int(1.5 * sr)
        for _ in range(30):
            sess.feed((rng.normal(size=step) * 0.1).astype(np.float32))
        assert len(sess._committed) >= 28
        # active tail is bounded by the lookback window, not history
        assert len(sess._merged_tail) <= max(
            40, 4 * len(sess._committed[0].get("segments") or [1]))
        from fun_asr_gguf_tpu.text_merge import merge_transcription_results
        full, _ = merge_transcription_results(
            [{"text": r["text"], "segments": r["segments"],
              "duration": r["duration"]} for r in sess._committed],
            sess._offsets, sess.overlap)
        assert sess.committed_text == full

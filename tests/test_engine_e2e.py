# coding: utf-8
"""End-to-end engine tests on a tiny random checkpoint (CPU).

Covers the reference's manual-E2E role (``04-Inference.py``): init → WAV →
transcribe (short + long paths) → result structure, timings, SRT export,
sherpa-style streams, hotword path. Random weights mean the text itself is
arbitrary — assertions target structure, determinism, and plumbing.
"""

import base64
import os

import numpy as np
import pytest

from fun_asr_gguf_tpu.audio import write_wav
from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "model")
    cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=0)
    # tiny CTC vocab file: ids 0..vocab-1, blank last
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(ckpt, "hot.txt"), "w", encoding="utf-8") as f:
        f.write("# test hotwords\n测试\n")
    return ckpt, cfg


@pytest.fixture(scope="module")
def engine(checkpoint):
    reset_hotword_manager()
    from fun_asr_gguf_tpu import create_asr_engine
    ckpt, _cfg = checkpoint
    eng = create_asr_engine(
        checkpoint_dir=ckpt, verbose=False,
        compute_dtype="float32",
        segment_pad_seconds=2.0,     # tiny static window for CPU tests
        n_predict=16,
        prefill_buckets=(64,))
    yield eng
    eng.cleanup()
    reset_hotword_manager()


def make_wav(tmp_path, seconds, name="a.wav", seed=0):
    sr = 16000
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=int(sr * seconds)) * 0.05
    path = str(tmp_path / name)
    write_wav(path, sig, sr)
    return path


class TestShortPath:
    def test_transcribe_structure(self, engine, tmp_path):
        path = make_wav(tmp_path, 1.5)
        res = engine.transcribe(path, verbose=False, temperature=0.0)
        assert isinstance(res.text, str)
        assert isinstance(res.segments, list)
        assert res.timings.encode > 0
        assert res.timings.inject > 0
        assert res.timings.llm_generate > 0
        assert res.timings.total > 0
        # CTC ran and produced some text with random weights
        assert isinstance(res.ctc_text, str)
        for seg in res.segments:
            assert set(seg) == {"char", "start"}

    def test_greedy_deterministic(self, engine, tmp_path):
        path = make_wav(tmp_path, 1.0, "b.wav", seed=1)
        r1 = engine.transcribe(path, verbose=False, temperature=0.0)
        r2 = engine.transcribe(path, verbose=False, temperature=0.0)
        assert r1.text == r2.text

    def test_start_second_duration(self, engine, tmp_path):
        path = make_wav(tmp_path, 2.0, "c.wav", seed=2)
        res = engine.transcribe(path, verbose=False, temperature=0.0,
                                start_second=0.5, duration=1.0)
        assert res.timings.load_audio > 0

    def test_srt_export(self, engine, tmp_path):
        path = make_wav(tmp_path, 1.0, "d.wav", seed=3)
        res = engine.transcribe(path, verbose=False, temperature=0.0,
                                srt=True)
        srt_path = os.path.splitext(path)[0] + ".srt"
        if res.segments:
            assert os.path.exists(srt_path)
            assert "-->" in open(srt_path, encoding="utf-8").read()

    def test_language_and_context(self, engine, tmp_path):
        path = make_wav(tmp_path, 1.0, "e.wav", seed=4)
        res = engine.transcribe(path, verbose=False, temperature=0.0,
                                language="中文", context="会议记录")
        assert isinstance(res.text, str)


class TestLongPath:
    def test_segmentation_and_merge(self, engine, tmp_path):
        # segment_size=1.0 & 5s audio → 5+ segments through the long path
        path = make_wav(tmp_path, 5.0, "long.wav", seed=5)
        res = engine.transcribe(path, verbose=False, temperature=0.0,
                                segment_size=1.0, overlap=0.25)
        assert isinstance(res.text, str)
        starts = [s["start"] for s in res.segments]
        assert starts == sorted(starts)
        # accumulated timings across segments
        assert res.timings.encode > 0


class TestStreams:
    def test_sherpa_stream_api(self, engine):
        stream = engine.create_stream()
        rng = np.random.default_rng(6)
        stream.accept_waveform(16000, rng.normal(size=8000) * 0.05)
        d_res = engine.decode_stream(stream, verbose=False, temperature=0.0)
        assert stream.result.text == d_res.text
        assert len(stream.result.tokens) == len(stream.result.timestamps)


class TestRuleCorrection:
    """Opt-in regex rule correction (``rules_path``): the reference ships
    RuleCorrector unwired (hot_rule.py); here the knob applies it to the
    final transcript before alignment."""

    def test_rules_applied_to_transcript(self, checkpoint, tmp_path):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        rules = tmp_path / "rules.txt"
        rules.write_text("# test\n(?s)^.*$ = 规则替换\n", encoding="utf-8")
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            rules_path=str(rules))
        try:
            assert eng.models.rule_corrector is not None
            assert eng.models.rule_corrector.patterns
            res = eng.transcribe(make_wav(tmp_path, 1.0, "r.wav"),
                                 verbose=False, temperature=0.0)
            # random weights: output may be empty; otherwise rewritten
            assert res.text in ("", "规则替换")
        finally:
            eng.cleanup()
            reset_hotword_manager()
        assert eng.models._rules_watcher is None     # watcher stopped

    def test_missing_rules_file_autocreated(self, checkpoint, tmp_path):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        rules = tmp_path / "sub" / "rules.txt"
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            rules_path=str(rules))
        try:
            assert rules.exists()                    # like hot.txt
            assert eng.models.rule_corrector.patterns == {}
        finally:
            eng.cleanup()
            reset_hotword_manager()


class TestRectificationWiring:
    """Opt-in correction-history RAG (``rectify_path``): retrieved
    "wrong => right" entries join the LLM context (the reference ships
    RectificationRAG unwired, hot_rectification.py)."""

    def test_history_block_joins_llm_context(self, checkpoint, tmp_path,
                                             monkeypatch):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        hist = tmp_path / "hot-rectify.txt"
        hist.write_text("撒贝你好\n撒贝宁好\n---\n", encoding="utf-8")
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            rectify_path=str(hist))
        try:
            rag = eng.models.rectification
            assert rag is not None and len(rag.records) == 1
            # retrieval itself (same algorithm the hotword tests cover)
            assert "撒贝宁好" in rag.format_prompt("今天撒贝你好吗")

            # injection plumbing: the block must reach build_prompt's
            # context (the CTC text of random weights is arbitrary, so
            # pin format_prompt and capture the context)
            monkeypatch.setattr(rag, "format_prompt",
                                lambda *a, **k: "纠错历史：\n- 错 => 对")
            seen = {}
            orig = eng.models.prompt_builder.build_prompt

            def spy(hotwords, language=None, context=None):
                seen["context"] = context
                return orig(hotwords, language, context)

            monkeypatch.setattr(eng.models.prompt_builder, "build_prompt",
                                spy)
            eng.transcribe(make_wav(tmp_path, 1.0, "rc.wav"),
                           verbose=False, temperature=0.0,
                           context="用户给的背景")
            assert seen["context"] == "用户给的背景\n纠错历史：\n- 错 => 对"
        finally:
            eng.cleanup()
            reset_hotword_manager()
        assert eng.models._rectify_watcher is None


class TestEngineInit:
    def test_bad_checkpoint_raises(self, tmp_path):
        from fun_asr_gguf_tpu import create_asr_engine
        with pytest.raises(RuntimeError):
            create_asr_engine(checkpoint_dir=str(tmp_path / "missing"),
                              verbose=False)


class TestQuantizedEngine:
    def test_q8_0_engine_matches_bf16_greedy(self, checkpoint, tmp_path):
        """Engine with llm_weight_format=q8_0 (QuantTensor path) produces
        the same greedy transcript as the dense engine on a tiny model."""
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=16, prefill_buckets=(64,),
            llm_weight_format="q8_0")
        try:
            from fun_asr_gguf_tpu.ops.quant_matmul import QuantTensor
            layers = eng.models.llm_params["layers"]
            assert isinstance(
                layers.get("qkv_w", layers.get("q_w")), QuantTensor)
            assert "lm_head_q" in eng.models.llm_params
            path = make_wav(tmp_path, 1.0, "q.wav", seed=42)
            res = eng.transcribe(path, verbose=False, temperature=0.0)
            assert isinstance(res.text, str)
        finally:
            eng.cleanup()
            reset_hotword_manager()


class TestBeamSearchEngine:
    def test_ctc_beam_engine_runs(self, checkpoint, tmp_path):
        """ctc_beam_size > 1 routes hotword recall through prefix beam
        search; the pipeline must stay functional end-to-end."""
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            ctc_beam_size=4)
        try:
            assert eng.models.config.ctc_beam_size == 4
            path = make_wav(tmp_path, 1.0, "beam.wav", seed=11)
            res = eng.transcribe(path, verbose=False, temperature=0.0)
            assert isinstance(res.text, str)
            assert res.audio_seconds == pytest.approx(1.0)
        finally:
            eng.cleanup()
            reset_hotword_manager()


@pytest.mark.slow  # 21s engine init; int8 numerics covered by test_qwen3 TestInt8Weights
class TestInt8Engine:
    def test_int8_engine_runs_and_close_to_dense(self, checkpoint, tmp_path):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        from fun_asr_gguf_tpu.models.qwen3 import Int8Weight
        ckpt, _cfg = checkpoint
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            llm_weight_format="int8")
        try:
            assert isinstance(eng.models.llm_params["layers"]["qkv_w"],
                              Int8Weight)
            path = make_wav(tmp_path, 1.0, "i8.wav", seed=17)
            res = eng.transcribe(path, verbose=False, temperature=0.0)
            assert isinstance(res.text, str)
        finally:
            eng.cleanup()
            reset_hotword_manager()


class TestShardedEngine:
    def test_mesh_engine_matches_single_device_greedy(self, checkpoint,
                                                      tmp_path):
        """config.mesh_shape places the decoder on a ('dp','tp') mesh
        (Megatron-TP shardings); greedy transcription through the facade
        must be identical to the single-device engine."""
        reset_hotword_manager()
        import jax
        from jax.sharding import NamedSharding
        from fun_asr_gguf_tpu import create_asr_engine
        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        ckpt, _cfg = checkpoint
        path = make_wav(tmp_path, 1.0, "tp.wav", seed=23)
        kwargs = dict(checkpoint_dir=ckpt, verbose=False,
                      compute_dtype="float32", segment_pad_seconds=2.0,
                      n_predict=8, prefill_buckets=(64,))
        eng1 = create_asr_engine(**kwargs)
        try:
            ref = eng1.transcribe(path, verbose=False, temperature=0.0)
        finally:
            eng1.cleanup()
            reset_hotword_manager()
        eng2 = create_asr_engine(mesh_shape={"dp": 1, "tp": 2}, **kwargs)
        try:
            assert eng2.models.mesh is not None
            assert eng2.models.mesh.shape == {"dp": 1, "tp": 2}
            layers = eng2.models.llm_params["layers"]
            w = layers.get("qkv_w", layers.get("q_w"))
            leaf = w.w8 if hasattr(w, "w8") else w
            assert isinstance(leaf.sharding, NamedSharding)
            assert not leaf.sharding.is_fully_replicated
            res = eng2.transcribe(path, verbose=False, temperature=0.0)
            assert res.text == ref.text
        finally:
            eng2.cleanup()
            reset_hotword_manager()

    def test_dp_tp_batch_matches_single(self, checkpoint, tmp_path):
        """With a dp>1 mesh, transcribe_batch shards the batch dimension
        over 'dp' (put_batch) while 'tp' shards the weights; outputs must
        equal the single-device engine's per-file greedy results."""
        reset_hotword_manager()
        import jax
        from fun_asr_gguf_tpu import create_asr_engine
        if len(jax.devices()) < 4:
            pytest.skip("needs >= 4 devices")
        ckpt, _cfg = checkpoint
        paths = [make_wav(tmp_path, 1.0, f"dp{i}.wav", seed=40 + i)
                 for i in range(2)]
        kwargs = dict(checkpoint_dir=ckpt, verbose=False,
                      compute_dtype="float32", segment_pad_seconds=2.0,
                      n_predict=8, prefill_buckets=(64,))
        eng1 = create_asr_engine(**kwargs)
        try:
            ref = [eng1.transcribe(pth, verbose=False, temperature=0.0).text
                   for pth in paths]
        finally:
            eng1.cleanup()
            reset_hotword_manager()
        eng2 = create_asr_engine(mesh_shape={"dp": 2, "tp": 2}, **kwargs)
        try:
            res = eng2.transcribe_batch(paths, temperature=0.0)
            assert [r.text for r in res] == ref
        finally:
            eng2.cleanup()
            reset_hotword_manager()

    def test_mesh_q8_0_rejected(self, checkpoint):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        with pytest.raises(Exception, match="q8_0"):
            create_asr_engine(
                checkpoint_dir=ckpt, verbose=False,
                compute_dtype="float32", segment_pad_seconds=2.0,
                n_predict=8, prefill_buckets=(64,),
                llm_weight_format="q8_0", mesh_shape={"dp": 1, "tp": 2})
        reset_hotword_manager()

    def test_mesh_too_many_devices_rejected(self, checkpoint):
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        # device-count depends on the runtime, so it surfaces as the
        # generic init failure (reference semantics: initialize() -> False)
        with pytest.raises(RuntimeError, match="initialize"):
            create_asr_engine(
                checkpoint_dir=ckpt, verbose=False,
                compute_dtype="float32", segment_pad_seconds=2.0,
                n_predict=8, prefill_buckets=(64,),
                mesh_shape={"dp": 64, "tp": 2})
        reset_hotword_manager()


class TestInt4Engine:
    def test_int4_engine_runs(self, checkpoint, tmp_path):
        """Experimental w4a16 decode (llm_weight_format='int4')."""
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        from fun_asr_gguf_tpu.models.qwen3 import Int4Weight
        ckpt, _cfg = checkpoint
        eng = create_asr_engine(
            checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
            segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,),
            llm_weight_format="int4")
        try:
            assert isinstance(eng.models.llm_params["layers"]["qkv_w"],
                              Int4Weight)
            path = make_wav(tmp_path, 1.0, "i4.wav", seed=18)
            res = eng.transcribe(path, verbose=False, temperature=0.0)
            assert isinstance(res.text, str)
        finally:
            eng.cleanup()
            reset_hotword_manager()


class TestInt8KVEngine:
    def test_int8_kv_engine_matches_bf16_kv_greedy(self, checkpoint,
                                                   tmp_path):
        """kv_cache_dtype='int8' through the facade: the cache stores
        int8 + scales; greedy transcription stays deterministic and (on
        this tiny f32 model) matches the bf16-KV engine."""
        reset_hotword_manager()
        from fun_asr_gguf_tpu import create_asr_engine
        from fun_asr_gguf_tpu.models.qwen3 import QuantKV  # noqa: F401
        ckpt, _cfg = checkpoint
        path = make_wav(tmp_path, 1.0, "kv8.wav", seed=33)
        kwargs = dict(checkpoint_dir=ckpt, verbose=False,
                      compute_dtype="float32", segment_pad_seconds=2.0,
                      n_predict=8, prefill_buckets=(64,))
        eng1 = create_asr_engine(**kwargs)
        try:
            ref = eng1.transcribe(path, verbose=False, temperature=0.0)
        finally:
            eng1.cleanup()
            reset_hotword_manager()
        eng2 = create_asr_engine(kv_cache_dtype="int8", **kwargs)
        try:
            r1 = eng2.transcribe(path, verbose=False, temperature=0.0)
            r2 = eng2.transcribe(path, verbose=False, temperature=0.0)
            assert r1.text == r2.text          # deterministic
            assert isinstance(r1.text, str)
            # int8 KV perturbs logits by ~1/254 of each head's absmax —
            # on this checkpoint greedy output is unchanged
            assert r1.text == ref.text
        finally:
            eng2.cleanup()
            reset_hotword_manager()

    def test_bad_kv_dtype_rejected(self, checkpoint):
        from fun_asr_gguf_tpu import create_asr_engine
        ckpt, _cfg = checkpoint
        with pytest.raises(ValueError, match="kv_cache_dtype"):
            create_asr_engine(checkpoint_dir=ckpt, verbose=False,
                              kv_cache_dtype="fp8")


class TestEdgeCases:
    def test_very_short_audio(self, engine, tmp_path):
        """One-tenth-second clip: static padding must absorb it."""
        path = make_wav(tmp_path, 0.1, "tiny.wav", seed=50)
        res = engine.transcribe(path, verbose=False, temperature=0.0)
        assert isinstance(res.text, str)
        assert res.audio_seconds == pytest.approx(0.1, abs=0.01)

    def test_silent_audio(self, engine, tmp_path):
        import numpy as np
        from fun_asr_gguf_tpu.audio import write_wav
        path = str(tmp_path / "silence.wav")
        write_wav(path, np.zeros(16000), 16000)
        res = engine.transcribe(path, verbose=False, temperature=0.0)
        assert isinstance(res.text, str)   # no NaNs/crash on all-zero input

    def test_empty_wav_handled_gracefully(self, engine, tmp_path):
        """Zero-sample audio pads into the static window and transcribes
        as silence (no crash) — mirrors the reference's pad-to-window
        behavior for degenerate inputs."""
        from fun_asr_gguf_tpu.audio import write_wav
        import numpy as np
        path = str(tmp_path / "empty.wav")
        write_wav(path, np.zeros(0), 16000)
        res = engine.transcribe(path, verbose=False, temperature=0.0)
        assert isinstance(res.text, str)
        assert res.audio_seconds == 0.0

    def test_transcribe_batch_mixed_lengths(self, engine, tmp_path):
        paths = [make_wav(tmp_path, s, f"mx{i}.wav", seed=60 + i)
                 for i, s in enumerate((0.5, 1.0, 1.5))]
        results = engine.transcribe_batch(paths, temperature=0.0)
        assert len(results) == 3
        assert all(isinstance(r.text, str) for r in results)


class TestStreamResetPlumbing:
    def test_reporter_reset_callback(self):
        from fun_asr_gguf_tpu.display import DisplayReporter
        events = []
        with DisplayReporter(verbose=False,
                             on_stream=lambda p: events.append(p),
                             on_stream_reset=lambda: events.append(
                                 "<RESET>")) as rep:
            rep.stream("ab")
            rep.stream_reset()
            rep.stream("cd")
        assert events == ["ab", "<RESET>", "cd"]

    def test_reporter_reset_noop_without_callback(self):
        from fun_asr_gguf_tpu.display import DisplayReporter
        with DisplayReporter(verbose=False) as rep:
            rep.stream_reset()    # must not raise

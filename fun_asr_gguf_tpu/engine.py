"""Public facade: FunASREngine / create_asr_engine.

API-compatible with the reference facade (``fun_asr_gguf/asr_engine.py``),
including the sherpa-onnx-style ``create_stream``/``decode_stream`` pair.
The constructor takes a checkpoint directory (our TPU artifact layout:
``encoder.safetensors`` + ``decoder.gguf`` + ``tokenizer.json`` +
``tokens.txt``) instead of the reference's onnx/gguf path triple — the
remaining knobs and defaults match the reference.
"""

from typing import Optional

from .core.model_manager import ModelManager
from .core.orchestrator import TranscriptionOrchestrator
from .datatypes import (ASREngineConfig, DecodeResult, RecognitionStream,
                        TranscriptionResult)


class FunASREngine:
    """TPU ASR inference engine (facade)."""

    def __init__(self,
                 checkpoint_dir: str,
                 tokens_path: Optional[str] = None,
                 tokenizer_path: Optional[str] = None,
                 hotwords_path: Optional[str] = None,
                 rules_path: Optional[str] = None,
                 rectify_path: Optional[str] = None,
                 enable_ctc: bool = True,
                 n_predict: int = 512,
                 similar_threshold: float = 0.6,
                 max_hotwords: int = 10,
                 compute_dtype: str = "bfloat16",
                 segment_pad_seconds: float = 60.0,
                 prefill_buckets=(256, 512),
                 llm_weight_format: str = "auto",
                 fuse_projections: bool = True,
                 ctc_beam_size: int = 1,
                 ctc_beam_topk: int = 8,
                 hotword_beam_bonus: float = 2.0,
                 compilation_cache_dir: Optional[str] = None,
                 int8_lm_head: bool = True,
                 warmup_all_buckets: bool = False,
                 warmup: bool = True,
                 speculative: bool = True,
                 spec_k: int = 8,
                 spec_draft_len: int = 512,
                 spec_min_accept: float = 1.35,
                 mesh_shape: Optional[dict] = None,
                 kv_cache_dtype: str = "bf16"):
        if llm_weight_format not in ("auto", "bf16", "int8", "int4",
                                     "q8_0"):
            raise ValueError(
                f"llm_weight_format must be auto|bf16|int8|int4|q8_0, got "
                f"{llm_weight_format!r}")
        if mesh_shape:
            from .parallel.mesh import validate_mesh_shape
            validate_mesh_shape(mesh_shape, llm_weight_format)
        if kv_cache_dtype not in ("bf16", "int8"):
            raise ValueError(
                f"kv_cache_dtype must be bf16|int8, got {kv_cache_dtype!r}")
        self.config = ASREngineConfig(
            checkpoint_dir=checkpoint_dir,
            tokens_path=tokens_path,
            tokenizer_path=tokenizer_path,
            hotwords_path=hotwords_path,
            rules_path=rules_path,
            rectify_path=rectify_path,
            enable_ctc=enable_ctc,
            n_predict=n_predict,
            similar_threshold=similar_threshold,
            max_hotwords=max_hotwords,
            compute_dtype=compute_dtype,
            segment_pad_seconds=segment_pad_seconds,
            prefill_buckets=tuple(prefill_buckets),
            llm_weight_format=llm_weight_format,
            fuse_projections=fuse_projections,
            ctc_beam_size=ctc_beam_size,
            ctc_beam_topk=ctc_beam_topk,
            hotword_beam_bonus=hotword_beam_bonus,
            compilation_cache_dir=compilation_cache_dir,
            int8_lm_head=int8_lm_head,
            warmup_all_buckets=warmup_all_buckets,
            warmup=warmup,
            speculative=speculative,
            spec_k=spec_k,
            spec_draft_len=spec_draft_len,
            spec_min_accept=spec_min_accept,
            mesh_shape=dict(mesh_shape) if mesh_shape else None,
            kv_cache_dtype=kv_cache_dtype)
        self.models = ModelManager(self.config)
        self.orchestrator = TranscriptionOrchestrator(self.models)
        self.sample_rate = self.config.sample_rate
        self._batch_decoder = None

    def initialize(self, verbose: bool = True) -> bool:
        return self.models.initialize(verbose=verbose)

    def transcribe(self, audio_path: str, language: Optional[str] = None,
                   context: Optional[str] = None, verbose: bool = True,
                   segment_size: float = 60.0, overlap: float = 2.0,
                   start_second: Optional[float] = None,
                   duration: Optional[float] = None, srt: bool = False,
                   temperature: float = 0.4, top_p: float = 1.0,
                   top_k: int = 50, on_stream=None, on_stream_reset=None,
                   preloaded_audio=None,
                   parallel_segments: bool = False) -> TranscriptionResult:
        """on_stream: optional callback(text_piece) invoked as the LLM
        streams generated text (powers the server's SSE mode);
        on_stream_reset: optional callback() when a repetition-fuse retry
        discards the streamed pieces. preloaded_audio: already-decoded
        mono waveform (skips load_audio; start_second/duration are
        assumed applied). parallel_segments: decode long-audio segments
        as batched device programs instead of sequentially (TPU-native
        extension; on_stream token callbacks are NOT invoked in this mode
        — segment texts arrive with the final result)."""
        return self.orchestrator.transcribe(
            audio_path=audio_path, language=language, context=context,
            verbose=verbose, segment_size=segment_size, overlap=overlap,
            start_second=start_second, duration=duration, srt=srt,
            temperature=temperature, top_p=top_p, top_k=top_k,
            on_stream=on_stream, on_stream_reset=on_stream_reset,
            preloaded_audio=preloaded_audio,
            parallel_segments=parallel_segments)

    def create_stream(self, hotwords: Optional[str] = None
                      ) -> RecognitionStream:
        """sherpa-onnx compatible stream creation."""
        return RecognitionStream(sample_rate=self.sample_rate)

    def decode_stream(self, stream: RecognitionStream,
                      language: Optional[str] = None,
                      context: Optional[str] = None, verbose: bool = True,
                      reporter=None, temperature: float = 0.3,
                      top_p: float = 1.0, top_k: int = 50) -> DecodeResult:
        """sherpa-onnx compatible stream decoding."""
        return self.orchestrator.decoder.decode_stream(
            stream, language, context, verbose, reporter,
            temperature=temperature, top_p=top_p, top_k=top_k)

    def decode_streams(self, streams, language: Optional[str] = None,
                       context: Optional[str] = None,
                       temperature: float = 0.3, top_p: float = 1.0,
                       top_k: int = 50, n_real: Optional[int] = None):
        """Decode N recognition streams concurrently in one batched device
        program (TPU-native extension; no reference counterpart — the
        reference context is single-sequence, ``llama.py:464``).
        ``n_real``: see ``BatchStreamDecoder.decode_streams``."""
        from .core.batch import BatchStreamDecoder
        if self._batch_decoder is None:
            self._batch_decoder = BatchStreamDecoder(self.models)
        return self._batch_decoder.decode_streams(
            streams, language, context, temperature=temperature,
            top_p=top_p, top_k=top_k, n_real=n_real)

    def create_streaming_session(self, language: Optional[str] = None,
                                 context: Optional[str] = None,
                                 partial_tokens: int = 48, **kwargs):
        """True incremental transcription (TPU-native extension; the
        reference buffers whole segments, ``nano_dataclass.py:30-69``):
        ``session.feed(chunk)`` returns a growing provisional transcript
        while audio is still arriving; ``session.finish()`` runs the
        standard full-pipeline decode. Sessions are unbounded: past one
        segment window the session rolls the window over the stream with
        the long-audio orchestrator's windowing and merge. Extra kwargs
        (``segment_size``, ``overlap``, ``temperature``, …) pass through
        to :class:`.streaming.StreamingSession`."""
        from .streaming import StreamingSession
        return StreamingSession(self.models, language=language,
                                context=context,
                                partial_tokens=partial_tokens, **kwargs)

    def transcribe_batch(self, audio_paths, language: Optional[str] = None,
                         context: Optional[str] = None,
                         temperature: float = 0.3, top_p: float = 1.0,
                         top_k: int = 50):
        """Batched short-audio transcription (each file ≤ segment window).

        Returns a list of TranscriptionResult in input order.
        """
        from .audio import load_audio
        from .ctc import CHAR_DURATION  # noqa: F401 (doc anchor)
        streams = []
        for path in audio_paths:
            audio = load_audio(path, self.config.sample_rate)
            stream = RecognitionStream()
            stream.accept_waveform(self.config.sample_rate, audio)
            streams.append(stream)
        decoded = self.decode_streams(streams, language, context,
                                      temperature=temperature, top_p=top_p,
                                      top_k=top_k)
        results = []
        for d in decoded:
            res = TranscriptionResult(
                text=d.text,
                segments=[{"char": s["char"], "start": s["start"]}
                          for s in (d.aligned or [])],
                ctc_text="".join(r.text for r in d.ctc_results),
                hotwords=d.hotwords, timings=d.timings)
            results.append(res)
        return results

    def cleanup(self):
        self.models.cleanup()


def create_asr_engine(checkpoint_dir: str,
                      tokens_path: Optional[str] = None,
                      tokenizer_path: Optional[str] = None,
                      hotwords_path: Optional[str] = None,
                      enable_ctc: bool = True,
                      similar_threshold: float = 0.6,
                      max_hotwords: int = 10,
                      verbose: bool = True,
                      **kwargs) -> FunASREngine:
    """Create and initialize the engine (raises on failure, like the
    reference ``create_asr_engine``, ``asr_engine.py:112-136``)."""
    engine = FunASREngine(
        checkpoint_dir=checkpoint_dir,
        tokens_path=tokens_path,
        tokenizer_path=tokenizer_path,
        hotwords_path=hotwords_path,
        enable_ctc=enable_ctc,
        similar_threshold=similar_threshold,
        max_hotwords=max_hotwords,
        **kwargs)
    if not engine.initialize(verbose=verbose):
        raise RuntimeError("Failed to initialize ASR engine")
    return engine

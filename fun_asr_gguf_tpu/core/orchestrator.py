"""High-level transcription orchestration.

Behavioral port of the reference orchestrator
(``fun_asr_gguf/core/orchestrator.py``): short/long strategy split at
``segment_size + 2 s``, the long path's windowing (size ``segment_size``,
step ``segment_size − overlap``) with per-segment decoding, timing
accumulation, overlap merge, SRT export, and the stats report format.
"""

import os
import time
from typing import List, Optional

import numpy as np

from ..audio import load_audio
from ..datatypes import RecognitionStream, Statistics, TranscriptionResult
from ..display import DisplayReporter
from ..srt_utils import generate_srt_file
from ..text_merge import merge_transcription_results
from .decoder import StreamDecoder
from .model_manager import ModelManager


def _n_audio(d_res) -> int:
    """Audio-token count: the explicit field when set (batched decode
    keeps the embedding on device), else the host embedding's length."""
    if getattr(d_res, "n_audio_tokens", 0):
        return int(d_res.n_audio_tokens)
    return int(d_res.audio_embd.shape[0]) if d_res.audio_embd is not None \
        else 0



class TranscriptionOrchestrator:
    """Drives full-file transcription."""

    def __init__(self, models: ModelManager):
        self.models = models
        self.decoder = StreamDecoder(models)
        self._batch_decoder = None

    def transcribe(self, audio_path: str, language: Optional[str] = None,
                   context: Optional[str] = None, verbose: bool = True,
                   segment_size: float = 60.0, overlap: float = 2.0,
                   start_second: Optional[float] = None,
                   duration: Optional[float] = None, srt: bool = False,
                   temperature: float = 0.3, top_p: float = 1.0,
                   top_k: int = 50, on_stream=None, on_stream_reset=None,
                   preloaded_audio=None,
                   parallel_segments: bool = False) -> TranscriptionResult:
        result = TranscriptionResult()
        with DisplayReporter(verbose=verbose, on_stream=on_stream,
                             on_stream_reset=on_stream_reset) as reporter:
            try:
                self._print_header(reporter, audio_path)

                reporter.print("\n[1] 加载音频...")
                t0 = time.perf_counter()
                if preloaded_audio is not None:
                    audio = preloaded_audio   # slicing already applied
                else:
                    audio = load_audio(audio_path,
                                       self.models.config.sample_rate,
                                       start_second=start_second,
                                       duration=duration)
                result.timings.load_audio = time.perf_counter() - t0

                audio_duration = len(audio) / self.models.config.sample_rate
                result.audio_seconds = audio_duration
                reporter.print(f"    音频长度: {audio_duration:.2f}s")
                if start_second:
                    reporter.print(f"    起始偏移: {start_second:.2f}s")
                base_offset = start_second if start_second else 0.0

                t_proc = time.perf_counter()
                if audio_duration <= segment_size + 2.0:
                    self._transcribe_short(
                        audio, result, language, context, verbose, reporter,
                        base_offset, temperature=temperature, top_p=top_p,
                        top_k=top_k)
                else:
                    self._transcribe_long(
                        audio, result, language, context, verbose,
                        segment_size, overlap, reporter, base_offset,
                        temperature=temperature, top_p=top_p, top_k=top_k,
                        parallel_segments=parallel_segments)
                result.timings.total = time.perf_counter() - t_proc
                self._print_stats(reporter, result)

                if srt and result.segments:
                    srt_path = os.path.splitext(audio_path)[0] + ".srt"
                    generate_srt_file(result.segments, srt_path)
                    reporter.print(
                        f"✓ 字幕已导出至: {os.path.basename(srt_path)}",
                        force=True)

                if result.text:
                    reporter.print("\n" + "-" * 30 + " 完整转录文本 "
                                   + "-" * 30, force=True)
                    reporter.print(result.text, force=True)
                    reporter.print("-" * 74 + "\n", force=True)
                return result
            except Exception as e:
                reporter.print(f"\n✗ 转录失败: {e}", force=True)
                raise

    def _transcribe_short(self, audio, result, language, context, verbose,
                          reporter, base_offset, temperature=0.3, top_p=1.0,
                          top_k=50):
        stream = RecognitionStream()
        stream.accept_waveform(self.models.config.sample_rate, audio)
        d_res = self.decoder.decode_stream(
            stream, language, context, verbose, reporter,
            temperature=temperature, top_p=top_p, top_k=top_k)

        for field in ["encode", "ctc", "prepare", "inject", "llm_generate",
                      "align", "ctc_infer", "ctc_decode", "hotword_verify",
                      "ctc_cast", "ctc_argmax", "ctc_loop"]:
            val = getattr(d_res.timings, field, 0.0)
            if val > 0 or getattr(result.timings, field, 0.0) == 0:
                setattr(result.timings, field, val)

        result.text = d_res.text
        result.segments = [{"char": seg["char"],
                            "start": seg["start"] + base_offset}
                           for seg in (d_res.aligned or [])]
        result.hotwords = d_res.hotwords
        if d_res.ctc_results:
            result.ctc_text = "".join(r.text for r in d_res.ctc_results)
        if verbose:
            self._print_performance_stats(reporter, d_res, audio,
                                          result.timings.inject,
                                          result.timings.llm_generate)

    def _transcribe_long(self, audio, result, language, context, verbose,
                         segment_size, overlap, reporter, base_offset,
                         temperature=0.3, top_p=1.0, top_k=50,
                         parallel_segments=False):
        reporter.print("    检测到长音频，开启分段识别模式...", force=True)
        reporter.skip_technical = True

        sr = self.models.config.sample_rate
        audio_duration = len(audio) / sr
        segments_info = []
        step = segment_size - overlap
        curr = 0.0
        while curr < audio_duration:
            end = min(curr + segment_size, audio_duration)
            segments_info.append((curr, end))
            if end >= audio_duration:
                break
            curr += step

        if parallel_segments and len(segments_info) > 1:
            decoded = self._decode_segments_batched(
                audio, segments_info, sr, language, context, reporter,
                temperature=temperature, top_p=top_p, top_k=top_k)
        else:
            decoded = []
            for idx, (s_s, e_s) in enumerate(segments_info):
                reporter.set_segment(idx + 1, len(segments_info))
                reporter.print(
                    f"\n--- 处理分段 [{s_s:.1f}s - {e_s:.1f}s] ---",
                    force=True)
                chunk = audio[int(s_s * sr):int(e_s * sr)]
                stream = RecognitionStream()
                stream.accept_waveform(sr, chunk)
                decoded.append(self.decoder.decode_stream(
                    stream, language, context, True, reporter,
                    temperature=temperature, top_p=top_p, top_k=top_k))

        segment_results = []
        for (s_s, e_s), d_res in zip(segments_info, decoded):
            segment_results.append({
                "text": d_res.text,
                "segments": d_res.aligned,
                "duration": e_s - s_s,
                "hotwords": d_res.hotwords,
                "ctc_text": "".join(r.text for r in d_res.ctc_results)
                            if d_res.ctc_results else "",
            })
            t, rt = d_res.timings, result.timings
            rt.encode += t.encode
            rt.ctc += t.ctc
            rt.ctc_infer += t.ctc_infer
            rt.ctc_decode += t.ctc_decode
            rt.ctc_cast += t.ctc_cast
            rt.ctc_argmax += t.ctc_argmax
            rt.ctc_loop += t.ctc_loop
            rt.hotword_verify += t.hotword_verify
            rt.prepare += t.prepare
            rt.inject += t.inject
            rt.llm_generate += t.llm_generate
            rt.align += t.align

        reporter.set_segment(0, 0)
        reporter.skip_technical = False

        offsets = [s[0] + base_offset for s in segments_info]
        full_text, full_segs = merge_transcription_results(
            segment_results, offsets, overlap)
        result.text = full_text
        result.segments = full_segs

        all_h, all_ctc = set(), []
        for r in segment_results:
            all_h.update(r["hotwords"])
            if r["ctc_text"]:
                all_ctc.append(r["ctc_text"])
        result.hotwords = list(all_h)
        result.ctc_text = "".join(all_ctc)

    def _decode_segments_batched(self, audio, segments_info, sr, language,
                                 context, reporter, temperature=0.3,
                                 top_p=1.0, top_k=50, group_size=8):
        """Decode all long-audio segments as batched device programs.

        TPU-native extension with no reference counterpart (the reference
        long path is strictly sequential, ``core/orchestrator.py:139-149``):
        segments ride the batch dimension of one encoder / CTC / prefill /
        generate program instead of N sequential pipelines. Groups are
        capped at ``group_size`` rows (bounds KV-cache HBM) and padded to
        power-of-2 buckets (bounds compile variants).
        """
        from .batch import BatchStreamDecoder, pad_streams_to_bucket
        if self._batch_decoder is None:
            self._batch_decoder = BatchStreamDecoder(self.models)

        n_total = len(segments_info)
        reporter.print(f"    并行模式: {n_total} 段批量解码...", force=True)
        decoded = []
        for g0 in range(0, n_total, group_size):
            group = segments_info[g0:g0 + group_size]
            streams = []
            for (s_s, e_s) in group:
                stream = RecognitionStream()
                stream.accept_waveform(sr, audio[int(s_s * sr):
                                                 int(e_s * sr)])
                streams.append(stream)
            padded, n_real = pad_streams_to_bucket(streams, sr)
            # latency-to-first-text: stream segment 1's tokens to the
            # console as each device chunk lands, instead of sitting
            # silent until every segment finishes (the text reprints
            # below once merged offsets/headers are known)
            on_chunk = None
            if g0 == 0 and self.models.tokenizer is not None:
                from ..formats.tokenizer import StreamTextDecoder
                s0, e0 = segments_info[0]
                reporter.set_segment(1, n_total)
                reporter.print(
                    f"\n--- 分段 [{s0:.1f}s - {e0:.1f}s] (实时) ---",
                    force=True)
                live = StreamTextDecoder(self.models.tokenizer, reporter)
                stop_set = set(self.models.stop_tokens) | {
                    self.models.eos_token}

                def on_chunk(toks, _live=live, _stops=stop_set):
                    for t in toks[0].tolist():
                        if t >= 0 and t not in _stops:
                            _live.push(t)

            results = self._batch_decoder.decode_streams(
                padded, language, context, temperature=temperature,
                top_p=top_p, top_k=top_k, n_real=n_real,
                on_chunk=on_chunk)
            if g0 == 0 and on_chunk is not None:
                live.flush()
                reporter.print("", force=True)
            decoded.extend(results[:n_real])

        for idx, ((s_s, e_s), d_res) in enumerate(zip(segments_info,
                                                      decoded)):
            reporter.set_segment(idx + 1, n_total)
            reporter.print(f"\n--- 分段 [{s_s:.1f}s - {e_s:.1f}s] ---",
                           force=True)
            reporter.print(d_res.text, force=True)
        return decoded

    def _print_header(self, reporter, audio_path):
        line = "=" * 70
        reporter.print(f"\n{line}", force=True)
        reporter.print(f"处理音频: {os.path.basename(audio_path)}", force=True)
        reporter.print(f"{line}", force=True)

    def _print_stats(self, reporter, result):
        t = result.timings
        reporter.print("\n[转录耗时]")
        reporter.print(f"  - 音频编码： {t.encode*1000:5.0f}ms")
        reporter.print(f"  - CTC解码：  {t.ctc*1000:5.0f}ms "
                       f"(Infer: {t.ctc_infer*1000:.0f}ms, "
                       f"Dec: {t.ctc_decode*1000:.0f}ms, "
                       f"HW: {t.hotword_verify*1000:.0f}ms)")
        reporter.print(f"  - Prompt:    {t.prepare*1000:5.0f}ms")
        reporter.print(f"  - LLM读取：  {t.inject*1000:5.0f}ms")
        reporter.print(f"  - LLM生成：  {t.llm_generate*1000:5.0f}ms")
        reporter.print(f"  - 时间对齐： {t.align*1000:5.0f}ms")
        reporter.print(f"  - 推理总计： {t.total:5.2f}s\n")

    def _print_performance_stats(self, reporter, d_res, audio, t_inject,
                                 t_llm):
        stats = Statistics(
            audio_duration=len(audio) / self.models.config.sample_rate,
            n_input_tokens=(_n_audio(d_res) + d_res.n_prefix
                            + d_res.n_suffix),
            n_prefix_tokens=d_res.n_prefix,
            n_audio_tokens=_n_audio(d_res),
            n_suffix_tokens=d_res.n_suffix,
            n_generated_tokens=d_res.n_gen)
        if t_inject > 0:
            stats.tps_in = stats.n_input_tokens / t_inject
        if t_llm > 0:
            stats.tps_out = d_res.n_gen / t_llm
        reporter.print(f"\n[统计]\n{stats}")

"""Per-segment decode pipeline: encode → CTC+hotwords → prompt → LLM → align.

Behavioral port of the reference decoders (``fun_asr_gguf/core/decoder.py``)
on top of the jitted TPU programs:

* :class:`CTCDecoder` — CTC forward (device argmax, only int32 indices come
  back) + greedy decode + hotword recall;
* :class:`LLMDecoder` — embedding-injection prefill + chunked on-device
  generation with streaming text assembly; reports inject/generate timings
  like the reference's Timings;
* :class:`StreamDecoder` — orchestration incl. the retry-with-hotter-
  temperature loop on repetition aborts (+0.3, up to 6 attempts,
  ``core/decoder.py:201-211``).
"""

import logging
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger("fun_asr_gguf_tpu.core")

from ..ctc import align_timestamps, decode_ctc
from ..datatypes import (DecodeResult, LLMDecodeResult, RecognitionStream,
                         Timings)
from ..display import DisplayReporter
from ..formats.tokenizer import StreamTextDecoder
from .model_manager import ModelManager

ABORT_MARKER = "====解码有误，强制熔断===="


def beam_recall_text(models: ModelManager, topk_row, greedy_text: str
                     ) -> str:
    """Prefix-beam transcript for hotword recall (shared by the single-
    stream and batched decoders). topk_row = one stream's (vals [T,k],
    ids [T,k], blank [T]) host arrays; falls back to the greedy text."""
    try:
        from ..ctc_beam import beam_decode
        vals, ids, blank = topk_row
        return beam_decode(
            (vals[None], ids[None], blank[None]),
            models.ctc_id2token,
            beam_size=models.config.ctc_beam_size,
            hotwords=list(models.corrector.hotwords),
            char_bonus=models.config.hotword_beam_bonus,
            blank_id=models.hybrid_cfg.ctc.vocab_size - 1,
        ) or greedy_text
    except Exception:
        logger.exception("ctc beam search failed; using greedy")
        return greedy_text


class CTCDecoder:
    """CTC inference + hotword recall."""

    def __init__(self, models: ModelManager):
        self.models = models

    def decode(self, enc_output, enable_ctc: bool, max_hotwords: int
               ) -> Tuple[List, List[str], Optional[str], Dict[str, float]]:
        """Returns (ctc_results, hotwords, draft_text, t_stats).

        ``draft_text`` is the best transcript prediction available for
        CTC-draft speculative decoding: the hotword-corrected recall text
        when correction ran (the LLM is prompted with those hotwords, so
        it tends to emit the corrected form), else the recall transcript
        (beam when enabled, greedy otherwise). Greedy ``ctc_results``
        remain the timestamp source.
        """
        t_stats = {"infer": 0.0, "decode": 0.0, "hotword": 0.0}
        if not enable_ctc or not self.models.ctc_id2token:
            return [], [], None, t_stats

        # beam recall shares ONE device program with the greedy path (the
        # [T, vocab] projection runs once); without hotwords the beam
        # result would be discarded, so run plain argmax then
        beam = self.models.beam_recall_enabled
        t0 = time.perf_counter()
        if beam:
            vals, ids, blank, argmax = self.models.ctc_topk(enc_output)
            indices = argmax[0]
        else:
            indices = self.models.ctc_indices(enc_output)
        t_stats["infer"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ctc_text, ctc_results, ctc_details = decode_ctc(
            indices, self.models.ctc_id2token)
        t_stats["decode"] = time.perf_counter() - t0
        t_stats.update(ctc_details)

        # prefix beam search: a better transcript for hotword recall, with
        # shallow-fusion bonuses toward the hotword list. Greedy stays the
        # timestamp source (exact frame indices).
        recall_text = ctc_text
        if beam and ctc_text:
            t0 = time.perf_counter()
            recall_text = beam_recall_text(
                self.models, (vals[0], ids[0], blank[0]), ctc_text)
            t_stats["decode"] += time.perf_counter() - t0

        hotwords: List[str] = []
        draft_text = recall_text or None
        t0 = time.perf_counter()
        if (self.models.corrector and self.models.corrector.hotwords
                and recall_text):
            res = self.models.corrector.correct(recall_text, k=max_hotwords)
            candidates = set()
            for _, hw, _ in res.matchs:
                candidates.add(hw)
            for _, hw, _ in res.similars:
                candidates.add(hw)
            hotwords = list(candidates)
            if res.text:
                draft_text = res.text
        t_stats["hotword"] = time.perf_counter() - t0
        return ctc_results, hotwords, draft_text, t_stats


class LLMDecoder:
    """Generation loop driver (chunked on-device generation)."""

    def __init__(self, models: ModelManager):
        self.models = models

    def decode(self, full_embd: np.ndarray, n_input_tokens: int,
               n_predict: int, stream_output: bool = False,
               reporter: Optional[DisplayReporter] = None,
               temperature: float = 0.3, top_p: float = 1.0,
               top_k: int = 50,
               draft_text: Optional[str] = None) -> LLMDecodeResult:
        res = LLMDecodeResult()
        models = self.models

        t0 = time.perf_counter()
        seed = int(np.random.randint(0, 2 ** 31 - 1))
        state = models.prefill(full_embd, rng_seed=seed)
        state.logits.block_until_ready()
        res.t_inject = time.perf_counter() - t0

        # CTC-draft speculative decoding: the CTC transcript predicts the
        # LLM output, so verify spec_k drafted tokens per device step
        # (distribution-preserving — see models/speculative.py)
        draft_ids = None
        if models.config.speculative and draft_text:
            draft_ids = models.make_draft_ids(draft_text)
        if draft_ids is not None:
            state = models.spec_prepare(state)

        t0 = time.perf_counter()
        text_decoder = StreamTextDecoder(
            models.tokenizer, reporter if stream_output else None)
        # fixed moderate chunk + host loop: keeps the while-loop program's
        # compile time bounded (XLA compile cost grows superlinearly with
        # the chunk buffer) and enables streaming; the carry stays on device
        chunk_len = models._default_chunk_len()
        generated = 0
        stop_set = set(models.stop_tokens) | {models.eos_token}
        first_spec = True

        def push_toks(toks_np) -> int:
            n = 0
            for t in toks_np.tolist():
                if t < 0:
                    continue
                n += 1
                if t in stop_set:
                    continue
                text_decoder.push(t)
            return n

        done_early = False
        while generated < n_predict and draft_ids is not None:
            todo = min(chunk_len, n_predict - generated)
            if first_spec:
                # probe: cap the first spec chunk so the acceptance
                # guardrail below can bail after ≤16 emissions instead
                # of paying a full chunk of verify passes on a bad
                # draft — `limit` is traced, so this reuses the same
                # compiled program (no extra compile)
                todo = min(todo, 16)
                first_spec = False
            state, tokens = models.spec_generate(
                state, draft_ids, temperature=temperature, top_p=top_p,
                top_k=top_k, chunk_len=chunk_len, limit=todo)
            # spec chunks may emit fewer than `todo` (budget-truncated
            # acceptance at the chunk boundary); count what actually came
            n_emitted = push_toks(np.asarray(tokens)[0])
            generated += n_emitted
            if bool(np.asarray(state.done)[0]):
                done_early = True
                break
            if n_emitted == 0:
                done_early = True
                break   # safety: no forward progress should be impossible

            # acceptance-rate guardrail: a verify round costs about one
            # decode step (plus K-lane sampling when T > 0), so drafting
            # below ~spec_min_accept emitted tokens/round is slower than
            # plain decode — abandon the draft and continue un-drafted.
            # A pending `forbid` (probabilistic rejection at the chunk
            # boundary) rides along: spec_to_gen hands it to the plain
            # chunk's first draw, which consumes it exactly.
            rounds = int(np.asarray(state.rounds)[0])
            min_acc = getattr(models.config, "spec_min_accept", 1.35)
            if (rounds >= 8 and min_acc > 0
                    and generated / rounds < min_acc):
                from ..models.speculative import spec_to_gen
                logger.info(
                    "speculation off: %.2f tokens/round < %.2f "
                    "(%d rounds)", generated / rounds, min_acc, rounds)
                state = spec_to_gen(state)
                draft_ids = None

        # plain chunks, PIPELINED: dispatch chunk k+1 before fetching
        # chunk k — the ~10-40 ms tunnel fetch overlaps device execution
        # (the chunk program's device loop exits immediately once done,
        # so a speculatively dispatched trailing chunk is ~free).
        # state.done is snapshotted out because the next dispatch
        # DONATES the state's buffers.
        pending = None
        while not done_early and generated < n_predict:
            todo = min(chunk_len, n_predict - generated)
            state, tokens = models.generate(
                state, temperature=temperature, top_p=top_p, top_k=top_k,
                chunk_len=chunk_len, limit=todo)
            generated += todo
            prev_done = False
            if pending is not None:
                toks_prev, done_prev = jax.device_get(pending)
                push_toks(toks_prev[0])
                prev_done = bool(done_prev[0])
            pending = (tokens, jnp.copy(state.done))
            if prev_done:
                break
        if pending is not None:
            toks_prev, _ = jax.device_get(pending)
            push_toks(toks_prev[0])
        res.is_aborted = bool(np.asarray(state.aborted)[0])
        text_decoder.flush()

        res.text = text_decoder.generated_text
        res.n_gen = int(np.asarray(state.n_gen)[0])
        res.t_gen = time.perf_counter() - t0
        return res


class StreamDecoder:
    """Full per-segment pipeline."""

    def __init__(self, models: ModelManager):
        self.models = models
        self.ctc_decoder = CTCDecoder(models)
        self.llm_decoder = LLMDecoder(models)

    def decode_stream(self, stream: RecognitionStream,
                      language: Optional[str] = None,
                      context: Optional[str] = None,
                      verbose: bool = True,
                      reporter: Optional[DisplayReporter] = None,
                      temperature: float = 0.3, top_p: float = 1.0,
                      top_k: int = 50) -> DecodeResult:
        timings = Timings()

        # 1. Encode
        if reporter:
            reporter.print("\n[2] 音频编码...")
        t0 = time.perf_counter()
        audio_embd, enc_output = self.models.encode_audio(stream.audio_data)
        timings.encode = time.perf_counter() - t0
        if reporter:
            reporter.print(f"    耗时: {timings.encode*1000:.2f}ms")

        # 2. CTC + hotwords
        if reporter:
            reporter.print("\n[3] CTC 解码...")
        t0 = time.perf_counter()
        ctc_results, hotwords, draft_text, ctc_times = \
            self.ctc_decoder.decode(
                enc_output, self.models.config.enable_ctc,
                self.models.config.max_hotwords)
        timings.ctc = time.perf_counter() - t0
        timings.ctc_infer = ctc_times["infer"]
        timings.ctc_decode = ctc_times["decode"]
        timings.hotword_verify = ctc_times["hotword"]
        timings.ctc_cast = ctc_times.get("cast", 0.0)
        timings.ctc_argmax = ctc_times.get("argmax", 0.0)
        timings.ctc_loop = ctc_times.get("loop", 0.0)

        if verbose and ctc_results and reporter:
            ctc_text = "".join(r.text for r in ctc_results)
            reporter.print(f"    CTC: {ctc_text}")
            if hotwords:
                reporter.print(f"    热词: {hotwords}")
        if reporter:
            reporter.print(
                f"    耗时: {timings.ctc*1000:.2f}ms "
                f"(Infer: {timings.ctc_infer*1000:.0f}ms, "
                f"Dec: {timings.ctc_decode*1000:.0f}ms, "
                f"HW: {timings.hotword_verify*1000:.0f}ms)")

        # 3. Prompt
        if reporter:
            reporter.print("\n[4] 准备 Prompt...")
        # opt-in correction-history RAG (config.rectify_path): retrieved
        # "wrong => right" entries join the LLM context for this segment
        context = self.models.augment_context(context, draft_text)

        t0 = time.perf_counter()
        p_embd, s_embd, n_p, n_s, p_text = \
            self.models.prompt_builder.build_prompt(hotwords, language,
                                                    context)
        timings.prepare = time.perf_counter() - t0
        if verbose and reporter:
            reporter.print("-" * 15 + " Prefix Prompt " + "-" * 15 + "\n"
                           + p_text + "\n" + "-" * 40)
        if reporter:
            reporter.print(f"    Prefix: {n_p} tokens")
            reporter.print(f"    Suffix: {n_s} tokens")

        # 4. LLM (retry with hotter temperature on repetition aborts)
        if reporter:
            reporter.print("\n[5] LLM 解码...")
            reporter.print("=" * 70)
        full_embd = np.concatenate(
            [p_embd, audio_embd.astype(np.float32), s_embd], axis=0)

        # stream pieces when printing verbosely OR when a callback is
        # attached (the server's SSE mode runs verbose=False)
        stream_output = verbose or (
            reporter is not None and getattr(reporter, "on_stream", None))
        # the (hotword-corrected) CTC transcript doubles as the
        # speculative-decoding draft — set by CTCDecoder.decode above
        llm_res = None
        for _ in range(6):
            llm_res = self.llm_decoder.decode(
                full_embd, full_embd.shape[0], self.models.config.n_predict,
                stream_output=bool(stream_output), reporter=reporter,
                temperature=temperature, top_p=top_p, top_k=top_k,
                draft_text=draft_text)
            if not llm_res.is_aborted:
                break
            temperature += 0.3
            llm_res.text += ABORT_MARKER
            if reporter is not None and hasattr(reporter, "stream_reset"):
                # tell streaming consumers (SSE) the aborted attempt's
                # pieces are being discarded before the retry re-emits
                reporter.stream_reset()
            print(f"\n\n[!] 触发重试 (Temp -> {temperature:.1f})\n")

        # opt-in regex rule correction (config.rules_path) — applied
        # before alignment so timestamps follow the corrected text
        text = self.models.apply_rules(llm_res.text.strip())
        timings.inject = llm_res.t_inject
        timings.llm_generate = llm_res.t_gen
        if reporter:
            reporter.print("\n" + "=" * 70)

        # 5. Align
        if reporter:
            reporter.print("\n[6] 时间戳对齐")
        t0 = time.perf_counter()
        aligned = None
        timestamps: List[float] = []
        tokens: List[str] = []
        if ctc_results:
            aligned = align_timestamps(ctc_results, text)
            if aligned:
                tokens = [seg["char"] for seg in aligned]
                timestamps = [seg["start"] for seg in aligned]
        timings.align = time.perf_counter() - t0

        if reporter and aligned:
            reporter.print(f"    对齐耗时: {timings.align*1000:.2f}ms")
            preview = " ".join(f"{r['char']}({r['start']:.2f}s)"
                               for r in aligned[:10])
            if len(aligned) > 10:
                preview += " ..."
            reporter.print(f"    结果预览: {preview}")

        stream.set_result(text=text, timestamps=timestamps, tokens=tokens)
        return DecodeResult(
            text=text, ctc_results=ctc_results, aligned=aligned,
            audio_embd=audio_embd,
            n_audio_tokens=int(audio_embd.shape[0]),
            n_prefix=n_p, n_suffix=n_s,
            n_gen=llm_res.n_gen, timings=timings, hotwords=hotwords,
            is_aborted=llm_res.is_aborted)

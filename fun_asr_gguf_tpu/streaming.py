# coding: utf-8
"""True incremental (streaming) transcription.

The reference's "streaming" surface is a stub — audio is buffered and
decoded whole-segment (``nano_dataclass.py:30-69``); its first text
arrives only after the full segment decodes. This module is the
TPU-native extension: text starts flowing while audio is still arriving.

Per ``feed()`` tick:

1. **Windowed re-encode.** The audio so far is padded to the engine's
   static window ladder and runs the SAME jitted encoder program the
   batch path uses (``ModelManager.encode_audio``) — the SANM encoder is
   bidirectional, so the whole window re-encodes (7.5 ms for 60 s on
   v5e; incremental encoding would change already-emitted frames
   anyway).
2. **Rolling CTC.** The CTC head + greedy collapse over the window gives
   an instant provisional transcript (and, at ``finish()``, timestamps).
3. **Prefill-extend.** The ChatML prefix KV is computed ONCE per session
   (``qwen3_prefill`` over the prefix embeds); each tick extends it with
   ``[audio-embeds ++ suffix ++ pad]`` through one multi-token
   ``qwen3_verify_step`` pass at a static bucket length — re-prefilling
   only what changed. Pad-slot writes land ABOVE the decode start and
   every decode step overwrites its slot before exposing it, so the
   junk tail is never attended (the verify pass's rewind-safety
   property).
4. **Bounded partial decode.** A greedy ``generate_chunk`` run (budget
   scales with audio fed) yields the partial LLM transcript.

``finish()`` hands the buffered audio to the UNMODIFIED batch decoder
(``StreamDecoder.decode_stream``) — final text, hotword recall,
timestamp alignment and stats are byte-identical to non-streaming use.

**Unbounded sessions.** When the fed audio reaches one segment window
(``segment_size``, default the engine's pad window), the session *rolls
over*: the completed window is decoded once through the full batch path
(hotwords, alignment — the orchestrator's per-segment quality), its
result is committed, and only the ``overlap`` tail stays buffered — the
exact windowing of the long-audio orchestrator (size ``segment_size``,
step ``size − overlap``; ``core/orchestrator.py``). Memory is O(window)
in audio and O(text) in committed results, so a session can run
indefinitely; ``finish()`` merges committed segments with the same
anchor-overlap merge the batch long path uses, and a session that never
filled one window returns a byte-identical single-segment result.
"""

import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .datatypes import DecodeResult, RecognitionStream
from .frontend import audio_token_length
from .models.generate import RING, GenState, generate_chunk
from .models.qwen3 import qwen3_prefill, qwen3_verify_step


@partial(jax.jit, static_argnames=("t_ext",))
def _assemble_chunk(embd, suffix, n_audio, t_ext):
    """Build the extension chunk ON DEVICE: [audio-embd ++ suffix ++ 0]
    in the static ``t_ext`` bucket. The previous host-side assembly
    fetched the full window embedding (~MBs) and re-uploaded a ~6 MB
    f32 chunk every tick — over a ~25 MB/s tunnel that round-trip was
    most of the first-partial latency."""
    b, t, h = embd.shape
    if t > t_ext:
        # the encoder's padded window can carry a few more slots than
        # the extension bucket; everything past the bucket is pad
        # garbage by construction (n_audio + n_suffix <= t_ext)
        embd = embd[:, :t_ext]
        t = t_ext
    mask = (jnp.arange(t, dtype=jnp.int32)[None, :, None]
            < n_audio)                       # zero the pad/garbage tail
    out = jnp.zeros((b, t_ext, h), embd.dtype)
    out = jax.lax.dynamic_update_slice(
        out, jnp.where(mask, embd, 0), (0, 0, 0))
    return jax.lax.dynamic_update_slice(
        out, suffix.astype(embd.dtype)[None], (0, n_audio, 0))


@partial(jax.jit, static_argnames=("cfg",))
def _extend_prefix(params, prefix_kv, chunk, slots, positions, valid_from,
                   last, cfg):
    """One jitted program: verify-pass extension of the cached prefix KV
    + the last-valid-position logits slice."""
    vlogits, kv = qwen3_verify_step(params, prefix_kv, chunk, slots,
                                    positions, valid_from, cfg)
    logits = jax.lax.dynamic_index_in_dim(vlogits, last, axis=1,
                                          keepdims=False)       # [B, V]
    return logits, kv


@dataclass
class StreamingPartial:
    """One ``feed()`` tick's provisional output."""
    text: str                 # partial LLM transcript of the CURRENT window
    ctc_text: str             # rolling CTC transcript (current window)
    seconds: float            # audio fed so far (committed + buffered)
    latency_ms: float         # this tick's wall time (feed → text)
    n_tokens: int = 0         # partial tokens decoded
    committed_text: str = ""  # final-quality text of rolled-over segments

    @property
    def full_text(self) -> str:
        """committed (final-quality) text ++ the current provisional.

        The current window re-transcribes the rollover overlap, so its
        partial can repeat the committed tail; an exact suffix/prefix
        anchor is dropped here. When the two passes transcribe the
        overlap *differently* (no exact anchor), the duplication stays
        visible until the next commit merges it properly — partials are
        provisional by contract."""
        if not self.committed_text:
            return self.text
        c, p = self.committed_text, self.text
        for k in range(min(len(c), len(p)), 1, -1):
            if c.endswith(p[:k]):
                return c + p[k:]
        return c + p


@dataclass
class StreamingStats:
    first_text_ms: Optional[float] = None   # first chunk fed → first
    #                                         nonempty partial text
    first_ctc_ms: Optional[float] = None
    ticks: List[float] = field(default_factory=list)


class StreamingSession:
    """Incremental transcription over an unbounded audio stream.

    Partials run WITHOUT hotword injection (hotwords would edit the
    cached prefix); committed rollover segments and ``finish()`` are the
    full pipeline, hotwords included.

    ``segment_size``/``overlap`` control the rollover windowing
    (defaults: the engine's pad window; overlap ``min(2 s, size/4)``) —
    chosen to match the long-audio orchestrator so a streamed file and a
    batch-transcribed file take identical segment boundaries.
    ``temperature``/``top_p``/``top_k`` apply to committed-segment
    decodes (a rollover happens mid-stream, before ``finish()``'s
    sampling arguments exist).
    """

    def __init__(self, models, language: Optional[str] = None,
                 context: Optional[str] = None,
                 partial_tokens: int = 48,
                 extend_bucket: Optional[int] = None,
                 segment_size: Optional[float] = None,
                 overlap: Optional[float] = None,
                 temperature: float = 0.4, top_p: float = 1.0,
                 top_k: int = 50):
        self.models = models
        self.language = language
        self.context = context
        self.partial_tokens = int(partial_tokens)
        cfg = models.hybrid_cfg.llm
        self._cfg = cfg

        # prompt prefix/suffix embeds, once per session (no hotwords)
        ctx = models.augment_context(context, None) if context else context
        p_embd, s_embd, self._n_prefix, self._n_suffix, _ = \
            models.prompt_builder.build_prompt(None, language, ctx)
        self._suffix = s_embd.astype(np.float32)
        self._suffix_dev = jnp.asarray(self._suffix,
                                       models._compute_dtype)

        # extension bucket: audio tokens for the LARGEST window + suffix,
        # rounded up to 32 (one static verify shape per session config)
        max_window = int(models.config.segment_pad_seconds
                         * models.config.sample_rate)
        need = audio_token_length(max_window) + self._n_suffix
        if extend_bucket and extend_bucket < need:
            # the on-device chunk assembly clamps writes into the static
            # bucket; an undersized user bucket would silently truncate
            # valid audio tokens instead of erroring
            raise ValueError(
                f"extend_bucket={extend_bucket} is smaller than the "
                f"window needs ({need} = audio tokens + suffix); omit it "
                "or pass a larger value")
        self._t_ext = extend_bucket or (-(-need // 32) * 32)
        self._cap = (self._n_prefix + self._t_ext
                     + self.partial_tokens + 8)

        # prefix KV, once (the "prefill" the extension extends)
        pre = jnp.asarray(p_embd[None], models._compute_dtype)
        mask = jnp.ones((1, self._n_prefix), jnp.float32)
        _logits, self._prefix_kv = qwen3_prefill(
            models.llm_params, pre, mask, cfg, kv_max_len=self._cap)

        self._buf = np.zeros((0,), np.float32)
        self._t0: Optional[float] = None
        self.stats = StreamingStats()
        from .formats.tokenizer import StreamTextDecoder
        self._mk_decoder = lambda: StreamTextDecoder(models.tokenizer)

        # rollover windowing (orchestrator-identical: step = size − ov)
        sr = models.config.sample_rate
        seg_s = (float(segment_size) if segment_size
                 else float(models.config.segment_pad_seconds))
        if seg_s > float(models.config.segment_pad_seconds):
            # silently clamping would move rollover boundaries away from
            # a batch transcribe() run with the same segment_size,
            # breaking the identical-boundaries contract above
            raise ValueError(
                f"segment_size={seg_s} exceeds the engine's pad window "
                f"(segment_pad_seconds="
                f"{models.config.segment_pad_seconds}); create the "
                "engine with a larger segment_pad_seconds or use a "
                "smaller segment_size")
        ov_s = (float(overlap) if overlap is not None
                else min(2.0, seg_s / 4.0))
        if not 0.0 <= ov_s < seg_s:
            raise ValueError(f"overlap {ov_s} must be in [0, "
                             f"segment_size={seg_s})")
        self.segment_size, self.overlap = seg_s, ov_s
        self._seg_samples = int(seg_s * sr)
        self._step_samples = self._seg_samples - int(ov_s * sr)
        self._temperature, self._top_p, self._top_k = \
            float(temperature), float(top_p), int(top_k)
        self._committed: List[dict] = []   # orchestrator segment dicts
        self._offsets: List[float] = []    # absolute segment starts (s)
        self._consumed = 0                 # samples before buffer start
        self._committed_text = ""
        self._seg_decoder = None

    # -- internals --------------------------------------------------------

    def _extend_and_decode(self, audio_embd, n_audio: int):
        """verify-pass extension + bounded greedy decode over a
        DEVICE-resident window embedding ([1, T, h]; valid length
        ``n_audio``). Returns the partial-token DEVICE array (the
        caller fetches it together with the CTC indices — one sync per
        tick); decode text with :meth:`_decode_partial_tokens`."""
        m = self.models
        cfg = self._cfg
        n_valid = n_audio + self._n_suffix
        chunk_dev = _assemble_chunk(
            audio_embd.astype(m._compute_dtype),
            self._suffix_dev, jnp.asarray(n_audio, jnp.int32),
            self._t_ext)
        positions = (self._n_prefix
                     + jnp.arange(self._t_ext, dtype=jnp.int32))[None, :]
        logits, kv = _extend_prefix(
            m.llm_params, self._prefix_kv, chunk_dev,
            jnp.asarray([self._n_prefix], jnp.int32), positions,
            jnp.asarray([0], jnp.int32),
            jnp.asarray(n_valid - 1, jnp.int32), cfg)
        plen = jnp.asarray([self._n_prefix + n_valid], jnp.int32)
        state = GenState(
            kv=kv, logits=logits, prompt_len=plen,
            valid_from=jnp.zeros((1,), jnp.int32),
            step=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(0),
            ring=jnp.full((1, RING), -1, jnp.int32),
            n_gen=jnp.zeros((1,), jnp.int32),
            done=jnp.zeros((1,), bool),
            aborted=jnp.zeros((1,), bool),
            forbid=jnp.full((1,), -1, jnp.int32),
            # traced base slot: one compiled decode serves every tick
            prompt_slots=jnp.asarray(self._n_prefix + n_valid, jnp.int32))

        # partial budget grows with audio (≈ tokens the audio can carry)
        budget = min(self.partial_tokens,
                     8 + n_audio)
        chunk_len = self.partial_tokens
        state, tokens = generate_chunk(
            m.llm_params, state, cfg, jnp.asarray(0.0), jnp.asarray(1.0),
            50, chunk_len=chunk_len, stop_tokens=m.stop_tokens,
            limit=jnp.asarray(budget, jnp.int32), greedy=True)
        return tokens      # device array — caller fetches (one sync)

    def _decode_partial_tokens(self, toks_np) -> tuple:
        m = self.models
        dec = self._mk_decoder()
        stop = set(m.stop_tokens) | {m.eos_token}
        n_toks = 0
        for t in toks_np[0].tolist():
            if t < 0 or t in stop:
                continue
            dec.push(t)
            n_toks += 1
        dec.flush()
        return dec.generated_text.strip(), n_toks

    def _decode_buffer(self, temperature, top_p, top_k) -> DecodeResult:
        """Full batch-path decode of the current buffer (one segment)."""
        from .core.decoder import StreamDecoder
        if self._seg_decoder is None:
            self._seg_decoder = StreamDecoder(self.models)
        stream = RecognitionStream()
        stream.accept_waveform(self.models.config.sample_rate, self._buf)
        return self._seg_decoder.decode_stream(
            stream, self.language, self.context, verbose=False,
            temperature=temperature, top_p=top_p, top_k=top_k)

    def _commit(self, d_res: DecodeResult):
        """Append one segment's final-quality result; refresh the merged
        committed text."""
        sr = self.models.config.sample_rate
        self._offsets.append(self._consumed / sr)
        self._committed.append({
            "text": d_res.text,
            "segments": d_res.aligned,
            "duration": len(self._buf) / sr,
            "hotwords": d_res.hotwords,
            "ctc_results": d_res.ctc_results,
            "ctc_text": "".join(r.text for r in d_res.ctc_results)
                        if d_res.ctc_results else "",
            "timings": d_res.timings,
            "n_gen": d_res.n_gen,
        })
        # incremental merge: fold ONLY the new segment into the running
        # char/timestamp accumulator, then FREEZE everything the next
        # window's merge can never revisit (its overlap lookback starts
        # at next_offset − 1 s). Per-commit algorithmic work is O(active
        # window), not O(session history) — unbounded sessions never
        # re-run SequenceMatcher over old text; finish() still runs the
        # authoritative full merge.
        from .text_merge import PUNCS, finalize_merge, merge_step
        first = len(self._committed) == 1
        off = self._offsets[-1]
        tail = merge_step(
            getattr(self, "_merged_tail", []),
            {"text": d_res.text, "segments": d_res.aligned},
            off, self.overlap, first=first)
        if not hasattr(self, "_frozen_text"):
            self._frozen_text, self._frozen_last = "", ""
        next_lookback = off + (self.segment_size - self.overlap) - 1.0
        keep_from = 0
        while (keep_from < len(tail) - 1
               and tail[keep_from]["start"] < next_lookback):
            keep_from += 1
        for s in tail[:keep_from]:   # incremental finalize (dedup carry)
            ch = s["char"]
            if self._frozen_last and ch in PUNCS \
                    and ch == self._frozen_last:
                continue
            self._frozen_text += ch
            self._frozen_last = ch
        self._merged_tail = tail[keep_from:]
        if first:
            self._committed_text = d_res.text
        else:
            tail_text, _ = finalize_merge(self._merged_tail,
                                          prev_char=self._frozen_last)
            self._committed_text = self._frozen_text + tail_text

    def _rollover(self):
        """The buffer holds one full window: decode it through the batch
        path, commit, keep only the overlap tail (step = size − ov)."""
        d_res = self._decode_buffer(self._temperature, self._top_p,
                                    self._top_k)
        d_res.audio_embd = None    # keep unbounded sessions O(text)
        self._commit(d_res)
        self._buf = self._buf[self._step_samples:].copy()
        self._consumed += self._step_samples

    # -- public surface ---------------------------------------------------

    @property
    def seconds(self) -> float:
        return (self._consumed + len(self._buf)) \
            / self.models.config.sample_rate

    @property
    def committed_text(self) -> str:
        """Merged final-quality text of all rolled-over segments."""
        return self._committed_text

    def feed(self, audio: np.ndarray,
             sample_rate: Optional[int] = None) -> StreamingPartial:
        """Append an audio chunk (mono float in [-1, 1]) and return the
        updated provisional transcript."""
        m = self.models
        sr = m.config.sample_rate
        if sample_rate is not None and sample_rate != sr:
            raise ValueError(f"expected {sr} Hz audio, got {sample_rate} "
                             "(resample before feeding, e.g. via "
                             "audio.load_audio)")
        t_tick = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if self._t0 is None:
            self._t0 = t_tick
        # consume up to window boundaries; each full window rolls over
        # (a chunk larger than the step can trigger several rollovers)
        while len(self._buf) + len(audio) > self._seg_samples:
            take = self._seg_samples - len(self._buf)
            self._buf = np.concatenate([self._buf, audio[:take]])
            audio = audio[take:]
            self._rollover()
        self._buf = np.concatenate([self._buf, audio])

        text, ctc_text, n_toks = "", "", 0
        if len(self._buf):
            # dispatch the WHOLE tick (encode → CTC → chunk assembly →
            # prefix-extend → partial decode) before the first fetch:
            # dispatches queue asynchronously, so the tick pays ONE
            # device→host sync instead of one per stage (each sync over
            # the tunnel costs ~RTT ≈ tens of ms)
            embd_dev, enc, n_audio = m.encode_audio_device(self._buf)
            idx_dev = None
            if m.config.enable_ctc and m.ctc_id2token:
                idx_dev = m._ctc_fn(m.ctc_params, enc)
            tokens_dev = self._extend_and_decode(embd_dev, n_audio)
            if idx_dev is not None:
                from .ctc import decode_ctc
                indices, toks_np = jax.device_get((idx_dev, tokens_dev))
                ctc_text, _, _ = decode_ctc(np.asarray(indices)[0],
                                            m.ctc_id2token)
            else:
                toks_np = jax.device_get(tokens_dev)
            text, n_toks = self._decode_partial_tokens(np.asarray(toks_np))

        now = time.perf_counter()
        tick_ms = (now - t_tick) * 1000.0
        self.stats.ticks.append(tick_ms)
        since_first = (now - self._t0) * 1000.0
        if text and self.stats.first_text_ms is None:
            self.stats.first_text_ms = since_first
        if ctc_text and self.stats.first_ctc_ms is None:
            self.stats.first_ctc_ms = since_first
        return StreamingPartial(text=text, ctc_text=ctc_text,
                                seconds=self.seconds,
                                latency_ms=tick_ms, n_tokens=n_toks,
                                committed_text=self._committed_text)

    def finish(self, temperature: float = 0.4, top_p: float = 1.0,
               top_k: int = 50) -> DecodeResult:
        """Final decode through the standard batch path (hotwords,
        alignment, retry policy — identical to non-streaming).

        A session that stayed within one window returns the plain
        single-segment ``DecodeResult``, byte-identical to
        ``decode_stream`` on the same audio. A rolled-over session
        decodes its residual buffer as the last window and merges all
        committed segments with the orchestrator's anchor-overlap merge
        — the same text the long-audio batch path produces (``aligned``
        carries absolute-time starts)."""
        if not self._committed:
            return self._decode_buffer(temperature, top_p, top_k)
        if len(self._buf):
            d_last = self._decode_buffer(temperature, top_p, top_k)
            d_last.audio_embd = None
            self._commit(d_last)
            self._buf = np.zeros((0,), np.float32)

        from .text_merge import merge_transcription_results
        full_text, full_segs = merge_transcription_results(
            [{"text": r["text"], "segments": r["segments"],
              "duration": r["duration"]} for r in self._committed],
            self._offsets, self.overlap)
        self._committed_text = full_text
        merged = DecodeResult(text=full_text, aligned=full_segs)
        seen = set()
        for r in self._committed:
            merged.ctc_results.extend(r["ctc_results"])
            merged.n_gen += r["n_gen"]
            for h in r["hotwords"]:
                if h not in seen:
                    seen.add(h)
                    merged.hotwords.append(h)
            t = r["timings"]
            for f in ("encode", "ctc", "ctc_infer", "ctc_decode",
                      "ctc_cast", "ctc_argmax", "ctc_loop",
                      "hotword_verify", "prepare", "inject",
                      "llm_generate", "align"):
                setattr(merged.timings, f,
                        getattr(merged.timings, f) + getattr(t, f, 0.0))
        return merged

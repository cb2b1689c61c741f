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
    text: str                 # partial LLM transcript (greedy)
    ctc_text: str             # rolling CTC transcript
    seconds: float            # audio fed so far
    latency_ms: float         # this tick's wall time (feed → text)
    n_tokens: int = 0         # partial tokens decoded


@dataclass
class StreamingStats:
    first_text_ms: Optional[float] = None   # first chunk fed → first
    #                                         nonempty partial text
    first_ctc_ms: Optional[float] = None
    ticks: List[float] = field(default_factory=list)


class StreamingSession:
    """Incremental transcription over one ≤ segment-length utterance.

    Partials run WITHOUT hotword injection (hotwords would edit the
    cached prefix); ``finish()`` is the full pipeline, hotwords included.
    """

    def __init__(self, models, language: Optional[str] = None,
                 context: Optional[str] = None,
                 partial_tokens: int = 48,
                 extend_bucket: Optional[int] = None):
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

        # extension bucket: audio tokens for the LARGEST window + suffix,
        # rounded up to 32 (one static verify shape per session config)
        max_window = int(models.config.segment_pad_seconds
                         * models.config.sample_rate)
        need = audio_token_length(max_window) + self._n_suffix
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

    # -- internals --------------------------------------------------------

    def _extend_and_decode(self, audio_embd: np.ndarray):
        """verify-pass extension + bounded greedy decode. Returns
        (text, n_tokens)."""
        m = self.models
        cfg = self._cfg
        n_audio = audio_embd.shape[0]
        n_valid = n_audio + self._n_suffix
        chunk = np.zeros((1, self._t_ext, audio_embd.shape[1]), np.float32)
        chunk[0, :n_audio] = audio_embd
        chunk[0, n_audio:n_valid] = self._suffix
        chunk_dev = jnp.asarray(chunk, m._compute_dtype)
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
        dec = self._mk_decoder()
        stop = set(m.stop_tokens) | {m.eos_token}
        state, tokens = generate_chunk(
            m.llm_params, state, cfg, jnp.asarray(0.0), jnp.asarray(1.0),
            50, chunk_len=chunk_len, stop_tokens=m.stop_tokens,
            limit=jnp.asarray(budget, jnp.int32), greedy=True)
        n_toks = 0
        for t in np.asarray(tokens)[0].tolist():
            if t < 0 or t in stop:
                continue
            dec.push(t)
            n_toks += 1
        dec.flush()
        return dec.generated_text.strip(), n_toks

    # -- public surface ---------------------------------------------------

    @property
    def seconds(self) -> float:
        return len(self._buf) / self.models.config.sample_rate

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
        max_samples = int(m.config.segment_pad_seconds * sr)
        if len(self._buf) + len(audio) > max_samples:
            # validate BEFORE buffering: a rejected chunk must not grow
            # the session (finish() stays within the segment window)
            raise ValueError(
                f"streaming session exceeds one segment "
                f"({m.config.segment_pad_seconds:.0f} s): feed at most "
                "that much per session, finish(), and start a new "
                "session (long audio routes through the orchestrator's "
                "segmented path)")
        if self._t0 is None:
            self._t0 = t_tick
        self._buf = np.concatenate([self._buf, audio])

        audio_embd, enc = m.encode_audio(self._buf)
        ctc_text = ""
        if m.config.enable_ctc and m.ctc_id2token:
            from .ctc import decode_ctc
            indices = np.asarray(m._ctc_fn(m.ctc_params, enc))
            ctc_text, _, _ = decode_ctc(indices[0], m.ctc_id2token)
        text, n_toks = self._extend_and_decode(audio_embd)

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
                                latency_ms=tick_ms, n_tokens=n_toks)

    def finish(self, temperature: float = 0.4, top_p: float = 1.0,
               top_k: int = 50) -> DecodeResult:
        """Final decode of the full buffered audio through the standard
        batch path (hotwords, alignment, retry policy — identical to
        non-streaming)."""
        from .core.decoder import StreamDecoder
        stream = RecognitionStream()
        stream.accept_waveform(self.models.config.sample_rate, self._buf)
        return StreamDecoder(self.models).decode_stream(
            stream, self.language, self.context, verbose=False,
            temperature=temperature, top_p=top_p, top_k=top_k)

"""Batched multi-stream decoding: N concurrent audios in one device program.

New TPU-idiomatic capability (BASELINE.json configs[3]) with no reference
counterpart (the reference is strictly single-sequence, ``llama.py:464``):
the batch dimension rides through every jitted program — one encoder
forward for all streams, one CTC forward, one batched prefill (per-row
prompt lengths via left-padding masks) and one batched generation loop with
per-row stop/fuse flags. CTC-draft speculative decoding rides the batch
dimension too: each row drafts from its own CTC transcript with a per-row
token budget (``models/speculative.py``). Host-side stages (hotword
recall, prompt build, alignment) loop per row.

Aborted rows (repetition fuse) are retried individually with the
reference's +0.3-temperature policy (``core/decoder.py:201-211``).
"""

import logging
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ctc import align_timestamps, decode_ctc
from ..datatypes import DecodeResult, RecognitionStream, Timings
from ..frontend import audio_token_length
from ..models.audio_encoder import audio_encoder_forward
from ..models.generate import generate_chunk, prefill_init
from .decoder import ABORT_MARKER, StreamDecoder
from .model_manager import ModelManager

logger = logging.getLogger("fun_asr_gguf_tpu.core.batch")

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("bucket",))
def _assemble_prompts(pbuf, sbuf, embd, n_p, t_a, n_s, bucket):
    """Batched ON-DEVICE prompt assembly: per row, left-pad
    [prefix ++ audio-embd ++ suffix] into the static ``bucket``.

    Replaces the host path that fetched the [B, T, h] window embedding
    and re-uploaded a [B, bucket, h] f32 prompt (~20 MB of tunnel
    round-trip per b=8 batch — comparable to the whole decode time).
    ``pbuf``/``sbuf`` are the per-row prefix/suffix embeds padded to
    static caps; lengths are per-row scalars. Returns (prompt
    [B, bucket, h] in embd's dtype, mask [B, bucket] f32)."""
    bsz, p_cap, h = pbuf.shape
    t_max = embd.shape[1]
    s_cap = sbuf.shape[1]
    p_len = n_p + t_a + n_s                              # [B]
    pos = (jnp.arange(bucket, dtype=jnp.int32)[None, :]
           - (bucket - p_len)[:, None])                  # [B, L]
    in_pre = (pos >= 0) & (pos < n_p[:, None])
    a_pos = pos - n_p[:, None]
    in_aud = (a_pos >= 0) & (a_pos < t_a[:, None])
    s_pos = a_pos - t_a[:, None]
    in_suf = (s_pos >= 0) & (s_pos < n_s[:, None])

    def g(buf, idx, cap):
        idx = jnp.clip(idx, 0, cap - 1)
        return jnp.take_along_axis(buf, idx[..., None], axis=1)

    out = jnp.where(in_pre[..., None], g(pbuf, pos, p_cap), 0)
    out = out + jnp.where(in_aud[..., None],
                          g(embd.astype(pbuf.dtype), a_pos, t_max), 0)
    out = out + jnp.where(in_suf[..., None], g(sbuf, s_pos, s_cap), 0)
    return out, (pos >= 0).astype(jnp.float32)


def pad_streams_to_bucket(streams: List[RecognitionStream],
                          sample_rate: int):
    """Pad a stream list to the next power-of-2 batch size.

    The batch dimension is a static shape under jit, so every distinct
    size would compile its own device program otherwise. Pad rows are
    short silence (trivial CTC/prompt work, no wasted retry decodes),
    not copies of real audio. Returns ``(padded_streams, n_real)``.
    """
    n = len(streams)
    bucket = 1
    while bucket < n:
        bucket *= 2
    padded = list(streams)
    for _ in range(bucket - n):
        s = RecognitionStream()
        s.accept_waveform(sample_rate,
                          np.zeros(sample_rate // 4, np.float32))
        padded.append(s)
    return padded, n


class BatchStreamDecoder:
    """Decodes N recognition streams concurrently."""

    def __init__(self, models: ModelManager):
        self.models = models
        self._single = StreamDecoder(models)

    def decode_streams(self, streams: List[RecognitionStream],
                       language: Optional[str] = None,
                       context: Optional[str] = None,
                       temperature: float = 0.3, top_p: float = 1.0,
                       top_k: int = 50,
                       n_real: Optional[int] = None,
                       on_chunk=None) -> List[DecodeResult]:
        """``n_real``: when the caller padded the batch to a bucket
        (:func:`pad_streams_to_bucket`), the number of leading real rows.
        Device time is attributed to real rows only, and pad rows skip
        the abort-retry path.

        ``on_chunk``: optional callback invoked with each generation
        chunk's token array [B, chunk] (-1 padded) as it leaves the
        device — lets the caller stream text (e.g. the first long-audio
        segment) while later tokens are still decoding."""
        models = self.models
        b = len(streams)
        if n_real is None:
            n_real = b
        if b == 0:
            return []
        if b == 1:
            return [self._single.decode_stream(
                streams[0], language, context, verbose=False,
                temperature=temperature, top_p=top_p, top_k=top_k)]

        timings = [Timings() for _ in range(b)]

        # 1. batched encode
        t0 = time.perf_counter()
        lens = [len(s.audio_data) for s in streams]
        window = max(models.pad_window_samples(n) for n in lens)
        buf = np.zeros((b, window), dtype=np.float32)
        for i, s in enumerate(streams):
            buf[i, : lens[i]] = s.audio_data
        enc, embd, _mask = audio_encoder_forward(
            {"encoder": models.encoder_params,
             "adaptor": models.adaptor_params},
            models.frontend_consts,
            models.put_batch(buf), models.put_batch(lens, jnp.int32),
            cfg=models.audio_cfg, compute_dtype=models._compute_dtype)
        # embd STAYS ON DEVICE: the prompts assemble there too. Block
        # for the timing split only — without it the async encoder's
        # runtime lands in whichever stage fetches first (t_ctc)
        enc.block_until_ready()
        t_encode = time.perf_counter() - t0

        # 2. batched CTC + per-row hotwords
        t0 = time.perf_counter()
        ctc_rows = [[] for _ in range(b)]
        hotword_rows = [[] for _ in range(b)]
        draft_rows: List[Optional[str]] = [None] * b
        if models.config.enable_ctc and models.ctc_id2token:
            # same recall policy as the single-stream decoder: beam search
            # (when enabled + hotwords exist) shares the batched device
            # program with the greedy path
            beam = models.beam_recall_enabled
            if beam:
                vals, ids, blank, argmax = models.ctc_topk(enc)
                indices = argmax
            else:
                indices = np.asarray(models._ctc_fn(models.ctc_params, enc))
            for i in range(b):
                text, results, _ = decode_ctc(indices[i],
                                              models.ctc_id2token)
                ctc_rows[i] = results
                recall = text
                if beam and text:
                    from .decoder import beam_recall_text
                    recall = beam_recall_text(
                        models, (vals[i], ids[i], blank[i]), text)
                draft_rows[i] = recall or None
                if models.corrector and models.corrector.hotwords and recall:
                    res = models.corrector.correct(
                        recall, k=models.config.max_hotwords)
                    cand = {hw for _, hw, _ in res.matchs}
                    cand |= {hw for _, hw, _ in res.similars}
                    hotword_rows[i] = list(cand)
                    if res.text:    # hotword-corrected → better LLM draft
                        draft_rows[i] = res.text
        t_ctc = time.perf_counter() - t0

        # 3. per-row prompts, assembled ON DEVICE (only the small
        # prefix/suffix embeds upload; the audio embedding never leaves
        # the chip)
        t0 = time.perf_counter()
        prefixes, suffixes = [], []
        n_prefix, n_suffix, targets = [], [], []
        for i in range(b):
            row_ctx = models.augment_context(context, draft_rows[i])
            p_embd, s_embd, n_p, n_s, _ = models.prompt_builder.build_prompt(
                hotword_rows[i], language, row_ctx)
            prefixes.append(np.asarray(p_embd, np.float32))
            suffixes.append(np.asarray(s_embd, np.float32))
            n_prefix.append(n_p)
            n_suffix.append(n_s)
            targets.append(audio_token_length(lens[i],
                                              models.audio_cfg.frontend))
        llm_dim = prefixes[0].shape[1]
        # static caps rounded to 32 to bound recompiles across batches
        # with different hotword-prefix lengths
        p_cap = -(-max(max(n_prefix), 1) // 32) * 32
        s_cap = -(-max(max(n_suffix), 1) // 8) * 8
        pbuf = np.zeros((b, p_cap, llm_dim), np.float32)
        sbuf = np.zeros((b, s_cap, llm_dim), np.float32)
        for i in range(b):
            pbuf[i, :n_prefix[i]] = prefixes[i]
            sbuf[i, :n_suffix[i]] = suffixes[i]
        max_len_prompt = max(n_prefix[i] + targets[i] + n_suffix[i]
                             for i in range(b))
        bucket = models.prompt_bucket(max_len_prompt)
        prompt_dev, mask_dev = _assemble_prompts(
            models.put_batch(pbuf, models._compute_dtype),
            models.put_batch(sbuf, models._compute_dtype),
            embd,
            models.put_batch(n_prefix, jnp.int32),
            models.put_batch(targets, jnp.int32),
            models.put_batch(n_suffix, jnp.int32),
            bucket)
        t_prepare = time.perf_counter() - t0

        # 4. batched prefill + generation. CTC-draft speculation rides the
        # batch dimension too (models/speculative.py is written [B, ...]):
        # each row drafts from its own CTC transcript; rows without one
        # propose nothing and advance one token per verify step.
        drafts = None
        if models.config.speculative and models.tokenizer is not None:
            rows_d = []
            for i in range(b):
                text = draft_rows[i] or ""
                row = models.make_draft_ids(text)
                rows_d.append(row[0] if row is not None else
                              np.full((models.config.spec_draft_len,), -1,
                                      dtype=np.int32))
            if any(np.any(r >= 0) for r in rows_d):
                drafts = np.stack(rows_d, axis=0)

        max_len = bucket + models.config.n_predict
        if drafts is not None:
            max_len += models.config.spec_k + 1   # verify-round headroom
        t0 = time.perf_counter()
        seed = int(np.random.randint(0, 2 ** 31 - 1))
        state = prefill_init(
            models.llm_params,
            prompt_dev,
            mask_dev,
            jax.random.PRNGKey(seed), models.hybrid_cfg.llm,
            max_len=max_len,
            kv_int8=(models.config.kv_cache_dtype == "int8"))
        state.logits.block_until_ready()
        t_inject = time.perf_counter() - t0

        t0 = time.perf_counter()
        chunk_len = models._default_chunk_len()
        token_chunks = []
        if drafts is not None:
            from ..models.speculative import spec_generate_chunk, spec_init
            state = spec_init(state)
            draft_dev = models.put_batch(drafts)
            # batch-aware acceptance guardrail: a batched verify round
            # costs ~(1 + spec_accept_slope*B) plain decode steps
            # (measured on v5e — experiments/spec_batch_crossover.py:
            # cost ratio 1.02/1.39/1.51/2.03 at b=1/2/4/8), so drafting
            # pays only while the batch emits more than that many tokens
            # per round per row. Below threshold, keep the SAME spec
            # program but drop to spec_k=0 with an empty draft — a plain
            # decoder with per-row KV slots (spec_to_gen needs uniform
            # slots, which a batch mid-decode no longer has).
            slope = getattr(models.config, "spec_accept_slope", 0.13)
            min_acc = max(getattr(models.config, "spec_min_accept", 1.35),
                          1.0 + slope * b) \
                if getattr(models.config, "spec_min_accept", 1.35) > 0 else 0
            spec_k = models.config.spec_k
            emitted_total = 0
            first_chunk = True
            n_gen_np = np.zeros((b,), np.int64)   # fresh prefill: 0 emitted
            while True:
                # budget by state.n_gen (stop tokens are NOT counted, the
                # reference single-stream semantics) — raw emitted-token
                # counts would charge a stopping row one extra slot
                todo = np.minimum(chunk_len,
                                  models.config.n_predict - n_gen_np)
                call_k = spec_k
                if first_chunk and spec_k > 0:
                    # probe: cap the first spec chunk so a bad batch of
                    # drafts is abandoned quickly (core/decoder.py's
                    # single stream probes 16; at batch >= 4 a verify
                    # round costs ~1.6-2x a plain step, so the probe
                    # shortens to the guardrail's 8-round minimum).
                    # Batched SAMPLED rounds additionally pay exact
                    # acceptance top-k over B·(K+1)·vocab logits
                    # (~30 ms/round at b=8, K=8 — measured r04), so the
                    # probe runs at K=2: one third the acceptance math,
                    # same discrimination (a ≥85%-agreement draft emits
                    # ~2.6/round at K=2, over the 1+0.13·8 ≈ 2.04 bar;
                    # a ~50% draft emits ~1.75 and is dropped — exactly
                    # as at K=8)
                    todo = np.minimum(todo, 16 if b < 4 else 8)
                    if b >= 4 and temperature > 0:
                        call_k = min(spec_k, 2)
                    first_chunk = False
                state, tokens = spec_generate_chunk(
                    models.llm_params, state, draft_dev,
                    models.hybrid_cfg.llm,
                    jnp.asarray(temperature, jnp.float32),
                    jnp.asarray(top_p, jnp.float32), top_k,
                    spec_k=call_k, chunk_len=chunk_len,
                    stop_tokens=models.stop_tokens,
                    limit=jnp.asarray(todo, jnp.int32),
                    greedy=(temperature <= 0))
                # ONE batched host fetch per chunk: over the remote
                # tunnel every device→host read pays ~10 ms of RTT, and
                # five scattered np.asarray calls per chunk were ~40% of
                # the measured b=8 step 4 wall time (phase-timed r04)
                (toks_np, n_gen_f, done, rounds_f,
                 slots_np) = jax.device_get(
                    (tokens, state.n_gen, state.done, state.rounds,
                     state.slot_next))
                n_gen_np = n_gen_f.astype(np.int64)
                token_chunks.append(toks_np)
                if on_chunk is not None:
                    on_chunk(toks_np)
                n_emit = (toks_np >= 0).sum(axis=1)
                emitted_total += int(n_emit.sum())
                active = ~done & (n_gen_np < models.config.n_predict)
                if not np.any(active):
                    break
                if not np.any(n_emit[active] > 0):
                    break   # safety: no forward progress should be impossible
                if spec_k > 0 and min_acc:
                    rounds = int(rounds_f.max())
                    if (rounds >= 8
                            and emitted_total / (rounds * b) < min_acc):
                        logger.info(
                            "batched speculation off: %.2f tokens/round/row"
                            " < %.2f (b=%d, %d rounds)",
                            emitted_total / (rounds * b), min_acc, b,
                            rounds)
                        spec_k = 0
                        draft_dev = jnp.full_like(draft_dev, -1)
                        if bool((slots_np == slots_np[0]).all()):
                            # rows still slot-aligned (near-zero
                            # acceptance advances every row one token per
                            # round): hand off to the PLAIN chunk program
                            # — measured ~2.2x faster than spec_k=0
                            # verify rounds at b=8 on v5e (BENCH_r04:
                            # 4.26 vs 1.97 ms/step). Misaligned rows keep
                            # the spec_k=0 fallback (per-row KV slots).
                            from ..models.speculative import spec_to_gen
                            logger.info("batched speculation: rows "
                                        "aligned — switching to the "
                                        "plain chunk program")
                            state = spec_to_gen(state)
                            # pipelined like the no-spec loop: budget
                            # conservatively by the last-FETCHED n_gen
                            # plus the in-flight chunk's limit, so a
                            # lagged fetch can never overshoot n_predict
                            inflight = 0
                            pending2 = None
                            while True:
                                act = (~done
                                       & (n_gen_np + inflight
                                          < models.config.n_predict))
                                if not act.any():
                                    break
                                todo = int(np.minimum(
                                    chunk_len,
                                    models.config.n_predict - inflight
                                    - n_gen_np[act]).max())
                                if todo <= 0:
                                    break
                                state, tokens = generate_chunk(
                                    models.llm_params, state,
                                    models.hybrid_cfg.llm,
                                    jnp.asarray(temperature, jnp.float32),
                                    jnp.asarray(top_p, jnp.float32),
                                    top_k, chunk_len=chunk_len,
                                    stop_tokens=models.stop_tokens,
                                    limit=jnp.asarray(todo, jnp.int32),
                                    greedy=(temperature <= 0))
                                if pending2 is not None:
                                    (toks_np, n_gen_f,
                                     done) = jax.device_get(pending2)
                                    n_gen_np = n_gen_f.astype(np.int64)
                                    token_chunks.append(toks_np)
                                    if on_chunk is not None:
                                        on_chunk(toks_np)
                                pending2 = (tokens, jnp.copy(state.n_gen),
                                            jnp.copy(state.done))
                                inflight = todo
                            if pending2 is not None:
                                (toks_np, n_gen_f,
                                 done) = jax.device_get(pending2)
                                n_gen_np = n_gen_f.astype(np.int64)
                                token_chunks.append(toks_np)
                                if on_chunk is not None:
                                    on_chunk(toks_np)
                            break
        else:
            # pipelined chunk loop: dispatch chunk k+1 BEFORE fetching
            # chunk k's tokens, so the ~10-40 ms device->host fetch
            # overlaps device execution instead of sitting on the
            # serial path (measured +15% aggregate at b=8 over the
            # tunnel). Safe on early stop: the chunk program's device
            # loop exits immediately when all rows are done, so a
            # speculatively dispatched trailing chunk costs ~one step.
            # state.done must be snapshotted out (jnp.copy): the next
            # dispatch DONATES the state's buffers.
            generated = 0
            pending = None
            while generated < models.config.n_predict:
                todo = min(chunk_len, models.config.n_predict - generated)
                state, tokens = generate_chunk(
                    models.llm_params, state, models.hybrid_cfg.llm,
                    jnp.asarray(temperature, jnp.float32),
                    jnp.asarray(top_p, jnp.float32), top_k,
                    chunk_len=chunk_len,
                    stop_tokens=models.stop_tokens,
                    limit=jnp.asarray(todo, jnp.int32),
                    greedy=(temperature <= 0))
                generated += todo
                all_done = False
                if pending is not None:
                    toks_np, done_np = jax.device_get(pending)
                    token_chunks.append(toks_np)
                    if on_chunk is not None:
                        on_chunk(toks_np)
                    all_done = bool(np.all(done_np))
                pending = (tokens, jnp.copy(state.done))
                if all_done:
                    break
            if pending is not None:
                toks_np, _ = jax.device_get(pending)
                token_chunks.append(toks_np)
                if on_chunk is not None:
                    on_chunk(toks_np)
        tokens = np.concatenate(token_chunks, axis=1)
        n_gen, aborted = jax.device_get((state.n_gen, state.aborted))
        t_gen = time.perf_counter() - t0

        # 5. assemble per-row results; retry aborted rows individually
        stop_set = set(models.stop_tokens) | {models.eos_token}
        share = max(n_real, 1)     # pad rows don't own device time
        results: List[DecodeResult] = []
        for i in range(b):
            t = timings[i]
            t.encode = t_encode / share if i < n_real else 0.0
            t.ctc = t_ctc / share if i < n_real else 0.0
            t.prepare = t_prepare / share if i < n_real else 0.0
            t.inject = t_inject / share if i < n_real else 0.0
            t.llm_generate = t_gen / share if i < n_real else 0.0

            if aborted[i] and i < n_real:
                retry = self._retry_row(streams[i], language, context,
                                        temperature + 0.3, top_p, top_k)
                retry.timings.encode += t.encode
                results.append(retry)
                continue

            from ..formats.tokenizer import StreamTextDecoder
            dec = StreamTextDecoder(models.tokenizer)
            for tok in tokens[i].tolist():
                if tok < 0 or tok in stop_set:
                    continue
                dec.push(tok)
            dec.flush()
            text = models.apply_rules(dec.generated_text.strip())

            t0a = time.perf_counter()
            aligned, ts, toks_out = [], [], []
            if ctc_rows[i]:
                aligned = align_timestamps(ctc_rows[i], text) or []
                toks_out = [seg["char"] for seg in aligned]
                ts = [seg["start"] for seg in aligned]
            t.align = time.perf_counter() - t0a

            streams[i].set_result(text=text, timestamps=ts, tokens=toks_out)
            results.append(DecodeResult(
                text=text, ctc_results=ctc_rows[i], aligned=aligned,
                # the embedding stays on device; consumers use the count
                audio_embd=None, n_audio_tokens=targets[i],
                n_prefix=n_prefix[i], n_suffix=n_suffix[i],
                n_gen=int(n_gen[i]), timings=t,
                hotwords=hotword_rows[i], is_aborted=False))
        return results

    def _retry_row(self, stream, language, context, temperature, top_p,
                   top_k) -> DecodeResult:
        """Single-row retry path after a repetition abort."""
        res = self._single.decode_stream(
            stream, language, context, verbose=False,
            temperature=temperature, top_p=top_p, top_k=top_k)
        if res.is_aborted:
            res.text += ABORT_MARKER
        return res

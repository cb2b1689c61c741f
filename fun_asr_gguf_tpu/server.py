"""HTTP transcription server (stdlib, zero dependencies).

The TPU-serving analogue of the reference's bundled ``llama-server.exe``
(reference ``fun_asr_gguf/bin/``, unused by its Python path) reshaped for
ASR: a small threaded HTTP front-end over ``FunASREngine`` for production
deployment on a TPU host.

Endpoints:
  GET  /v1/health            → engine/model status JSON
  POST /v1/transcribe        → body = audio file bytes (wav/mp3/flac/...);
                               options via query string: language, context,
                               temperature, top_p, top_k, segment_size,
                               overlap, srt=1, parallel_segments=1 (batch
                               long-audio segments through one device
                               program). Response JSON: text,
                               segments, ctc_text, hotwords, timings, rtf
                               (+ srt when requested).
                               With stream=1 the response is
                               text/event-stream: one `data: {"piece": …}`
                               event per generated text piece, then a
                               final `data: {"done": true, …full result…}`.
  POST /v1/stream/start      → open an incremental (streaming) session
                               (?language=&context=&partial_tokens=);
                               returns {"session": id}. Then
                               POST /v1/stream/feed?session=ID with raw
                               mono chunks (encoding=pcm16 default, or
                               f32) at the engine sample rate → growing
                               provisional transcript per chunk; and
                               POST /v1/stream/finish?session=ID → the
                               final batch-path-identical result.
  POST /v1/audio/transcriptions → OpenAI audio API compatible (drop-in
                               for whisper-API clients): multipart form
                               with `file`, optional `language` (ISO),
                               `prompt`, `temperature`,
                               `response_format` json/text/srt/vtt/
                               verbose_json.

Requests are serialized through a lock by default. With
``--batch-window-ms N``, concurrent short-clip requests that arrive
within the window are aggregated into ONE batched device program
(``engine.decode_streams`` — measured 2.1× aggregate decode throughput
at batch 4 on v5e); long audio, SSE, and SRT requests keep the single
path.

Usage:
    python -m fun_asr_gguf_tpu.server --checkpoint model_dir --port 8090
"""

import argparse
import json
import logging
import os
import tempfile
import threading
import time
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

logger = logging.getLogger("fun_asr_gguf_tpu.server")

MAX_BODY_BYTES = 512 * 1024 * 1024      # reject absurd uploads


class BatchDispatcher:
    """Micro-batching: group concurrent short-clip requests into one
    batched device program.

    Handler threads ``submit(waveform, opts)`` and block; the dispatcher
    thread collects jobs for up to ``window_ms`` (or ``max_batch``),
    groups them by decoding options, and runs each group through
    ``engine.decode_streams``.
    """

    def __init__(self, engine, engine_lock, window_ms: float,
                 max_batch: int = 8):
        import queue as _queue
        self.engine = engine
        self.engine_lock = engine_lock
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.jobs: "_queue.Queue" = _queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, waveform, opts: dict) -> dict:
        """Blocking: returns {"result": DecodeResult} or {"error": str}."""
        import queue as _queue
        reply: "_queue.Queue" = _queue.Queue()
        self.jobs.put((waveform, opts, reply))
        return reply.get()

    @staticmethod
    def _group_key(opts):
        return (opts.get("language"), opts.get("context"),
                opts["temperature"], opts["top_p"], opts["top_k"])

    def _run(self):
        import queue as _queue
        from .datatypes import RecognitionStream
        while True:
            batch = [self.jobs.get()]
            try:
                self._serve_batch(batch, _queue, RecognitionStream)
            except Exception as e:                      # noqa: BLE001
                # nothing may kill the dispatcher thread: every pending
                # submit() would hang forever otherwise
                logger.exception("batch dispatcher failure")
                for job in batch:
                    try:
                        job[2].put({"error": f"dispatcher failure: {e}"})
                    except Exception:                   # noqa: BLE001
                        pass

    def _serve_batch(self, batch, _queue, RecognitionStream):
            deadline = time.monotonic() + self.window
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self.jobs.get(timeout=left))
                except _queue.Empty:
                    break
            groups = {}
            for job in batch:
                groups.setdefault(self._group_key(job[1]), []).append(job)
            for jobs in groups.values():
                opts = jobs[0][1]
                try:
                    from .core.batch import pad_streams_to_bucket
                    streams = []
                    for waveform, _, _ in jobs:
                        s = RecognitionStream()
                        s.accept_waveform(self.engine.sample_rate, waveform)
                        streams.append(s)
                    streams, n = pad_streams_to_bucket(
                        streams, self.engine.sample_rate)
                    with self.engine_lock:
                        results = self.engine.decode_streams(
                            streams, language=opts.get("language"),
                            context=opts.get("context"),
                            temperature=opts["temperature"],
                            top_p=opts["top_p"], top_k=opts["top_k"],
                            n_real=n)
                    for (_, _, reply), r in zip(jobs, results[:n]):
                        reply.put({"result": r})
                except Exception as e:                  # noqa: BLE001
                    logger.exception("batched decode failed")
                    for _, _, reply in jobs:
                        reply.put({"error": str(e)})


class ASRRequestHandler(BaseHTTPRequestHandler):
    """One handler class per server instance (engine injected via class
    attribute by make_server)."""

    engine = None
    engine_lock: threading.Lock = None
    batcher: Optional[BatchDispatcher] = None
    server_version = "fun-asr-gguf-tpu"
    # live streaming sessions {id: (StreamingSession, last_used_ts)} —
    # class-level so every handler instance of this server shares them
    sessions: dict = None
    sessions_lock: threading.Lock = None
    MAX_SESSIONS = 8
    SESSION_IDLE_S = 600.0

    # -- helpers -------------------------------------------------------------
    def _send_json(self, code: int, payload: dict) -> bool:
        raw = json.dumps(payload, ensure_ascii=False).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)
        return True    # truthy sentinel: a response was written

    def log_message(self, fmt, *args):          # route to logging, not stderr
        logger.info("%s - %s", self.address_string(), fmt % args)

    # -- routes --------------------------------------------------------------
    def do_GET(self):
        path = urlparse(self.path).path
        if path in ("/v1/health", "/health"):
            cfg = self.engine.config
            return self._send_json(200, {
                "status": "ok",
                "model": os.path.basename(cfg.checkpoint_dir.rstrip("/")),
                "sample_rate": cfg.sample_rate,
                "llm_weight_format": cfg.llm_weight_format,
                "compute_dtype": cfg.compute_dtype,
            })
        return self._send_json(404, {"error": f"unknown path {path!r}"})

    def _read_body(self) -> Optional[bytes]:
        """Read the POST body with size checks; sends the error response
        itself and returns None on failure."""
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            length = 0
        if length <= 0:
            self._send_json(400, {"error": "empty body — POST the "
                                           "audio file bytes"})
            return None
        if length > MAX_BODY_BYTES:
            self._send_json(413, {"error": "body too large"})
            return None
        return self.rfile.read(length)

    # -- incremental (streaming) sessions ------------------------------------
    def _streaming_route(self, parsed):
        """POST /v1/stream/{start,feed,finish} — text flows while audio
        is still arriving (see :mod:`..streaming`). Raw mono chunks at
        the engine sample rate, pcm16 (default) or f32."""
        import uuid

        import numpy as np
        q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        action = parsed.path.rsplit("/", 1)[-1]
        now = time.time()
        with self.sessions_lock:
            for stale in [s for s, (_, ts) in self.sessions.items()
                          if now - ts > self.SESSION_IDLE_S]:
                self.sessions.pop(stale, None)
        if action == "start":
            sid = uuid.uuid4().hex[:16]
            with self.sessions_lock:
                # reserve the slot atomically: concurrent starts must
                # not race past the cap (each session pins a prefix KV)
                if len(self.sessions) >= self.MAX_SESSIONS:
                    return self._send_json(
                        429, {"error": "too many streaming sessions"})
                self.sessions[sid] = (None, now)
            try:
                extra = {}
                if "segment_size" in q:
                    extra["segment_size"] = float(q["segment_size"])
                if "overlap" in q:
                    extra["overlap"] = float(q["overlap"])
                if "temperature" in q:
                    extra["temperature"] = float(q["temperature"])
                with self.engine_lock:
                    sess = self.engine.create_streaming_session(
                        language=q.get("language"),
                        context=q.get("context"),
                        partial_tokens=int(q.get("partial_tokens", 48)),
                        **extra)
            except ValueError as e:
                # client parameter errors (e.g. segment_size beyond the
                # engine's pad window) are 400s with the actionable
                # message, not opaque 500s
                with self.sessions_lock:
                    self.sessions.pop(sid, None)
                return self._send_json(400, {"error": str(e)})
            except Exception as e:                      # noqa: BLE001
                logger.exception("stream start failed")
                with self.sessions_lock:
                    self.sessions.pop(sid, None)
                return self._send_json(500, {"error": str(e)})
            with self.sessions_lock:
                self.sessions[sid] = (sess, now)
            return self._send_json(200, {"session": sid})

        sid = q.get("session", "")
        with self.sessions_lock:
            entry = self.sessions.get(sid)
        if entry is None or entry[0] is None:
            return self._send_json(404,
                                   {"error": f"unknown session {sid!r}"})
        sess = entry[0]
        if action == "feed":
            body = self._read_body()
            if body is None:
                return
            enc = q.get("encoding", "pcm16")
            if enc == "pcm16":
                audio = np.frombuffer(body[:len(body) // 2 * 2],
                                      np.int16).astype(np.float32) / 32768.0
            elif enc in ("f32", "float32"):
                audio = np.frombuffer(body[:len(body) // 4 * 4], np.float32)
            else:
                return self._send_json(
                    400, {"error": f"unknown encoding {enc!r} "
                                   "(pcm16 or f32)"})
            try:
                with self.engine_lock:
                    part = sess.feed(audio)
            except Exception as e:                      # noqa: BLE001
                logger.exception("stream feed failed")
                return self._send_json(500, {"error": str(e)})
            with self.sessions_lock:
                self.sessions[sid] = (sess, time.time())
            return self._send_json(200, {
                "text": part.text, "ctc_text": part.ctc_text,
                "committed_text": part.committed_text,
                "full_text": part.full_text,
                "seconds": round(part.seconds, 3),
                "latency_ms": round(part.latency_ms, 1),
                "n_tokens": part.n_tokens})
        if action == "finish":
            try:
                with self.engine_lock:
                    res = sess.finish(
                        temperature=float(q.get("temperature", 0.4)),
                        top_p=float(q.get("top_p", 1.0)),
                        top_k=int(q.get("top_k", 50)))
            except Exception as e:                      # noqa: BLE001
                # keep the session (and its buffered audio) so the
                # client can retry finish after a transient failure
                logger.exception("stream finish failed")
                return self._send_json(500, {"error": str(e)})
            with self.sessions_lock:
                self.sessions.pop(sid, None)
            return self._send_json(200, {
                "text": res.text,
                "segments": [{"char": s["char"], "start": s["start"]}
                             for s in (res.aligned or [])],
                "ctc_text": "".join(r.text for r in res.ctc_results),
                "hotwords": res.hotwords,
                "first_text_ms": sess.stats.first_text_ms})
        return self._send_json(
            404, {"error": f"unknown stream action {action!r}"})

    def do_POST(self):
        parsed = urlparse(self.path)
        if parsed.path in ("/v1/audio/transcriptions",
                           "/audio/transcriptions"):
            return self._openai_transcription()
        if parsed.path.startswith(("/v1/stream/", "/stream/")):
            return self._streaming_route(parsed)
        if parsed.path not in ("/v1/transcribe", "/transcribe"):
            return self._send_json(404,
                                   {"error": f"unknown path {parsed.path!r}"})
        body = self._read_body()
        if body is None:
            return

        q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        try:
            opts = dict(
                language=q.get("language"),
                context=q.get("context"),
                temperature=float(q.get("temperature", 0.4)),
                top_p=float(q.get("top_p", 1.0)),
                top_k=int(q.get("top_k", 50)),
                segment_size=float(q.get("segment_size", 60.0)),
                overlap=float(q.get("overlap", 2.0)),
                start_second=(float(q["start_second"])
                              if "start_second" in q else None),
                duration=(float(q["duration"]) if "duration" in q else None),
                srt=q.get("srt", "0") in ("1", "true", "yes"),
                parallel_segments=q.get("parallel_segments", "0")
                                  in ("1", "true", "yes"),
            )
            stream_mode = q.get("stream", "0") in ("1", "true", "yes")
        except ValueError as e:
            return self._send_json(400, {"error": f"bad query param: {e}"})
        if stream_mode and opts["parallel_segments"]:
            # the batched long-audio path never invokes on_stream (segment
            # texts arrive with the final result — engine.transcribe docs),
            # so an SSE client would see nothing until the end; keep SSE
            # semantics consistent by decoding sequentially instead
            opts["parallel_segments"] = False

        suffix = {"audio/mpeg": ".mp3", "audio/wav": ".wav",
                  "audio/x-wav": ".wav", "audio/flac": ".flac",
                  "audio/ogg": ".ogg"}.get(
            (self.headers.get("Content-Type") or "").split(";")[0].strip())
        if suffix is None:
            # content-sniff: a WAV posted without a Content-Type must still
            # reach the extension-gated stdlib WAV parser
            suffix = ".wav" if body[:4] == b"RIFF" else ".bin"
        tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        srt_path = None
        sse_owns_files = False
        try:
            tmp.write(body)
            tmp.close()
            if stream_mode:
                # SSE owns and cleans the temp files (its worker may still
                # be queued on the engine lock after we return)
                sse_owns_files = True
                return self._transcribe_sse(tmp.name, opts)
            preloaded = None
            if self.batcher is not None and not opts["srt"]:
                handled, preloaded = self._try_batched(tmp.name, opts)
                if handled:
                    return
            t0 = time.perf_counter()
            with self.engine_lock:
                try:
                    result = self.engine.transcribe(
                        tmp.name, verbose=False,
                        preloaded_audio=preloaded, **opts)
                except RuntimeError as e:
                    if "could not decode" in str(e):
                        return self._send_json(
                            400, {"error": f"undecodable audio: {e}"})
                    raise
            wall = time.perf_counter() - t0
            payload = {
                "text": result.text,
                "segments": result.segments,
                "ctc_text": result.ctc_text,
                "hotwords": result.hotwords,
                "timings": asdict(result.timings),
                "wall_s": round(wall, 4),
            }
            if result.audio_seconds > 0:
                payload["audio_seconds"] = round(result.audio_seconds, 3)
                payload["rtf"] = round(wall / result.audio_seconds, 5)
            if opts["srt"]:
                srt_path = os.path.splitext(tmp.name)[0] + ".srt"
                if os.path.exists(srt_path):
                    with open(srt_path, encoding="utf-8") as f:
                        payload["srt"] = f.read()
            return self._send_json(200, payload)
        except Exception as e:                              # noqa: BLE001
            logger.exception("transcription failed")
            return self._send_json(500, {"error": str(e)})
        finally:
            if not sse_owns_files:
                for p in (tmp.name, srt_path):
                    if p and os.path.exists(p):
                        os.unlink(p)


    def _try_batched(self, path: str, opts: dict):
        """Short-clip micro-batching path.

        Returns (sent, preloaded_waveform): ``sent=True`` means a response
        was written; otherwise the caller falls through to the single
        path, reusing the already-decoded waveform when available (no
        double audio decode for long clips)."""
        from .audio import load_audio
        try:
            waveform = load_audio(path, self.engine.sample_rate,
                                  start_second=opts.get("start_second"),
                                  duration=opts.get("duration"))
        except Exception:                               # noqa: BLE001
            return False, None   # single path produces the decode error
        sr = self.engine.sample_rate
        # single-path semantics: clips longer than the requested
        # segment_size (+2 s slack, orchestrator split rule) must go
        # through windowed orchestration, not one whole-clip program
        limit_s = min(opts["segment_size"] + 2.0,
                      self.engine.config.segment_pad_seconds)
        if len(waveform) > limit_s * sr:
            return False, waveform
        t0 = time.perf_counter()
        out = self.batcher.submit(waveform, opts)
        if "error" in out:
            return self._send_json(500, {"error": out["error"]}), None
        r = out["result"]
        wall = time.perf_counter() - t0
        audio_s = len(waveform) / sr
        base = opts.get("start_second") or 0.0
        timings = asdict(r.timings)
        if not timings.get("total"):
            timings["total"] = round(wall, 4)
        payload = {
            "text": r.text,
            "segments": [{"char": s["char"], "start": s["start"] + base}
                         for s in (r.aligned or [])],
            "ctc_text": "".join(c.text for c in r.ctc_results),
            "hotwords": r.hotwords,
            "timings": timings,
            "wall_s": round(wall, 4),
            "audio_seconds": round(audio_s, 3),
            "batched": True,
        }
        if audio_s:
            payload["rtf"] = round(wall / audio_s, 5)
        return self._send_json(200, payload), None

    # -- OpenAI-compatible audio API ---------------------------------------

    _ISO_LANG = {"zh": "中文", "en": "英文", "ja": "日文", "ko": "韩文",
                 "yue": "粤语", "zh-cn": "中文", "zh-tw": "中文"}
    _OAI_FORMATS = ("json", "text", "srt", "vtt", "verbose_json")

    def _oai_error(self, code: int, message: str,
                   etype: str = "invalid_request_error"):
        return self._send_json(code, {"error": {"message": message,
                                                "type": etype}})

    def _parse_multipart(self, body: bytes):
        """Minimal multipart/form-data parser (stdlib email machinery).
        Returns ((file_bytes|None, filename), {field: value})."""
        from email.parser import BytesParser
        from email.policy import HTTP
        ctype = (self.headers.get("Content-Type") or "").strip()
        msg = BytesParser(policy=HTTP).parsebytes(
            b"Content-Type: " + ctype.encode("latin-1") + b"\r\n\r\n" + body)
        file_bytes, filename, fields = None, "", {}
        if msg.is_multipart():
            for part in msg.iter_parts():
                name = part.get_param("name",
                                      header="content-disposition")
                if name is None:
                    continue
                payload = part.get_payload(decode=True) or b""
                if name == "file":
                    file_bytes = payload
                    filename = part.get_filename() or ""
                else:
                    fields[str(name)] = payload.decode(
                        "utf-8", "replace").strip()
        return (file_bytes, filename), fields

    def _send_text(self, code: int, text: str,
                   content_type: str = "text/plain; charset=utf-8"):
        raw = text.encode("utf-8")
        try:
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)
            return True
        except (BrokenPipeError, ConnectionResetError):
            return False

    def _openai_transcription(self):
        """POST /v1/audio/transcriptions — OpenAI audio API compatible:
        multipart/form-data with ``file`` (audio) and optional ``model``
        (ignored), ``language`` (ISO-639-1, mapped to the prompt's
        language names), ``prompt`` (→ engine ``context``),
        ``temperature``, ``response_format`` ∈ json (default) / text /
        srt / vtt / verbose_json. A drop-in target for OpenAI/whisper
        API clients (no reference counterpart — llama-server serves
        LLM chat only)."""
        body = self._read_body()
        if body is None:
            return
        ctype = (self.headers.get("Content-Type") or "")
        if "multipart/form-data" not in ctype:
            return self._oai_error(400, "expected multipart/form-data "
                                        "with a 'file' field")
        try:
            (blob, filename), fields = self._parse_multipart(body)
        except Exception as e:                              # noqa: BLE001
            return self._oai_error(400, f"malformed multipart body: {e}")
        if not blob:
            return self._oai_error(400, "missing 'file' field")
        fmt = fields.get("response_format", "json") or "json"
        if fmt not in self._OAI_FORMATS:
            return self._oai_error(
                400, f"response_format must be one of {self._OAI_FORMATS}")
        try:
            temperature = float(fields.get("temperature") or 0.0)
        except ValueError:
            return self._oai_error(400, "temperature must be a number")
        lang = fields.get("language") or None
        if lang:
            lang = self._ISO_LANG.get(lang.lower(), lang)

        suffix = os.path.splitext(filename)[1].lower() or \
            (".wav" if blob[:4] == b"RIFF" else ".bin")
        tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        try:
            tmp.write(blob)
            tmp.close()
            with self.engine_lock:
                try:
                    result = self.engine.transcribe(
                        tmp.name, verbose=False, temperature=temperature,
                        language=lang, context=fields.get("prompt") or None)
                except RuntimeError as e:
                    if "could not decode" in str(e):
                        return self._oai_error(
                            400, f"undecodable audio: {e}")
                    raise
            if fmt == "text":
                return self._send_text(200, result.text + "\n")
            from .srt_utils import compose_srt, compose_vtt, split_subtitles
            if fmt in ("srt", "vtt"):
                cues = split_subtitles(result.segments)
                text = (compose_srt(cues) if fmt == "srt"
                        else compose_vtt(cues))
                return self._send_text(200, text)
            if fmt == "verbose_json":
                cues = split_subtitles(result.segments)
                return self._send_json(200, {
                    "task": "transcribe",
                    "language": fields.get("language") or "",
                    "duration": round(result.audio_seconds, 3),
                    "text": result.text,
                    "segments": [{
                        "id": i,
                        "start": round(c["start"], 3),
                        "end": round(c["end"], 3),
                        "text": c["content"],
                    } for i, c in enumerate(cues)],
                })
            return self._send_json(200, {"text": result.text})
        except Exception as e:                              # noqa: BLE001
            logger.exception("openai-compat transcription failed")
            return self._oai_error(500, str(e), etype="server_error")
        finally:
            if os.path.exists(tmp.name):
                os.unlink(tmp.name)

    def _transcribe_sse(self, path: str, opts: dict):
        """Server-sent-events mode: stream generated text pieces live.

        Transcription runs on a worker thread; this handler thread drains
        a queue of pieces into `data:` events and finishes with the full
        result payload. The worker owns the temp files (it may still be
        queued on the engine lock after the client disconnects) and never
        lets an exception escape once SSE headers are on the wire.
        """
        import queue as _queue
        pieces: "_queue.Queue" = _queue.Queue()
        done = {}
        RESET = object()          # retry marker (distinct from None = EOF)
        srt_path = os.path.splitext(path)[0] + ".srt"

        def worker():
            try:
                with self.engine_lock:
                    done["result"] = self.engine.transcribe(
                        path, verbose=False,
                        on_stream=lambda p: pieces.put(p),
                        on_stream_reset=lambda: pieces.put(RESET), **opts)
                if opts.get("srt") and os.path.exists(srt_path):
                    with open(srt_path, encoding="utf-8") as f:
                        done["srt"] = f.read()
            except Exception as e:                      # noqa: BLE001
                done["error"] = str(e)
            finally:
                for p in (path, srt_path):              # worker owns cleanup
                    if os.path.exists(p):
                        os.unlink(p)
                pieces.put(None)                        # sentinel

        t = threading.Thread(target=worker, daemon=True)
        t.start()

        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream; charset=utf-8")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()

        def emit(obj):
            self.wfile.write(
                b"data: " + json.dumps(obj, ensure_ascii=False)
                .encode("utf-8") + b"\n\n")
            self.wfile.flush()

        try:
            while True:
                piece = pieces.get()
                if piece is None:
                    break
                if piece is RESET:
                    # repetition-fuse retry: client should clear buffered
                    # pieces — the final event's text stays authoritative
                    emit({"reset": True})
                elif piece:
                    emit({"piece": piece})
            t.join()
            if "error" in done:
                emit({"done": True, "error": done["error"]})
            else:
                r = done["result"]
                payload = {"done": True, "text": r.text,
                           "segments": r.segments, "ctc_text": r.ctc_text,
                           "hotwords": r.hotwords,
                           "audio_seconds": round(r.audio_seconds, 3),
                           "timings": asdict(r.timings)}
                if "srt" in done:
                    payload["srt"] = done["srt"]
                emit(payload)
        except OSError:
            logger.info("SSE client disconnected mid-stream")
        except Exception:                               # noqa: BLE001
            # headers already sent — never fall back to a second HTTP
            # response on this socket
            logger.exception("SSE emit failed after headers")


def make_server(engine, host: str = "127.0.0.1", port: int = 8090,
                batch_window_ms: float = 0.0,
                max_batch: int = 8) -> ThreadingHTTPServer:
    """Build (don't start) a threaded HTTP server bound to the engine.

    ``batch_window_ms > 0`` enables micro-batching of concurrent
    short-clip requests (one batched device program per window)."""
    lock = threading.Lock()
    batcher = (BatchDispatcher(engine, lock, batch_window_ms, max_batch)
               if batch_window_ms > 0 else None)
    handler = type("BoundASRHandler", (ASRRequestHandler,), {
        "engine": engine,
        "engine_lock": lock,
        "batcher": batcher,
        "sessions": {},
        "sessions_lock": threading.Lock(),
    })
    return ThreadingHTTPServer((host, port), handler)


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--llm-weight-format", default="auto",
                    choices=("auto", "bf16", "int8", "q8_0"))
    ap.add_argument("--n-predict", type=int, default=512)
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--segment-pad-seconds", type=float, default=60.0,
                    help="static audio window compiled per segment")
    ap.add_argument("--compile-cache",
                    default=os.path.join(
                        tempfile.gettempdir(),
                        f"funasr_server_xla_cache_{os.getuid()}"
                        if hasattr(os, "getuid")
                        else "funasr_server_xla_cache"),
                    help="persist XLA compiles here for fast restarts "
                         "(default on; pass an empty string to disable)")
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="micro-batch concurrent short requests within "
                         "this window into one device program")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--rules-path", default=None,
                    help="regex rule-correction file "
                         "('pattern = replacement' lines, live-reloaded)")
    ap.add_argument("--rectify-path", default=None,
                    help="correction-history file ('wrong'/'right' blocks "
                         "separated by ---, live-reloaded); retrieved "
                         "entries are added to the LLM context")
    ap.add_argument("--warmup-all", action="store_true",
                    help="compile every prefill bucket at startup so no "
                         "request pays first-use compile time")
    ap.add_argument("--kv-cache-dtype", default="bf16",
                    choices=["bf16", "int8"],
                    help="int8: quantized KV cache (halves cache reads "
                         "in batched serving)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ways: shard the decoder "
                         "Megatron-style over the first N chips "
                         "(mesh_shape={'dp':1,'tp':N})")
    args = ap.parse_args(argv)

    from . import create_asr_engine
    engine = create_asr_engine(checkpoint_dir=args.checkpoint,
                               llm_weight_format=args.llm_weight_format,
                               n_predict=args.n_predict,
                               compute_dtype=args.compute_dtype,
                               segment_pad_seconds=args.segment_pad_seconds,
                               compilation_cache_dir=args.compile_cache,
                               rules_path=args.rules_path,
                               rectify_path=args.rectify_path,
                               warmup_all_buckets=args.warmup_all,
                               kv_cache_dtype=args.kv_cache_dtype,
                               mesh_shape=({"dp": 1, "tp": args.tp}
                                           if args.tp > 1 else None))
    server = make_server(engine, args.host, args.port,
                         batch_window_ms=args.batch_window_ms,
                         max_batch=args.max_batch)
    print(f"[server] listening on http://{args.host}:{args.port} "
          f"(POST /v1/transcribe)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.cleanup()


if __name__ == "__main__":
    main()

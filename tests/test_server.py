# coding: utf-8
"""HTTP serving layer tests: spin the threaded server on a tiny random
checkpoint and drive it with real HTTP requests."""

import base64
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from fun_asr_gguf_tpu.audio import write_wav
from fun_asr_gguf_tpu.hotword.manager import reset_hotword_manager
from fun_asr_gguf_tpu.models.config import HybridConfig
from fun_asr_gguf_tpu.models.loaders import create_random_checkpoint


@pytest.fixture(scope="module")
def served_engine(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("srv_ckpt") / "model")
    cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=0)
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(ckpt, "hot.txt"), "w", encoding="utf-8") as f:
        f.write("测试\n")

    reset_hotword_manager()
    from fun_asr_gguf_tpu import create_asr_engine
    from fun_asr_gguf_tpu.server import make_server
    eng = create_asr_engine(
        checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
        segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,))
    server = make_server(eng, "127.0.0.1", 0)     # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    eng.cleanup()
    reset_hotword_manager()


def _wav_bytes(seconds=1.0, seed=0, tmpdir="/tmp"):
    import tempfile
    sig = np.random.default_rng(seed).normal(size=int(16000 * seconds)) * 0.05
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    write_wav(path, sig, 16000)
    with open(path, "rb") as f:
        raw = f.read()
    os.unlink(path)
    return raw


def _post(url, data, content_type="audio/wav"):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read().decode("utf-8"))


def _multipart(fields, file_bytes, filename="a.wav",
               file_ctype="audio/wav"):
    """Build a multipart/form-data body + content-type header."""
    boundary = "funasrboundary42"
    parts = []
    for k, v in fields.items():
        parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                     f'name="{k}"\r\n\r\n{v}\r\n'.encode())
    parts.append(f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="file"; filename="{filename}"\r\n'
                 f"Content-Type: {file_ctype}\r\n\r\n".encode())
    parts.append(file_bytes)
    parts.append(f"\r\n--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


def _post_openai(base, fields, wav, raw=False):
    body, ctype = _multipart(fields, wav)
    req = urllib.request.Request(base + "/v1/audio/transcriptions",
                                 data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=300) as resp:
        data = resp.read()
        return resp.status, (data.decode("utf-8") if raw
                             else json.loads(data.decode("utf-8")))


class TestOpenAICompat:
    """POST /v1/audio/transcriptions — the OpenAI audio API surface."""

    def test_json_default(self, served_engine):
        status, body = _post_openai(served_engine,
                                    {"model": "fun-asr"}, _wav_bytes())
        assert status == 200
        assert set(body) == {"text"}
        assert isinstance(body["text"], str)

    def test_text_format(self, served_engine):
        wav = _wav_bytes(seed=3)
        _, js = _post_openai(served_engine, {"temperature": "0"}, wav)
        status, txt = _post_openai(
            served_engine, {"temperature": "0", "response_format": "text"},
            wav, raw=True)
        assert status == 200
        assert txt.rstrip("\n") == js["text"]

    def test_verbose_json_segments(self, served_engine):
        status, body = _post_openai(
            served_engine,
            {"temperature": "0", "response_format": "verbose_json",
             "language": "zh"},
            _wav_bytes(seed=4))
        assert status == 200
        assert body["task"] == "transcribe"
        assert body["language"] == "zh"
        assert body["duration"] > 0
        for seg in body["segments"]:
            assert set(seg) == {"id", "start", "end", "text"}
            assert seg["end"] >= seg["start"] >= 0

    def test_srt_and_vtt(self, served_engine):
        wav = _wav_bytes(seed=5)
        _, srt = _post_openai(
            served_engine, {"temperature": "0", "response_format": "srt"},
            wav, raw=True)
        _, vtt = _post_openai(
            served_engine, {"temperature": "0", "response_format": "vtt"},
            wav, raw=True)
        assert vtt.startswith("WEBVTT")
        if srt.strip():                    # random weights may emit no text
            assert " --> " in srt and "," in srt.split(" --> ")[0]
        if "-->" in vtt:
            assert "." in vtt.split(" --> ")[0].splitlines()[-1]

    def test_prompt_feeds_context(self, served_engine):
        status, body = _post_openai(
            served_engine,
            {"temperature": "0", "prompt": "术语表：功放"},
            _wav_bytes(seed=6))
        assert status == 200 and isinstance(body["text"], str)

    def test_missing_file_400(self, served_engine):
        body, ctype = _multipart({"model": "x"}, b"")
        # strip the file part entirely
        body = body.split(b'name="file"')[0] + b"--funasrboundary42--\r\n"
        req = urllib.request.Request(
            served_engine + "/v1/audio/transcriptions", data=body,
            method="POST", headers={"Content-Type": ctype})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
        err = json.loads(e.value.read().decode())
        assert err["error"]["type"] == "invalid_request_error"

    def test_bad_format_400(self, served_engine):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_openai(served_engine, {"response_format": "yaml"},
                         _wav_bytes())
        assert e.value.code == 400

    def test_non_multipart_400(self, served_engine):
        req = urllib.request.Request(
            served_engine + "/v1/audio/transcriptions",
            data=_wav_bytes(), method="POST",
            headers={"Content-Type": "audio/wav"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400


class TestServer:
    def test_health(self, served_engine):
        with urllib.request.urlopen(served_engine + "/v1/health",
                                    timeout=60) as resp:
            body = json.loads(resp.read().decode())
        assert resp.status == 200
        assert body["status"] == "ok"
        assert body["sample_rate"] == 16000

    def test_transcribe_wav(self, served_engine):
        status, body = _post(served_engine + "/v1/transcribe?temperature=0",
                             _wav_bytes())
        assert status == 200
        assert isinstance(body["text"], str)
        assert isinstance(body["segments"], list)
        assert "timings" in body and body["wall_s"] > 0

    def test_transcribe_deterministic_greedy(self, served_engine):
        wav = _wav_bytes(seed=7)
        _, a = _post(served_engine + "/v1/transcribe?temperature=0", wav)
        _, b = _post(served_engine + "/v1/transcribe?temperature=0", wav)
        assert a["text"] == b["text"]

    def test_parallel_segments_long_audio(self, served_engine):
        wav = _wav_bytes(seconds=2.5, seed=40)
        url = (served_engine + "/v1/transcribe?temperature=0"
               "&segment_size=1.0&overlap=0.2")
        _, seq = _post(url, wav)
        _, par = _post(url + "&parallel_segments=1", wav)
        assert par["text"] == seq["text"]
        assert [s["char"] for s in par["segments"]] == \
               [s["char"] for s in seq["segments"]]

    def test_unknown_path_404(self, served_engine):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(served_engine + "/v1/nope", _wav_bytes())
        assert e.value.code == 404

    def test_empty_body_400(self, served_engine):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(served_engine + "/v1/transcribe", b"")
        assert e.value.code == 400

    def test_garbage_audio_400(self, served_engine):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(served_engine + "/v1/transcribe", b"\x00\x01not audio" * 50)
        assert e.value.code in (400, 500)
        body = json.loads(e.value.read().decode())
        assert "error" in body

    def test_bad_query_param_400(self, served_engine):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(served_engine + "/v1/transcribe?temperature=hot",
                  _wav_bytes())
        assert e.value.code == 400

    def test_concurrent_requests_serialize(self, served_engine):
        wav = _wav_bytes(seed=9)
        results = [None, None]
        def hit(i):
            results[i] = _post(
                served_engine + "/v1/transcribe?temperature=0", wav)
        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        [t.start() for t in ts]
        [t.join(timeout=300) for t in ts]
        assert all(r is not None and r[0] == 200 for r in results)
        assert results[0][1]["text"] == results[1][1]["text"]

    def test_sse_streaming(self, served_engine):
        req = urllib.request.Request(
            served_engine + "/v1/transcribe?temperature=0&stream=1",
            data=_wav_bytes(seed=13), method="POST",
            headers={"Content-Type": "audio/wav"})
        events = []
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.headers["Content-Type"].startswith(
                "text/event-stream")
            for raw in resp:
                line = raw.decode("utf-8").strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[6:]))
        assert events and events[-1].get("done") is True
        final = events[-1]
        assert "text" in final and "timings" in final
        # pieces must actually stream (not only the final event); replay
        # the protocol: reset events clear the client buffer
        streamed = ""
        for e in events:
            if e.get("reset"):
                streamed = ""
            elif "piece" in e:
                streamed += e["piece"]
        if final["text"]:
            assert streamed, "no piece events before the final event"
            assert final["text"] in streamed or streamed in final["text"]


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory):
    """Server with micro-batching enabled (50 ms window)."""
    ckpt = str(tmp_path_factory.mktemp("srv_ckpt_b") / "model")
    cfg = create_random_checkpoint(ckpt, HybridConfig.tiny(), seed=0)
    lines = []
    for i in range(cfg.ctc.vocab_size):
        ch = chr(ord("一") + i) if i < cfg.ctc.vocab_size - 1 else "<blk>"
        lines.append(f"{base64.b64encode(ch.encode()).decode()} {i}")
    with open(os.path.join(ckpt, "tokens.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(ckpt, "hot.txt"), "w", encoding="utf-8") as f:
        f.write("测试\n")
    reset_hotword_manager()
    from fun_asr_gguf_tpu import create_asr_engine
    from fun_asr_gguf_tpu.server import make_server
    eng = create_asr_engine(
        checkpoint_dir=ckpt, verbose=False, compute_dtype="float32",
        segment_pad_seconds=2.0, n_predict=8, prefill_buckets=(64,))
    server = make_server(eng, "127.0.0.1", 0, batch_window_ms=50.0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    eng.cleanup()
    reset_hotword_manager()


class TestBatchedServer:
    def test_short_clip_goes_through_batcher(self, batched_server):
        status, body = _post(
            batched_server + "/v1/transcribe?temperature=0", _wav_bytes())
        assert status == 200
        assert body.get("batched") is True
        assert isinstance(body["text"], str)
        assert body["audio_seconds"] == pytest.approx(1.0)

    def test_concurrent_requests_share_a_batch(self, batched_server):
        wavs = [_wav_bytes(seed=s) for s in (21, 22, 23)]
        results = [None] * 3
        def hit(i):
            results[i] = _post(
                batched_server + "/v1/transcribe?temperature=0", wavs[i])
        ts = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        [t.start() for t in ts]
        [t.join(timeout=300) for t in ts]
        assert all(r is not None and r[0] == 200 for r in results)
        assert all(r[1].get("batched") is True for r in results)
        # batched result matches the GENUINE single path (srt=1 bypasses
        # the batcher) for the same audio
        solo = _post(batched_server + "/v1/transcribe?temperature=0&srt=1",
                     wavs[0])[1]
        assert "batched" not in solo
        assert results[0][1]["text"] == solo["text"]

    def test_long_audio_falls_through_to_single_path(self, batched_server):
        status, body = _post(
            batched_server + "/v1/transcribe?temperature=0",
            _wav_bytes(seconds=4.0, seed=30))
        assert status == 200
        assert "batched" not in body     # orchestrated single path

    def test_srt_request_uses_single_path(self, batched_server):
        status, body = _post(
            batched_server + "/v1/transcribe?temperature=0&srt=1",
            _wav_bytes(seed=31))
        assert status == 200
        assert "batched" not in body

    def test_keepalive_no_stale_second_response(self, batched_server):
        """The broken batched-sentinel bug wrote TWO responses per request;
        a keep-alive client would read the stale one as the next reply."""
        import http.client
        host = batched_server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=300)
        try:
            for seed in (41, 42):
                conn.request("POST", "/v1/transcribe?temperature=0",
                             body=_wav_bytes(seed=seed),
                             headers={"Content-Type": "audio/wav"})
                resp = conn.getresponse()
                body = json.loads(resp.read().decode())
                assert resp.status == 200
                assert body.get("batched") is True
        finally:
            conn.close()


class TestStreamingSessionAPI:
    def _post(self, url, body=b""):
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read().decode("utf-8"))

    def test_stream_session_lifecycle(self, served_engine):
        base = served_engine
        sid = self._post(f"{base}/v1/stream/start?partial_tokens=8"
                         )["session"]
        rng = np.random.default_rng(0)
        full = (rng.normal(size=16000) * 0.05).astype(np.float32)
        parts = []
        for off in (0, 8000):
            chunk = (full[off:off + 8000] * 32767).astype("<i2").tobytes()
            parts.append(self._post(
                f"{base}/v1/stream/feed?session={sid}", chunk))
        assert parts[-1]["seconds"] == pytest.approx(1.0, abs=0.01)
        assert isinstance(parts[-1]["text"], str)
        assert parts[-1]["latency_ms"] > 0

        final = self._post(
            f"{base}/v1/stream/finish?session={sid}&temperature=0")
        assert isinstance(final["text"], str)
        # the session is gone after finish
        err = self._post_err(f"{base}/v1/stream/feed?session={sid}",
                             b"\x00\x00")
        assert err == 404

    def _post_err(self, url, body=b""):
        req = urllib.request.Request(url, data=body, method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            return 200
        except urllib.error.HTTPError as e:
            return e.code

    def test_unknown_session_404(self, served_engine):
        assert self._post_err(
            f"{served_engine}/v1/stream/feed?session=nope",
            b"\x00\x00") == 404

    def test_bad_encoding_400(self, served_engine):
        sid = self._post(f"{served_engine}/v1/stream/start")["session"]
        assert self._post_err(
            f"{served_engine}/v1/stream/feed?session={sid}&encoding=ogg",
            b"\x00\x00") == 400
        self._post(f"{served_engine}/v1/stream/finish?session={sid}")

"""Dynamic-batching serving layer: concurrent requests ride ONE engine
dispatch, transport is stdlib HTTP, WAV bytes round-trip."""
import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from vibevoice_tpu.serving.server import BatchingFrontend, TTSServer, wav_bytes


class FakeTTS:
    """Engine stand-in: records batch sizes, returns deterministic audio."""

    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()
        self.hold_event = None     # streaming test: block completion until set
        self.stream_pieces = 3
        self.t_generate_done = None

    def generate(self, scripts, voices, max_new_tokens=None, seed=0,
                 audio_streamer=None):
        with self.lock:
            self.calls.append(len(scripts))
        audio = [np.full(2400, 0.25 + i * 0.1, np.float32)
                 for i in range(len(scripts))]
        if audio_streamer is not None:
            for p in range(self.stream_pieces):
                chunk = [a[p * 800:(p + 1) * 800] for a in audio]
                audio_streamer.put(chunk, range(len(audio)))
                if self.hold_event is not None and p == 0:
                    # first piece emitted; block "generation" until released
                    assert self.hold_event.wait(timeout=30)
            audio_streamer.end()
        self.t_generate_done = __import__("time").perf_counter()

        class R:
            pass

        r = R()
        r.audio = audio
        return r, {"audio_sec": len(scripts) * 0.1, "wall_s": 0.01,
                   "rtf": 1.0, "steps": max_new_tokens}


def test_wav_bytes_roundtrip():
    audio = np.sin(np.linspace(0, 20, 2400)).astype(np.float32) * 0.5
    data = wav_bytes(audio)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 24000 and w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=1e-4)


def test_frontend_batches_concurrent_requests():
    tts = FakeTTS()
    fe = BatchingFrontend(tts, max_batch=4, max_wait_ms=200)
    try:
        futs = [fe.submit(f"Speaker 1: req {i}", max_new_tokens=64)
                for i in range(4)]
        results = [f.result(timeout=30) for f in futs]
        assert all(a is not None for a, _ in results)
        # all four rode one dispatch
        assert max(tts.calls) == 4
        assert results[0][1]["batch_size"] == 4
    finally:
        fe.stop()


def test_frontend_groups_by_token_bucket():
    tts = FakeTTS()
    fe = BatchingFrontend(tts, max_batch=8, max_wait_ms=150)
    try:
        f1 = fe.submit("Speaker 1: a", max_new_tokens=64)
        f2 = fe.submit("Speaker 1: b", max_new_tokens=128)
        f3 = fe.submit("Speaker 1: c", max_new_tokens=64)
        for f in (f1, f2, f3):
            f.result(timeout=30)
        # 64-token requests batched together; the 128 one ran separately
        assert sorted(tts.calls) == [1, 2]
    finally:
        fe.stop()


def test_http_server_end_to_end():
    tts = FakeTTS()
    srv = TTSServer(tts, port=0, max_batch=4, max_wait_ms=100,
                    voice_presets={"alice": np.zeros(64, np.float32)}).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.load(r)["ok"] is True

        body = json.dumps({"script": "Speaker 1: hello", "voice": "alice",
                           "max_new_tokens": 32}).encode()
        req = urllib.request.Request(base + "/tts", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnframes() == 2400

        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            m = json.load(r)
        assert m["requests"] == 1 and m["batches"] == 1

        # missing field -> 400
        bad = urllib.request.Request(base + "/tts", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
    finally:
        srv.stop()


def _read_stream(host, port, body_obj, on_first=None):
    """POST /tts/stream and decode the chunked WAV; returns (pcm16, t_first).
    `on_first(t)` fires when the first PCM bytes (post-header) arrive."""
    import http.client
    conn = http.client.HTTPConnection(host, port, timeout=120)
    body = json.dumps(body_obj).encode()
    conn.request("POST", "/tts/stream", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()  # http.client decodes chunked framing
    assert resp.status == 200
    assert resp.getheader("Transfer-Encoding") == "chunked"
    header = resp.read(44)
    assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
    import time as _t
    first_pcm = resp.read(2)  # blocks until the first flushed audio chunk
    t_first = _t.perf_counter()
    if on_first is not None:
        on_first(t_first)
    rest = resp.read()
    conn.close()
    pcm = np.frombuffer(first_pcm + rest, "<i2")
    return pcm, t_first


def test_http_stream_first_chunk_before_completion():
    """First streamed bytes MUST reach the client while generation is still
    running: the fake engine emits one piece, then blocks until released."""
    tts = FakeTTS()
    tts.hold_event = threading.Event()
    srv = TTSServer(tts, port=0, max_batch=1, max_wait_ms=10).start()
    try:
        got_first = threading.Event()

        def on_first(t):
            got_first.set()

        result = {}

        def client():
            result["pcm"], _ = _read_stream(
                "127.0.0.1", srv.port,
                {"script": "Speaker 1: hi", "max_new_tokens": 32,
                 "buffer_sec": 0.0}, on_first)

        th = threading.Thread(target=client, daemon=True)
        th.start()
        # first chunk arrives while generate() is still blocked on hold_event
        assert got_first.wait(timeout=30)
        assert tts.t_generate_done is None  # generation has NOT completed
        tts.hold_event.set()
        th.join(timeout=30)
        assert not th.is_alive()
        np.testing.assert_allclose(result["pcm"] / 32767.0,
                                   np.full(2400, 0.25), atol=1e-4)
        # TTFB was recorded
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=10) as r:
            m = json.load(r)
        assert m["stream_requests"] == 1
        assert m["ttfb_s_last"] is not None and m["ttfb_s_mean"] > 0
    finally:
        tts.hold_event.set()
        srv.stop()


def test_http_stream_real_tiny_pipeline():
    """Full stack over the REAL tiny engine: streamed PCM == the engine's
    emitted audio, and the first chunk arrives before generate() returns."""
    import time
    import jax.numpy as jnp
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    import tests.test_pipeline_smoke as smoke

    tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320),
                                   dtype=jnp.float32, ddpm_steps=2,
                                   prompt_bucket=256)
    smoke._force_diffusion_engine(tts, 1, 256, 48)
    done = {}
    real_gen = tts.generate

    def gen(*a, **k):
        try:
            return real_gen(*a, **k)
        finally:
            done["t"] = time.perf_counter()

    tts.generate = gen
    srv = TTSServer(tts, port=0, max_batch=1, max_wait_ms=10).start()
    try:
        pcm, t_first = _read_stream(
            "127.0.0.1", srv.port,
            {"script": "Speaker 1: hello world", "max_new_tokens": 48,
             "buffer_sec": 0.0})
        assert len(pcm) == 48 * tts.cfg.speech_compress_ratio
        # generate()'s streamer.end() fires just before it returns, so the
        # client can drain the stream marginally before the wrapper records
        # completion — wait for it, then compare against FIRST-chunk time
        deadline = time.perf_counter() + 10
        while "t" not in done and time.perf_counter() < deadline:
            time.sleep(0.01)
        assert "t" in done and t_first < done["t"], (
            "first streamed bytes should precede generation completion")
    finally:
        srv.stop()


def test_http_server_real_tiny_pipeline():
    """Full stack: HTTP -> frontend -> REAL tiny engine -> WAV."""
    import jax.numpy as jnp
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    import tests.test_pipeline_smoke as smoke

    tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320),
                                   dtype=jnp.float32, ddpm_steps=2,
                                   prompt_bucket=256)
    smoke._force_diffusion_engine(tts, 1, 256, 6)
    srv = TTSServer(tts, port=0, max_batch=1, max_wait_ms=10).start()
    try:
        body = json.dumps({"script": "Speaker 1: hello world",
                           "max_new_tokens": 6}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{srv.port}/tts",
                                     data=body)
        with urllib.request.urlopen(req, timeout=120) as r:
            data = r.read()
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnframes() == 6 * tts.cfg.speech_compress_ratio
    finally:
        srv.stop()

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

    def generate(self, scripts, voices, max_new_tokens=None, seed=0):
        with self.lock:
            self.calls.append(len(scripts))
        audio = [np.full(2400, 0.25 + i * 0.1, np.float32)
                 for i in range(len(scripts))]

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

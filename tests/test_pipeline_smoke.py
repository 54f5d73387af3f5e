"""End-to-end pipeline smoke: tiny random model through the full user API
(processor -> engine -> audio -> captions), plus streaming."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.engine.streamer import AudioStreamer
from vibevoice_tpu.pipeline import VibeVoiceTTS


@pytest.fixture(scope="module")
def tts():
    # vocab must cover the ByteFallbackTokenizer control ids (256-260)
    t = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320), dtype=jnp.float32,
                                 ddpm_steps=3, prompt_bucket=256)
    # force the diffusion path so random weights still produce audio frames
    object.__setattr__(t, "force", None)
    return t


def _force_diffusion_engine(tts, batch, prompt_len, max_steps):
    from vibevoice_tpu.engine import generate as G
    gen = G.GenerationConfig(
        speech_start_id=tts.tokenizer.speech_start_id,
        speech_end_id=tts.tokenizer.speech_end_id,
        speech_diffusion_id=tts.tokenizer.speech_diffusion_id,
        eos_id=tts.tokenizer.eos_id, ddpm_steps=3, force_diffusion=True)
    key = (batch, prompt_len, max_steps)
    eng = G.Engine(tts.params, tts.cfg, gen, max_steps=max_steps, batch=batch,
                   prompt_len=prompt_len, dtype=tts.dtype,
                   keep_audio=getattr(tts, "keep_audio", True))
    tts._engines[(batch, prompt_len, max_steps)] = eng
    # monkeypatch the bucket chooser to return our engine
    tts._engine = lambda b, p, m: eng
    return eng


def test_pipeline_generates_audio(tts, tmp_path):
    _force_diffusion_engine(tts, 1, 256, 6)
    script = "Speaker 1: Hello world.\nSpeaker 2: Hi."
    voice = [np.random.default_rng(0).normal(0, 0.05, 64).astype(np.float32)]
    res, metrics = tts.generate(script, voice, max_new_tokens=6)
    hop = tts.cfg.speech_compress_ratio
    assert res.audio[0] is not None
    assert len(res.audio[0]) == 6 * hop
    assert metrics["audio_sec"] > 0
    out = tts.save_audio(res.audio[0], str(tmp_path / "out.wav"))
    assert os.path.exists(out)


def test_pipeline_streaming(tts):
    _force_diffusion_engine(tts, 1, 256, 5)
    streamer = AudioStreamer(batch_size=1)
    script = "Speaker 1: Streaming test."
    res, _ = tts.generate(script, None, max_new_tokens=5, audio_streamer=streamer)
    chunks = list(streamer.get_stream(0))
    hop = tts.cfg.speech_compress_ratio
    assert len(chunks) == 5
    assert all(len(c) == hop for c in chunks)
    # streamed chunks concatenated == buffered audio
    np.testing.assert_allclose(np.concatenate(chunks), res.audio[0], atol=1e-6)


def test_captions_end_to_end(tts, tmp_path):
    from vibevoice_tpu.processor.captions_processor import VibeVoiceProcessorSimpleCaptions
    _force_diffusion_engine(tts, 1, 256, 4)
    script = "Speaker 1: A caption test sentence."
    res, _ = tts.generate(script, None, max_new_tokens=4)
    proc = VibeVoiceProcessorSimpleCaptions(
        tts.tokenizer, speech_tok_compress_ratio=tts.cfg.speech_compress_ratio)
    enc = tts.processor(script, None)
    files = proc.save_audio_with_captions(res.audio[0], str(tmp_path / "cap.wav"),
                                          enc.parsed_scripts[0])
    assert os.path.exists(files["wav"])
    assert os.path.exists(files["srt"])
    srt = open(files["srt"]).read()
    assert "Speaker 1" in srt


def test_keep_audio_false_streams_only():
    tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320),
                                   dtype=jnp.float32, ddpm_steps=2,
                                   prompt_bucket=256, keep_audio=False)
    _force_diffusion_engine(tts, 1, 256, 5)
    with pytest.raises(ValueError, match="audio_streamer"):
        tts.generate("Speaker 1: Hi.", None, max_new_tokens=5)
    streamer = AudioStreamer(batch_size=1)
    res, _ = tts.generate("Speaker 1: Hi.", None, max_new_tokens=5,
                          audio_streamer=streamer)
    chunks = list(streamer.get_stream(0))
    hop = tts.cfg.speech_compress_ratio
    assert res.audio[0] is None  # buffered waveform dropped by design
    assert len(chunks) == 5 and all(len(c) == hop for c in chunks)


def test_warm_precompiles_engine_grid(tts):
    # restore the real bucket chooser (earlier tests monkeypatch tts._engine
    # onto a forced-diffusion engine)
    tts._engine = type(tts)._engine.__get__(tts)
    warmed = tts.warm(batch_sizes=(1,), max_new_tokens=(4,))
    assert warmed == [(1, 256, 4)]
    assert (1, 256, 4) in tts._engines
    # warmed engine is reused for requests that bucket to the same key
    eng = tts._engines[(1, 256, 4)]
    assert tts._engine(1, 100, 4) is eng

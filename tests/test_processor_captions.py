"""Host-side layers: processor packing, captions, audio IO, streamer."""
import os

import numpy as np
import pytest

from vibevoice_tpu.caption.simple import (
    CaptionSegment, SimpleCaptionFormatter, SimpleCaptionGenerator,
    chunk_words, split_long_segments, split_sentences,
)
from vibevoice_tpu.engine.streamer import AudioStreamer
from vibevoice_tpu.processor.audio import AudioNormalizer, load_audio, save_audio
from vibevoice_tpu.processor.processor import VibeVoiceProcessor
from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer


def test_processor_packing_structure():
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor(tk, speech_tok_compress_ratio=16)
    script = "Speaker 1: Hello there.\nSpeaker 2: Hi!"
    voice = [np.zeros(40, np.float32), np.zeros(16, np.float32)]
    out = proc(script, voice)
    assert out.input_ids.shape[0] == 1
    ids = out.input_ids[0]
    # voice prompt: one speech_start/end pair per speaker
    assert (ids == tk.speech_start_id).sum() == 3  # 2 voice + trailing start
    assert (ids == tk.speech_end_id).sum() == 2
    # ceil(40/16)=3 + ceil(16/16)=1 diffusion positions flagged for splicing
    assert out.speech_input_mask.sum() == 4
    assert out.speech_tensors.shape == (2, 48)  # padded to max 3 frames
    assert out.speech_masks.tolist() == [[True, True, True], [True, False, False]]
    # prompt ends with speech_start
    assert ids[-1] == tk.speech_start_id
    assert out.parsed_scripts[0][0][0] == 0  # normalized to 0-based


def test_processor_batch_left_padding():
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor(tk, speech_tok_compress_ratio=16)
    out = proc(["Speaker 1: Short.", "Speaker 1: A much longer script line here."])
    assert out.input_ids.shape[0] == 2
    # shorter one is left-padded
    assert out.attention_mask[0, 0] == 0
    assert out.attention_mask[:, -1].tolist() == [1, 1]


def test_script_file_parsing(tmp_path):
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor(tk)
    p = tmp_path / "script.txt"
    p.write_text("Speaker 1: Hi\nplain line\nSpeaker 2: Yo\n")
    script = proc._convert_text_to_script(str(p))
    assert "Speaker 1: plain line" in script
    import json
    j = tmp_path / "script.json"
    j.write_text(json.dumps([{"speaker": "1", "text": "Hi"}, {"speaker": "2", "text": "Yo"}]))
    script = proc._convert_json_to_script(str(j))
    assert script == "Speaker 1: Hi\nSpeaker 2: Yo"


def test_audio_roundtrip(tmp_path):
    sr = 24000
    wav = (np.sin(np.linspace(0, 100, sr)) * 0.3).astype(np.float32)
    path = str(tmp_path / "t.wav")
    save_audio(wav, path, sr)
    back = load_audio(path, sr)
    assert back.shape == wav.shape
    np.testing.assert_allclose(back, wav, atol=1e-3)


def test_audio_normalizer():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.5, 24000).astype(np.float32)
    y = AudioNormalizer()(x)
    db = 20 * np.log10(np.sqrt(np.mean(y ** 2)))
    assert -26.5 < db < -23.5
    assert np.abs(y).max() <= 1.0


def test_caption_pipeline(tmp_path):
    gen = SimpleCaptionGenerator()
    script = [("Speaker 1", "Hello everyone. Welcome to the show about very "
                            "long sentences that must be split into chunks "
                            "for readability reasons obviously."),
              ("Speaker 2", "Thanks! Glad to be here.")]
    segs = gen.generate(script, duration=15.0)
    assert segs[0].start == 0.0
    assert abs(segs[-1].end - 15.0) < 1e-6
    for a, b in zip(segs, segs[1:]):
        assert b.start >= a.start
    assert all(len(s.text.split()) <= 15 for s in segs)

    fmt = SimpleCaptionFormatter()
    srt = fmt.to_srt(segs)
    assert "-->" in srt and "Speaker 1" in srt
    vtt = fmt.to_vtt(segs)
    assert vtt.startswith("WEBVTT")
    files = fmt.create_caption_package(segs, str(tmp_path), "test")
    assert all(os.path.exists(p) for p in files.values())
    assert len(files) == 5

    long_seg = [CaptionSegment(0, 30, " ".join(["word"] * 40), "S")]
    split = split_long_segments(long_seg)
    assert len(split) > 1
    assert abs(split[-1].end - 30) < 1e-6


def test_sentence_utils():
    assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert len(chunk_words(" ".join(["w"] * 31), 15)) == 3


def test_audio_streamer():
    st = AudioStreamer(batch_size=2)
    st.put([np.ones(4), np.zeros(4)], [0, 1])
    st.put([np.ones(4) * 2], [0])
    st.end([0])
    chunks = list(st.get_stream(0))
    assert len(chunks) == 2
    st.end()
    assert all(st.finished_flags)


def test_demo_example_scripts_parse():
    import glob
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor(tk)
    for f in glob.glob("demo/text_examples/*.txt"):
        script = proc._convert_text_to_script(f)
        parsed = proc._parse_script(script)
        assert len(parsed) > 0
        assert all(isinstance(s, int) and t.strip() for s, t in parsed)


def test_processor_save_load_roundtrip(tmp_path):
    """save_pretrained/from_pretrained with the reference's
    preprocessor_config.json schema (ref vibevoice_processor.py:44-161)."""
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor(tk, speech_tok_compress_ratio=1600,
                              db_normalize=True, target_dB_FS=-20)
    path = proc.save_pretrained(str(tmp_path))
    import json
    cfg = json.load(open(path))
    assert cfg["processor_class"] == "VibeVoiceProcessor"
    assert cfg["speech_tok_compress_ratio"] == 1600
    assert cfg["audio_processor"]["target_dB_FS"] == -20

    loaded = VibeVoiceProcessor.from_pretrained(str(tmp_path), tokenizer=tk)
    assert loaded.speech_tok_compress_ratio == 1600
    assert loaded.target_dB_FS == -20
    assert loaded.db_normalize is True


def test_processor_loads_reference_written_config(tmp_path, reference_path):
    """A config dir written by the REFERENCE's save_pretrained loads
    unchanged (cross-implementation compatibility)."""
    from vibevoice.processor.vibevoice_processor import (
        VibeVoiceProcessor as RefProcessor)
    ref = RefProcessor(tokenizer=None, audio_processor=None,
                       speech_tok_compress_ratio=3200, db_normalize=True)
    ref.save_pretrained(str(tmp_path))

    tk = ByteFallbackTokenizer()
    ours = VibeVoiceProcessor.from_pretrained(str(tmp_path), tokenizer=tk)
    assert ours.speech_tok_compress_ratio == 3200
    assert ours.db_normalize is True
    assert ours.sampling_rate == 24000


def test_processor_missing_config_uses_defaults(tmp_path):
    tk = ByteFallbackTokenizer()
    proc = VibeVoiceProcessor.from_pretrained(str(tmp_path / "nonexistent"),
                                              tokenizer=tk)
    assert proc.speech_tok_compress_ratio == 3200
    assert proc.db_normalize is True

"""Caption timing parity vs the reference SimpleCaptionGenerator.

Each rung of the alignment ladder is driven with identical synthetic inputs
through the reference implementation and ours, asserting equal segment
timings (VERDICT round-1 item 6)."""
import numpy as np
import pytest

from vibevoice_tpu.caption.simple import SimpleCaptionGenerator

CHUNK_TEXTS = [
    (1, "Welcome to the show everyone."),
    (1, "Today we dig into tensor processing units."),
    (2, "Thanks for having me on again."),
    (2, "Let's start with the memory hierarchy."),
    (1, "High bandwidth memory feeds the matrix unit."),
    (2, "And the vector unit handles elementwise work."),
    (1, "Exactly right."),
]


def _ours_chunks():
    return [(f"Speaker {sid}", text) for sid, text in CHUNK_TEXTS]


def _ref_segments():
    return [{
        "speaker_id": sid,
        "text": text,
        "word_count": len(text.split()),
        "char_count": len(text),
    } for sid, text in CHUNK_TEXTS]


@pytest.fixture()
def ref_gen(reference_path):
    from vibevoice.caption.simple_caption_generator import SimpleCaptionGenerator as R
    return R()


def _assert_times_match(ours, ref_dicts, atol=1e-6):
    assert len(ours) == len(ref_dicts)
    for seg, rd in zip(ours, ref_dicts):
        np.testing.assert_allclose(seg.start, rd["start_time"], atol=atol)
        np.testing.assert_allclose(seg.end, rd["end_time"], atol=atol)


@pytest.mark.parametrize("duration", [30.0, 55.5, 120.0])
def test_wpm_progressive_slowdown_parity(ref_gen, duration):
    """Rung 3: the WPM heuristic with progressive slowdown (ref :265-419)."""
    ref_out = ref_gen._calculate_timing(_ref_segments(), duration)
    ours = SimpleCaptionGenerator()._calculate_timing(_ours_chunks(), duration)
    _assert_times_match(ours, ref_out)


def test_silence_boundary_mapping_parity(ref_gen):
    """Rung 2 boundary selection (ref _map_silences_to_sentences :786-860)
    when silence count != sentence count (too many and too few)."""
    duration = 60.0
    target = len(CHUNK_TEXTS)
    gen = SimpleCaptionGenerator()

    # too many silences: the longest ones are kept as boundaries
    silences = [(5.0, 5.4), (11.0, 12.0), (18.0, 18.2), (25.0, 26.5),
                (33.0, 33.9), (40.0, 40.3), (47.0, 48.0), (52.0, 52.6),
                (56.0, 56.2)]
    speech = [(0.0, 5.0)]  # shape-only; both impls ignore it when != target
    ref_segs = ref_gen._map_silences_to_sentences(silences, list(speech), target, duration)
    ours = gen._map_silences_to_sentences(silences, list(speech), target, duration)
    assert ours == [tuple(map(float, s)) for s in map(tuple, ref_segs)]

    # too few silences: uniform interpolation
    few = [(10.0, 11.0), (30.0, 31.0)]
    ref_segs = ref_gen._map_silences_to_sentences(few, list(speech), target, duration)
    ours = gen._map_silences_to_sentences(few, list(speech), target, duration)
    assert ours == [tuple(map(float, s)) for s in map(tuple, ref_segs)]


def test_word_count_proportional_mapping_parity(ref_gen):
    """Rung 2 final mapping (ref :967-1073), incl. the reference's double
    calibration-offset application."""
    duration = 80.0
    audio_segments = [(0.0, 9.0), (10.0, 21.0), (22.5, 30.0), (31.0, 44.0),
                      (45.0, 58.0), (59.0, 70.0), (71.0, 77.0)]
    ref_out = ref_gen._build_segments_from_audio_alignment_with_word_count(
        _ref_segments(), list(audio_segments), None, duration)
    ours = SimpleCaptionGenerator()._segments_from_word_count(
        _ours_chunks(), list(audio_segments), duration)
    _assert_times_match(ours, ref_out)


def test_faster_whisper_matching_parity(ref_gen):
    """Rung 1: sequential word matching against synthetic transcribed word
    timings (ref _build_segments_from_faster_whisper_alignment :545-652) —
    exact matches, a partially-matched segment, and a missing segment that
    takes the proportional fallback."""
    duration = 40.0
    # build word timings for chunks 0-2 and 4-6 (chunk 3 missing from the
    # "transcript" -> proportional fallback), one word mangled in chunk 1
    words = []
    t = 0.5
    for idx, (sid, text) in enumerate(CHUNK_TEXTS):
        if idx == 3:
            t += 4.0
            continue
        for w_i, w in enumerate(text.split()):
            token = w.strip(".,!?;:").lower()
            if idx == 1 and w_i == 2:
                token = "dug"  # transcription error
            words.append({"word": token, "start": round(t, 2), "end": round(t + 0.3, 2)})
            t += 0.45
        t += 0.8

    alignment = {"word_segments": words,
                 "transcription_segments": [],
                 "script_segments": _ref_segments()}
    ref_out = ref_gen._build_segments_from_faster_whisper_alignment(
        _ref_segments(), alignment, None, duration)
    ours = SimpleCaptionGenerator()._segments_from_words(
        _ours_chunks(), words, duration)
    _assert_times_match(ours, ref_out)


def test_speech_segments_between_silences_structure():
    """Rung 2 segment construction: sentences live BETWEEN silences (first
    segment from 0, each next from silence end to next silence start)."""
    gen = SimpleCaptionGenerator()
    silences = [(5.0, 6.0), (12.0, 13.0), (20.0, 21.0)]
    segs = gen.speech_segments_for_sentences(silences, 30.0, 4)
    assert segs == [(0.0, 5.0), (6.0, 12.0), (13.0, 20.0), (21.0, 30.0)]


def test_generate_without_audio_uses_wpm_ladder():
    gen = SimpleCaptionGenerator()
    out = gen.generate([("Speaker 1", "Hello there. How are you today?"),
                        ("Speaker 2", "Great, thanks for asking!")], 12.0)
    assert out[-1].end == 12.0
    assert all(b.start >= a.start for a, b in zip(out, out[1:]))


# ---------------------------------------------------------------------------
# Whisper-path script matching (VERDICT r3 item 7): our matcher vs the
# reference's structured matcher (caption_generator.py:245-311), driven with
# identical synthetic transcription segments.  The reference class needs the
# whisper package only in __init__; the matcher methods are pure.
# ---------------------------------------------------------------------------

SCRIPT = """Speaker 1: Welcome to the show everyone.
speaker 2 : Thanks for having me on again.

Speaker 1: High bandwidth memory feeds the matrix unit.
Speaker 3: And the vector unit handles elementwise work.
not a speaker line
Speaker 4:
"""

TRANS_SEGMENTS = [
    {"text": " Welcome to the show, everyone!", "start": 0.0, "end": 2.5,
     "no_speech_prob": 0.01},
    {"text": "thanks for having me", "start": 2.5, "end": 4.0},
    {"text": "the memory feeds the matrix unit", "start": 4.0, "end": 7.0,
     "no_speech_prob": 0.2},
    {"text": "zzz qqq completely unrelated words", "start": 7.0, "end": 8.0},
    {"text": "", "start": 8.0, "end": 8.5},
]


@pytest.fixture()
def ref_whisper_cls(reference_path):
    from vibevoice.caption.caption_generator import CaptionGenerator as R
    return R


def test_whisper_script_parse_parity(ref_whisper_cls):
    from vibevoice_tpu.caption.whisper import CaptionGenerator as Ours
    ref = ref_whisper_cls.__new__(ref_whisper_cls)  # matcher methods are pure
    got = Ours.parse_script_segments(SCRIPT)
    want = ref._parse_script_segments(SCRIPT)
    assert got == want


@pytest.mark.parametrize("mapping", [None, {1: "Alice", 3: "Carol"}])
def test_whisper_script_matching_parity(ref_whisper_cls, mapping):
    from vibevoice_tpu.caption.whisper import CaptionGenerator as Ours
    ref = ref_whisper_cls.__new__(ref_whisper_cls)
    script_segments = ref._parse_script_segments(SCRIPT)
    want = ref._match_transcription_to_script(TRANS_SEGMENTS, script_segments,
                                              mapping)
    got = Ours.match_transcription_to_script(TRANS_SEGMENTS, script_segments,
                                             mapping)
    assert got == want

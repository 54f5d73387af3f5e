"""Whisper-based caption generation (optional dependency).

Equivalent of the reference's `vibevoice/caption/caption_generator.py:18-311`
/ `caption_formatter.py:16-247`: transcribe generated audio with
openai-whisper or faster-whisper for exact word timings, optionally matching
against the known script.  Gated on import — absent backends raise a clear
error and callers fall back to `SimpleCaptionGenerator`.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .simple import CaptionSegment, SimpleCaptionFormatter


def _backend():
    try:
        import faster_whisper  # type: ignore
        return "faster_whisper"
    except ImportError:
        pass
    try:
        import whisper  # type: ignore
        return "whisper"
    except ImportError:
        return None


class CaptionGenerator:
    """STT-based captions; model sizes tiny/base/small/medium/large."""

    def __init__(self, model_size: str = "base", device: str = "cpu"):
        self.model_size = model_size
        self.device = device
        self._model = None
        self._kind = _backend()
        if self._kind is None:
            raise ImportError(
                "No whisper backend installed (pip install openai-whisper or "
                "faster-whisper); use SimpleCaptionGenerator instead.")

    def _load(self):
        if self._model is not None:
            return
        if self._kind == "faster_whisper":
            from faster_whisper import WhisperModel
            self._model = WhisperModel(self.model_size, device=self.device,
                                       compute_type="int8")
        else:
            import whisper
            self._model = whisper.load_model(self.model_size, device=self.device)

    def transcribe(self, audio_path: str, word_timestamps: bool = True) -> List[CaptionSegment]:
        self._load()
        segments: List[CaptionSegment] = []
        if self._kind == "faster_whisper":
            segs, _ = self._model.transcribe(audio_path, word_timestamps=word_timestamps)
            for s in segs:
                segments.append(CaptionSegment(s.start, s.end, s.text.strip()))
        else:
            result = self._model.transcribe(audio_path, word_timestamps=word_timestamps)
            for s in result["segments"]:
                segments.append(CaptionSegment(s["start"], s["end"], s["text"].strip()))
        return segments

    def match_speakers(self, segments: Sequence[CaptionSegment],
                       script_lines: Sequence[Tuple[str, str]]) -> List[CaptionSegment]:
        """Attach speakers by greedy text alignment against the script."""
        out = []
        li = 0
        for seg in segments:
            best, best_score = None, -1.0
            for j in range(li, min(li + 3, len(script_lines))):
                speaker, text = script_lines[j]
                a = set(seg.text.lower().split())
                b = set(text.lower().split())
                score = len(a & b) / max(len(a), 1)
                if score > best_score:
                    best, best_score, bj = speaker, score, j
            if best is not None and best_score > 0.3:
                li = bj
                out.append(CaptionSegment(seg.start, seg.end, seg.text, best))
            else:
                out.append(seg)
        return out


CaptionFormatter = SimpleCaptionFormatter  # same emitters serve both paths

__all__ = ["CaptionGenerator", "CaptionFormatter"]

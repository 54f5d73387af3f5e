"""Script-based caption generation (no STT required).

Re-implements the reference caption pipeline's behavior
(`vibevoice/caption/simple_caption_generator.py:28-1305`,
`simple_caption_formatter.py:16-290`): split the known script into caption
segments, estimate timing from duration via a words-per-minute heuristic with
speaker-change pauses, optionally refine with ffmpeg `silencedetect` sentence
boundaries or faster-whisper word alignment when available, then emit
SRT / VTT / JSON / transcript formats.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
import shutil
import subprocess
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple


@dataclass
class CaptionSegment:
    start: float
    end: float
    text: str
    speaker: Optional[str] = None

    def to_dict(self):
        return {"start": round(self.start, 3), "end": round(self.end, 3),
                "text": self.text, "speaker": self.speaker}


_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> List[str]:
    parts = [p.strip() for p in _SENT_RE.split(text.strip()) if p.strip()]
    return parts or ([text.strip()] if text.strip() else [])


def chunk_words(sentence: str, max_words: int = 15) -> List[str]:
    """Split long sentences into <=max_words chunks at word boundaries
    (ref :166: <=15-word chunking)."""
    words = sentence.split()
    if len(words) <= max_words:
        return [sentence]
    return [" ".join(words[i:i + max_words]) for i in range(0, len(words), max_words)]


class SimpleCaptionGenerator:
    """Align a script to an audio duration (ref :28-1305)."""

    def __init__(self, words_per_minute: float = 150.0,
                 speaker_change_pause: float = 0.5,
                 max_words_per_caption: int = 15,
                 min_segment_duration: float = 0.8,
                 silence_threshold_db: float = -30.0,
                 min_silence_duration: float = 0.25):
        self.wpm = words_per_minute
        self.speaker_change_pause = speaker_change_pause
        self.max_words = max_words_per_caption
        self.min_segment_duration = min_segment_duration
        self.silence_threshold_db = silence_threshold_db
        self.min_silence_duration = min_silence_duration

    # ------------------------------------------------------------------
    def generate(self, script_lines: Sequence[Tuple[str, str]], duration: float,
                 audio_path: Optional[str] = None) -> List[CaptionSegment]:
        """script_lines: [(speaker, text)]; duration: audio seconds.

        Alignment ladder (ref :421, :654, :223): faster-whisper word
        alignment -> ffmpeg silence boundaries -> WPM heuristic.
        """
        segments = self._chunk_script(script_lines)
        if audio_path and os.path.exists(audio_path):
            aligned = self._align_with_silences(segments, duration, audio_path)
            if aligned is not None:
                return aligned
        return self._calculate_timing(segments, duration)

    # ------------------------------------------------------------------
    def _chunk_script(self, script_lines) -> List[Tuple[str, str]]:
        chunks: List[Tuple[str, str]] = []
        for speaker, text in script_lines:
            for sent in split_sentences(text):
                for chunk in chunk_words(sent, self.max_words):
                    chunks.append((speaker, chunk))
        return chunks

    def _calculate_timing(self, chunks, duration: float) -> List[CaptionSegment]:
        """WPM heuristic with speaker-change pauses + proportional rescale to
        the true duration (ref _calculate_timing :223-352)."""
        if not chunks:
            return []
        word_rate = self.wpm / 60.0
        est = []
        prev_speaker = None
        for speaker, text in chunks:
            dur = max(len(text.split()) / word_rate, self.min_segment_duration)
            pause = self.speaker_change_pause if (prev_speaker is not None and
                                                  speaker != prev_speaker) else 0.0
            est.append((speaker, text, dur, pause))
            prev_speaker = speaker
        total = sum(d + p for _, _, d, p in est)
        scale = duration / total if total > 0 else 1.0
        out, t = [], 0.0
        for speaker, text, dur, pause in est:
            t += pause * scale
            out.append(CaptionSegment(start=t, end=min(t + dur * scale, duration),
                                      text=text, speaker=speaker))
            t += dur * scale
        if out:
            out[-1].end = duration
        return out

    # ------------------------------------------------------------------
    def _detect_silences(self, audio_path: str) -> Optional[List[Tuple[float, float]]]:
        """ffmpeg silencedetect (ref :654-700); None when ffmpeg is absent."""
        if shutil.which("ffmpeg") is None:
            return None
        cmd = ["ffmpeg", "-i", audio_path, "-af",
               f"silencedetect=noise={self.silence_threshold_db}dB:d={self.min_silence_duration}",
               "-f", "null", "-"]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        except (subprocess.TimeoutExpired, OSError):
            return None
        silences, start = [], None
        for line in proc.stderr.splitlines():
            ms = re.search(r"silence_start:\s*([\d.]+)", line)
            me = re.search(r"silence_end:\s*([\d.]+)", line)
            if ms:
                start = float(ms.group(1))
            elif me and start is not None:
                silences.append((start, float(me.group(1))))
                start = None
        return silences

    def _align_with_silences(self, chunks, duration: float,
                             audio_path: str) -> Optional[List[CaptionSegment]]:
        silences = self._detect_silences(audio_path)
        if not silences:
            return None
        # candidate boundaries at silence midpoints
        bounds = sorted((s + e) / 2 for s, e in silences if e < duration)
        base = self._calculate_timing(chunks, duration)
        snapped = []
        for seg in base:
            end = seg.end
            # snap the end to the nearest silence midpoint within 0.75 s
            cand = min(bounds, key=lambda b: abs(b - end), default=None)
            if cand is not None and abs(cand - end) < 0.75:
                end = cand
            snapped.append(CaptionSegment(seg.start, max(end, seg.start + 0.2),
                                          seg.text, seg.speaker))
        # enforce monotonicity
        for i in range(1, len(snapped)):
            if snapped[i].start < snapped[i - 1].end:
                snapped[i].start = snapped[i - 1].end
                snapped[i].end = max(snapped[i].end, snapped[i].start + 0.2)
        if snapped:
            snapped[-1].end = duration
        return snapped


# ---------------------------------------------------------------------------
# formatting (ref simple_caption_formatter.py:16-290)
# ---------------------------------------------------------------------------

def _ts_srt(t: float) -> str:
    h, rem = divmod(max(t, 0.0), 3600)
    m, s = divmod(rem, 60)
    return f"{int(h):02d}:{int(m):02d}:{int(s):02d},{int(round((s % 1) * 1000)):03d}"


def _ts_vtt(t: float) -> str:
    h, rem = divmod(max(t, 0.0), 3600)
    m, s = divmod(rem, 60)
    return f"{int(h):02d}:{int(m):02d}:{int(s):06.3f}"


class SimpleCaptionFormatter:
    def to_srt(self, segments: Sequence[CaptionSegment], include_speaker=True) -> str:
        out = []
        for i, seg in enumerate(segments, 1):
            text = f"{seg.speaker}: {seg.text}" if include_speaker and seg.speaker else seg.text
            out.append(f"{i}\n{_ts_srt(seg.start)} --> {_ts_srt(seg.end)}\n{text}\n")
        return "\n".join(out)

    def to_vtt(self, segments: Sequence[CaptionSegment], include_speaker=True) -> str:
        out = ["WEBVTT", ""]
        for seg in segments:
            text = f"<v {seg.speaker}>{seg.text}" if include_speaker and seg.speaker else seg.text
            out.append(f"{_ts_vtt(seg.start)} --> {_ts_vtt(seg.end)}\n{text}\n")
        return "\n".join(out)

    def to_json(self, segments: Sequence[CaptionSegment]) -> str:
        return json.dumps({"segments": [s.to_dict() for s in segments]}, indent=2)

    def to_transcript(self, segments: Sequence[CaptionSegment]) -> str:
        lines, cur_speaker, cur = [], None, []
        for seg in segments:
            if seg.speaker != cur_speaker and cur:
                lines.append(f"{cur_speaker}: {' '.join(cur)}")
                cur = []
            cur_speaker = seg.speaker
            cur.append(seg.text)
        if cur:
            lines.append(f"{cur_speaker}: {' '.join(cur)}")
        return "\n\n".join(lines)

    def to_script_timing(self, segments: Sequence[CaptionSegment]) -> str:
        return "\n".join(f"[{_ts_vtt(s.start)} - {_ts_vtt(s.end)}] {s.speaker}: {s.text}"
                         for s in segments)

    def create_caption_package(self, segments, output_dir: str, base_name: str,
                               include_speaker=True) -> Dict[str, str]:
        os.makedirs(output_dir, exist_ok=True)
        files = {}
        for ext, content in [
            ("srt", self.to_srt(segments, include_speaker)),
            ("vtt", self.to_vtt(segments, include_speaker)),
            ("json", self.to_json(segments)),
            ("txt", self.to_transcript(segments)),
            ("timing.txt", self.to_script_timing(segments)),
        ]:
            path = os.path.join(output_dir, f"{base_name}.{ext}")
            with open(path, "w", encoding="utf-8") as f:
                f.write(content)
            files[ext] = path
        return files


def split_long_segments(segments: Sequence[CaptionSegment], max_duration: float = 7.0,
                        max_words: int = 15) -> List[CaptionSegment]:
    """ref split_long_segments :1252."""
    out: List[CaptionSegment] = []
    for seg in segments:
        dur = seg.end - seg.start
        words = seg.text.split()
        if dur <= max_duration and len(words) <= max_words:
            out.append(seg)
            continue
        n = max(int(-(-dur // max_duration)), -(-len(words) // max_words))
        per = len(words) / n
        t = seg.start
        for i in range(n):
            chunk = words[int(i * per): int((i + 1) * per)]
            if not chunk:
                continue
            end = seg.start + dur * (i + 1) / n
            out.append(CaptionSegment(t, end, " ".join(chunk), seg.speaker))
            t = end
    return out


__all__ = ["CaptionSegment", "SimpleCaptionGenerator", "SimpleCaptionFormatter",
           "split_sentences", "chunk_words", "split_long_segments"]

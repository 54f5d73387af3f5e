#!/usr/bin/env python
"""Post-hoc captioning for existing audio — equivalent of
`/root/reference/generate_captions_for_existing_audio.py:18-151`: given a wav
and its script, emit the caption package without re-generating audio.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio_path", type=str, required=True)
    ap.add_argument("--txt_path", type=str, required=True)
    ap.add_argument("--output_dir", type=str, default=None)
    ap.add_argument("--use_whisper", action="store_true")
    ap.add_argument("--whisper_model", type=str, default="base")
    args = ap.parse_args()

    from vibevoice_tpu.caption.simple import SimpleCaptionFormatter, SimpleCaptionGenerator
    from vibevoice_tpu.processor.audio import load_audio
    from vibevoice_tpu.processor.processor import VibeVoiceProcessor
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer

    wav = load_audio(args.audio_path)
    duration = len(wav) / 24000.0

    proc = VibeVoiceProcessor(ByteFallbackTokenizer())
    with open(args.txt_path, encoding="utf-8") as f:
        script = proc._convert_text_to_script(args.txt_path) \
            if args.txt_path.endswith(".txt") else f.read()
    parsed = proc._parse_script(script)
    lines = [(f"Speaker {sid + 1}", text.strip()) for sid, text in parsed]

    segments = None
    if args.use_whisper:
        try:
            from vibevoice_tpu.caption.whisper import CaptionGenerator
            stt = CaptionGenerator(args.whisper_model)
            segments = stt.match_speakers(stt.transcribe(args.audio_path), lines)
        except ImportError as e:
            print(f"whisper unavailable ({e}); falling back to script timing")
    if segments is None:
        segments = SimpleCaptionGenerator().generate(lines, duration, args.audio_path)

    out_dir = args.output_dir or os.path.dirname(os.path.abspath(args.audio_path))
    base = os.path.splitext(os.path.basename(args.audio_path))[0]
    files = SimpleCaptionFormatter().create_caption_package(segments, out_dir, base)
    for k, v in files.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()

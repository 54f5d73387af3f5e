#!/usr/bin/env python
"""CLI with Whisper-based captions — equivalent of
`/root/reference/demo/inference_with_captions.py` (falls back to
script-timing captions when no whisper backend is installed).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--txt_path", type=str, required=True)
    ap.add_argument("--output_dir", type=str, default="./outputs")
    ap.add_argument("--whisper_model", type=str, default="base")
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--max_new_tokens", type=int, default=512)
    args = ap.parse_args()

    from vibevoice_tpu.pipeline import VibeVoiceTTS
    from vibevoice_tpu.processor.captions_processor import VibeVoiceProcessorWithCaptions
    from demo.inference_from_file import VoiceMapper, parse_txt_script

    with open(args.txt_path, encoding="utf-8") as f:
        script, speakers = parse_txt_script(f.read())

    if args.model_path:
        tts = VibeVoiceTTS.from_pretrained(args.model_path, cfg_scale=args.cfg_scale,
                                           ddpm_steps=args.ddpm_steps)
    else:
        print("WARNING: random weights (smoke run)")
        tts = VibeVoiceTTS.from_random(cfg_scale=args.cfg_scale, ddpm_steps=args.ddpm_steps)

    mapper = VoiceMapper()
    voices = [mapper.get_voice_path(n) or
              np.random.default_rng(0).normal(0, 0.02, 24000).astype(np.float32)
              for n in speakers]

    res, metrics = tts.generate(script, voices, max_new_tokens=args.max_new_tokens)
    if res.audio[0] is None:
        print("no audio generated")
        return

    proc = VibeVoiceProcessorWithCaptions(
        tts.tokenizer, speech_tok_compress_ratio=tts.cfg.speech_compress_ratio,
        whisper_model_size=args.whisper_model)
    enc = tts.processor(script, voices)
    base = os.path.splitext(os.path.basename(args.txt_path))[0]
    out = os.path.join(args.output_dir, f"{base}.wav")
    files = proc.save_audio_with_captions(res.audio[0], out, enc.parsed_scripts[0])
    for k, v in files.items():
        print(f"  {k}: {v}")
    print(f"RTF={metrics['rtf']:.3f}")


if __name__ == "__main__":
    main()

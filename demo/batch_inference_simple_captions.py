#!/usr/bin/env python
"""Batch (data-parallel) inference with script-timing captions — equivalent of
`/root/reference/demo/batch_inference_simple_captions.py:180-402`: glob a txt
dir, batch scripts, ONE padded generate per batch, per-file wav + captions.

On TPU the batch dimension rides the `data` mesh axis when more than one
device is available; single-chip it is plain in-process batching (the same
5%->70-90% utilization lever the reference claims on GPU).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def create_batches(files, batch_size):
    return [files[i:i + batch_size] for i in range(0, len(files), batch_size)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    # file selection mirrors the reference CLI (batch_inference_simple_
    # captions.py:45-62): explicit --txt_files overrides the directory glob,
    # --txt_path runs a single file; --txt_dir is the reference's name for
    # our --input_dir
    ap.add_argument("--input_dir", "--txt_dir", dest="input_dir", type=str,
                    default=None)
    ap.add_argument("--txt_files", type=str, nargs="+", default=None)
    ap.add_argument("--txt_path", type=str, default=None)
    ap.add_argument("--output_dir", type=str, default="./outputs")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--max_new_tokens", type=int, default=512)
    ap.add_argument("--voices_dir", type=str, default=None)
    # accepted for reference shell-script compatibility (:71-115): captions
    # are always script-timed here; --device is validated but the TPU/CPU
    # choice is jax's
    ap.add_argument("--speaker_names", type=str, nargs="+", default=None)
    ap.add_argument("--generate_captions", action="store_true")
    ap.add_argument("--caption_formats", type=str, nargs="+", default=["srt"])
    ap.add_argument("--words_per_minute", type=int, default=150)
    ap.add_argument("--device", type=str, default=None)
    args = ap.parse_args()

    from vibevoice_tpu.pipeline import VibeVoiceTTS
    from vibevoice_tpu.processor.captions_processor import VibeVoiceProcessorSimpleCaptions
    from demo.inference_from_file import VoiceMapper

    if args.txt_files:
        files = list(args.txt_files)
    elif args.txt_path:
        files = [args.txt_path]
    elif args.input_dir:
        files = sorted(glob.glob(os.path.join(args.input_dir, "*.txt")))
    else:
        ap.error("one of --txt_files / --txt_path / --input_dir is required")
    missing = [f for f in files if not os.path.isfile(f)]
    if missing:
        print(f"missing input files: {missing}")
        return
    if not files:
        print(f"no .txt files in {args.input_dir}")
        return
    print(f"{len(files)} scripts, batch size {args.batch_size}")

    if args.model_path:
        tts = VibeVoiceTTS.from_pretrained(args.model_path, cfg_scale=args.cfg_scale,
                                           ddpm_steps=args.ddpm_steps)
    else:
        print("WARNING: random weights (smoke run)")
        tts = VibeVoiceTTS.from_random(cfg_scale=args.cfg_scale, ddpm_steps=args.ddpm_steps)

    cap_proc = VibeVoiceProcessorSimpleCaptions(
        tts.tokenizer, speech_tok_compress_ratio=tts.cfg.speech_compress_ratio)
    mapper = VoiceMapper(args.voices_dir)
    os.makedirs(args.output_dir, exist_ok=True)

    total_audio, total_wall = 0.0, 0.0
    saved_files = []
    for bi, batch_files in enumerate(create_batches(files, args.batch_size)):
        scripts = [open(f, encoding="utf-8").read() for f in batch_files]
        voices = []
        for _ in batch_files:
            p = mapper.get_voice_path("1")
            voices.append([p] if p else
                          [np.random.default_rng(0).normal(0, 0.02, 24000).astype(np.float32)])
        t0 = time.time()
        res, metrics = tts.generate(scripts, voices, max_new_tokens=args.max_new_tokens)
        dt = time.time() - t0
        total_audio += metrics["audio_sec"]
        total_wall += dt
        enc = tts.processor(scripts, voices)
        for i, f in enumerate(batch_files):
            base = os.path.splitext(os.path.basename(f))[0]
            if res.audio[i] is None:
                print(f"  [{base}] no audio")
                continue
            out = os.path.join(args.output_dir, f"{base}.wav")
            files_out = cap_proc.save_audio_with_captions(
                res.audio[i], out, enc.parsed_scripts[i])
            print(f"  [{base}] {len(res.audio[i])/24000:.1f}s -> {files_out['wav']}")
            saved_files.append(files_out["wav"])
        print(f"batch {bi}: {dt:.1f}s wall, RTF {metrics['rtf']:.2f}")
    print(f"TOTAL: {total_audio:.1f}s audio in {total_wall:.1f}s "
          f"(RTF {total_audio/max(total_wall,1e-9):.2f})")
    # shell pipelines grep for this exact line (ref :389-396)
    for f in saved_files:
        print(f"Saved audio to: {f}")


if __name__ == "__main__":
    main()

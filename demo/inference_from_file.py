#!/usr/bin/env python
"""File-to-podcast CLI — equivalent of the reference's canonical entry point
(`/root/reference/demo/inference_from_file.py:182-400`): voice-preset
mapping, txt script parsing, generation, RTF metrics, wav output.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# real recorded multilingual presets (zh-/in-/en- voices); scanned after the
# repo's own demo/voices so the reference's richer preset library (incl. the
# Chinese and Hindi voices, ref demo/voices/zh-*.wav, in-Samuel_man.wav) is
# available wherever the reference checkout is mounted
REFERENCE_VOICES_DIR = "/root/reference/demo/voices"


class VoiceMapper:
    """Map speaker names -> demo/voices/*.wav presets (ref :17-90)."""

    def __init__(self, voices_dir: str | None = None,
                 extra_dirs: tuple = (REFERENCE_VOICES_DIR,)):
        self.voices_dir = voices_dir or os.path.join(os.path.dirname(__file__), "voices")
        self.voice_presets = {}
        for d in (self.voices_dir, *extra_dirs):
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith((".wav", ".mp3", ".flac", ".npy")):
                    name = os.path.splitext(f)[0].split("_")[0]
                    self.voice_presets.setdefault(name, os.path.join(d, f))

    def get_voice_path(self, speaker_name: str) -> str | None:
        if not self.voice_presets:
            return None
        for name, path in self.voice_presets.items():
            if speaker_name.lower() in name.lower() or name.lower() in speaker_name.lower():
                return path
        return next(iter(self.voice_presets.values()))


def parse_txt_script(txt: str):
    """'Speaker N: text' lines -> (script, speaker names) (ref :93-136)."""
    lines = [l.strip() for l in txt.split("\n") if l.strip()]
    speakers, out_lines = [], []
    for line in lines:
        m = re.match(r"^Speaker\s+(\w+)\s*:\s*(.*)$", line, re.IGNORECASE)
        if m:
            sp = m.group(1)
            if sp not in speakers:
                speakers.append(sp)
            out_lines.append(f"Speaker {speakers.index(sp) + 1}: {m.group(2)}")
        else:
            out_lines.append(f"Speaker 1: {line}")
            if "1" not in speakers:
                speakers.append("1")
    return "\n".join(out_lines), speakers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None,
                    help="HF-format VibeVoice checkpoint dir (random weights if omitted)")
    ap.add_argument("--txt_path", type=str, required=True)
    ap.add_argument("--speaker_names", type=str, nargs="*", default=None)
    ap.add_argument("--output_dir", type=str, default="./outputs")
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--max_new_tokens", type=int, default=512)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random model on CPU (smoke test, noise output)")
    args = ap.parse_args()

    if args.tiny:
        import os as _os
        _os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from vibevoice_tpu.pipeline import VibeVoiceTTS

    with open(args.txt_path, encoding="utf-8") as f:
        txt = f.read()
    script, speakers = parse_txt_script(txt)

    mapper = VoiceMapper()
    names = args.speaker_names or speakers
    voices = []
    for name in names:
        p = mapper.get_voice_path(name)
        if p:
            voices.append(p)
        else:
            # fallback: 1 s of low-level noise as a neutral voice prompt
            voices.append(np.random.default_rng(0).normal(0, 0.02, 24000).astype(np.float32))

    t0 = time.time()
    if args.model_path:
        tts = VibeVoiceTTS.from_pretrained(args.model_path, cfg_scale=args.cfg_scale,
                                           ddpm_steps=args.ddpm_steps)
    elif args.tiny:
        import jax.numpy as jnp
        from vibevoice_tpu.configs import tiny_config
        print("WARNING: tiny random model (smoke run, output is noise)")
        tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320), dtype=jnp.float32,
                                       cfg_scale=args.cfg_scale, ddpm_steps=min(args.ddpm_steps, 4))
    else:
        print("WARNING: no --model_path; using random weights (smoke run)")
        tts = VibeVoiceTTS.from_random(cfg_scale=args.cfg_scale, ddpm_steps=args.ddpm_steps)
    print(f"model ready in {time.time()-t0:.1f}s")

    res, metrics = tts.generate(script, voices, max_new_tokens=args.max_new_tokens,
                                seed=args.seed, show_progress=True)

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(args.txt_path))[0]
    out_path = os.path.join(args.output_dir, f"{base}_generated.wav")
    if res.audio[0] is not None:
        tts.save_audio(res.audio[0], out_path)
        print(f"saved {out_path} ({len(res.audio[0])/24000:.1f}s audio)")
    else:
        print("no audio frames generated")
    print(f"steps={metrics['steps']} wall={metrics['wall_s']:.2f}s "
          f"audio={metrics['audio_sec']:.2f}s RTF={metrics['rtf']:.3f}")


if __name__ == "__main__":
    main()

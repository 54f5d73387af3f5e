#!/usr/bin/env python
"""Streaming web UI with live captions — equivalent of
`/root/reference/demo/gradio_demo_with_captions.py:38-1382`.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo.gradio_demo import SAMPLE_RATE, VibeVoiceDemo


class VibeVoiceDemoWithCaptions(VibeVoiceDemo):
    def generate_with_captions(self, script: str, voice_paths, max_new_tokens=512):
        """Yields ((sr, chunk), caption_text) pairs: audio plus the caption
        line estimated to be active at the current audio position."""
        from vibevoice_tpu.caption.simple import SimpleCaptionGenerator
        parsed = self.tts.processor._parse_script(script)
        lines = [(f"Speaker {sid + 1}", t.strip()) for sid, t in parsed]
        total_words = sum(len(t.split()) for _, t in lines)
        est_duration = max(total_words / 2.5, 1.0)  # rough preview timing
        segments = SimpleCaptionGenerator().generate(lines, est_duration)

        elapsed = 0.0
        for sr, chunk in self.generate_podcast_streaming(script, voice_paths,
                                                         max_new_tokens):
            elapsed += len(chunk) / sr
            active = next((s for s in segments if s.start <= elapsed <= s.end),
                          segments[-1] if segments else None)
            text = f"{active.speaker}: {active.text}" if active else ""
            yield (sr, chunk), text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--inference_steps", type=int, default=5)
    ap.add_argument("--port", type=int, default=7861)
    args = ap.parse_args()

    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; `pip install gradio` to run the web demo.")
        sys.exit(1)

    demo_obj = VibeVoiceDemoWithCaptions(args.model_path, args.inference_steps)
    from demo.inference_from_file import VoiceMapper
    mapper = VoiceMapper()

    def gen(script, speaker):
        voice = mapper.get_voice_path(speaker or "1")
        voices = [voice] if voice else [np.random.default_rng(0).normal(0, 0.02, 24000).astype(np.float32)]
        for (sr, chunk), caption in demo_obj.generate_with_captions(script, voices):
            yield (sr, chunk), caption

    with gr.Blocks(title="VibeVoice-TPU + captions") as ui:
        script = gr.Textbox(label="Script", lines=8,
                            value="Speaker 1: Hello!\nSpeaker 2: Hi there.")
        speaker = gr.Textbox(label="Speaker preset", value="1")
        audio = gr.Audio(label="Audio", streaming=True, autoplay=True)
        caption = gr.Textbox(label="Live caption")
        gr.Button("Generate").click(gen, [script, speaker], [audio, caption])
        gr.Button("Stop").click(lambda: demo_obj.stop())
    ui.launch(server_port=args.port)


if __name__ == "__main__":
    main()

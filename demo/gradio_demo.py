#!/usr/bin/env python
"""Streaming web UI — equivalent of `/root/reference/demo/gradio_demo.py:34-1246`:
generation thread feeding an AudioStreamer, chunk-buffered yields to the UI,
cooperative stop.  Requires `gradio` (not bundled); fails with a clear message
otherwise.
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SAMPLE_RATE = 24000


class VibeVoiceDemo:
    def __init__(self, model_path=None, inference_steps: int = 5, cfg_scale: float = 1.3):
        from vibevoice_tpu.pipeline import VibeVoiceTTS
        if model_path:
            self.tts = VibeVoiceTTS.from_pretrained(model_path, ddpm_steps=inference_steps,
                                                    cfg_scale=cfg_scale)
        else:
            self.tts = VibeVoiceTTS.from_random(ddpm_steps=inference_steps,
                                                cfg_scale=cfg_scale)
        self.stop_flag = False

    def generate_podcast_streaming(self, script: str, voice_paths, max_new_tokens=512):
        """Yields (sample_rate, np.ndarray) chunks >= 30 s or every 15 s
        (ref :314-393 buffering policy)."""
        from vibevoice_tpu.engine.streamer import AudioStreamer
        self.stop_flag = False
        streamer = AudioStreamer(batch_size=1)
        err = []

        def run():
            try:
                self.tts.generate(script, voice_paths, max_new_tokens=max_new_tokens,
                                  audio_streamer=streamer,
                                  stop_check_fn=lambda: self.stop_flag)
            except Exception as e:  # surface into the UI loop
                err.append(e)
                streamer.end()

        t = threading.Thread(target=run, daemon=True)
        t.start()

        buf, last_yield = [], time.time()
        min_samples = SAMPLE_RATE * 30
        for chunk in streamer.get_stream(0):
            buf.append(chunk)
            n = sum(len(c) for c in buf)
            if n >= min_samples or (time.time() - last_yield > 15 and n > 0):
                yield SAMPLE_RATE, np.concatenate(buf)
                buf, last_yield = [], time.time()
        if buf:
            yield SAMPLE_RATE, np.concatenate(buf)
        t.join(timeout=5)
        if err:
            raise err[0]

    def stop(self):
        self.stop_flag = True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--inference_steps", type=int, default=5)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()

    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; `pip install gradio` to run the web demo.")
        sys.exit(1)

    demo_obj = VibeVoiceDemo(args.model_path, args.inference_steps)
    from demo.inference_from_file import VoiceMapper
    mapper = VoiceMapper()

    def gen(script, speaker):
        voice = mapper.get_voice_path(speaker or "1")
        voices = [voice] if voice else [np.random.default_rng(0).normal(0, 0.02, 24000).astype(np.float32)]
        yield from demo_obj.generate_podcast_streaming(script, voices)

    with gr.Blocks(title="VibeVoice-TPU") as ui:
        script = gr.Textbox(label="Script", lines=8,
                            value="Speaker 1: Hello!\nSpeaker 2: Hi there.")
        speaker = gr.Textbox(label="Speaker preset", value="1")
        audio = gr.Audio(label="Generated audio", streaming=True, autoplay=True)
        go = gr.Button("Generate")
        stop = gr.Button("Stop")
        go.click(gen, [script, speaker], audio)
        stop.click(lambda: demo_obj.stop())
    ui.launch(server_port=args.port)


if __name__ == "__main__":
    main()

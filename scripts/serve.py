"""Headless TTS serving CLI: dynamic-batching HTTP endpoint over the engine.

  python scripts/serve.py --model_path /path/to/VibeVoice-1.5B \
      --quantize int8 --quantize_tokenizer int4k --port 8000 \
      --max_batch 8 --voices_dir demo/voices

POST /tts {"script": "Speaker 1: ...", "voice": "en-Alice"} -> WAV.
Pre-warms the engine buckets (batch 1..max_batch at the prompt bucket) so
no request pays a compile; pair with scripts/warm_serving_cache.py at
rollout for a persistent-cache hit instead of a live compile.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None,
                    help="HF checkpoint dir (tiny random model if omitted — smoke)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=50.0)
    ap.add_argument("--max_new_tokens", type=int, default=256)
    ap.add_argument("--quantize", default=None)
    ap.add_argument("--quantize_tokenizer", default=None)
    ap.add_argument("--use_fused_stages", action="store_true",
                    help="tiled large-T stage kernels (recommended at B>=2)")
    ap.add_argument("--kv_dtype", default="model")
    ap.add_argument("--ddpm_steps", type=int, default=5)
    ap.add_argument("--algorithm_type", default="sde-dpmsolver++")
    ap.add_argument("--voices_dir", default=None)
    ap.add_argument("--no_warm", action="store_true")
    # /tts/stream buffering policy (reference gradio: first flush at >=30
    # audio-sec buffered, else on a 15 s cadence)
    ap.add_argument("--stream_buffer_sec", type=float, default=30.0)
    ap.add_argument("--stream_cadence_s", type=float, default=15.0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    from vibevoice_tpu.serving import serve
    from vibevoice_tpu.processor.audio import load_audio

    kw = dict(ddpm_steps=args.ddpm_steps, algorithm_type=args.algorithm_type,
              quantize=args.quantize, quantize_tokenizer=args.quantize_tokenizer,
              use_fused_stages=args.use_fused_stages, kv_dtype=args.kv_dtype)
    if args.model_path:
        tts = VibeVoiceTTS.from_pretrained(args.model_path, **kw)
    else:
        from vibevoice_tpu.configs import tiny_config
        print("WARNING: no --model_path; tiny random model (smoke only)")
        tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320),
                                       dtype=jnp.float32, **kw)

    presets = {}
    if args.voices_dir and os.path.isdir(args.voices_dir):
        for f in sorted(os.listdir(args.voices_dir)):
            if f.endswith(".wav"):
                presets[os.path.splitext(f)[0].split("_")[0]] = load_audio(
                    os.path.join(args.voices_dir, f))

    if not args.no_warm:
        sizes = sorted({1, 2, args.max_batch})
        print(f"warming engine buckets {sizes} ...")
        tts.warm(batch_sizes=sizes, max_new_tokens=(args.max_new_tokens,))

    srv = serve(tts, host=args.host, port=args.port, max_batch=args.max_batch,
                max_wait_ms=args.max_wait_ms,
                default_max_new_tokens=args.max_new_tokens,
                voice_presets=presets,
                stream_buffer_sec=args.stream_buffer_sec,
                stream_cadence_s=args.stream_cadence_s)
    print(f"serving on {args.host}:{srv.port} "
          f"(POST /tts, POST /tts/stream, GET /healthz /metrics)")
    try:
        import time
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()

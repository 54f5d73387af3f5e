"""Precompile serving engines into the persistent compile cache.

Deployment step: run once per model/config rollout so serving processes
start with every engine program already in `.jax_cache` (cold compiles over
a remote-device tunnel take minutes per engine; warm starts are seconds).

  python scripts/warm_serving_cache.py --model_path /path/to/VibeVoice-1.5B \
      --batch_sizes 1 8 --prompt_buckets 1024 4096 --max_new_tokens 4096 \
      --quantize int8 --cache_dir /root/repo/.jax_cache

Without --model_path, warms a random-weight 1.5B (programs depend only on
shapes/dtypes, so the cache carries over to real weights).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--batch_sizes", type=int, nargs="+", default=[1])
    ap.add_argument("--prompt_buckets", type=int, nargs="+", default=None)
    ap.add_argument("--max_new_tokens", type=int, nargs="+", default=[256])
    ap.add_argument("--quantize", default=None,
                    choices=[None, "int8", "int4", "int4f"])
    ap.add_argument("--use_fused_stages", action="store_true",
                    help="pre-warm the tiled stage-kernel path (B>=2 serving)")
    ap.add_argument("--quantize_tokenizer", default=None,
                    choices=[None, "int8", "int4", "int4k"],
                    help="σ-VAE stack quantization (vocoder + semantic encoder)")
    ap.add_argument("--kv_dtype", default="model", choices=["model", "int8"])
    ap.add_argument("--ddpm_steps", type=int, default=5)
    ap.add_argument("--algorithm_type", default="sde-dpmsolver++")
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    args = ap.parse_args()

    import jax
    os.makedirs(args.cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from vibevoice_tpu.pipeline import VibeVoiceTTS

    kw = dict(dtype=jnp.bfloat16, ddpm_steps=args.ddpm_steps,
              algorithm_type=args.algorithm_type, quantize=args.quantize,
              quantize_tokenizer=args.quantize_tokenizer,
              use_fused_stages=args.use_fused_stages,
              kv_dtype=args.kv_dtype)
    t0 = time.perf_counter()
    if args.model_path:
        tts = VibeVoiceTTS.from_pretrained(args.model_path, **kw)
    else:
        tts = VibeVoiceTTS.from_random(**kw)
    print(f"model ready in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    warmed = tts.warm(batch_sizes=args.batch_sizes,
                      prompt_buckets=args.prompt_buckets,
                      max_new_tokens=args.max_new_tokens)
    dt = time.perf_counter() - t0
    for key in warmed:
        print(f"warmed engine (batch={key[0]}, prompt={key[1]}, max_new={key[2]})")
    print(f"{len(warmed)} engines compiled+cached in {dt:.1f}s -> {args.cache_dir}")


if __name__ == "__main__":
    main()

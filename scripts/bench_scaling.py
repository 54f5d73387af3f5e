#!/usr/bin/env python
"""Scaling-efficiency benchmark (BASELINE.md: >=85% DP efficiency target;
the reference's analogue is batch inference lifting GPU util 5%->70-90%,
demo/batch_inference_simple_captions.py:68-69).

Measures decode throughput (audio-sec/s) at several batch sizes on the
available devices and reports per-batch efficiency vs B=1.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_batch(params, cfg, batch: int, steps: int = 32, prompt_len: int = 64):
    from vibevoice_tpu.engine import generate as G
    gen = G.GenerationConfig(
        speech_start_id=151652, speech_end_id=151653, speech_diffusion_id=151654,
        eos_id=151643, ddpm_steps=10, force_diffusion=True)
    # max_steps must cover warmup + timed chunks: steps that run past the
    # per-sample cap mark samples finished and the superstep skips the
    # diffusion branch — a timed chunk beyond the cap measures no-ops and
    # inflated round-1's B=8 number ~2x (206 vs the honest ~110 audio-sec/s)
    eng = G.Engine(params, cfg, gen, max_steps=2 * steps + 8, batch=batch,
                   prompt_len=prompt_len, dtype=jnp.bfloat16)
    ids = np.zeros((batch, prompt_len), np.int32)
    mask = np.ones((batch, prompt_len), np.int32)
    sim = np.zeros((batch, prompt_len), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, steps)   # warmup incl. compile
    _ = int(np.asarray(state.frames).sum())     # tunnel-safe sync
    # steady-state: time a fresh pass of `steps`
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, steps)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    hop = cfg.speech_compress_ratio
    audio_sec = steps * batch * hop / 24000.0
    return audio_sec / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    from vibevoice_tpu.configs import vibevoice_1_5b
    from vibevoice_tpu.models import vibevoice

    cfg = vibevoice_1_5b()
    params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    jax.block_until_ready(params["lm"]["embed"])

    results = {}
    base = None
    for b in args.batches:
        thr = bench_batch(params, cfg, b, steps=args.steps)
        if base is None:
            base = thr
        eff = thr / (base * b)
        results[b] = {"audio_sec_per_s": round(thr, 3),
                      "efficiency_vs_b1": round(eff, 3)}
        print(json.dumps({"batch": b, **results[b]}), flush=True)

    print(json.dumps({"metric": "batch_scaling", "results": results}))


if __name__ == "__main__":
    main()

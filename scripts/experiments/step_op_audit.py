"""Audit the op/fusion count of one decode superstep (ROUND3 open item 2:
the ~2.1 ms mode-independent intercept is suspected to be ~100+ tiny
state/bookkeeping ops).  Compiles `Engine._step` on CPU at a 4-layer
1.5B-shaped config and prints the optimized-HLO op histogram, splitting
"LM-layer" ops from everything else so the plumbing is visible.

Usage:  JAX_PLATFORMS=cpu python scripts/experiments/step_op_audit.py [--full]
"""
import argparse
import collections
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="all 28 layers")
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--quantize", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="audit the REAL TPU-compiled program (each entry "
                         "fusion = one kernel launch); default audits on CPU")
    args = ap.parse_args()

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        os.makedirs("/root/repo/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vibevoice_tpu.configs import vibevoice_1_5b
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice

    cfg = vibevoice_1_5b()
    n_layers = args.layers or (28 if args.full else 4)
    cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
        cfg.decoder, num_hidden_layers=n_layers))

    params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    if args.quantize:
        from vibevoice_tpu.utils.quantize import quantize_model
        params = quantize_model(params, mode=args.quantize)

    gen = G.GenerationConfig(
        speech_start_id=151652, speech_end_id=151653, speech_diffusion_id=151654,
        eos_id=151643, cfg_scale=1.3, ddpm_steps=5,
        algorithm_type="sde-dpmsolver++", force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=128, batch=1, prompt_len=64,
                   dtype=jnp.bfloat16)

    ids = np.zeros((1, 64), np.int32)
    mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)

    compiled = eng._step.lower(eng.params, state).compile()
    txt = compiled.as_text()

    # count only the ENTRY computation: its instructions are the actual
    # dispatch sequence (each fusion = one kernel launch on TPU)
    entry = []
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            entry.append(line)
    txt = "\n".join(entry)

    ops = collections.Counter()
    fusions = 0
    tiny = []  # non-fused top-level ops with < 4096 output elements
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?\S+ = \(?\w+\[([\d,]*)\][^=]*? ([\w-]+)\(", line)
        if not m:
            continue
        dims_s, op = m.group(1), m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        ops[op] += 1
        if op == "fusion":
            fusions += 1
        dims = [int(x) for x in dims_s.split(",") if x]
        n = 1
        for d in dims:
            n *= d
        if n < 4096 and op not in ("fusion", "bitcast", "copy"):
            tiny.append((op, dims))

    print(f"layers={n_layers} quantize={args.quantize}")
    print(f"total top-level ops: {sum(ops.values())}, fusions: {fusions}")
    for op, c in ops.most_common(25):
        print(f"  {op:28s} {c}")
    print(f"tiny (<4096 elem) non-fusion ops: {len(tiny)}")
    th = collections.Counter(op for op, _ in tiny)
    for op, c in th.most_common(15):
        print(f"  tiny {op:24s} {c}")


if __name__ == "__main__":
    main()

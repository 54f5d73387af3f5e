"""A/B: end-to-end decode RTF — int8 vs int4 LM weights (Pallas dequant-matmul).

Whole-engine chunks with scalar-fetch sync (microbenchmarks over the tunnel
are unreliable; see CLAUDE.md).  Variants:
  int8           — round-1 production path (25.5x RTF reference point)
  int4           — per-channel int4 LM+head+logits, diffusion head int4
  int4-g128      — per-group-128 scales (quality option; costs a VPU mul/value)
  int4-lm-only   — int4 LM, diffusion head kept int8
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.utils.quantize import quantize_model

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(params["lm"]["embed"][0, 0])
print("init done", flush=True)


def run(p, tag, ddpm_steps=10):
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=ddpm_steps, force_diffusion=True)
    eng = G.Engine(p, cfg, gen, max_steps=128, batch=1, prompt_len=64,
                   dtype=jnp.bfloat16)
    ids = np.zeros((1, 64), np.int32); mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    t0 = time.perf_counter()
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    print(f"# {tag} warmup {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    rtf = 64 * hop / 24000.0 / dt
    print(json.dumps({"tag": tag, "ms_per_frame": round(dt / 64 * 1000, 3),
                      "rtf": round(rtf, 2)}), flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "int8"):
    qp = quantize_model(params, True)
    _ = float(qp["lm"]["layers"][0]["q"]["w"]["scale"][0])
    run(qp, "int8")
if which in ("all", "int4"):
    qp = quantize_model(params, True, mode="int4")
    _ = float(qp["lm"]["layers"][0]["qkv"]["w"]["scale4"][0, 0])
    run(qp, "int4")
if which in ("all", "int4-g128"):
    qp = quantize_model(params, True, mode="int4", group_size=128)
    _ = float(qp["lm"]["layers"][0]["qkv"]["w"]["scale4"][0, 0])
    run(qp, "int4-g128")
if which in ("all", "int4-lm-only"):
    qp = quantize_model(params, True, mode="int4", diffusion_mode="int8")
    _ = float(qp["lm"]["layers"][0]["qkv"]["w"]["scale4"][0, 0])
    run(qp, "int4-lm-only")

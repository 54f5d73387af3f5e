"""Per-layer cost slope of the decode superstep.

The int4f probe showed the LM limb (~2.7 ms at B=1) is not call-bound.
This separates it into (a) a per-layer slope and (b) a fixed intercept
(logits + sampling + diffusion + σ-VAE + plumbing) by measuring the frame
time at L in {4, 12, 28} layers, same config otherwise (int4f + tok8,
production 5-step SDE).  The int4f per-layer weight read is ~31 MB
(~38 µs at 820 GB/s): a slope well above that is op-scheduling/latency —
the budget a fused decode-layer megakernel could reclaim.

Usage: layer_scaling_probe.py [batch]
"""
import sys, os, time, json, gc, dataclasses
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
base_cfg = vibevoice_1_5b()
hop = base_cfg.speech_compress_ratio

points = []
for layers in (4, 12, 28):
    cfg = dataclasses.replace(
        base_cfg, decoder=dataclasses.replace(base_cfg.decoder,
                                              num_hidden_layers=layers))
    params = jax.jit(lambda k, c=cfg: vibevoice.init_model(k, c, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    params = quantize_model(params, True, mode="int4f", tokenizer_mode="int8")
    _ = float(np.asarray(params["speech_scaling_factor"]))

    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=5, algorithm_type="sde-dpmsolver++",
                             force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=192, batch=BATCH,
                   prompt_len=64, dtype=jnp.bfloat16)
    ids = np.zeros((BATCH, 64), np.int32)
    mask = np.ones((BATCH, 64), np.int32)
    sim = np.zeros((BATCH, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    f0 = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    f1 = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    ms = dt / 64 * 1000
    points.append((layers, ms))
    print(json.dumps({"layers": layers, "batch": BATCH,
                      "ms_per_step": round(ms, 3)}), flush=True)
    del params, eng, state
    gc.collect()

(l0, m0), (l1, m1), (l2, m2) = points
slope_a = (m1 - m0) / (l1 - l0) * 1000
slope_b = (m2 - m1) / (l2 - l1) * 1000
intercept = m0 - (m1 - m0) / (l1 - l0) * l0
print(json.dumps({"us_per_layer_4_12": round(slope_a, 1),
                  "us_per_layer_12_28": round(slope_b, 1),
                  "intercept_ms": round(intercept, 3),
                  "int4f_read_floor_us_per_layer": 38}), flush=True)

"""Late-generation decode cost: sweep the LIVE context length inside the
64K cache by advancing the engine's slot clock, measuring ms/frame at each
point.  The decode kernel DMAs only blocks below `lengths`, so cost should
scale with live length; this quantifies the end-of-90-minute worst case
(the earlier 64K probe measured a 2K live context in a 64K-wide cache)."""
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

KV = os.environ.get("KV", "model")       # KV=int8: quantized KV cache
W8 = os.environ.get("W8", "0") == "1"    # W8=1: int8 weights

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
if W8:
    params = quantize_model(params, True)
_ = float(np.asarray(jax.tree_util.tree_leaves(params["lm"]["embed"])[0][0, 0]))
print(f"init done (W8={W8} KV={KV})", flush=True)

prompt_len = 2048
max_steps = 65536 - prompt_len
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=10, force_diffusion=True)
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=1,
               prompt_len=prompt_len, dtype=jnp.bfloat16, kv_dtype=KV)

ids = np.zeros((1, prompt_len), np.int32)
mask = np.ones((1, prompt_len), np.int32)
sim = np.zeros((1, prompt_len), bool)
results = []
for live in (4096, 16384, 32768, 49152, 63488):
    # fresh prefill per point: decode_chunk donates its state, so a hacked
    # copy of one prefill state would reuse deleted buffers on iteration 2
    state0, _ = eng.prefill(ids, mask, sim)
    _ = int(np.asarray(state0.frames).sum())
    # advance the slot clock so the kernel's `lengths` sees `live` slots;
    # mark them visible so attention actually reads them (worst case)
    vis = np.zeros((2, eng.cache_len), np.int32)
    vis[:, :live] = 1
    state = state0._replace(
        write_pos=jnp.int32(live),
        visible=jnp.asarray(vis),
        pos_positions=jnp.full((1,), live, jnp.int32),
        neg_positions=jnp.full((1,), live, jnp.int32),
        neg_started=jnp.ones((1,), bool),
        step=jnp.int32(live - prompt_len),
        max_step_per_sample=jnp.full((1,), max_steps, jnp.int32),
    )
    state, _ = eng.decode_chunk(state, 16)   # warmup at this length class
    _ = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 16)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    rec = {"live": live, "kv": KV, "w8": W8, "ms_per_frame": round(dt / 16 * 1000, 2),
           "rtf": round(16 * hop / 24000.0 / dt, 2)}
    results.append(rec)
    print(json.dumps(rec), flush=True)
    del state, state0  # free 4.5 GB of engine state before the next prefill

print(json.dumps({"sweep": results}), flush=True)

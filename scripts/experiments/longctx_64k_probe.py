"""Capability probe: construct the 90-min/64K engine (1.5B bf16), prefill a
2048-token prompt into the 64K cache, decode a few frames. Validates memory
fit + long-cache decode at full width (BASELINE.json config 5's single-chip
slice)."""
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

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(params["lm"]["embed"][0, 0])
print("init done", flush=True)

prompt_len = 2048
max_steps = 65536 - prompt_len   # full 64K context budget (~2.3h of audio)
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=10, force_diffusion=True)
t0 = time.perf_counter()
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=1,
               prompt_len=prompt_len, dtype=jnp.bfloat16)
print(f"engine built (cache 64K): {time.perf_counter()-t0:.1f}s "
      f"flash_prefill={eng.use_flash_prefill} flash_decode={eng.use_flash_decode}",
      flush=True)

ids = np.zeros((1, prompt_len), np.int32)
mask = np.ones((1, prompt_len), np.int32)
sim = np.zeros((1, prompt_len), bool)
t0 = time.perf_counter()
state, _ = eng.prefill(ids, mask, sim)
_ = int(np.asarray(state.frames).sum())
print(f"prefill 2048 into 64K cache: {time.perf_counter()-t0:.1f}s", flush=True)

state, _ = eng.decode_chunk(state, 16)
_ = int(np.asarray(state.frames).sum())
t0 = time.perf_counter()
state, _ = eng.decode_chunk(state, 16)
f = int(np.asarray(state.frames).sum())
dt = time.perf_counter() - t0
print(json.dumps({"cache": 65536, "ms_per_frame": round(dt/16*1000, 2),
                  "rtf": round(16*hop/24000.0/dt, 2), "frames": f}), flush=True)

import sys; sys.path.insert(0,'/root/repo')
import os, time, json
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

def run(tag, **kw):
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=10, force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=128, batch=1, prompt_len=64,
                   dtype=jnp.bfloat16, **kw)
    ids = np.zeros((1, 64), np.int32); mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({"tag": tag, "ms_per_frame": round(dt/64*1000, 3),
                      "rtf": round(64*hop/24000.0/dt, 2)}), flush=True)

run("baseline")
run("fused_vocoder", use_fused_vocoder=True)

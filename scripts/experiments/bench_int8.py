"""A/B: end-to-end decode RTF with int8 weight-only LM vs bf16."""
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

def run(params, tag):
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=10, force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=128, batch=1, prompt_len=64,
                   dtype=jnp.bfloat16)
    ids = np.zeros((1, 64), np.int32); mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    rtf = 64 * hop / 24000.0 / dt
    print(json.dumps({"tag": tag, "ms_per_frame": round(dt / 64 * 1000, 3),
                      "rtf": round(rtf, 2)}), flush=True)

run(params, "bf16")
# quantize eagerly (a single giant jitted program can exceed the remote
# tunnel's compile request limits)
qparams = quantize_model(params, True)
_ = float(qparams["lm"]["layers"][0]["q"]["w"]["scale"][0])
print("quantized", flush=True)
run(qparams, "int8")

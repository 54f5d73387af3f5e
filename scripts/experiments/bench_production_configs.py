"""Production-config RTF matrix (VERDICT round-1 item 4): the reference's
gradio serving config is 5 solver steps with sde-dpmsolver++
(demo/gradio_demo.py:35,:114-118); its CLI default is 10-step dpmsolver++.
Measures one config per invocation (robust to tunnel hiccups):

  python scripts/experiments/bench_production_configs.py <config>
  config in: sde5-bf16-b1 | sde5-int8-b1 | sde5-bf16-b8 | sde5-int8-b8 |
             dpm10-bf16-b8-int8kv | sde5-int4-b1
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

CONFIGS = {
    "sde5-bf16-b1": dict(steps=5, algo="sde-dpmsolver++", quant=None, batch=1),
    "sde5-int8-b1": dict(steps=5, algo="sde-dpmsolver++", quant="int8", batch=1),
    # int4 = int4 LM + int8 diffusion head (the measured-optimal default);
    # int4full forces the head to int4 too (measured slower: per-step Pallas
    # call overhead exceeds the saved reads)
    "sde5-int4-b1": dict(steps=5, algo="sde-dpmsolver++", quant="int4", batch=1),
    "sde5-int4full-b1": dict(steps=5, algo="sde-dpmsolver++", quant="int4", batch=1,
                             dmode="int4"),
    "sde5-bf16-b8": dict(steps=5, algo="sde-dpmsolver++", quant=None, batch=8),
    "sde5-int8-b8": dict(steps=5, algo="sde-dpmsolver++", quant="int8", batch=8),
    "dpm10-int8-b8": dict(steps=10, algo="dpmsolver++", quant="int8", batch=8),
    "dpm10-bf16-b8": dict(steps=10, algo="dpmsolver++", quant=None, batch=8),
    "dpm5-bf16-b8": dict(steps=5, algo="dpmsolver++", quant=None, batch=8),
    "sde5-int8-b1-fv": dict(steps=5, algo="sde-dpmsolver++", quant="int8", batch=1,
                            fused_vocoder=True),
    "sde5-int4-b1-fv": dict(steps=5, algo="sde-dpmsolver++", quant="int4", batch=1,
                            fused_vocoder=True),
    "sde5-int4-b1-fsem": dict(steps=5, algo="sde-dpmsolver++", quant="int4", batch=1,
                              fused_semantic=True),
    "sde5-int4-b1-fsem-fv": dict(steps=5, algo="sde-dpmsolver++", quant="int4",
                                 batch=1, fused_semantic=True, fused_vocoder=True),
}

name = sys.argv[1]
c = CONFIGS[name]

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
if c["quant"]:
    params = quantize_model(params, True, mode=c["quant"],
                            diffusion_mode=c.get("dmode"))
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print("init done", flush=True)

gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=c["steps"], algorithm_type=c["algo"],
                         force_diffusion=True)
b = c["batch"]
eng = G.Engine(params, cfg, gen, max_steps=128, batch=b, prompt_len=64,
               dtype=jnp.bfloat16, use_fused_vocoder=c.get("fused_vocoder", False),
               use_fused_semantic=c.get("fused_semantic", False))
ids = np.zeros((b, 64), np.int32)
mask = np.ones((b, 64), np.int32)
sim = np.zeros((b, 64), bool)
t0 = time.perf_counter()
state, _ = eng.prefill(ids, mask, sim)
state, _ = eng.decode_chunk(state, 64)
f0 = int(np.asarray(state.frames).sum())
print(f"# warmup {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
state, _ = eng.decode_chunk(state, 64)
f1 = int(np.asarray(state.frames).sum())
dt = time.perf_counter() - t0
# credit only frames actually emitted (steps at the max-step cap are
# finished no-ops; with max_steps=128 the timed chunk has one)
audio_sec = (f1 - f0) * hop / 24000.0
steps_emitted = (f1 - f0) / b
print(json.dumps({"config": name, "ms_per_frame_total": round(dt / steps_emitted * 1000, 3),
                  "audio_sec_per_s": round(audio_sec / dt, 2),
                  "rtf_per_stream": round(audio_sec / dt / b, 2)}), flush=True)

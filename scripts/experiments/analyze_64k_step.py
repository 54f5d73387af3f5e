"""Inspect the compiled 64K decode step: XLA's bytes-accessed estimate and
temp-buffer allocation reveal whether cache-sized copies remain after the
alias-friendly rewrite (uniform-slot DUS everywhere)."""
import sys, os, re, json
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
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(params["lm"]["embed"][0, 0])

prompt_len = 2048
max_steps = 65536 - prompt_len
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=10, force_diffusion=True)
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=1,
               prompt_len=prompt_len, dtype=jnp.bfloat16)

ids = np.zeros((1, prompt_len), np.int32)
mask = np.ones((1, prompt_len), np.int32)
sim = np.zeros((1, prompt_len), bool)
state, _ = eng.prefill(ids, mask, sim)
_ = int(np.asarray(state.frames).sum())
print("prefill done", flush=True)

lowered = eng._chunk.lower(eng.params, state, 16)
comp = lowered.compile()
ma = comp.memory_analysis()
print("memory_analysis:", ma, flush=True)
try:
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = {k: v for k, v in ca.items() if "bytes" in k or k in ("flops",)}
    print("cost_analysis:", json.dumps({k: float(v) for k, v in keys.items()}), flush=True)
except Exception as e:
    print("cost_analysis failed:", e, flush=True)

txt = comp.as_text()
print("hlo chars:", len(txt), flush=True)
# find big copies / scatters
pat = re.compile(r"(copy|scatter|dynamic-update-slice|concatenate)\(")
big = {}
for line in txt.splitlines():
    m = re.search(r"= (\S+)\[([\d,]*)\][^ ]* (copy|scatter|concatenate)\(", line)
    if m:
        dt, shape, op = m.group(1), m.group(2), m.group(3)
        dims = [int(x) for x in shape.split(",") if x]
        n = 1
        for d in dims:
            n *= d
        bytes_ = n * (2 if dt.startswith("bf16") or dt.startswith("f16") else 4)
        if bytes_ > 16 * 1024 * 1024:
            key = f"{op} {dt}[{shape}]"
            big[key] = big.get(key, 0) + 1
for k, v in sorted(big.items(), key=lambda kv: -kv[1]):
    print(f"BIG {v}x {k}", flush=True)
with open("/tmp/step64k_hlo.txt", "w") as f:
    f.write(txt)
print("hlo saved to /tmp/step64k_hlo.txt", flush=True)

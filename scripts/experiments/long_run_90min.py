"""ONE continuous long-form generation: B=1, 64K cache, ~40K frames
(~90 minutes of audio — the reference's headline capability, README.md:96-99)
decoded end-to-end in a single engine session, with RTF and device memory
logged per chunk.  Unlike longctx_live_sweep.py (which samples decode cost at
spot live-lengths), this retires the capability asterisk by actually running
the whole generation: every cache slot is written in order, the live context
grows 2K -> 42K organically, and the wall-clock covers all of it.

Config: production 5-step SDE, bf16 (exact-numerics headline mode); set
W8=1 KV=int8 for the quantized long-context serving mode.

Usage: python scripts/experiments/long_run_90min.py [frames=40448]
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

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 40448
KV = os.environ.get("KV", "model")
W8 = os.environ.get("W8", "0") == "1"
CHUNK = 512

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
if W8:
    params = quantize_model(params, True)
_ = float(np.asarray(jax.tree_util.tree_leaves(params["lm"]["embed"])[0][0, 0]))
print(f"init done (W8={W8} KV={KV} frames={FRAMES})", flush=True)


def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        return {"tag": tag, "used_gib": round(st.get("bytes_in_use", 0) / 2**30, 2),
                "peak_gib": round(st.get("peak_bytes_in_use", 0) / 2**30, 2)}
    except Exception:
        return {"tag": tag}


prompt_len = 2048
max_steps = 65536 - prompt_len
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         cfg_scale=1.3, ddpm_steps=5,
                         algorithm_type="sde-dpmsolver++", force_diffusion=True,
                         # default 2x-prompt per-sample cap would end the run
                         # at 4096 frames; this run goes to FRAMES
                         max_length_times=64.0)
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=1,
               prompt_len=prompt_len, dtype=jnp.bfloat16, kv_dtype=KV,
               keep_audio=False)
print(f"engine built: cache {eng.cache_len}, flash_decode={eng.use_flash_decode}",
      flush=True)

ids = np.zeros((1, prompt_len), np.int32)
mask = np.ones((1, prompt_len), np.int32)
sim = np.zeros((1, prompt_len), bool)
t_start = time.perf_counter()
state, _ = eng.prefill(ids, mask, sim)
f = int(np.asarray(state.frames).sum())
print(f"prefill: {time.perf_counter()-t_start:.1f}s  {json.dumps(mem('prefill'))}",
      flush=True)

done = 0
t_gen0 = time.perf_counter()
log = []
while done < FRAMES:
    n = min(CHUNK, FRAMES - done)
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, n)
    f1 = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    frames = f1 - f
    f = f1
    done += n
    if frames == 0:
        # a step past the per-sample cap is a finished no-op (the r1 bench
        # bug class) — never time those silently
        print(json.dumps({"error": "no frames emitted this chunk — per-sample "
                          "cap hit?", "frames_done": f, "steps_done": done}),
              flush=True)
        break
    rec = {"frames_done": f, "live_ctx": prompt_len + done,
           "chunk_ms_per_frame": round(dt / n * 1000, 2),
           "chunk_rtf": round(frames * hop / 24000.0 / dt, 2)}
    if done % (CHUNK * 8) == 0 or done >= FRAMES:
        rec.update(mem("decode"))
    log.append(rec)
    print(json.dumps(rec), flush=True)

wall = time.perf_counter() - t_gen0
audio_sec = f * hop / 24000.0
print(json.dumps({
    "metric": "continuous_longform_90min",
    "frames": f, "audio_min": round(audio_sec / 60.0, 1),
    "wall_min": round(wall / 60.0, 2),
    "end_to_end_rtf": round(audio_sec / wall, 2),
    "first_chunk_rtf": log[0]["chunk_rtf"], "last_chunk_rtf": log[-1]["chunk_rtf"],
    "config": f"bf16 B=1 5-step SDE, 64K cache, kv={KV}, w8={W8}",
    "mem_final": mem("final")}), flush=True)

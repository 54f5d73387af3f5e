"""B>1 long-context decode (VERDICT round-1 item 8): throughput at live
contexts 16K-63K inside the 64K cache for B in {2,4}, int8 weights +
int8 KV (the realistic batch-serving regime).  keep_audio=False drops the
per-sample waveform accumulator (the streamer gets chunks instead).

  B=2 LIVES="16384 32768" python scripts/experiments/bench_longctx_batch.py
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

B = int(os.environ.get("B", "2"))
LIVES = [int(x) for x in os.environ.get("LIVES", "16384 32768 63488").split()]
W = os.environ.get("W", "int8")          # int8 | int4 | int4f | bf16
KV = os.environ.get("KV", "int8")        # int8 | model
TOK = os.environ.get("TOK") or None      # int8 | int4 | unset (σ-VAE stacks)
FS = os.environ.get("FS", "") == "1"     # tiled large-T stage kernel
STEPS = int(os.environ.get("STEPS", "10"))
ALGO = os.environ.get("ALGO", "dpmsolver++")
# cache width: B=4 at the full 64K int8-KV cache RESOURCE_EXHAUSTs the
# 16 GB chip (measured 2026-08-19) — serve B=4 from a 32K cache instead
CACHE = int(os.environ.get("CACHE", "65536"))

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
if W != "bf16":
    params = quantize_model(params, True, mode=W, tokenizer_mode=TOK)
elif TOK:
    from vibevoice_tpu.utils.quantize import quantize_tokenizers
    params = quantize_tokenizers(params, mode=TOK)
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print(f"init done (B={B} W={W} KV={KV} TOK={TOK} FS={FS} {STEPS}-step {ALGO})", flush=True)

prompt_len = 2048
max_steps = CACHE - prompt_len
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=STEPS, algorithm_type=ALGO,
                         force_diffusion=True)
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=B,
               prompt_len=prompt_len, dtype=jnp.bfloat16, kv_dtype=KV,
               use_fused_stages=FS, keep_audio=False)

ids = np.zeros((B, prompt_len), np.int32)
mask = np.ones((B, prompt_len), np.int32)
sim = np.zeros((B, prompt_len), bool)
results = []
for live in LIVES:
    state0, _ = eng.prefill(ids, mask, sim)
    _ = int(np.asarray(state0.frames).sum())
    vis = np.zeros((2 * B, eng.cache_len), np.int32)
    vis[:, :live] = 1
    state = state0._replace(
        write_pos=jnp.int32(live),
        visible=jnp.asarray(vis),
        pos_positions=jnp.full((B,), live, jnp.int32),
        neg_positions=jnp.full((B,), live, jnp.int32),
        neg_started=jnp.ones((B,), bool),
        step=jnp.int32(live - prompt_len),
        max_step_per_sample=jnp.full((B,), max_steps, jnp.int32),
    )
    state, _ = eng.decode_chunk(state, 16)
    _ = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 16)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    audio_sec = 16 * B * hop / 24000.0
    rec = {"batch": B, "live": live, "w": W, "kv": KV,
           "ms_per_frame_total": round(dt / 16 * 1000, 2),
           "audio_sec_per_s": round(audio_sec / dt, 2),
           "rtf_per_stream": round(audio_sec / dt / B, 2)}
    results.append(rec)
    print(json.dumps(rec), flush=True)
    del state, state0

print(json.dumps({"sweep": results}), flush=True)

"""Decode-step cost attribution at 1.5B with tunnel-safe timing:
queued dependent dispatches (state threaded through) + one scalar fetch.
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.models import vibevoice, qwen2, tokenizer
from vibevoice_tpu.schedule import dpm_solver as ds

cfg = vibevoice_1_5b()
dec = cfg.decoder
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(params["lm"]["embed"][0, 0])
print("init done", flush=True)

N = 32

def report(name, dt_total):
    print(json.dumps({"part": name, "ms": round(dt_total / N * 1000, 3)}), flush=True)

# --- LM decode step [2B], threading hidden back in as next embeds ---
B2, S = 2, 192
cache = qwen2.kv_cache_init(dec, B2, S, jnp.bfloat16)
vis = jnp.ones((B2, S), jnp.int32)

@jax.jit
def lm_step(params, cache, emb):
    h, c = qwen2.forward(params["lm"], dec, emb, jnp.full((B2, 1), 10, jnp.int32),
                         qwen2.decode_bias(vis), cache=cache, write_pos=jnp.int32(10))
    return h, c

emb = jnp.zeros((B2, 1, dec.hidden_size), jnp.bfloat16)
h, cache = lm_step(params, cache, emb)
_ = float(h.sum())
t0 = time.perf_counter()
for _i in range(N):
    h, cache = lm_step(params, cache, h * 0.01)
_ = float(h.sum())
report("lm_step_2B", time.perf_counter() - t0)

# --- diffusion sampling scan (10 steps), threading condition ---
solver_cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="cosine",
                             prediction_type="v_prediction")
sched = ds.set_timesteps(solver_cfg, ds.make_tables(solver_cfg), 10)

@jax.jit
def diff(params, hcond):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64), jnp.bfloat16)
    lat = vibevoice.sample_speech_latents(params, cfg, solver_cfg, sched,
                                          hcond, hcond, 1.3, x)
    return lat

hc = jnp.zeros((1, dec.hidden_size), jnp.bfloat16)
lat = diff(params, hc)
_ = float(lat.sum())
t0 = time.perf_counter()
for _i in range(N):
    lat = diff(params, jnp.broadcast_to(lat.sum(), (1, dec.hidden_size)).astype(jnp.bfloat16))
_ = float(lat.sum())
report("diffusion_scan10", time.perf_counter() - t0)

# --- vocoder frame, threading streaming state ---
ac_state = tokenizer.decoder_state_init(cfg.acoustic_tokenizer, 1, jnp.bfloat16)

@jax.jit
def voc(params, z, st):
    return tokenizer.decoder_apply_streaming(params["acoustic_decoder"],
                                             cfg.acoustic_tokenizer, z, st)

z = jnp.zeros((1, 1, 64), jnp.bfloat16)
y, ac_state = voc(params, z, ac_state)
_ = float(y.sum())
t0 = time.perf_counter()
for _i in range(N):
    y, ac_state = voc(params, (y[:, :1, :64] * 0 + 0.01), ac_state)
_ = float(y.sum())
report("vocoder_frame", time.perf_counter() - t0)

# --- semantic encode frame, threading state ---
sem_state = tokenizer.encoder_state_init(cfg.semantic_tokenizer, 1, jnp.bfloat16)

@jax.jit
def sem(params, au, st):
    return tokenizer.encoder_apply_streaming(params["semantic_encoder"],
                                             cfg.semantic_tokenizer, au, st)

au = jnp.zeros((1, 3200, 1), jnp.bfloat16)
sm, sem_state = sem(params, au, sem_state)
_ = float(sm.sum())
t0 = time.perf_counter()
for _i in range(N):
    sm, sem_state = sem(params, au + sm.sum() * 0, sem_state)
_ = float(sm.sum())
report("semantic_frame", time.perf_counter() - t0)

"""Where does int4 spend its time? Component timing int8 vs int4 at 1.5B
(tunnel-safe: state threaded through N dependent dispatches + scalar fetch)."""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.models import vibevoice, qwen2, diffusion_head as dh
from vibevoice_tpu.utils.quantize import quantize_lm, quantize_diffusion_head, quantize_weight, quantize_weight_int4, mm

PART = sys.argv[1] if len(sys.argv) > 1 else "all"

cfg = vibevoice_1_5b()
dec = cfg.decoder
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
_ = float(params["lm"]["embed"][0, 0])
print("init done", flush=True)

N = 64


def bench(name, fn, state0):
    s = fn(state0)
    _ = float(jnp.asarray(s[0] if isinstance(s, tuple) else s).sum())
    t0 = time.perf_counter()
    for _i in range(N):
        s = fn(s)
    _ = float(jnp.asarray(s[0] if isinstance(s, tuple) else s).sum())
    print(json.dumps({"part": name, "ms": round((time.perf_counter() - t0) / N * 1000, 3)}), flush=True)


# --- LM decode step [2B] ---
B2, S = 2, 192
vis = jnp.ones((B2, S), jnp.int32)

def lm_variant(lm_params, tag):
    cache0 = qwen2.kv_cache_init(dec, B2, S, jnp.bfloat16)

    @jax.jit
    def step(state):
        emb, cache = state
        h, c = qwen2.forward(lm_params, dec, emb, jnp.full((B2, 1), 10, jnp.int32),
                             qwen2.decode_bias(vis), cache=cache, write_pos=jnp.int32(10))
        return (h * 0.01, c)

    emb0 = jnp.zeros((B2, 1, dec.hidden_size), jnp.bfloat16)
    bench(f"lm_step_2B/{tag}", step, (emb0, cache0))


if PART in ("all", "lm"):
    lm8 = quantize_lm(params["lm"])
    _ = float(lm8["layers"][0]["q"]["w"]["scale"][0])
    lm_variant(lm8, "int8")
    lm4 = quantize_lm(params["lm"], mode="int4")
    _ = float(lm4["layers"][0]["qkv"]["w"]["scale4"][0, 0])
    lm_variant(lm4, "int4")

# --- logits matmul (tied embed) ---
if PART in ("all", "logits"):
    h0 = jnp.zeros((1, dec.hidden_size), jnp.bfloat16)
    lmh8 = quantize_weight(params["lm"]["embed"].T)
    _ = float(lmh8["scale"][0])
    lmh4 = quantize_weight_int4(params["lm"]["embed"].T)
    _ = float(lmh4["scale4"][0, 0])

    for tag, w in (("int8", lmh8), ("int4", lmh4)):
        @jax.jit
        def logits_step(h, w=w):
            lg = mm(h, w)
            return h + lg[:, :dec.hidden_size] * 1e-6
        bench(f"logits/{tag}", logits_step, h0)

# --- diffusion head scan (10 steps) ---
from vibevoice_tpu.schedule import dpm_solver as ds
sol = ds.SolverConfig(num_train_timesteps=cfg.diffusion_head.ddpm_num_steps,
                      beta_schedule=cfg.diffusion_head.ddpm_beta_schedule,
                      prediction_type=cfg.diffusion_head.prediction_type)
tab = ds.make_tables(sol)
sched = ds.set_timesteps(sol, tab, 10)

def diff_variant(head, tag):
    @jax.jit
    def sample(cond):
        x = vibevoice.sample_speech_latents(
            {**params, "diffusion_head": head}, cfg, sol, sched,
            cond, cond * 0.5, 1.3, jnp.zeros((1, cfg.acoustic_vae_dim), jnp.bfloat16))
        return cond * 0.99 + jnp.pad(x, ((0, 0), (0, dec.hidden_size - cfg.acoustic_vae_dim))) * 1e-6
    cond0 = jnp.zeros((1, dec.hidden_size), jnp.bfloat16)
    bench(f"diffusion10/{tag}", sample, cond0)


if PART in ("all", "diff"):
    dh8 = quantize_diffusion_head(params["diffusion_head"])
    _ = float(dh8["layers"][0]["gate"]["scale"][0])
    diff_variant(dh8, "int8")
    dh4 = quantize_diffusion_head(params["diffusion_head"], mode="int4")
    _ = float(dh4["layers"][0]["gateup"]["scale4"][0, 0])
    diff_variant(dh4, "int4")

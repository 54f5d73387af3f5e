"""Attribute the decode superstep's per-frame cost by stubbing components.

Runs the sde5-int4 production config, then re-measures with the vocoder,
semantic re-encode, or both replaced by shape-identical no-ops (monkeypatched
before engine build, so each variant is its own compiled program).  The
deltas attribute the "rest" bucket that remains after LM/diffusion savings.

Usage: step_parts_ablation.py [batch] [lm_mode] — batch defaults to 1;
lm_mode to int4.  batch=8 attributes the B=8 per-stream efficiency gap
(round-2: 74-77% — which phase stops scaling?).
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
LM_MODE = sys.argv[2] if len(sys.argv) > 2 else "int4"

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice, tokenizer
from vibevoice_tpu.utils.quantize import quantize_model

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
if LM_MODE != "bf16":
    params = quantize_model(params, True, mode=LM_MODE)
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print(f"init done (batch={BATCH}, lm={LM_MODE})", flush=True)

real_dec = tokenizer.decoder_apply_streaming
real_enc = tokenizer.encoder_apply_streaming


def stub_dec(p, c, latents, state):
    b = latents.shape[0]
    return jnp.zeros((b, hop, 1), latents.dtype) + latents.sum() * 1e-9, state


def stub_enc(p, c, chunk, state):
    b = chunk.shape[0]
    return (jnp.zeros((b, 1, cfg.semantic_vae_dim), chunk.dtype)
            + chunk.sum() * 1e-9, state)


def run(tag, dec_fn, enc_fn, ddpm_steps=5):
    tokenizer.decoder_apply_streaming = dec_fn
    tokenizer.encoder_apply_streaming = enc_fn
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=ddpm_steps,
                             algorithm_type="sde-dpmsolver++",
                             force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=192, batch=BATCH, prompt_len=64,
                   dtype=jnp.bfloat16)
    ids = np.zeros((BATCH, 64), np.int32)
    mask = np.ones((BATCH, 64), np.int32)
    sim = np.zeros((BATCH, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    f0 = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    f1 = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    frames = f1 - f0
    print(json.dumps({"variant": tag, "batch": BATCH,
                      "ms_per_step": round(dt / 64 * 1000, 3),
                      "ms_per_stream_frame": round(dt / frames * BATCH * 1000, 3)
                      if frames else None,
                      "audiosec_per_s": round(frames * hop / 24000.0 / dt, 2)}),
          flush=True)
    tokenizer.decoder_apply_streaming = real_dec
    tokenizer.encoder_apply_streaming = real_enc


run("full", real_dec, real_enc)
run("no-vocoder", stub_dec, real_enc)
run("no-semantic", real_dec, stub_enc)
run("no-voc-no-sem", stub_dec, stub_enc)
run("no-voc-no-sem-1step", stub_dec, stub_enc, ddpm_steps=1)

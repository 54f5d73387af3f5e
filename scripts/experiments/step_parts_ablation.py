"""Attribute the decode superstep's per-frame cost by stubbing components.

Runs the sde5-int4 production config, then re-measures with the vocoder,
semantic re-encode, or both replaced by shape-identical no-ops (monkeypatched
before engine build, so each variant is its own compiled program).  The
deltas attribute the "rest" bucket that remains after LM/diffusion savings.
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
from vibevoice_tpu.models import vibevoice, tokenizer
from vibevoice_tpu.utils.quantize import quantize_model

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
params = quantize_model(params, True, mode="int4")
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print("init done", flush=True)

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
    eng = G.Engine(params, cfg, gen, max_steps=128, batch=1, prompt_len=64,
                   dtype=jnp.bfloat16)
    ids = np.zeros((1, 64), np.int32)
    mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    _ = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": tag, "ms_per_frame": round(dt / 64 * 1000, 3)}),
          flush=True)
    tokenizer.decoder_apply_streaming = real_dec
    tokenizer.encoder_apply_streaming = real_enc


run("full", real_dec, real_enc)
run("no-vocoder", stub_dec, real_enc)
run("no-semantic", real_dec, stub_enc)
run("no-voc-no-sem", stub_dec, stub_enc)
run("no-voc-no-sem-1step", stub_dec, stub_enc, ddpm_steps=1)

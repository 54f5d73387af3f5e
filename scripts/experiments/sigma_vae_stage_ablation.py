"""Locate the σ-VAE per-stream compute inside the decode superstep.

The r3 B=8 attribution (step_parts_ablation.py 8) shows the σ-VAE stacks
cost 3.9 ms of the 6.97 ms batch-step and are the per-stream efficiency
ceiling: their weight reads amortize over the batch but their conv compute
does not.  This narrows WHERE that compute sits by replacing Block1D
sub-parts with shape-identical no-ops (streaming state is still threaded so
the flat state list stays aligned):

  * largeT / smallT split at T >= 128: the early encoder / late decoder
    stages run at T in {3200,1600,800,160?} with dims 32..128 (VPU-heavy,
    tiny matmuls); the deep stages run at T <= 40 with dims 256..2048
    (weight-read-heavy).
  * mixer vs FFN split inside the large-T blocks.

Usage: sigma_vae_stage_ablation.py [batch] [lm_mode] [tok_mode|none]
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
from vibevoice_tpu.models.norms import rms_norm
from vibevoice_tpu.ops.conv import causal_conv1d, causal_conv1d_streaming
from vibevoice_tpu.utils.quantize import quantize_model, mm

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LM_MODE = sys.argv[2] if len(sys.argv) > 2 else "int8"
TOK_MODE = sys.argv[3] if len(sys.argv) > 3 else "int8"

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
params = quantize_model(params, True, mode=LM_MODE,
                        tokenizer_mode=None if TOK_MODE == "none" else TOK_MODE)
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print(f"init done (batch={BATCH}, lm={LM_MODE}, tok={TOK_MODE})", flush=True)

orig_block = tokenizer._block_apply


def block_variant(do_mixer, do_ffn, t_min=0, t_max=1 << 30):
    """A _block_apply that skips mixer/FFN compute for stages whose T falls
    in [t_min, t_max); streaming states are still consumed so the rotating
    state list stays aligned with the apply order."""
    def fn(p, x, eps, groups, states=None):
        t = x.shape[1]
        if not (t_min <= t < t_max):
            return orig_block(p, x, eps, groups, states)
        res = x
        if do_mixer:
            h = rms_norm(x, p["norm_w"], eps)
            if states is None:
                h = causal_conv1d(h, p["mixer"]["w"], p["mixer"]["b"], groups=groups)
            else:
                st = states.pop(0)
                h, st2 = causal_conv1d_streaming(h, st, p["mixer"]["w"], p["mixer"]["b"], groups=groups)
                states.append(st2)
            x = res + h * p["gamma"]
        elif states is not None:
            st = states.pop(0)
            states.append(st)
        if do_ffn:
            res = x
            h = rms_norm(x, p["ffn_norm_w"], eps)
            h = mm(h, p["ffn1"]["w"])
            if p["ffn1"]["b"] is not None:
                h = h + p["ffn1"]["b"]
            h = jax.nn.gelu(h, approximate=False)
            h = mm(h, p["ffn2"]["w"])
            if p["ffn2"]["b"] is not None:
                h = h + p["ffn2"]["b"]
            x = res + h * p["ffn_gamma"]
        return x
    return fn


def run(tag, fn):
    tokenizer._block_apply = fn
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             ddpm_steps=5, algorithm_type="sde-dpmsolver++",
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
    print(json.dumps({"variant": tag, "batch": BATCH,
                      "ms_per_step": round(dt / 64 * 1000, 3),
                      "audiosec_per_s": round((f1 - f0) * hop / 24000.0 / dt, 2)}),
          flush=True)
    tokenizer._block_apply = orig_block


run("full", orig_block)
run("largeT-blocks-off", block_variant(False, False, t_min=128))
run("smallT-blocks-off", block_variant(False, False, t_max=128))
run("largeT-mixers-off", block_variant(False, True, t_min=128))
run("largeT-ffns-off", block_variant(True, False, t_min=128))
run("all-blocks-off", block_variant(False, False))

"""Settle the B=1 transition-conv fold: r4 measured +3.8% for folding, the
r5 session-2 A/B measured a wash/-0.6% (37.94 off vs 37.70 on, same
process, fold_head now off in both).  Two interleaved repeats decide the
default.  Usage: fold_conv_ab.py [batch=1] [lm_mode=auto]."""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice, tokenizer as tokmod
from vibevoice_tpu.utils.quantize import quantize_model

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
LM_MODE = sys.argv[2] if len(sys.argv) > 2 else ("int4f" if BATCH == 1 else "int8")

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
base = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
base["speech_scaling_factor"] = jnp.asarray(1.0)
base["speech_bias_factor"] = jnp.asarray(0.0)
packs = (
    tokmod.pack_decoder_stages(base["acoustic_decoder"], cfg.acoustic_tokenizer,
                               quant="int4"),
    tokmod.pack_encoder_stages(base["semantic_encoder"], cfg.semantic_tokenizer,
                               chunk_t=hop, quant="int4"))
params = quantize_model(base, True, mode=LM_MODE, tokenizer_mode="int8")
params = dict(params)
params["_vocoder_packs"], params["_semantic_packs"] = packs
_ = float(np.asarray(params["speech_scaling_factor"]))
print(f"# init done (batch={BATCH}, lm={LM_MODE}, tok=int4k+fs)", flush=True)


def run(tag, fold):
    p = {k: v for k, v in params.items() if not k.endswith("_packs_large")}
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             cfg_scale=1.3, ddpm_steps=5,
                             algorithm_type="sde-dpmsolver++",
                             force_diffusion=True)
    eng = G.Engine(p, cfg, gen, max_steps=192, batch=BATCH, prompt_len=64,
                   dtype=jnp.bfloat16, use_fused_vocoder=True,
                   use_fused_semantic=True, use_fused_stages=True,
                   fused_stage_fold_conv=fold)
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
    print(json.dumps({"variant": tag, "batch": BATCH, "lm": LM_MODE,
                      "ms_per_step": round(dt / 64 * 1000, 3),
                      "rtf_per_stream": round((f1 - f0) * hop / 24000.0 / dt / BATCH, 2)}),
          flush=True)


for rep in ("", "2", "3"):
    run(f"fold-on{rep}", True)
    run(f"fold-off{rep}", False)

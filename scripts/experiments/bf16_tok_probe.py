"""B=1 option for exact-LM users: keep the LM in bf16 (exact numerics where
the tokens come from) and quantize only the σ-VAE stacks (int4k + fused
stages) — the r5 bf16 attribution puts the σ-VAE at ~2.5 ms of the 7.4 ms
frame, so this should land ~22-23 RTF vs 18.x plain bf16.  Quality-gated
like every tokenizer mode (quality_eval.py tok candidates).

Measures plain bf16 and bf16+int4k+fs in ONE process.
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
from vibevoice_tpu.models import vibevoice, tokenizer as tokmod
from vibevoice_tpu.utils.quantize import quantize_tokenizers

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio

base = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
base["speech_scaling_factor"] = jnp.asarray(1.0)
base["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(np.asarray(base["speech_scaling_factor"]))
print("# init done", flush=True)


def run(tag, params, **kw):
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             cfg_scale=1.3, ddpm_steps=5,
                             algorithm_type="sde-dpmsolver++",
                             force_diffusion=True)
    eng = G.Engine(dict(params), cfg, gen, max_steps=192, batch=1,
                   prompt_len=64, dtype=jnp.bfloat16, **kw)
    ids = np.zeros((1, 64), np.int32)
    mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    state, _ = eng.decode_chunk(state, 64)
    f0 = int(np.asarray(state.frames).sum())
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    f1 = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({"variant": tag,
                      "ms_per_step": round(dt / 64 * 1000, 3),
                      "rtf": round((f1 - f0) * hop / 24000.0 / dt, 2)}),
          flush=True)


run("bf16-plain", base)

# int4k sigma-VAE on top of the bf16 LM (pipeline.py int4k wiring)
voc = tokmod.pack_decoder_stages(base["acoustic_decoder"], cfg.acoustic_tokenizer,
                                 quant="int4")
sem = tokmod.pack_encoder_stages(base["semantic_encoder"], cfg.semantic_tokenizer,
                                 chunk_t=hop, quant="int4")
p = quantize_tokenizers(dict(base), mode="int8",
                        skip={"acoustic_decoder": set(voc),
                              "semantic_encoder": set(sem)})
p["_vocoder_packs"], p["_semantic_packs"] = voc, sem
run("bf16lm+int4k+fs", p, use_fused_vocoder=True, use_fused_semantic=True,
    use_fused_stages=True)
run("bf16-plain2", base)

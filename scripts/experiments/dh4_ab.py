"""A/B quantize_diffusion="int4k" (fused int4 solver-step head kernel,
ops/fused_head.py) at the composed 1.5B serving configs — it pays +10% at
7B (session 5); is it still a wash at 1.5B now that everything else got
faster?  Usage: dh4_ab.py [batch] [lm_mode=auto]."""
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
from vibevoice_tpu.ops.fused_head import pack_head_solver_q
from vibevoice_tpu.utils.quantize import quantize_model

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
LM_MODE = sys.argv[2] if len(sys.argv) > 2 else "int4f"

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
base = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
base["speech_scaling_factor"] = jnp.asarray(1.0)
base["speech_bias_factor"] = jnp.asarray(0.0)
packq = pack_head_solver_q(base["diffusion_head"])  # from the RAW bf16 head
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


def run(tag, dh4):
    p = {k: v for k, v in params.items() if not k.endswith("_packs_large")}
    if dh4:  # pipeline.py dh4 wiring: stash the pack, drop the per-step FFNs
        p["_diffusion_head_packq"] = packq
        headp = dict(p["diffusion_head"])
        headp["layers"] = [
            {k: (None if k in ("gate", "up", "down", "gateup") else v)
             for k, v in lp.items()} for lp in headp["layers"]]
        p["diffusion_head"] = headp
    gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                             speech_diffusion_id=151654, eos_id=151643,
                             cfg_scale=1.3, ddpm_steps=5,
                             algorithm_type="sde-dpmsolver++",
                             force_diffusion=True)
    eng = G.Engine(p, cfg, gen, max_steps=192, batch=BATCH, prompt_len=64,
                   dtype=jnp.bfloat16, use_fused_vocoder=True,
                   use_fused_semantic=True, use_fused_stages=True)
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
                      "audiosec_per_s": round((f1 - f0) * hop / 24000.0 / dt, 2)}),
          flush=True)


run("dh4-off", False)
run("dh4-on", True)
run("dh4-on2", True)
run("dh4-off2", False)

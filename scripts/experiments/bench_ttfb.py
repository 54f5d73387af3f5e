"""Time-to-first-audio (streaming serving latency).

The reference gradio demo buffers >=30 s of audio (or 15 s wall) before the
first yield (`/root/reference/demo/gradio_demo.py:314-393`), so its perceived
start latency is prefill + ~30 audio-seconds of decode.  This measures the
TPU engine's equivalents on warm (pre-compiled) serving:

  * prefill latency for a typical packed prompt,
  * first-frame latency (prefill + 1 decode step = 0.133 s of audio),
  * first-chunk latency at the reference's 30 s buffering policy.

Run: python scripts/experiments/bench_ttfb.py [prompt_len]
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

PROMPT = int(sys.argv[1]) if len(sys.argv) > 1 else 1024  # ~2 voice samples + script
W = os.environ.get("W", "bf16")

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
frame_sec = hop / 24000.0
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
TOK = os.environ.get("TOK") or None  # int8 | int4 | int4k (sigma-VAE stacks)
eng_kw = {}
if TOK == "int4k":
    from vibevoice_tpu.models import tokenizer as tokmod
    voc = tokmod.pack_decoder_stages(params["acoustic_decoder"],
                                     cfg.acoustic_tokenizer, quant="int4")
    sem = tokmod.pack_encoder_stages(params["semantic_encoder"],
                                     cfg.semantic_tokenizer, chunk_t=hop,
                                     quant="int4")
    TOKM, skip = "int8", {"acoustic_decoder": set(voc), "semantic_encoder": set(sem)}
    eng_kw = dict(use_fused_vocoder=True, use_fused_semantic=True)
else:
    TOKM, skip, voc, sem = TOK, None, None, None
if W != "bf16":
    params = quantize_model(params, True, mode=W, tokenizer_mode=TOKM,
                            tokenizer_skip=skip)
if voc is not None:
    params = dict(params)
    params["_vocoder_packs"], params["_semantic_packs"] = voc, sem
_ = float(np.asarray(jax.tree_util.tree_leaves(params)[0]).reshape(-1)[0])
print(f"init done (prompt={PROMPT} W={W} TOK={TOK})", flush=True)

gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=5, algorithm_type="sde-dpmsolver++",
                         force_diffusion=True)
eng = G.Engine(params, cfg, gen, max_steps=512, batch=1, prompt_len=PROMPT,
               dtype=jnp.bfloat16, **eng_kw)
ids = np.zeros((1, PROMPT), np.int32)
mask = np.ones((1, PROMPT), np.int32)
sim = np.zeros((1, PROMPT), bool)

frames_30s = int(round(30.0 / frame_sec))  # reference buffering policy

# warm all programs (compile outside the timed section)
state, _ = eng.prefill(ids, mask, sim)
state, _ = eng.decode_chunk(state, 1)
state, _ = eng.decode_chunk(state, frames_30s)
_ = int(np.asarray(state.frames).sum())
print("# warm", flush=True)

def timed():
    t0 = time.perf_counter()
    st, _ = eng.prefill(ids, mask, sim)
    _ = int(np.asarray(st.frames).sum())
    t_prefill = time.perf_counter() - t0
    st, _ = eng.decode_chunk(st, 1)
    _ = int(np.asarray(st.frames).sum())
    t_first_frame = time.perf_counter() - t0
    st, _ = eng.decode_chunk(st, frames_30s)
    _ = int(np.asarray(st.frames).sum())
    t_30s = time.perf_counter() - t0
    return t_prefill, t_first_frame, t_30s

best = min([timed() for _ in range(3)], key=lambda r: r[2])
print(json.dumps({
    "prompt_len": PROMPT, "weights": W,
    "prefill_ms": round(best[0] * 1000, 1),
    "first_audio_frame_ms": round(best[1] * 1000, 1),
    "first_30s_chunk_s": round(best[2], 2),
    "note": "warm serving; reference gradio yields its first chunk only after "
            "~30 audio-sec are buffered, so first_30s_chunk_s is the "
            "user-perceived start latency under the reference policy",
}), flush=True)

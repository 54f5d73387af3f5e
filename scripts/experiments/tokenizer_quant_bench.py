"""Measure σ-VAE stack quantization at the production config (5-step SDE).

Round-2 attribution (step_parts_ablation.py): at int4 LM the vocoder
(1.48 ms) + semantic re-encode (1.09 ms) dominate the 4.64 ms frame, and
both are weight-read-bound (the deep D=2048 stage is ~537 MB bf16 per stack
per frame).  This measures the int8/int4 tokenizer-stack options stacked on
the int8/int4 LM modes, one engine at a time (params copies freed between
variants — the 16 GB chip cannot hold them all).

Usage: python scripts/experiments/tokenizer_quant_bench.py [batch]
"""
import sys, os, time, json, gc
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

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
frame_sec = hop / 24000.0

t0 = time.perf_counter()
base = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
base["speech_scaling_factor"] = jnp.asarray(1.0)
base["speech_bias_factor"] = jnp.asarray(0.0)
_ = float(np.asarray(base["speech_scaling_factor"]))
print(f"# init {time.perf_counter()-t0:.1f}s", flush=True)

gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         cfg_scale=1.3, ddpm_steps=5,
                         algorithm_type="sde-dpmsolver++", force_diffusion=True)

ids = np.zeros((BATCH, 64), np.int32)
mask = np.ones((BATCH, 64), np.int32)
sim = np.zeros((BATCH, 64), bool)


def run(tag, lm_mode, tok_mode, eng_kw=None, chain_int4=False):
    t0 = time.perf_counter()
    packs = None
    if chain_int4:
        # int4 packs for the deep (T<=8) stages, built from the ORIGINAL
        # bf16 weights, streamed inside the chain kernel (one call/stage)
        from vibevoice_tpu.models import tokenizer as tokmod
        packs = (
            tokmod.pack_decoder_stages(base["acoustic_decoder"],
                                       cfg.acoustic_tokenizer, quant="int4"),
            tokmod.pack_encoder_stages(base["semantic_encoder"],
                                       cfg.semantic_tokenizer, chunk_t=hop,
                                       quant="int4"))
    if lm_mode is None and tok_mode is None:
        params = base
    elif lm_mode is None:
        from vibevoice_tpu.utils.quantize import quantize_tokenizers
        params = quantize_tokenizers(base, mode=tok_mode)
    else:
        params = quantize_model(base, True, mode=lm_mode, tokenizer_mode=tok_mode)
    if packs is not None:
        params = dict(params)
        params["_vocoder_packs"], params["_semantic_packs"] = packs
        eng_kw = dict(eng_kw or {}, use_fused_vocoder=True, use_fused_semantic=True)
    _ = float(np.asarray(params["speech_scaling_factor"]))
    print(f"# {tag}: quantize {time.perf_counter()-t0:.1f}s", flush=True)

    eng = G.Engine(params, cfg, gen, max_steps=192, batch=BATCH,
                   prompt_len=64, dtype=jnp.bfloat16, **(eng_kw or {}))
    t0 = time.perf_counter()
    state, _ = eng.prefill(ids, mask, sim)
    _ = int(np.asarray(state.frames).sum())
    print(f"# {tag}: prefill {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    f0 = int(np.asarray(state.frames).sum())
    print(f"# {tag}: warmup {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, _ = eng.decode_chunk(state, 64)
    f1 = int(np.asarray(state.frames).sum())
    dt = time.perf_counter() - t0
    frames = f1 - f0
    rtf = frames * frame_sec / dt
    ms = dt / (frames / BATCH) * 1000 if frames else float("nan")
    print(json.dumps({"variant": tag, "batch": BATCH,
                      "ms_per_frame": round(ms, 3),
                      "rtf_or_audiosec_per_s": round(rtf, 2)}), flush=True)
    del params, eng, state
    gc.collect()


VARIANTS = {
    "bf16": ("bf16 plain (exact-numerics headline)", None, None),
    # bf16 fused kernels: unquantized packs, fp32 intra-kernel math -> same
    # or better numerics than the XLA path; candidates for the bf16 headline
    "bf16fv": ("bf16+fused voc+sem chains", None, None,
               {"use_fused_vocoder": True, "use_fused_semantic": True}),
    "bf16fs": ("bf16+fused large-T stages", None, None,
               {"use_fused_stages": True}),
    "bf16all": ("bf16+chains+stages", None, None,
                {"use_fused_vocoder": True, "use_fused_semantic": True,
                 "use_fused_stages": True}),
    "base": ("int4lm+bf16tok (baseline)", "int4", None),
    "i4i8": ("int4lm+int8tok", "int4", "int8"),
    "i4i4": ("int4lm+int4tok", "int4", "int4"),
    "i8i8": ("int8lm+int8tok", "int8", "int8"),
    "bfi8": ("bf16lm+int8tok", None, "int8"),
    # + tiled large-T stage kernel (ops/fused_stage.py)
    "i4i8fs": ("int4lm+int8tok+fusedstages", "int4", "int8",
               {"use_fused_stages": True}),
    "i8i8fs": ("int8lm+int8tok+fusedstages", "int8", "int8",
               {"use_fused_stages": True}),
    # int4 FFN + int8 attention projections: halves Pallas call count
    "i4fi8": ("int4flm+int8tok", "int4f", "int8"),
    # deep sigma-VAE stages as int4-weight chain kernels (one call/stage)
    "i4fq": ("int4flm+int8tok+int4chain", "int4f", "int8", None, True),
    "i8q": ("int8lm+int8tok+int4chain", "int8", "int8", None, True),
    # full composition: int4 chain (T<=8) + tiled stage kernel (T>=128)
    "i8qfs": ("int8lm+int8tok+int4chain+fusedstages", "int8", "int8",
              {"use_fused_stages": True}, True),
    # B=1 composition: the row-folded stage kernel wins at B=1 too (r4)
    "i4fqfs": ("int4flm+int8tok+int4chain+fusedstages", "int4f", "int8",
               {"use_fused_stages": True}, True),
    # fold_conv ablations (A/B the folded transition convs; default is auto)
    "i8qfs_f": ("int8lm+int8tok+int4chain+fs-fold", "int8", "int8",
                {"use_fused_stages": True, "fused_stage_fold_conv": True}, True),
    "i8qfs_nf": ("int8lm+int8tok+int4chain+fs-nofold", "int8", "int8",
                 {"use_fused_stages": True, "fused_stage_fold_conv": False}, True),
    # stage-kernel T-tile variants (sweep: stage_tile_sweep.py — decoder
    # stages prefer 200, the semantic stem prefers whole-array)
    "i8qfs_t200": ("int8lm+int8tok+int4chain+fs-tile200", "int8", "int8",
                   {"use_fused_stages": True, "fused_stage_tile": 200}, True),
    "i8qfs_t2xs": ("int8lm+int8tok+int4chain+fs-t200sem3200", "int8", "int8",
                   {"use_fused_stages": True, "fused_stage_tile": 200,
                    "fused_stage_tile_semantic": 3200}, True),
    "i4fqfs_t200": ("int4flm+int8tok+int4chain+fs-tile200", "int4f", "int8",
                    {"use_fused_stages": True, "fused_stage_tile": 200}, True),
    "i8qfs_t160": ("int8lm+int8tok+int4chain+fs-tile160", "int8", "int8",
                   {"use_fused_stages": True, "fused_stage_tile": 160}, True),
    "i8qfs_t80": ("int8lm+int8tok+int4chain+fs-tile80", "int8", "int8",
                  {"use_fused_stages": True, "fused_stage_tile": 80}, True),
    "i4fqfs_nf": ("int4flm+int8tok+int4chain+fs-nofold", "int4f", "int8",
                  {"use_fused_stages": True, "fused_stage_fold_conv": False}, True),
    "bf16fs_nf": ("bf16+fused large-T stages nofold", None, None,
                  {"use_fused_stages": True, "fused_stage_fold_conv": False}),
}
names = sys.argv[2:] or list(VARIANTS)
for nm in names:
    run(*VARIANTS[nm])

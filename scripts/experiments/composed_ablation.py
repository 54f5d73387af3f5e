"""Re-attribute the decode superstep at the COMPOSED serving config.

The r3 stage ablation (sigma_vae_stage_ablation.py) patched `_block_apply`,
which the round-4 recommended config bypasses entirely (int8 LM + int4k
chain kernels for the deep stages + tiled fused stage kernels for the
large-T stages).  This re-attributes the B>=2 per-stream residue at that
composed config by replacing each kernel family with a shape-identical
no-op (streaming states are threaded unchanged so pytrees stay aligned):

  * no-voc / no-sem / no-voc-no-sem — the two sigma-VAE limbs wholesale
    (what's left is the LM + diffusion-head limb).
  * large-id   — the tiled fused stage kernels (ops/fused_stage.py) in both
    stacks become identity.
  * chains-id  — the small-T int4 chain kernels (ops/fused_blocks.py).
  * trans-big-id / trans-all-id — the stage-transition convs (transposed
    "up" convs + strided "down" convs), split at cout>128 (the deep
    weight-read-heavy ones) vs all of them.
  * tok-kernels-id — large + chains + transitions together: the remainder
    is heads/norms/stage-T40 + dispatch.

Usage: composed_ablation.py [batch] [lm_mode] — defaults 8 / int8; tok is
always int4k + fused stages (tile auto).
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b, tiny_config
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice, tokenizer as tokmod
from vibevoice_tpu.ops import fused_stage as fsmod, fused_blocks as fbmod
from vibevoice_tpu.utils.quantize import quantize_model

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LM_MODE = sys.argv[2] if len(sys.argv) > 2 else "int8"
TINY = bool(os.environ.get("VV_TINY"))  # CPU smoke test of every variant

cfg = tiny_config() if TINY else vibevoice_1_5b()
hop = cfg.speech_compress_ratio

base = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(0))
base["speech_scaling_factor"] = jnp.asarray(1.0)
base["speech_bias_factor"] = jnp.asarray(0.0)
# int4k: int4 chain packs for the deep (T<=8) stages from the bf16 weights,
# then int8 for the rest of the tokenizer stacks + the LM (pipeline.py:63-72)
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

REAL = dict(
    dec_fused=tokmod.decoder_apply_streaming_fused,
    enc_fused=tokmod.encoder_apply_streaming_fused,
    stage=fsmod.fused_stage_chain,
    chain_b=fbmod.fused_block_chain_batched,
    chain_1=fbmod.fused_block_chain,
    convt=tokmod.causal_conv_transpose1d_streaming,
    conv=tokmod.causal_conv1d_streaming,
)


def _cout(w):
    return w["scale"].shape[-1] if isinstance(w, dict) else w.shape[-1]


def stub_dec_fused(p, c, z, states, fused_packs=None, large_packs=None,
                   tile_want=400):
    return jnp.zeros((z.shape[0], hop, 1), z.dtype) + z.sum() * 1e-9, states


def stub_enc_fused(p, c, x, states, fused_packs=None, large_packs=None,
                   tile_want=400):
    return (jnp.zeros((x.shape[0], 1, cfg.semantic_vae_dim), x.dtype)
            + x.sum() * 1e-9, states)


def id_stage(packed, x, ctx, eps=1e-5, tile_want=400, conv_state=None,
             head_state=None, **kw):
    conv = packed.get("conv") if isinstance(packed, dict) else None
    hp = packed.get("head") if isinstance(packed, dict) else None
    d = packed["vecs"].shape[2]
    if conv is None:
        t = x.shape[1]
    else:
        t = x.shape[1] * conv.s if conv.kind == "up" else x.shape[1] // conv.s
    od = 1 if hp is not None else d
    if conv is None and hp is None:
        out = (x, ctx)
    else:
        y = jnp.zeros((x.shape[0], t, od), x.dtype) + x.sum() * 1e-9
        out = (y, ctx)
    if conv is not None:
        out += (conv_state,)
    if hp is not None:
        out += (head_state,)
    return out


def id_chain_b(packed, x, ctx, eps=1e-5, tile_f=256):
    return x, ctx


def id_chain_1(packed, x, ctx, eps=1e-5, tile_f=256):
    return x, ctx


def make_convt(cut):
    def fn(x, st, w, b, stride):
        if _cout(w) <= cut:
            return REAL["convt"](x, st, w, b, stride)
        y = jnp.zeros((x.shape[0], x.shape[1] * stride, _cout(w)), x.dtype)
        return y + x.sum() * 1e-9, st
    return fn


def make_conv(cut):
    def fn(x, st, w, b, stride=1, dilation=1, groups=1):
        # transitions are the groups==1 strided convs; mixers/stems/heads
        # pass groups==D or stride==1
        if groups != 1 or stride == 1 or _cout(w) <= cut:
            return REAL["conv"](x, st, w, b, stride=stride, dilation=dilation,
                                groups=groups)
        y = jnp.zeros((x.shape[0], x.shape[1] // stride, _cout(w)), x.dtype)
        return y + x.sum() * 1e-9, st
    return fn


def run(tag, patches):
    for k, v in patches.items():
        mod = tokmod if k in ("dec_fused", "enc_fused", "convt", "conv") else (
            fsmod if k == "stage" else fbmod)
        name = dict(dec_fused="decoder_apply_streaming_fused",
                    enc_fused="encoder_apply_streaming_fused",
                    stage="fused_stage_chain",
                    chain_b="fused_block_chain_batched",
                    chain_1="fused_block_chain",
                    convt="causal_conv_transpose1d_streaming",
                    conv="causal_conv1d_streaming")[k]
        setattr(mod, name, v)
    try:
        sid = (4, 5, 6, 3) if TINY else (151652, 151653, 151654, 151643)
        gen = G.GenerationConfig(speech_start_id=sid[0], speech_end_id=sid[1],
                                 speech_diffusion_id=sid[2], eos_id=sid[3],
                                 cfg_scale=1.3, ddpm_steps=5,
                                 algorithm_type="sde-dpmsolver++",
                                 force_diffusion=True)
        nstep = 8 if TINY else 64
        eng = G.Engine(params, cfg, gen, max_steps=3 * nstep, batch=BATCH,
                       prompt_len=64, dtype=jnp.bfloat16,
                       use_fused_vocoder=True, use_fused_semantic=True,
                       use_fused_stages=True,
                       fused_stage_t_min=8 if TINY else 128)
        ids = np.zeros((BATCH, 64), np.int32)
        mask = np.ones((BATCH, 64), np.int32)
        sim = np.zeros((BATCH, 64), bool)
        state, _ = eng.prefill(ids, mask, sim)
        state, _ = eng.decode_chunk(state, nstep)
        f0 = int(np.asarray(state.frames).sum())
        t0 = time.perf_counter()
        state, _ = eng.decode_chunk(state, nstep)
        f1 = int(np.asarray(state.frames).sum())
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": tag, "batch": BATCH,
                          "ms_per_step": round(dt / nstep * 1000, 3),
                          "audiosec_per_s": round((f1 - f0) * hop / 24000.0 / dt, 2)}),
              flush=True)
    finally:
        for k in patches:
            mod = tokmod if k in ("dec_fused", "enc_fused", "convt", "conv") else (
                fsmod if k == "stage" else fbmod)
            name = dict(dec_fused="decoder_apply_streaming_fused",
                        enc_fused="encoder_apply_streaming_fused",
                        stage="fused_stage_chain",
                        chain_b="fused_block_chain_batched",
                        chain_1="fused_block_chain",
                        convt="causal_conv_transpose1d_streaming",
                        conv="causal_conv1d_streaming")[k]
            setattr(mod, name, REAL[k])


run("full", {})
run("no-voc", {"dec_fused": stub_dec_fused})
run("no-sem", {"enc_fused": stub_enc_fused})
run("no-voc-no-sem", {"dec_fused": stub_dec_fused, "enc_fused": stub_enc_fused})
run("large-id", {"stage": id_stage})
run("chains-id", {"chain_b": id_chain_b, "chain_1": id_chain_1})
run("trans-big-id", {"convt": make_convt(128), "conv": make_conv(128)})
run("trans-all-id", {"convt": make_convt(0), "conv": make_conv(0)})
run("tok-kernels-id", {"stage": id_stage, "chain_b": id_chain_b,
                       "chain_1": id_chain_1, "convt": make_convt(0),
                       "conv": make_conv(0)})

"""Capability probe: the 7B-class model (VibeVoice-Large topology, 32K ctx)
serving from ONE 16 GB v5e chip via int8 weight-only quantization.

The reference needs a >=24 GB CUDA GPU for 7B bf16; here int8 projections
(~6.5 GB) + bf16 embeddings + a 32K fused-layout KV cache (~3.8 GB) fit a
single chip.  Memory discipline: init each LM layer on-device in bf16 and
quantize it immediately (donating the bf16 buffers) so peak memory stays
~int8-model-sized instead of bf16-model-sized.
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_7b
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import qwen2, vibevoice
from vibevoice_tpu.utils.quantize import (quantize_weight, quantize_weight_int4,
                                           quantize_diffusion_head, quantize_lm_layer)

W = os.environ.get("W", "int8")   # int8 | int4 | int4f (LM weight mode;
                                  # int4f = int4 FFN kernels + int8 attention
                                  # projections, the r3-best B=1 LM mode)
B = int(os.environ.get("B", "1"))

cfg = vibevoice_7b()
dec = cfg.decoder
hop = cfg.speech_compress_ratio

# --- layer-wise init+quantize: peak memory ~ int8 model, not bf16 model ---
# (qwen2.init builds all layers at once; init one layer at a time instead)
t0 = time.perf_counter()
std = 0.02
h, ffn = dec.hidden_size, dec.intermediate_size
hd, nh, nkv = dec.head_dim, dec.num_attention_heads, dec.num_key_value_heads

def nrm(k, shape):
    return jax.random.normal(k, shape, jnp.bfloat16) * std

@jax.jit
def make_layer_bf16(key):
    lk = jax.random.split(key, 7)
    return {
        "input_norm_w": jnp.ones((h,), jnp.bfloat16),
        "q": {"w": nrm(lk[0], (h, nh * hd)), "b": jnp.zeros((nh * hd,), jnp.bfloat16)},
        "k": {"w": nrm(lk[1], (h, nkv * hd)), "b": jnp.zeros((nkv * hd,), jnp.bfloat16)},
        "v": {"w": nrm(lk[2], (h, nkv * hd)), "b": jnp.zeros((nkv * hd,), jnp.bfloat16)},
        "o": {"w": nrm(lk[3], (nh * hd, h)), "b": None},
        "post_norm_w": jnp.ones((h,), jnp.bfloat16),
        "gate": nrm(lk[4], (h, ffn)),
        "up": nrm(lk[5], (h, ffn)),
        "down": nrm(lk[6], (ffn, h)),
    }

@jax.jit
def quant_layer(lp):
    return quantize_lm_layer(lp, mode=W)

layers = []
key = jax.random.PRNGKey(0)
for i in range(dec.num_hidden_layers):
    key, lk = jax.random.split(key)
    bf = make_layer_bf16(lk)
    qlp = quant_layer(bf)
    jax.block_until_ready(qlp["gateup"]["qint4"] if W in ("int4", "int4f")
                          else qlp["gate"]["qint8"])
    del bf
    layers.append(qlp)
print(f"quantized {len(layers)} LM layers: {time.perf_counter()-t0:.1f}s", flush=True)

# embeddings + the rest of the model (tokenizers/head/connectors are small)
import dataclasses
small_cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(dec, num_hidden_layers=0))
params = jax.jit(lambda k: vibevoice.init_model(k, small_cfg, dtype=jnp.bfloat16))(jax.random.PRNGKey(1))
params["speech_scaling_factor"] = jnp.asarray(1.0)
params["speech_bias_factor"] = jnp.asarray(0.0)
params["lm"]["layers"] = layers
if os.environ.get("DH") == "int4k":
    # per-solver-step head FFNs as ONE fused int4 kernel per step
    # (ops/fused_head.py) — pack from the RAW head, then drop the now-unused
    # per-step FFN weights (pipeline.py int4k wiring)
    from vibevoice_tpu.ops.fused_head import pack_head_solver_q
    params["_diffusion_head_packq"] = pack_head_solver_q(params["diffusion_head"])
    headp = dict(params["diffusion_head"])
    headp["layers"] = [
        {k: (None if k in ("gate", "up", "down", "gateup") else v)
         for k, v in lp.items()} for lp in headp["layers"]]
    params["diffusion_head"] = headp
else:
    params["diffusion_head"] = jax.jit(quantize_diffusion_head)(params["diffusion_head"])
# TOK=int8: quantize the per-frame sigma-VAE stacks too (r3 — halves their
# per-frame reads AND frees ~0.65 GB of the 16 GB chip).  TOK=int4k: deep
# stages as int4-weight batched chain kernels (quarter-bf16 reads, one
# launch per stage) + int8 elsewhere — the measured-best B=1 sigma-VAE mode.
_eng_kw = {}
if os.environ.get("TOK") == "int4k":
    from vibevoice_tpu.models import tokenizer as tokmod
    from vibevoice_tpu.utils.quantize import quantize_tokenizers
    _voc = tokmod.pack_decoder_stages(params["acoustic_decoder"],
                                      cfg.acoustic_tokenizer, quant="int4")
    _sem = tokmod.pack_encoder_stages(params["semantic_encoder"],
                                      cfg.semantic_tokenizer, chunk_t=hop,
                                      quant="int4")
    params = quantize_tokenizers(
        params, mode="int8",
        skip={"acoustic_decoder": set(_voc), "semantic_encoder": set(_sem)})
    params = dict(params)
    params["_vocoder_packs"], params["_semantic_packs"] = _voc, _sem
    # drop the packed stages' tree FFN weights (HBM headroom matters at 7B)
    for _name, _packs in (("acoustic_decoder", _voc), ("semantic_encoder", _sem)):
        _stack = dict(params[_name]); _stages = list(_stack["stages"])
        for _i in _packs:
            _stages[_i] = [dict(bp, ffn1=dict(bp["ffn1"], w=None),
                                ffn2=dict(bp["ffn2"], w=None))
                           for bp in _stages[_i]]
        _stack["stages"] = _stages
        params[_name] = _stack
    _eng_kw = dict(use_fused_vocoder=True, use_fused_semantic=True)
elif os.environ.get("TOK"):
    from vibevoice_tpu.utils.quantize import quantize_tokenizers
    params = quantize_tokenizers(params, mode=os.environ["TOK"])
    _eng_kw = {}
# int8 embedding table (per-row scales) — memory lever for the 16 GB chip
params["lm"]["embed"] = jax.jit(lambda e: quantize_weight(e, axis=1))(params["lm"]["embed"])
# untied 7B lm_head: int4 for the int4/int4f modes (one big per-frame read —
# the subset head makes decode cheap either way), int8 otherwise
_qhead = quantize_weight_int4 if W in ("int4", "int4f") else quantize_weight
params["lm_head"] = jax.jit(lambda k: _qhead(
    jax.random.normal(k, (h, dec.vocab_size), jnp.bfloat16) * std))(jax.random.PRNGKey(2))
_ = float(params["lm"]["embed"]["qint8"][0, 0])
print(f"model ready: {time.perf_counter()-t0:.1f}s", flush=True)

def mem(tag):
    try:
        st = jax.local_devices()[0].memory_stats()
        print(f"# mem[{tag}]: used={st.get('bytes_in_use', 0)/2**30:.2f}GiB "
              f"peak={st.get('peak_bytes_in_use', 0)/2**30:.2f}GiB "
              f"limit={st.get('bytes_limit', 0)/2**30:.2f}GiB", flush=True)
    except Exception as e:
        print(f"# mem[{tag}] unavailable: {e}", flush=True)

mem("model")

import os as _os
ctx = int(_os.environ.get("CTX", "32768"))
prompt_len = 2048
max_steps = ctx - prompt_len
# STEPS/ALGO: default mirrors the reference CLI (10-step dpmsolver++);
# STEPS=5 ALGO=sde-dpmsolver++ is the production serving config
steps = int(_os.environ.get("STEPS", "10"))
algo = _os.environ.get("ALGO", "dpmsolver++")
gen = G.GenerationConfig(speech_start_id=151652, speech_end_id=151653,
                         speech_diffusion_id=151654, eos_id=151643,
                         ddpm_steps=steps, algorithm_type=algo,
                         force_diffusion=True)
kv_dtype = _os.environ.get("KV", "model")  # KV=int8: quantized KV cache
if _os.environ.get("FS"):  # FS=1: tiled large-T stage kernels (+auto fold/tile)
    _eng_kw["use_fused_stages"] = True
t0 = time.perf_counter()
eng = G.Engine(params, cfg, gen, max_steps=max_steps, batch=B,
               prompt_len=prompt_len, dtype=jnp.bfloat16,
               keep_audio=False,  # serving mode: chunks stream per step
               kv_dtype=kv_dtype, **_eng_kw)
print(f"engine built (cache {ctx}): {time.perf_counter()-t0:.1f}s "
      f"flash_prefill={eng.use_flash_prefill} flash_decode={eng.use_flash_decode}", flush=True)

ids = np.zeros((B, prompt_len), np.int32)
mask = np.ones((B, prompt_len), np.int32)
sim = np.zeros((B, prompt_len), bool)
t0 = time.perf_counter()
state, _ = eng.prefill(ids, mask, sim)
_ = int(np.asarray(state.frames).sum())
print(f"prefill 2048 into {ctx} cache: {time.perf_counter()-t0:.1f}s", flush=True)
mem("prefill")

state, _ = eng.decode_chunk(state, 16)
_ = int(np.asarray(state.frames).sum())
t0 = time.perf_counter()
state, _ = eng.decode_chunk(state, 16)
f = int(np.asarray(state.frames).sum())
dt = time.perf_counter() - t0
print(json.dumps({"model": f"7B-{W}", "batch": B, "cache": ctx, "kv": kv_dtype,
                  "steps": steps, "algo": algo,
                  "dh": _os.environ.get("DH", "int8"),
                  "ms_per_frame": round(dt / 16 * 1000, 2),
                  "audio_sec_per_s": round(16 * B * hop / 24000.0 / dt, 2),
                  "rtf_per_stream": round(16 * hop / 24000.0 / dt, 2),
                  "frames": f}), flush=True)

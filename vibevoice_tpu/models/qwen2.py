"""Qwen2 causal decoder, TPU-native.

The reference pulls `Qwen2Model` from transformers
(`vibevoice/modular/modeling_vibevoice.py:121`); here it is implemented
natively: RoPE (theta 1e6), GQA (12H/2KV at 1.5B), RMSNorm, SwiGLU MLP,
biased q/k/v projections — numerics matched to HF Qwen2 for parity.

Design:
  * params pytree + pure apply fns (no module graph)
  * ONE static preallocated KV cache `[L, B, S_max, KVH*D]` written with
    uniform-position dynamic_update_slice (alias-updated in place across
    scan steps) — decode runs fully inside jit with donated cache
  * prefill and decode share the same attention core; masks are additive fp32
  * sharding: attention heads and MLP hidden dims are split over the `model`
    mesh axis by `parallel/mesh.py` partition specs (HF tp_plan col/row split,
    ref configuration_vibevoice.py:175-183, expressed as GSPMD instead)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import Qwen2Config
from ..utils.quantize import mm
from .norms import rms_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: Qwen2Config, dtype=jnp.float32) -> Params:
    """Random init (N(0, 0.02)) with HF layout; real weights come from the
    checkpoint importer."""
    std = 0.02
    h, ffn = cfg.hidden_size, cfg.intermediate_size
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    n_layers = cfg.num_hidden_layers
    ks = jax.random.split(key, 2 + n_layers)

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    layers = []
    for i in range(n_layers):
        lk = jax.random.split(ks[2 + i], 7)
        layers.append({
            "input_norm_w": jnp.ones((h,), dtype),
            "q": {"w": nrm(lk[0], (h, nh * hd)), "b": jnp.zeros((nh * hd,), dtype) if cfg.attention_bias else None},
            "k": {"w": nrm(lk[1], (h, nkv * hd)), "b": jnp.zeros((nkv * hd,), dtype) if cfg.attention_bias else None},
            "v": {"w": nrm(lk[2], (h, nkv * hd)), "b": jnp.zeros((nkv * hd,), dtype) if cfg.attention_bias else None},
            "o": {"w": nrm(lk[3], (nh * hd, h)), "b": None},
            "post_norm_w": jnp.ones((h,), dtype),
            "gate": nrm(lk[4], (h, ffn)),
            "up": nrm(lk[5], (h, ffn)),
            "down": nrm(lk[6], (ffn, h)),
        })
    return {
        "embed": nrm(ks[0], (cfg.vocab_size, h)),
        "layers": layers,
        "final_norm_w": jnp.ones((h,), dtype),
    }


# ---------------------------------------------------------------------------
# RoPE (HF Qwen2 numerics: fp32 cos/sin, rotate-half)
# ---------------------------------------------------------------------------

def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [B, T] -> cos/sin [B, T, head_dim] (fp32)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, D]; cos/sin [B, T, D]."""
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * c + rot * s


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    # KVH and D are fused into one trailing dim: (S, KVH*D) tiles (8, 128)
    # natively on TPU, and the Pallas decode kernel reads the full stacked
    # buffer without a per-layer slice/relayout (see ops/decode_attention.py).
    # With k_scale/v_scale set, k/v hold int8 with per-slot symmetric scales
    # (dequantized inside the decode kernel) — halves cache memory and
    # long-context attention reads.  Scales are stored broadcast over 8
    # sublanes so Mosaic blocks tile natively.
    k: jnp.ndarray  # [L, B, S, KVH*D] (model dtype, or int8 when quantized)
    v: jnp.ndarray  # [L, B, S, KVH*D]
    k_scale: Optional[jnp.ndarray] = None  # [L, B, 8, S] bf16
    v_scale: Optional[jnp.ndarray] = None  # [L, B, 8, S] bf16


def kv_cache_init(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.float32,
                  quantized: bool = False) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len,
             cfg.num_key_value_heads * cfg.head_dim)
    if quantized:
        sshape = (cfg.num_hidden_layers, batch, 8, max_len)
        return KVCache(k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.bfloat16),
                       v_scale=jnp.zeros(sshape, jnp.bfloat16))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _quantize_slots(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, T, F] -> int8 [B, T, F] + per-slot scale [B, T] (symmetric)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    # round the scale to bf16 FIRST so quantize and dequantize use the
    # identical value (the stored scale is bf16; dividing by the fp32 scale
    # would add a small systematic dequant error)
    scale = (amax / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-12)),
                 -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# attention core
# ---------------------------------------------------------------------------

def _attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
            bias: jnp.ndarray) -> jnp.ndarray:
    """q [B, Tq, H, D]; k/v [B, Tk, KVH, D]; additive bias [B, 1|H, Tq, Tk].

    GQA via 5-D reshape (no materialized head repeat); softmax in fp32.
    """
    b, tq, nh, d = q.shape
    nkv = k.shape[2]
    g = nh // nkv
    qg = q.reshape(b, tq, nkv, g, d)
    scale = d ** -0.5
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32) * scale
    logits = logits + bias.reshape(b, nkv, g, *bias.shape[-2:]) if bias.shape[1] == nh else logits + bias[:, :, None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, tq, nh, d).astype(q.dtype)


def _layer(lp: Params, cfg: Qwen2Config, x: jnp.ndarray,
           cos: jnp.ndarray, sin: jnp.ndarray,
           cache_full: Optional[Tuple[KVCache, int, jnp.ndarray, int]],
           bias: jnp.ndarray,
           pad_mask: Optional[jnp.ndarray] = None,
           use_flash: bool = False,
           decode_ctx: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
           mesh=None) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """One decoder layer. If `cache_full=(cache, layer_idx, write_pos, row_off)`
    is given, new k/v are written at write_pos (directly into the full
    [L, B, S, KVH*D] buffers — one in-place dynamic_update_slice each, so
    the cache is alias-updated across `lax.scan` decode steps with zero
    copies) and attention reads this layer's cache slice."""
    b, t, h = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    hn = rms_norm(x, lp["input_norm_w"], cfg.rms_norm_eps)
    if "qkv" in lp:
        # int4 layout: q/k/v fused into one packed matrix -> ONE kernel call
        qkv = mm(hn, lp["qkv"]["w"])
        if lp["qkv"]["b"] is not None:
            qkv = qkv + lp["qkv"]["b"]
        q = qkv[..., : nh * hd]
        k = qkv[..., nh * hd: (nh + nkv) * hd]
        v = qkv[..., (nh + nkv) * hd:]
    else:
        q = mm(hn, lp["q"]["w"])
        if lp["q"]["b"] is not None:
            q = q + lp["q"]["b"]
        k = mm(hn, lp["k"]["w"])
        if lp["k"]["b"] is not None:
            k = k + lp["k"]["b"]
        v = mm(hn, lp["v"]["w"])
        if lp["v"]["b"] is not None:
            v = v + lp["v"]["b"]
    q = apply_rope(q.reshape(b, t, nh, hd), cos, sin)
    k = apply_rope(k.reshape(b, t, nkv, hd), cos, sin)

    new_cache = None
    use_kernel = False
    quant = False
    if cache_full is not None:
        cache, li, pos, row_off = cache_full
        k_full, v_full = cache.k, cache.v
        ks_full, vs_full = cache.k_scale, cache.v_scale
        quant = ks_full is not None
        k2 = k.reshape(b, t, nkv * hd)  # fused (KVH*D) cache lanes
        v2 = v
        if quant:
            k2, k_sc = _quantize_slots(k2)   # [B,T,F] int8, [B,T]
            v2, v_sc = _quantize_slots(v2)
        # uniform write position only: a single dynamic_update_slice on the
        # full buffer — XLA aliases it in place (no cache copy).  Left-padded
        # batching makes every sample share the slot clock, so per-sample
        # write positions (which would lower to cache-sized scatters and
        # defeat aliasing) are deliberately unsupported.
        # row_off (static) lets prefill write a sub-range of the cache
        # rows (positive stream at [0:B], CFG pre-seed at [B:2B]) so the
        # unified cache is allocated ONCE, never concatenated.
        if pos.ndim != 0:
            raise ValueError(
                "write_pos must be a scalar slot (uniform across samples); "
                "left-pad the batch so all samples share the slot clock")
        li_ = jnp.int32(li)
        z = jnp.int32(0)
        ro = jnp.int32(row_off)
        k_full = lax.dynamic_update_slice(
            k_full, k2.astype(k_full.dtype)[None], (li_, ro, pos, z))
        v_full = lax.dynamic_update_slice(
            v_full, v2.astype(v_full.dtype)[None], (li_, ro, pos, z))
        if quant:
            # scale slabs [1, B, 8, T] at (li, row_off, 0, pos)
            ks_slab = jnp.broadcast_to(k_sc[:, None, :], (b, 8, t))[None]
            vs_slab = jnp.broadcast_to(v_sc[:, None, :], (b, 8, t))[None]
            ks_full = lax.dynamic_update_slice(ks_full, ks_slab.astype(ks_full.dtype),
                                               (li_, ro, z, pos))
            vs_full = lax.dynamic_update_slice(vs_full, vs_slab.astype(vs_full.dtype),
                                               (li_, ro, z, pos))
        new_cache = KVCache(k=k_full, v=v_full, k_scale=ks_full, v_scale=vs_full)
        use_kernel = decode_ctx is not None and t == 1

    if use_flash and t > 1:
        # prefill: attention spans exactly the newly-written kv; O(T) memory.
        # Under TP the heads stay sharded: shard_map runs the kernel on each
        # shard's local heads (no gather)
        vr = v.reshape(b, t, nkv, hd)
        if mesh is not None:
            from ..ops.flash_attention import flash_attention_prefill_sharded
            att = flash_attention_prefill_sharded(mesh, q, k, vr, pad_mask)
        else:
            from ..ops.flash_attention import flash_attention_prefill
            att = flash_attention_prefill(q, k, vr, pad_mask, causal=True)
    elif use_kernel:
        # long-context decode: Pallas kernel reads the full stacked cache
        # (layer index folded into the block map — no slice materialization)
        # and skips beyond-length cache blocks; int8 caches dequantize
        # per-block inside the kernel.  Under TP, shard_map keeps the cache's
        # fused KVH*D lanes sharded — each shard DMAs only its local heads
        visible, lengths = decode_ctx
        if mesh is not None:
            from ..ops.decode_attention import decode_attention_sharded
            att = decode_attention_sharded(mesh, q[:, 0], k_full, v_full, li,
                                           visible, lengths,
                                           k_scale=ks_full, v_scale=vs_full)[:, None]
        else:
            from ..ops.decode_attention import decode_attention
            att = decode_attention(q[:, 0], k_full, v_full, li, visible, lengths,
                                   k_scale=ks_full, v_scale=vs_full)[:, None]
    else:
        if cache_full is not None:
            s_max = k_full.shape[2]
            k_att = k_full[li, row_off:row_off + b]
            v_att = v_full[li, row_off:row_off + b]
            if quant:
                k_att = (k_att.astype(x.dtype)
                         * ks_full[li, row_off:row_off + b, 0].astype(x.dtype)[..., None])
                v_att = (v_att.astype(x.dtype)
                         * vs_full[li, row_off:row_off + b, 0].astype(x.dtype)[..., None])
            k_att = k_att.reshape(b, s_max, nkv, hd)
            v_att = v_att.reshape(b, s_max, nkv, hd)
        else:
            k_att, v_att = k, v.reshape(b, t, nkv, hd)
        att = _attend(q, k_att, v_att, bias)
    att = mm(att.reshape(b, t, nh * hd), lp["o"]["w"])
    x = x + att

    hn = rms_norm(x, lp["post_norm_w"], cfg.rms_norm_eps)
    if "gateup" in lp:
        gu = mm(hn, lp["gateup"])
        ffn = gu.shape[-1] // 2
        mlp = mm(jax.nn.silu(gu[..., :ffn]) * gu[..., ffn:], lp["down"])
    else:
        mlp = mm(jax.nn.silu(mm(hn, lp["gate"])) * mm(hn, lp["up"]), lp["down"])
    return x + mlp, new_cache


def forward(
    params: Params,
    cfg: Qwen2Config,
    inputs_embeds: jnp.ndarray,          # [B, T, H]
    positions: jnp.ndarray,              # [B, T] rope positions
    attn_bias: jnp.ndarray,              # [B, 1, T, S] additive fp32 bias
    cache: Optional[KVCache] = None,
    write_pos: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    decode_ctx: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    batch_offset: int = 0,
    mesh=None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack. With `cache`, keys/values are appended at
    `write_pos` (same for all samples — left-padded batching) into cache rows
    [batch_offset : batch_offset+B] and attention spans the cache; without,
    attention spans the inputs (bias supplied).

    `mesh`: a Mesh with a >1 `model` axis routes the Pallas attention kernels
    through their shard_map wrappers so heads/cache lanes STAY sharded (no
    per-step cache all-gather) — the executed form of the tp_plan the
    reference only declares (configuration_vibevoice.py:175-183)."""
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    x = inputs_embeds
    cur = cache
    for li, lp in enumerate(params["layers"]):
        cache_full = None
        if cur is not None:
            cache_full = (cur, li, write_pos, batch_offset)
        x, ncache = _layer(lp, cfg, x, cos, sin, cache_full, attn_bias,
                           pad_mask=pad_mask, use_flash=use_flash, decode_ctx=decode_ctx,
                           mesh=mesh)
        if ncache is not None:
            cur = ncache
    x = rms_norm(x, params["final_norm_w"], cfg.rms_norm_eps)
    return x, cur


def causal_bias(attention_mask: jnp.ndarray, t: int) -> jnp.ndarray:
    """Left-padded batch prefill bias: [B, S] pad mask -> [B, 1, T, S] additive."""
    s = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((t, s), bool), k=s - t)
    ok = causal[None] & attention_mask[:, None, :].astype(bool)
    return jnp.where(ok, 0.0, -1e9).astype(jnp.float32)[:, None]


def decode_bias(visible: jnp.ndarray) -> jnp.ndarray:
    """Decode-step bias from a [B, S] visibility mask -> [B, 1, 1, S]."""
    return jnp.where(visible.astype(bool), 0.0, -1e9).astype(jnp.float32)[:, None, None, :]


def positions_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """HF convention: position_ids = cumsum(mask) - 1, clamped at 0 on pads."""
    pos = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.maximum(pos, 0)


def embed_rows(lm_params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup that accepts a plain [V, H] table or an int8 dict
    (per-row scales — only the gathered rows are dequantized)."""
    e = lm_params["embed"]
    if isinstance(e, dict) and "qint8" in e:
        return e["qint8"][ids].astype(e["scale"].dtype) * e["scale"][ids][..., None]
    return e[ids]


def logits(params: Params, cfg: Qwen2Config, hidden: jnp.ndarray,
           lm_head=None) -> jnp.ndarray:
    """LM head; tied to the embedding when `lm_head` is None
    (ref modeling_vibevoice_inference.py:120-129).  Accepts a quantized
    (int8 dict) head."""
    if lm_head is None:
        e = params["embed"]
        if isinstance(e, dict):  # int8 embed: h @ q^T, then per-row scales
            return (hidden @ e["qint8"].astype(hidden.dtype).T) * e["scale"].astype(hidden.dtype)
        return hidden @ e.T
    return mm(hidden, lm_head)


__all__ = [
    "init",
    "forward",
    "logits",
    "embed_rows",
    "KVCache",
    "kv_cache_init",
    "rope_cos_sin",
    "apply_rope",
    "causal_bias",
    "decode_bias",
    "positions_from_mask",
]

"""sigma-VAE acoustic / semantic tokenizers, TPU-native.

Re-implements the reference codec stack
(`vibevoice/modular/modular_vibevoice_tokenizer.py:620-1186`) as pure
functions over a params pytree, channel-last `[B, T, C]`:

* Encoder: stem conv + 6 strided downsampling convs (ratios reversed ->
  [2,2,4,5,5,8], 3200x total) interleaved with stages of `Block1D`
  (depthwise-conv mixer + GELU FFN + layer-scale), then head conv to the
  latent dim (ref TokenizerEncoder :687-813).
* Decoder: mirror with transposed-conv upsampling expressed as matmul +
  overlap-add (ref TokenizerDecoder :816-951).
* Streaming: every conv carries a fixed-shape state (ring-tail of inputs for
  convs, partial-sum tail for transposed convs) collected in a flat tuple
  pytree — replaces the dict-keyed `VibeVoiceTokenizerStreamingCache`
  (:193-256) and is donation/scan friendly.

Weight init matches the reference `_init_weights` (:1067-1079): conv/linear
weights ~ N(0, weight_init_value), biases zero.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..configs import AcousticTokenizerConfig, SemanticTokenizerConfig
from ..ops.conv import (
    ConvState,
    ConvTState,
    causal_conv1d,
    causal_conv1d_streaming,
    causal_conv_transpose1d,
    causal_conv_transpose1d_streaming,
    conv_state_init,
    conv_transpose_state_init,
)
from ..utils.quantize import mm
from .norms import rms_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, k: int, cin: int, cout: int, std: float, bias: bool, dtype):
    w = jax.random.normal(key, (k, cin, cout), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    p["b"] = jnp.zeros((cout,), dtype) if bias else None
    return p


def _convt_init(key, cin: int, k: int, cout: int, std: float, bias: bool, dtype):
    w = jax.random.normal(key, (cin, k, cout), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    p["b"] = jnp.zeros((cout,), dtype) if bias else None
    return p


def _linear_init(key, cin: int, cout: int, std: float, bias: bool, dtype):
    w = jax.random.normal(key, (cin, cout), dtype=jnp.float32) * std
    p = {"w": w.astype(dtype)}
    p["b"] = jnp.zeros((cout,), dtype) if bias else None
    return p


def _block_init(key, dim: int, cfg, dtype) -> Params:
    """Block1D params (ref :620-684)."""
    ks = jax.random.split(key, 3)
    groups = dim if cfg.mixer_layer == "depthwise_conv" else 1
    mixer_cin = dim // groups
    return {
        "norm_w": jnp.ones((dim,), dtype),
        "mixer": _conv_init(ks[0], 7, mixer_cin, dim, cfg.weight_init_value, cfg.conv_bias, dtype),
        "gamma": jnp.full((dim,), cfg.layer_scale_init_value, dtype),
        "ffn_norm_w": jnp.ones((dim,), dtype),
        "ffn1": _linear_init(ks[1], dim, cfg.ffn_expansion * dim, cfg.weight_init_value, cfg.conv_bias, dtype),
        "ffn2": _linear_init(ks[2], cfg.ffn_expansion * dim, dim, cfg.weight_init_value, cfg.conv_bias, dtype),
        "ffn_gamma": jnp.full((dim,), cfg.layer_scale_init_value, dtype),
    }


def encoder_dims(n_filters: int, n_stages: int) -> List[int]:
    return [n_filters * (2 ** i) for i in range(n_stages)]


def decoder_dims(n_filters: int, n_stages: int) -> List[int]:
    return [n_filters * (2 ** (n_stages - 1 - i)) for i in range(n_stages)]


def init_encoder(key, cfg, dtype=jnp.float32) -> Params:
    """TokenizerEncoder params (ref :687-774)."""
    depths = cfg.encoder_depths
    n = len(depths)
    dims = encoder_dims(cfg.encoder_n_filters, n)
    strides = list(reversed(cfg.encoder_ratios))  # ref :701
    keys = jax.random.split(key, 2 * n + 2)
    down = [_conv_init(keys[0], cfg.kernel_size, cfg.channels, dims[0],
                       cfg.weight_init_value, cfg.conv_bias, dtype)]
    for i in range(n - 1):
        r = strides[i]
        down.append(_conv_init(keys[1 + i], 2 * r, dims[i], dims[i + 1],
                               cfg.weight_init_value, cfg.conv_bias, dtype))
    stages = []
    for i in range(n):
        bkeys = jax.random.split(keys[n + i], depths[i])
        stages.append([_block_init(bk, dims[i], cfg, dtype) for bk in bkeys])
    final_norm = None if cfg.disable_last_norm else jnp.ones((dims[-1],), dtype)
    head = _conv_init(keys[-1], cfg.last_kernel_size, dims[-1], cfg.vae_dim,
                      cfg.weight_init_value, cfg.conv_bias, dtype)
    return {"down": down, "stages": stages, "final_norm_w": final_norm, "head": head}


def init_decoder(key, cfg: AcousticTokenizerConfig, dtype=jnp.float32) -> Params:
    """TokenizerDecoder params (ref :816-912)."""
    depths = cfg.decoder_depths_resolved()
    n = len(depths)
    dims = decoder_dims(cfg.decoder_n_filters, n)
    strides = list(cfg.decoder_ratios)  # ref :830 (not reversed)
    keys = jax.random.split(key, 2 * n + 2)
    up = [_conv_init(keys[0], cfg.kernel_size, cfg.vae_dim, dims[0],
                     cfg.weight_init_value, cfg.conv_bias, dtype)]
    for i in range(n - 1):
        r = strides[i]
        up.append(_convt_init(keys[1 + i], dims[i], 2 * r, dims[i + 1],
                              cfg.weight_init_value, cfg.conv_bias, dtype))
    stages = []
    for i in range(n):
        bkeys = jax.random.split(keys[n + i], depths[i])
        stages.append([_block_init(bk, dims[i], cfg, dtype) for bk in bkeys])
    final_norm = None if cfg.disable_last_norm else jnp.ones((dims[-1],), dtype)
    head = _conv_init(keys[-1], cfg.last_kernel_size, dims[-1], cfg.channels,
                      cfg.weight_init_value, cfg.conv_bias, dtype)
    return {"up": up, "stages": stages, "final_norm_w": final_norm, "head": head}


# ---------------------------------------------------------------------------
# apply (non-streaming)
# ---------------------------------------------------------------------------

def _block_apply(p: Params, x: jnp.ndarray, eps: float, groups: int,
                 states: Optional[list] = None) -> jnp.ndarray:
    """Block1D forward (ref :665-684): mixer + layer-scale, then GELU FFN."""
    res = x
    h = rms_norm(x, p["norm_w"], eps)
    if states is None:
        h = causal_conv1d(h, p["mixer"]["w"], p["mixer"]["b"], groups=groups)
    else:
        st = states.pop(0)
        h, new_st = causal_conv1d_streaming(h, st, p["mixer"]["w"], p["mixer"]["b"], groups=groups)
        states.append(new_st)
    x = res + h * p["gamma"]

    res = x
    h = rms_norm(x, p["ffn_norm_w"], eps)
    # `mm` accepts plain, int8- or int4-quantized weights (the deep stages'
    # FFNs dominate the per-frame σ-VAE weight reads — see
    # utils/quantize.quantize_tokenizer_stack)
    h = mm(h, p["ffn1"]["w"])
    if p["ffn1"]["b"] is not None:
        h = h + p["ffn1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = mm(h, p["ffn2"]["w"])
    if p["ffn2"]["b"] is not None:
        h = h + p["ffn2"]["b"]
    return res + h * p["ffn_gamma"]


def encoder_apply(params: Params, cfg, x: jnp.ndarray,
                  states: Optional[list] = None) -> jnp.ndarray:
    """audio [B, T, 1] -> latents [B, T/hop, vae_dim] (ref forward :810-813).

    If `states` is given (a list of ConvState, consumed in application order
    and re-appended), runs in streaming mode; pass the rotating list returned
    by `encoder_state_init`.
    """
    depths = cfg.encoder_depths
    strides = [1] + list(reversed(cfg.encoder_ratios))
    groups_of = (lambda d: d) if cfg.mixer_layer == "depthwise_conv" else (lambda d: 1)
    h = x
    for i in range(len(depths)):
        dp = params["down"][i]
        if states is None:
            h = causal_conv1d(h, dp["w"], dp["b"], stride=strides[i])
        else:
            st = states.pop(0)
            h, new_st = causal_conv1d_streaming(h, st, dp["w"], dp["b"], stride=strides[i])
            states.append(new_st)
        for bp in params["stages"][i]:
            h = _block_apply(bp, h, cfg.layernorm_eps, groups_of(h.shape[-1]), states)
    if params["final_norm_w"] is not None:
        h = rms_norm(h, params["final_norm_w"], cfg.layernorm_eps)
    hp = params["head"]
    if states is None:
        h = causal_conv1d(h, hp["w"], hp["b"])
    else:
        st = states.pop(0)
        h, new_st = causal_conv1d_streaming(h, st, hp["w"], hp["b"])
        states.append(new_st)
    return h


def decoder_apply(params: Params, cfg: AcousticTokenizerConfig, z: jnp.ndarray,
                  states: Optional[list] = None) -> jnp.ndarray:
    """latents [B, F, vae_dim] -> audio [B, F*hop, 1] (ref forward :948-951)."""
    depths = cfg.decoder_depths_resolved()
    strides = list(cfg.decoder_ratios)
    groups_of = (lambda d: d) if cfg.mixer_layer == "depthwise_conv" else (lambda d: 1)
    h = z
    for i in range(len(depths)):
        up = params["up"][i]
        if i == 0:
            if states is None:
                h = causal_conv1d(h, up["w"], up["b"])
            else:
                st = states.pop(0)
                h, new_st = causal_conv1d_streaming(h, st, up["w"], up["b"])
                states.append(new_st)
        else:
            r = strides[i - 1]
            if states is None:
                h = causal_conv_transpose1d(h, up["w"], up["b"], stride=r)
            else:
                st = states.pop(0)
                h, new_st = causal_conv_transpose1d_streaming(h, st, up["w"], up["b"], stride=r)
                states.append(new_st)
        for bp in params["stages"][i]:
            h = _block_apply(bp, h, cfg.layernorm_eps, groups_of(h.shape[-1]), states)
    if params["final_norm_w"] is not None:
        h = rms_norm(h, params["final_norm_w"], cfg.layernorm_eps)
    hp = params["head"]
    if states is None:
        h = causal_conv1d(h, hp["w"], hp["b"])
    else:
        st = states.pop(0)
        h, new_st = causal_conv1d_streaming(h, st, hp["w"], hp["b"])
        states.append(new_st)
    return h


def pack_decoder_stages(params: Params, cfg: AcousticTokenizerConfig,
                        max_frames: int = 8, quant: Optional[str] = None):
    """Precompute fused-kernel weight packs for decoder stages whose
    per-frame T is small enough to keep activations VMEM-resident
    (streaming decode: stage i runs at T = prod(ratios[:i]) frames).

    quant="int4": nibble-packed FFN weights streamed at quarter-bf16 bytes
    and dequantized in-VMEM (ops/fused_blocks.pack_stage_q) — the measured
    winner for the deep stages, where per-matmul int4 GEMV kernels lose to
    call overhead but ONE kernel per stage keeps the bandwidth saving."""
    from ..ops import fused_blocks as fb
    depths = cfg.decoder_depths_resolved()
    strides = list(cfg.decoder_ratios)
    packs = {}
    t = 1
    for i in range(len(depths)):
        if i > 0:
            t *= strides[i - 1]
        if t <= max_frames and depths[i] > 0:
            if quant == "int4":
                packs[i] = fb.pack_stage_q(params["stages"][i])
            else:
                dtype = params["stages"][i][0]["ffn1"]["w"].dtype
                packs[i] = fb.pack_stage(params["stages"][i], dtype=dtype)
    return packs


def _stage_fused_or_plain(params: Params, cfg, i: int, h: jnp.ndarray, s: list,
                          fused_packs, large_packs,
                          tile_want: int = 400) -> jnp.ndarray:
    """Apply stage i's Block1D chain via the small-T chain kernel, the tiled
    large-T stage kernel, or the plain op path, threading streaming states."""
    n = len(params["stages"][i])
    if fused_packs and i in fused_packs:
        from ..ops import fused_blocks as fb
        packed = fused_packs[i]
        stage_states = [s.pop(0) for _ in range(n)]
        ctx = jnp.stack([st.buf for st in stage_states], axis=1)
        if "w1q" in packed:
            # batched int4 chain: weights stream once for all rows
            h, new_ctx = fb.fused_block_chain_batched(packed, h, ctx,
                                                      eps=cfg.layernorm_eps)
        else:
            def _one(row_x, row_ctx):
                return fb.fused_block_chain(packed, row_x, row_ctx,
                                            eps=cfg.layernorm_eps)

            h, new_ctx = jax.vmap(_one)(h, ctx)
        for j in range(n):
            s.append(ConvState(buf=new_ctx[:, j]))
        return h
    if large_packs and i in large_packs:
        from ..ops import fused_stage as fs
        packed = large_packs[i]
        stage_states = [s.pop(0) for _ in range(n)]
        ctx = jnp.stack([st.buf for st in stage_states], axis=1)  # [B, N, 6, D]
        hp = packed.get("head")
        kw = {}
        head_st = None
        if hp is not None:  # folded decoder tail: pop the head conv's state
            head_st = s.pop(0)
            kw["head_state"] = head_st.buf
        res = fs.fused_stage_chain(packed, h, ctx, eps=cfg.layernorm_eps,
                                   tile_want=tile_want, **kw)
        h, new_ctx = res[0], res[1]
        for j in range(n):
            s.append(ConvState(buf=new_ctx[:, j]))
        if hp is not None:
            s.append(ConvState(buf=res[2].astype(head_st.buf.dtype)))
        return h
    groups_of = (lambda d: d) if cfg.mixer_layer == "depthwise_conv" else (lambda d: 1)
    for bp in params["stages"][i]:
        h = _block_apply(bp, h, cfg.layernorm_eps, groups_of(h.shape[-1]), s)
    return h


def _stage_folded_conv(params: Params, cfg, i: int, h: jnp.ndarray, s: list,
                       packed, tile_want: int) -> jnp.ndarray:
    """Apply [transition conv + stage i] as ONE fused stage-kernel call
    (packed carries the conv — round 4).  Pops the conv streaming state and
    the N block states, appends their successors in the same order."""
    from ..ops import fused_stage as fs
    n = len(params["stages"][i])
    conv_st = s.pop(0)
    stage_states = [s.pop(0) for _ in range(n)]
    hp = packed.get("head")
    kw = {}
    head_st = None
    if hp is not None:  # folded decoder tail: pop the head conv's state too
        head_st = s.pop(0)
        kw["head_state"] = head_st.buf
    ctx = jnp.stack([st.buf for st in stage_states], axis=1)  # [B, N, 6, D]
    cstate = conv_st.tail if isinstance(conv_st, ConvTState) else conv_st.buf
    res = fs.fused_stage_chain(
        packed, h, ctx, eps=cfg.layernorm_eps, tile_want=tile_want,
        conv_state=cstate, **kw)
    h, new_ctx, new_cstate = res[0], res[1], res[2]
    new_cstate = new_cstate.astype(cstate.dtype)
    s.append(ConvTState(tail=new_cstate) if isinstance(conv_st, ConvTState)
             else ConvState(buf=new_cstate))
    for j in range(n):
        s.append(ConvState(buf=new_ctx[:, j]))
    if hp is not None:
        s.append(ConvState(buf=res[3].astype(head_st.buf.dtype)))
    return h


def decoder_apply_streaming_fused(params: Params, cfg: AcousticTokenizerConfig,
                                  z: jnp.ndarray, states, fused_packs=None,
                                  large_packs=None, tile_want: int = 400):
    """Streaming decode using the fused Block1D kernels — `fused_packs` maps
    stage index -> small-T chain-kernel pack (ops/fused_blocks.py, T<=8) and
    `large_packs` -> tiled large-T stage-kernel pack (ops/fused_stage.py);
    identical numerics to `decoder_apply_streaming` up to fp32-vs-bf16
    intra-block rounding."""
    depths = cfg.decoder_depths_resolved()
    strides = list(cfg.decoder_ratios)
    s = list(states)
    h = z
    for i in range(len(depths)):
        lp = (large_packs or {}).get(i)
        if lp is not None and "conv" in lp:
            h = _stage_folded_conv(params, cfg, i, h, s, lp, tile_want)
            continue
        up = params["up"][i]
        if i == 0:
            st = s.pop(0)
            h, new_st = causal_conv1d_streaming(h, st, up["w"], up["b"])
            s.append(new_st)
        else:
            r = strides[i - 1]
            st = s.pop(0)
            h, new_st = causal_conv_transpose1d_streaming(h, st, up["w"], up["b"], stride=r)
            s.append(new_st)
        h = _stage_fused_or_plain(params, cfg, i, h, s, fused_packs, large_packs,
                                  tile_want=tile_want)
    last_pack = (large_packs or {}).get(len(depths) - 1)
    if last_pack is not None and "head" in last_pack:
        return h, s  # tail (final norm + head conv) already folded in-kernel
    if params["final_norm_w"] is not None:
        h = rms_norm(h, params["final_norm_w"], cfg.layernorm_eps)
    hp = params["head"]
    st = s.pop(0)
    h, new_st = causal_conv1d_streaming(h, st, hp["w"], hp["b"])
    s.append(new_st)
    return h, s


def encoder_apply_streaming(params: Params, cfg, x: jnp.ndarray, states):
    """Functional streaming encode: returns (latents, new_states)."""
    s = list(states)
    y = encoder_apply(params, cfg, x, s)
    return y, s


def pack_decoder_stages_large(params: Params, cfg: AcousticTokenizerConfig,
                              t_min: int = 128, fold_conv: bool = True,
                              fold_head: bool = True,
                              rowlane_batch: int = 0):
    """Weight packs for the tiled large-T stage kernel (ops/fused_stage.py):
    decoder stages whose per-frame T = prod(ratios[:i]) >= t_min.  These
    stages carry negligible weight bytes but, at batch, most of the σ-VAE's
    per-stream compute (r3 stage ablation).  Skips stages whose FFNs are
    quantized (large-T dims sit below the quantization min_dim by default,
    so the packs compose with quantize_tokenizer).

    `fold_conv` additionally folds each large stage's preceding stride-r
    transposed "up" conv into its kernel (round 4) — the upsampled [B, T, D]
    tensor never round-trips HBM; skipped where the conv weight is
    quantized (never at these dims by default: conv_min_params).

    `fold_head` folds the decoder TAIL (final RMSNorm + causal head conv
    D -> 1, ref modular_vibevoice_tokenizer.py:948-951) into the LAST
    stage's kernel as shifted FMAs + a lane reduction — the [B, T, D] stage
    output never reaches HBM and the waveform tile is emitted directly."""
    if cfg.mixer_layer != "depthwise_conv":
        return {}
    from ..ops import fused_stage as fs
    depths = cfg.decoder_depths_resolved()
    strides = list(cfg.decoder_ratios)
    packs = {}
    t = 1
    for i in range(len(depths)):
        if i > 0:
            t *= strides[i - 1]
        # t > 6: the kernel's cross-tile conv carry needs a full 6-row context
        # inside one tile
        if (t >= max(t_min, 7) and depths[i] > 0
                and not isinstance(params["stages"][i][0]["ffn1"]["w"], dict)):
            dtype = params["stages"][i][0]["ffn1"]["w"].dtype
            packs[i] = fs.pack_stage(params["stages"][i], dtype=dtype)
            up = params["up"][i]
            if (fold_conv and i > 0 and not isinstance(up["w"], dict)
                    and up["w"].shape[1] == 2 * strides[i - 1]):
                packs[i]["conv"] = fs.pack_up_conv(up, strides[i - 1],
                                                   dtype=dtype)
            d_i = params["stages"][i][0]["norm_w"].shape[0]
            r = fs.rowlane_rows(d_i, rowlane_batch) if rowlane_batch else 1
            if r > 1 and "conv" not in packs[i]:
                packs[i]["rowlane"] = fs.pack_stage_rowlane(
                    params["stages"][i], r, dtype=dtype)
    last = len(depths) - 1
    hw = params["head"]["w"]
    if (fold_head and last in packs and not isinstance(hw, dict)
            and hw.shape[2] == 1 and 0 < hw.shape[0] - 1 <= 8):
        packs[last]["head"] = fs.pack_head(params["head"],
                                           params["final_norm_w"])
    return packs


def pack_encoder_stages_large(params: Params, cfg, chunk_t: int,
                              t_min: int = 128, fold_conv: bool = True,
                              rowlane_batch: int = 0):
    """Mirror of `pack_decoder_stages_large` for the semantic re-encode:
    encoder stage i runs at T = chunk_t / prod(strides[:i+1]).  `fold_conv`
    folds each large stage's preceding strided "down" conv (k=2s, or the
    s=1 k=7 stem) into its kernel (round 4)."""
    if cfg.mixer_layer != "depthwise_conv":
        return {}
    from ..ops import fused_stage as fs
    depths = cfg.encoder_depths
    strides = [1] + list(reversed(cfg.encoder_ratios))
    packs = {}
    t = chunk_t
    for i in range(len(depths)):
        t //= strides[i]
        if (t >= max(t_min, 7) and depths[i] > 0
                and not isinstance(params["stages"][i][0]["ffn1"]["w"], dict)):
            dtype = params["stages"][i][0]["ffn1"]["w"].dtype
            packs[i] = fs.pack_stage(params["stages"][i], dtype=dtype)
            dp = params["down"][i]
            s_i, k_i = strides[i], (dp["w"].shape[0]
                                    if not isinstance(dp["w"], dict) else 0)
            if (fold_conv and not isinstance(dp["w"], dict)
                    and (s_i == 1 or k_i == 2 * s_i) and 0 < k_i - s_i <= 8):
                packs[i]["conv"] = fs.pack_down_conv(dp, s_i, dtype=dtype)
            d_i = params["stages"][i][0]["norm_w"].shape[0]
            r = fs.rowlane_rows(d_i, rowlane_batch) if rowlane_batch else 1
            if r > 1 and "conv" not in packs[i]:
                packs[i]["rowlane"] = fs.pack_stage_rowlane(
                    params["stages"][i], r, dtype=dtype)
    return packs


def pack_encoder_stages(params: Params, cfg, chunk_t: int, max_frames: int = 8,
                        quant: Optional[str] = None):
    """Precompute fused-kernel weight packs for encoder stages whose per-chunk
    T is small enough for VMEM-resident activations.

    At streaming re-encode (one 7.5 Hz frame = `chunk_t` samples, normally
    3200) stage i runs at T = chunk_t / prod(strides[:i+1]) — the tail
    stages (T <= 8) carry the largest dims, i.e. most of the weight bytes
    and the worst per-op arithmetic intensity, exactly what the fused
    Block1D-chain kernel fixes (mirror of `pack_decoder_stages`, incl.
    quant="int4")."""
    if cfg.mixer_layer != "depthwise_conv":
        return {}  # kernel packs depthwise taps only
    from ..ops import fused_blocks as fb
    depths = cfg.encoder_depths
    strides = [1] + list(reversed(cfg.encoder_ratios))
    packs = {}
    t = chunk_t
    for i in range(len(depths)):
        assert t % strides[i] == 0, (
            f"chunk {chunk_t} does not stream-divide encoder strides")
        t //= strides[i]
        if t <= max_frames and depths[i] > 0:
            if quant == "int4":
                packs[i] = fb.pack_stage_q(params["stages"][i])
            else:
                dtype = params["stages"][i][0]["ffn1"]["w"].dtype
                packs[i] = fb.pack_stage(params["stages"][i], dtype=dtype)
    return packs


def encoder_apply_streaming_fused(params: Params, cfg, x: jnp.ndarray,
                                  states, fused_packs=None, large_packs=None,
                                  tile_want: int = 400):
    """Streaming encode using the fused Block1D kernels (small-T chain and/or
    tiled large-T stage packs); identical numerics to
    `encoder_apply_streaming` up to fp32-vs-bf16 intra-block rounding."""
    depths = cfg.encoder_depths
    strides = [1] + list(reversed(cfg.encoder_ratios))
    s = list(states)
    h = x
    for i in range(len(depths)):
        lp = (large_packs or {}).get(i)
        if lp is not None and "conv" in lp:
            h = _stage_folded_conv(params, cfg, i, h, s, lp, tile_want)
            continue
        dp = params["down"][i]
        st = s.pop(0)
        h, new_st = causal_conv1d_streaming(h, st, dp["w"], dp["b"], stride=strides[i])
        s.append(new_st)
        h = _stage_fused_or_plain(params, cfg, i, h, s, fused_packs, large_packs,
                                  tile_want=tile_want)
    if params["final_norm_w"] is not None:
        h = rms_norm(h, params["final_norm_w"], cfg.layernorm_eps)
    hp = params["head"]
    st = s.pop(0)
    h, new_st = causal_conv1d_streaming(h, st, hp["w"], hp["b"])
    s.append(new_st)
    return h, s


def decoder_apply_streaming(params: Params, cfg, z: jnp.ndarray, states):
    """Functional streaming decode: returns (audio, new_states)."""
    s = list(states)
    y = decoder_apply(params, cfg, z, s)
    return y, s


# ---------------------------------------------------------------------------
# streaming state construction
# ---------------------------------------------------------------------------

def encoder_state_init(cfg, batch: int, dtype=jnp.float32) -> list:
    """Flat list of ConvState in the exact order `encoder_apply` consumes them."""
    depths = cfg.encoder_depths
    n = len(depths)
    dims = encoder_dims(cfg.encoder_n_filters, n)
    strides = [1] + list(reversed(cfg.encoder_ratios))
    states: list = []
    cin = cfg.channels
    for i in range(n):
        k = cfg.kernel_size if i == 0 else 2 * strides[i]
        states.append(conv_state_init(batch, cin, k, strides[i], dtype=dtype))
        cin = dims[i]
        for _ in range(depths[i]):
            mixer_cin = dims[i]
            states.append(conv_state_init(batch, mixer_cin, 7, 1, dtype=dtype))
    states.append(conv_state_init(batch, dims[-1], cfg.last_kernel_size, 1, dtype=dtype))
    return states


def decoder_state_init(cfg: AcousticTokenizerConfig, batch: int, dtype=jnp.float32) -> list:
    depths = cfg.decoder_depths_resolved()
    n = len(depths)
    dims = decoder_dims(cfg.decoder_n_filters, n)
    strides = list(cfg.decoder_ratios)
    states: list = []
    for i in range(n):
        if i == 0:
            states.append(conv_state_init(batch, cfg.vae_dim, cfg.kernel_size, 1, dtype=dtype))
        else:
            r = strides[i - 1]
            states.append(conv_transpose_state_init(batch, dims[i], 2 * r, r, dtype=dtype))
        for _ in range(depths[i]):
            states.append(conv_state_init(batch, dims[i], 7, 1, dtype=dtype))
    states.append(conv_state_init(batch, dims[-1], cfg.last_kernel_size, 1, dtype=dtype))
    return states


def state_reset_where(states, reset_mask: jnp.ndarray):
    """Zero streaming state for samples where reset_mask[b] is True.

    Replaces the reference's `cache.set_to_zero(sample_indices)` (:234-241)
    with a masked, jit-friendly rewrite.
    """
    def _z(leaf):
        m = reset_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, jnp.zeros_like(leaf), leaf)
    return jax.tree_util.tree_map(_z, states)


# ---------------------------------------------------------------------------
# VAE sampling (ref VibeVoiceTokenizerEncoderOutput :954-1000)
# ---------------------------------------------------------------------------

def vae_sample_gaussian(key, mean: jnp.ndarray, fix_std: float) -> jnp.ndarray:
    """'gaussian' dist sampling: batch-wise random std scaled by fix_std/0.8."""
    b = mean.shape[0]
    k1, k2 = jax.random.split(key)
    std = jax.random.normal(k1, (b,), mean.dtype) * (fix_std / 0.8)
    std = std.reshape((b,) + (1,) * (mean.ndim - 1))
    return mean + std * jax.random.normal(k2, mean.shape, mean.dtype)


def vae_sample_fix(key, mean: jnp.ndarray, fix_std: float) -> jnp.ndarray:
    return mean + fix_std * jax.random.normal(key, mean.shape, mean.dtype)


__all__ = [
    "init_encoder",
    "init_decoder",
    "encoder_apply",
    "decoder_apply",
    "pack_encoder_stages",
    "pack_decoder_stages",
    "pack_encoder_stages_large",
    "pack_decoder_stages_large",
    "encoder_apply_streaming_fused",
    "decoder_apply_streaming_fused",
    "encoder_state_init",
    "decoder_state_init",
    "state_reset_where",
    "vae_sample_gaussian",
    "vae_sample_fix",
    "encoder_dims",
    "decoder_dims",
]

"""Weight-only quantization for the decode-bandwidth-bound LM.

The decode step streams every LM weight per frame; int8 halves those bytes,
int4 halves them again.  Opt-in (`quantize="int8"` / `quantize="int4"` on the
pipeline/engine): weight-only, activations stay bf16, norms stay fp32.

  * int8: symmetric per-output-channel scales; matmuls dequantize in-register
    (XLA fuses the convert into the dot operand load).
  * int4: nibble-packed, unpacked INSIDE a fused Pallas matmul
    (`ops/int4_matmul.py`) — the XLA-level unpack routes are measured dead
    ends (see that module's docstring).  Per-output-channel scales by
    default; optional per-group scales (`group_size`) for finer resolution.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1,))
def _quantize_weight_impl(w, axis: int):
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127).astype(jnp.int8)
    return q, scale.squeeze(axis).astype(jnp.bfloat16)


def quantize_weight(w: jnp.ndarray, axis: int = 0) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: w [in, out] -> int8 + scale [out].

    Jitted per shape (one small program per unique weight shape; a single
    whole-model jit would exceed remote-tunnel compile request limits, and
    fully eager quantization costs hundreds of dispatches at load time)."""
    q, scale = _quantize_weight_impl(jnp.asarray(w), axis)
    return {"qint8": q, "scale": scale}


def quantize_weight_int4(w, group_size: Optional[int] = None) -> Dict[str, jnp.ndarray]:
    """Symmetric int4 (on-device jnp ops; load-time)."""
    from ..ops.int4_matmul import quantize_int4
    return quantize_int4(w, group_size=group_size)


def mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul that accepts plain, int8-quantized or int4-quantized weights."""
    if isinstance(w, dict):
        if "qint4" in w:
            from ..ops.int4_matmul import int4_matmul, dequant_int4_xla
            k = x.shape[-1]
            lead = x.shape[:-1]
            m = 1
            for d in lead:
                m *= int(d)
            if m <= 128:
                # decode GEMV/skinny-matmul: fused Pallas dequant-matmul
                # (bandwidth path).  Bound 128 covers 2B rows up to B=64 —
                # the old m<=32 sent B=32 decode down the materialized-
                # dequant branch, a measured 4x/step cliff (r5: 30.7 ms/step
                # vs 13.3 with the kernel -> B=32 hit 315 audio-sec/s)
                y = int4_matmul(x.reshape(m, k), w["qint4"], w["scale4"])
                return y.reshape(*lead, y.shape[-1])
            # prefill: weight read amortizes over many tokens — a
            # materialized XLA dequant is fine
            return x @ dequant_int4_xla(w["qint4"], w["scale4"], x.dtype)
        y = x @ w["qint8"].astype(x.dtype)
        return y * w["scale"].astype(x.dtype)
    return x @ w


def _quant(w, mode: str, group_size: Optional[int]):
    if mode == "int4":
        return quantize_weight_int4(w, group_size=group_size)
    return quantize_weight(w)


def quantize_lm_layer(lp: Dict[str, Any], mode: str = "int8",
                      group_size: Optional[int] = None) -> Dict[str, Any]:
    """Quantize one decoder layer.  int4 fuses same-input projections into
    single kernels: q/k/v share hn and gate/up share hn, so one packed matrix
    (and ONE Pallas call) serves each set — numerics-identical to separate
    quantization since scales are per output column either way.

    mode="int4f": int4 ONLY for the FFN matmuls (gate/up/down — ~88% of a
    layer's bytes); the attention projections stay int8 XLA dots.  Halves
    the per-frame Pallas call count (113 -> 57) against ~0.1 ms of extra
    reads — the probe for whether the int4 path is call-overhead-bound."""
    nl = dict(lp)
    if mode in ("int4", "int4f"):
        qkv_w = jnp.concatenate([lp["q"]["w"], lp["k"]["w"], lp["v"]["w"]], axis=1)
        qkv_b = None
        if lp["q"]["b"] is not None:
            qkv_b = jnp.concatenate([lp["q"]["b"], lp["k"]["b"], lp["v"]["b"]])
        attn_mode = "int8" if mode == "int4f" else "int4"
        nl["qkv"] = {"w": _quant(qkv_w, attn_mode, group_size), "b": qkv_b}
        nl["gateup"] = _quant(jnp.concatenate([lp["gate"], lp["up"]], axis=1),
                              "int4", group_size)
        for name in ("q", "k", "v"):  # superseded by the fused projection
            nl.pop(name)
        nl.pop("gate"); nl.pop("up")
        nl["o"] = {"w": _quant(lp["o"]["w"], attn_mode, group_size), "b": lp["o"]["b"]}
        nl["down"] = _quant(lp["down"], "int4", group_size)
    else:
        for name in ("q", "k", "v", "o"):
            proj = dict(lp[name])
            proj["w"] = _quant(lp[name]["w"], mode, group_size)
            nl[name] = proj
        for name in ("gate", "up", "down"):
            nl[name] = _quant(lp[name], mode, group_size)
    return nl


def quantize_lm(lm_params: Dict[str, Any], quantize_embed: bool = False,
                mode: str = "int8", group_size: Optional[int] = None) -> Dict[str, Any]:
    """Quantize the Qwen2 projection weights (q/k/v/o, gate/up/down).

    The embedding stays bf16 by default (row-gather reads only touched
    rows, so it is not a bandwidth problem — quantizing it is a MEMORY
    lever, e.g. fitting 7B on one 16 GB chip); the logits path gets its own
    quantized copy in `quantize_model`.  The embedding, when quantized, is
    always int8 per-row (gathers dequantize per row — int4 gather would not
    use the matmul kernel).
    """
    out = dict(lm_params)
    out["layers"] = [quantize_lm_layer(lp, mode=mode, group_size=group_size)
                     for lp in lm_params["layers"]]
    if quantize_embed:
        out["embed"] = quantize_weight(lm_params["embed"], axis=1)  # per-row scale
    return out


def quantize_diffusion_head(head_params: Dict[str, Any], mode: str = "int8",
                            group_size: Optional[int] = None) -> Dict[str, Any]:
    """Quantize the diffusion head's per-solver-step FFN weights.

    The sequential solver scan re-reads gate/up/down every one of the
    `ddpm_steps` iterations per frame (~170 MB bf16 per step at 1.5B) — the
    second-largest bandwidth consumer after the LM step.  The adaLN
    modulation weights (`ada_w`, `final_ada_w`) are also quantized: they are
    read once per frame by `precompute_modulations` but are LM-hidden-sized,
    so their bytes matter at B=1.  Only the tiny latent-side projections
    (noisy_images_proj / cond_proj / final linear) stay bf16 — fp accuracy
    where the output latent is produced.
    """
    out = dict(head_params)
    layers = []
    for lp in head_params["layers"]:
        nl = dict(lp)
        if mode == "int4":
            # gate/up share their input inside the solver scan: fuse into one
            # kernel call per step (same rationale as the LM fusion)
            nl["gateup"] = _quant(jnp.concatenate([lp["gate"], lp["up"]], axis=1),
                                  mode, group_size)
            nl.pop("gate"); nl.pop("up")
            nl["ada_w"] = _quant(lp["ada_w"], mode, group_size)
            nl["down"] = _quant(lp["down"], mode, group_size)
        else:
            for name in ("ada_w", "gate", "up", "down"):
                nl[name] = _quant(lp[name], mode, group_size)
        layers.append(nl)
    out["layers"] = layers
    out["final_ada_w"] = _quant(head_params["final_ada_w"], mode, group_size)
    return out


def quantize_conv_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Downsampling conv [K, Cin, Cout] -> int8 {"qint8" [K*Cin, Cout],
    "scale" [Cout]} for the window-matmul path (`ops.conv._causal_conv1d_q`);
    requires the model's k == 2*stride convention."""
    return quantize_weight(w.reshape(-1, w.shape[-1]))


def quantize_convt_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Transposed conv [Cin, K, Cout] -> int8 3D + per-(tap, channel) scales
    [K, Cout] (each (k, o) pair is an independent output column of the dense
    projection — see `ops.conv._convt_project`)."""
    q, scale = _quantize_weight_impl(jnp.asarray(w), 0)
    return {"qint8": q, "scale": scale}


def quantize_tokenizer_stack(stack: Dict[str, Any], mode: str = "int8",
                             min_dim: int = 512,
                             group_size: Optional[int] = None,
                             conv_min_params: int = 2_000_000,
                             skip_stages=()) -> Dict[str, Any]:
    """Quantize the Block1D FFN weights of one tokenizer encoder/decoder stack.

    The decode hot path re-reads the acoustic DECODER and semantic ENCODER
    weights every 7.5 Hz frame, exactly like the LM.  At the default topology
    the deep D=2048 stage alone (8 blocks, ref
    modular_vibevoice_tokenizer.py:687-951 depths (3,3,3,3,3,3,8)) is ~270 M
    FFN params = 537 MB bf16 per stack per frame — the dominant σ-VAE cost is
    weight bandwidth, not dispatch (measured: vocoder 1.48 ms + semantic
    re-encode 1.09 ms of the 4.64 ms int4 frame ≈ the stacks' HBM read time).

    Quantized: FFN matmul weights (ffn1/ffn2 — >90% of stack bytes) in
    stages with dim >= `min_dim`, plus the large stage-transition convs
    (>= `conv_min_params` params, always int8 — the deepest two are ~67 MB
    bf16 each).  The early large-T stages carry negligible bytes, so leaving
    them exact costs nothing and concentrates quantization where the
    arithmetic is a plain channel-wise matmul.  Norms, depthwise mixers,
    layer-scales, biases and the small convs stay in the model dtype.
    """
    out = dict(stack)
    stages = []
    for si, blocks in enumerate(stack["stages"]):
        if si in skip_stages:
            # covered elsewhere (e.g. int4 chain-kernel packs — the stage's
            # FFN weights are dropped from the tree by the caller)
            stages.append(blocks)
            continue
        nbs = []
        for bp in blocks:
            d = bp["norm_w"].shape[0]
            if d >= min_dim and not isinstance(bp["ffn1"]["w"], dict):
                nb = dict(bp)

                def _gs(w):  # group scales only where the group divides K
                    if group_size and w.shape[0] % group_size == 0:
                        return group_size
                    return None

                nb["ffn1"] = {"w": _quant(bp["ffn1"]["w"], mode, _gs(bp["ffn1"]["w"])),
                              "b": bp["ffn1"]["b"]}
                nb["ffn2"] = {"w": _quant(bp["ffn2"]["w"], mode, _gs(bp["ffn2"]["w"])),
                              "b": bp["ffn2"]["b"]}
                nbs.append(nb)
            else:
                nbs.append(bp)
        stages.append(nbs)
    out["stages"] = stages

    # stage-transition convs: the two deepest carry ~67 MB bf16 each per
    # frame (k=2r at D 1024<->2048).  Always int8 (the int4 kernel's per-call
    # overhead loses at these shapes, as measured for the diffusion head);
    # entries below `conv_min_params` stay exact.
    if "down" in out:  # encoder: down[0] is the k=7 stem, rest are k=2r
        out["down"] = [
            dict(dp, w=quantize_conv_weight(dp["w"]))
            if (i > 0 and not isinstance(dp["w"], dict)
                and dp["w"].size >= conv_min_params and dp["w"].shape[0] % 2 == 0)
            else dp
            for i, dp in enumerate(stack["down"])]
    if "up" in out:  # decoder: up[0] is a plain k=7 conv, rest transposed
        out["up"] = [
            dict(up, w=quantize_convt_weight(up["w"]))
            if (i > 0 and not isinstance(up["w"], dict)
                and up["w"].size >= conv_min_params)
            else up
            for i, up in enumerate(stack["up"])]
    return out


def quantize_tokenizers(params: Dict[str, Any], mode: str = "int8",
                        min_dim: int = 512,
                        group_size: Optional[int] = None,
                        conv_min_params: int = 2_000_000,
                        skip: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Quantize the two σ-VAE stacks on the decode hot path: the acoustic
    decoder (vocoder) and the semantic encoder (frame re-encode).  The
    acoustic ENCODER only runs at prefill (voice prompts), where its weight
    read amortizes over the whole prompt — it stays in the model dtype.
    `skip` maps stack name -> stage indices handled elsewhere (int4 chain
    packs).
    """
    skip = skip or {}
    out = dict(params)
    out["acoustic_decoder"] = quantize_tokenizer_stack(
        params["acoustic_decoder"], mode=mode, min_dim=min_dim,
        group_size=group_size, conv_min_params=conv_min_params,
        skip_stages=skip.get("acoustic_decoder", ()))
    out["semantic_encoder"] = quantize_tokenizer_stack(
        params["semantic_encoder"], mode=mode, min_dim=min_dim,
        group_size=group_size, conv_min_params=conv_min_params,
        skip_stages=skip.get("semantic_encoder", ()))
    return out


def quantize_model(params: Dict[str, Any], tie_word_embeddings: bool = True,
                   quantize_embed: bool = False, mode: str = "int8",
                   group_size: Optional[int] = None,
                   diffusion_mode: Optional[str] = None,
                   tokenizer_mode: Optional[str] = None,
                   tokenizer_min_dim: int = 512,
                   tokenizer_skip: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Quantize the LM (and untied lm_head) + diffusion head; the conv
    tokenizer stacks are additionally quantized when `tokenizer_mode` is set
    (opt-in — they shape the output waveform directly, so their quantization
    is a separate quality decision from the LM's).

    For tied embeddings a quantized copy of embed^T is added for the logits
    matmul (`lm_head`), trading ~0.5x embed memory for 2-4x logits bandwidth.
    `quantize_embed` additionally stores the embedding table itself in int8
    with per-row scales (a memory lever; lookups dequantize gathered rows).
    `diffusion_mode` overrides the diffusion head's mode.  Default for
    mode="int4" is an INT8 head: measured on-chip, int4's per-solver-step
    Pallas calls cost ~0.1 ms/step of dispatch overhead against only
    ~85 MB/step of saved reads, so the int8 head is faster (and safer for
    the output latent's fidelity); the LM, where int4 saves ~0.75 GB per
    frame, stays int4.
    """
    if mode not in ("int8", "int4", "int4f"):
        raise ValueError(f"quantize mode must be 'int8', 'int4' or 'int4f', got {mode}")
    dmode = diffusion_mode or ("int8" if mode in ("int4", "int4f") else mode)
    out = dict(params)
    out["lm"] = quantize_lm(params["lm"], quantize_embed=quantize_embed,
                            mode=mode, group_size=group_size)
    out["diffusion_head"] = quantize_diffusion_head(params["diffusion_head"],
                                                    mode=dmode, group_size=group_size)
    head_mode = "int4" if mode == "int4f" else mode  # logits head is one big
    # per-frame read (152k x h); int4f's call-count trade doesn't apply to it
    if params.get("lm_head") is not None:
        out["lm_head"] = _quant(params["lm_head"], head_mode, group_size)
    elif tie_word_embeddings:
        out["lm_head"] = _quant(params["lm"]["embed"].T, head_mode, group_size)
    if tokenizer_mode is not None:
        if tokenizer_mode not in ("int8", "int4"):
            raise ValueError(
                f"tokenizer_mode must be 'int8' or 'int4', got {tokenizer_mode}")
        out = quantize_tokenizers(out, mode=tokenizer_mode,
                                  min_dim=tokenizer_min_dim, group_size=group_size,
                                  skip=tokenizer_skip)
    return out


__all__ = ["quantize_weight", "quantize_weight_int4", "quantize_model",
           "quantize_lm", "quantize_lm_layer", "quantize_diffusion_head",
           "quantize_tokenizer_stack", "quantize_tokenizers", "mm"]

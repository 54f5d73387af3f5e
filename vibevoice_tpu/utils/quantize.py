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
            if m <= 32:
                # decode GEMV: fused Pallas dequant-matmul (bandwidth path)
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
    quantization since scales are per output column either way."""
    nl = dict(lp)
    if mode == "int4":
        qkv_w = jnp.concatenate([lp["q"]["w"], lp["k"]["w"], lp["v"]["w"]], axis=1)
        qkv_b = None
        if lp["q"]["b"] is not None:
            qkv_b = jnp.concatenate([lp["q"]["b"], lp["k"]["b"], lp["v"]["b"]])
        nl["qkv"] = {"w": _quant(qkv_w, mode, group_size), "b": qkv_b}
        nl["gateup"] = _quant(jnp.concatenate([lp["gate"], lp["up"]], axis=1),
                              mode, group_size)
        for name in ("q", "k", "v"):  # superseded by the fused projection
            nl.pop(name)
        nl.pop("gate"); nl.pop("up")
        nl["o"] = {"w": _quant(lp["o"]["w"], mode, group_size), "b": lp["o"]["b"]}
        nl["down"] = _quant(lp["down"], mode, group_size)
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


def quantize_model(params: Dict[str, Any], tie_word_embeddings: bool = True,
                   quantize_embed: bool = False, mode: str = "int8",
                   group_size: Optional[int] = None,
                   diffusion_mode: Optional[str] = None) -> Dict[str, Any]:
    """Quantize the LM (and untied lm_head) + diffusion head; the conv
    tokenizers stay bf16 (their weights are small — dispatch-bound, not
    weight-bandwidth-bound).

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
    if mode not in ("int8", "int4"):
        raise ValueError(f"quantize mode must be 'int8' or 'int4', got {mode}")
    dmode = diffusion_mode or ("int8" if mode == "int4" else mode)
    out = dict(params)
    out["lm"] = quantize_lm(params["lm"], quantize_embed=quantize_embed,
                            mode=mode, group_size=group_size)
    out["diffusion_head"] = quantize_diffusion_head(params["diffusion_head"],
                                                    mode=dmode, group_size=group_size)
    if params.get("lm_head") is not None:
        out["lm_head"] = _quant(params["lm_head"], mode, group_size)
    elif tie_word_embeddings:
        out["lm_head"] = _quant(params["lm"]["embed"].T, mode, group_size)
    return out


__all__ = ["quantize_weight", "quantize_weight_int4", "quantize_model",
           "quantize_lm", "quantize_lm_layer", "quantize_diffusion_head", "mm"]

"""Weight-only int8 quantization for the decode-bandwidth-bound LM.

The decode step streams every LM weight per frame; int8 halves those bytes.
Symmetric per-output-channel scales; matmuls dequantize in-register (XLA
fuses the convert into the dot operand load).  Opt-in (`quantize="int8"` on
the pipeline/engine): weight-only, activations stay bf16, norms stay fp32.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = 0) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: w [in, out] -> int8 + scale [out]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -127, 127).astype(jnp.int8)
    return {"qint8": q, "scale": scale.squeeze(axis).astype(jnp.bfloat16)}


def mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul that accepts plain or quantized weights."""
    if isinstance(w, dict) and "qint8" in w:
        y = x @ w["qint8"].astype(x.dtype)
        return y * w["scale"].astype(x.dtype)
    return x @ w


def quantize_lm(lm_params: Dict[str, Any], quantize_embed: bool = False) -> Dict[str, Any]:
    """Quantize the Qwen2 projection weights (q/k/v/o, gate/up/down).

    The embedding stays bf16 by default (row-gather reads only touched
    rows, so it is not a bandwidth problem — quantizing it is a MEMORY
    lever, e.g. fitting 7B on one 16 GB chip); the logits path gets its own
    int8 copy in `quantize_model`.
    """
    out = dict(lm_params)
    layers = []
    for lp in lm_params["layers"]:
        nl = dict(lp)
        for name in ("q", "k", "v", "o"):
            proj = dict(lp[name])
            proj["w"] = quantize_weight(lp[name]["w"])
            nl[name] = proj
        for name in ("gate", "up", "down"):
            nl[name] = quantize_weight(lp[name])
        layers.append(nl)
    out["layers"] = layers
    if quantize_embed:
        out["embed"] = quantize_weight(lm_params["embed"], axis=1)  # per-row scale
    return out


def quantize_diffusion_head(head_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the diffusion head's per-solver-step FFN weights.

    The sequential solver scan re-reads gate/up/down every one of the
    `ddpm_steps` iterations per frame (~170 MB bf16 per step at 1.5B) — the
    second-largest bandwidth consumer after the LM step.  The adaLN
    modulation weights (`ada_w`, `final_ada_w`) are read once per frame by
    `precompute_modulations` and stay bf16, as do the tiny latent-side
    projections (fp accuracy where the output is produced).
    """
    out = dict(head_params)
    layers = []
    for lp in head_params["layers"]:
        nl = dict(lp)
        for name in ("ada_w", "gate", "up", "down"):
            nl[name] = quantize_weight(lp[name])
        layers.append(nl)
    out["layers"] = layers
    out["final_ada_w"] = quantize_weight(head_params["final_ada_w"])
    return out


def quantize_model(params: Dict[str, Any], tie_word_embeddings: bool = True,
                   quantize_embed: bool = False) -> Dict[str, Any]:
    """Quantize the LM (and untied lm_head) + diffusion head; the conv
    tokenizers stay bf16 (their weights are small — dispatch-bound, not
    weight-bandwidth-bound).

    For tied embeddings an int8 copy of embed^T is added for the logits
    matmul (`lm_head`), trading ~0.5x embed memory for 2x logits bandwidth.
    `quantize_embed` additionally stores the embedding table itself in int8
    with per-row scales (a memory lever; lookups dequantize gathered rows).
    """
    out = dict(params)
    out["lm"] = quantize_lm(params["lm"], quantize_embed=quantize_embed)
    out["diffusion_head"] = quantize_diffusion_head(params["diffusion_head"])
    if params.get("lm_head") is not None:
        out["lm_head"] = quantize_weight(params["lm_head"])
    elif tie_word_embeddings:
        out["lm_head"] = quantize_weight(params["lm"]["embed"].T)
    return out


__all__ = ["quantize_weight", "quantize_model", "quantize_lm",
           "quantize_diffusion_head", "mm"]

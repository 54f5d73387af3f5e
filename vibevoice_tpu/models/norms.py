"""Normalization numerics shared across all model components.

Matches the reference's fp32-upcast RMSNorm exactly
(`vibevoice/modular/modular_vibevoice_tokenizer.py:53-91`,
`modular_vibevoice_diffusion_head.py:20-41`): normalize in float32, cast back
to the input dtype, then apply the (un-upcast) affine weight.  XLA fuses the
whole thing into the surrounding computation, so no APEX-style fused kernel is
needed.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    """RMSNorm over the last axis with fp32 island."""
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = normed.astype(x.dtype)
    if weight is not None:
        out = out * weight
    return out


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 island (ref ConvLayerNorm :39-51)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    normed = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return normed.astype(x.dtype)


__all__ = ["rms_norm", "layer_norm"]

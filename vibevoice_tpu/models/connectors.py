"""SpeechConnector: latent -> LM hidden projection (ref modeling_vibevoice.py:58-69).

Linear -> RMSNorm(eps=1e-6) -> Linear, biases on both linears.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .norms import rms_norm

Params = Dict[str, Any]


def init(key, input_dim: int, output_dim: int, dtype=jnp.float32, std: float = 0.02) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {"w": (jax.random.normal(k1, (input_dim, output_dim), jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((output_dim,), dtype)},
        "norm_w": jnp.ones((output_dim,), dtype),
        "fc2": {"w": (jax.random.normal(k2, (output_dim, output_dim), jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((output_dim,), dtype)},
    }


def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = x @ params["fc1"]["w"] + params["fc1"]["b"]
    h = rms_norm(h, params["norm_w"], 1e-6)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


__all__ = ["init", "apply"]

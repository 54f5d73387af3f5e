"""Training-time diffusion timestep samplers
(ref `vibevoice/schedule/timestep_sampler.py:5-18`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_sample(key, n: int, num_timesteps: int) -> jnp.ndarray:
    """UniformSampler: uniform over [0, T)."""
    return jax.random.randint(key, (n,), 0, num_timesteps)


def logit_normal_sample(key, n: int, num_timesteps: int,
                        loc: float = 0.0, scale: float = 1.0) -> jnp.ndarray:
    """LogitNormalSampler: sigmoid(N(loc, scale)) scaled to [0, T)."""
    z = jax.random.normal(key, (n,)) * scale + loc
    u = jax.nn.sigmoid(z)
    return jnp.clip((u * num_timesteps).astype(jnp.int32), 0, num_timesteps - 1)


__all__ = ["uniform_sample", "logit_normal_sample"]

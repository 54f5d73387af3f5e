"""Parallelism: mesh/sharding rules, multi-host init, context/ring attention."""
from .mesh import (  # noqa: F401
    batch_specs,
    make_mesh,
    model_param_specs,
    qwen2_param_specs,
    shard_params,
)

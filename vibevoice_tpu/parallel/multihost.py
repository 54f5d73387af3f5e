"""Multi-host initialization and DP serving helpers.

The reference's only distributed machinery is a NCCL all_reduce of scaling
stats (`modeling_vibevoice.py:312-317`) plus docker NCCL flags
(README.md:109).  Here multi-host runs use `jax.distributed.initialize` and
one global `(data, model)` mesh; collectives are emitted by GSPMD over ICI
within a slice and DCN across slices (SURVEY.md §5).

Typical pod-slice launch (same command on every host):

    python -m vibevoice_tpu.parallel.multihost --coordinator host0:1234 \
        --num-hosts 2 --host-id $HOST_ID ...

or rely on TPU metadata auto-detection (`jax.distributed.initialize()` with
no args on Cloud TPU).
"""
from __future__ import annotations

import argparse
from typing import Optional

import jax
import numpy as np

from .mesh import make_mesh


def initialize(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (no-op if already initialized)."""
    try:
        if coordinator is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def global_mesh(model_parallel: int = 1):
    """(data, model) mesh over all global devices; data spans hosts."""
    n = len(jax.devices())
    assert n % model_parallel == 0, (n, model_parallel)
    return make_mesh(data=n // model_parallel, model=model_parallel)


def shard_batch_for_host(batch_np, mesh):
    """Host-local shard of a global batch: each host feeds its addressable
    slice of arrays sharded P('data', ...) (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = {}
    for k, v in batch_np.items():
        if v is None:
            out[k] = None
            continue
        sharding = NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out


def dp_scaling_report(audio_sec: float, wall_s: float) -> dict:
    """Aggregate per-host throughput into the global scaling metric.

    Uses the multihost utils all-gather so every host reports the same global
    numbers; single-process it degenerates to the local values."""
    n = jax.process_count()
    if n > 1:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(
            np.asarray([audio_sec, wall_s], np.float64))
        audio_total = float(gathered[:, 0].sum())
        wall_max = float(gathered[:, 1].max())
    else:
        audio_total, wall_max = float(audio_sec), float(wall_s)
    return {
        "hosts": n,
        "audio_sec_total": audio_total,
        "throughput": audio_total / wall_max if wall_max else 0.0,
    }


__all__ = ["initialize", "global_mesh", "shard_batch_for_host", "dp_scaling_report"]

"""Context-parallel (sequence-sharded) prefill attention.

The reference handles long context with flash-attn + KV cache alone (SURVEY
§5: no ring/context parallelism).  This goes further for >64K prompts:
queries are sharded over a mesh axis with `shard_map`; K/V are all-gathered
over ICI and each device runs causal flash attention on its query shard with
the correct global row offset.  O(T/devices) activation memory per device.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _local_attention(q, k, v, pad_mask, row_offset, use_flash: bool):
    if use_flash:
        from ..ops.flash_attention import flash_attention_prefill
        return flash_attention_prefill(q, k, v, pad_mask, causal=True,
                                       row_offset=row_offset)
    # reference path (CPU tests): naive masked attention with global offset
    b, t, h, d = q.shape
    s = k.shape[1]
    g = h // k.shape[2]
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        kr.astype(jnp.float32)) / (d ** 0.5)
    rows = row_offset + jnp.arange(t)[:, None]
    cols = jnp.arange(s)[None, :]
    mask = (cols <= rows)[None, None] & pad_mask[:, None, None, :].astype(bool)
    probs = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs, vr.astype(jnp.float32)).astype(q.dtype)


def cp_prefill_attention(
    q: jnp.ndarray,         # [B, T, H, D] (T divisible by mesh axis size)
    k: jnp.ndarray,         # [B, T, KVH, D]
    v: jnp.ndarray,
    pad_mask: jnp.ndarray,  # [B, T]
    mesh: Mesh,
    axis: str = "data",
    use_flash: bool = True,
) -> jnp.ndarray:
    """Sequence-sharded causal self-attention: q split over `axis`, K/V
    all-gathered inside the shard; returns [B, T, H, D] sharded like q."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, (q.shape, n)
    shard_len = q.shape[1] // n

    def body(q_l, k_l, v_l, pad_l):
        k_g = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_g = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)
        pad_g = jax.lax.all_gather(pad_l, axis, axis=1, tiled=True)
        off = jax.lax.axis_index(axis) * shard_len
        return _local_attention(q_l, k_g, v_g, pad_g, off, use_flash)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(q, k, v, pad_mask)


__all__ = ["cp_prefill_attention"]

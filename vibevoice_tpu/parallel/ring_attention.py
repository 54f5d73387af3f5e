"""Ring attention over the mesh for >64K prefill (SURVEY §5 stretch goal).

Unlike `context_parallel.cp_prefill_attention` (which all-gathers K/V, O(T)
memory per device), ring attention keeps K/V sharded: each device holds a
T/n slice of Q, K, V; K/V blocks rotate around the ring with `ppermute`
(ICI neighbor exchange) for n steps while each device folds the visiting
block into its online-softmax accumulators — O(T/n) memory, compute/comm
overlapped by XLA's latency-hiding scheduler.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def _fold_block(q, k, v, pad, row_off, col_off, m, l, acc):
    """Fold one visiting K/V block into online-softmax accumulators.

    q [B,T,H,D]; k/v [B,S,KVH,D]; pad [B,S]; m/l/acc in [B,H,T,*] layout.
    """
    b, t, h, d = q.shape
    g = h // k.shape[2]
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   kr.astype(jnp.float32)) / (d ** 0.5)
    rows = row_off + jnp.arange(t)[:, None]
    cols = col_off + jnp.arange(k.shape[1])[None, :]
    mask = (cols <= rows)[None, None] & pad[:, None, None, :].astype(bool)
    s = jnp.where(mask, s, NEG_INF)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum("bhts,bshd->bhtd", p, vr.astype(jnp.float32))
    return m_new, l_new, acc_new


def ring_prefill_attention(
    q: jnp.ndarray,         # [B, T, H, D] (T divisible by ring size)
    k: jnp.ndarray,         # [B, T, KVH, D]
    v: jnp.ndarray,
    pad_mask: jnp.ndarray,  # [B, T]
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Causal self-attention with ring-rotated K/V; output sharded like q."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0
    shard_len = q.shape[1] // n

    def body(q_l, k_l, v_l, pad_l):
        b, t, h, d = q_l.shape
        idx = lax.axis_index(axis)
        row_off = idx * shard_len

        m = jnp.full((b, h, t, 1), NEG_INF, jnp.float32)
        lsum = jnp.zeros((b, h, t, 1), jnp.float32)
        acc = jnp.zeros((b, h, t, d), jnp.float32)

        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, i):
            m, lsum, acc, k_c, v_c, pad_c = carry
            # the block currently held came from device (idx - i) mod n
            src = (idx - i) % n
            col_off = src * shard_len
            m, lsum, acc = _fold_block(q_l, k_c, v_c, pad_c, row_off, col_off,
                                       m, lsum, acc)
            # rotate K/V to the next neighbor
            k_n = lax.ppermute(k_c, axis, perm)
            v_n = lax.ppermute(v_c, axis, perm)
            pad_n = lax.ppermute(pad_c, axis, perm)
            return (m, lsum, acc, k_n, v_n, pad_n), None

        (m, lsum, acc, _, _, _), _ = lax.scan(
            step, (m, lsum, acc, k_l, v_l, pad_l), jnp.arange(n))
        out = (acc / jnp.maximum(lsum, 1e-30)).transpose(0, 2, 1, 3)  # -> [B,T,H,D]
        return out.astype(q_l.dtype)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(None, axis)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(q, k, v, pad_mask)


__all__ = ["ring_prefill_attention"]

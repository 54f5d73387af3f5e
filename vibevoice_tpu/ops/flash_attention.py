"""Pallas flash-attention (prefill) for TPU.

Replaces the reference's flash-attn-2 dependency
(`demo/inference_from_file.py:261-309`) with a native Mosaic kernel: tiled
online-softmax attention with causal block skipping and left-pad masking,
O(T) memory — required for 64K-context prefill where naive attention would
materialize a 64K x 64K score matrix.

Layout: grid (B, H, num_q_blocks, num_k_blocks), k-blocks innermost; the
running max / normalizer / accumulator live in VMEM scratch persisted across
the sequential k-block grid steps (the standard TPU pallas flash pattern).
GQA is handled by indexing the kv head as h // group_size in the BlockSpec
index maps — no materialized head repeat.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(off_ref, q_ref, k_ref, v_ref, pad_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, scale: float, block_q: int, block_k: int, causal: bool):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    row_off = off_ref[0]  # global index of this shard's first query row

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # causal block skip: lowest q index in block >= highest k index needed
    run = True
    if causal:
        run = (ik * block_k) <= (row_off + iq * block_q + block_q - 1)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]          # [bq, D]
        k = k_ref[0, 0]          # [bk, D]
        v = v_ref[0, 0]          # [bk, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale  # [bq, bk]

        # masks: left-pad (pad_ref) + causal within the block
        pad = pad_ref[0, 0]       # [bk] int32
        s = jnp.where(pad[None, :] > 0, s, NEG_INF)
        if causal:
            rows = row_off + iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)

        m_prev = m_scratch[:, 0:1]                        # [bq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)        # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                            # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)                   # [bq, 1]
        l_new = alpha * l_scratch[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:, 0:1] = m_new
        l_scratch[:, 0:1] = l_new

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scratch[:, 0:1]
        o_ref[0, 0] = (acc_scratch[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention_prefill(
    q: jnp.ndarray,      # [B, T, H, D]
    k: jnp.ndarray,      # [B, S, KVH, D]
    v: jnp.ndarray,      # [B, S, KVH, D]
    pad_mask: jnp.ndarray,  # [B, S] int (1 = valid)
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 512,
    row_offset=None,        # global index of q[0] (context-parallel shards)
) -> jnp.ndarray:
    """Memory-linear attention for the prefill path; returns [B, T, H, D].

    With `row_offset` the queries are a contiguous shard of a longer
    sequence starting at that global row (context-parallel prefill);
    otherwise T == S self-attention over the prompt.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    kvh = k.shape[2]
    g = h // kvh
    scale = 1.0 / math.sqrt(d)

    block_q = min(block_q, max(t, 128))
    block_k = min(block_k, max(s, 128))
    t_pad = -(-t // block_q) * block_q
    s_pad = -(-s // block_k) * block_k

    qt = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
    kt = jnp.swapaxes(k, 1, 2)  # [B, KVH, S, D]
    vt = jnp.swapaxes(v, 1, 2)
    if t_pad != t:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, s_pad - s)))
    # broadcast to 8 sublanes so the mask block tiles natively at any batch
    # (a (1, block_k) block is only legal when B == 1)
    pad_mask = jnp.broadcast_to(pad_mask.astype(jnp.int32)[:, None, :],
                                (b, 8, s_pad))

    nq = t_pad // block_q
    nk = s_pad // block_k
    grid = (b, h, nq, nk)

    if row_offset is None:
        row_offset = jnp.zeros((1,), jnp.int32)
    else:
        row_offset = jnp.reshape(jnp.asarray(row_offset, jnp.int32), (1,))

    kernel = functools.partial(_flash_kernel, scale=scale, block_q=block_q,
                               block_k=block_k, causal=causal)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki, off: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, off, g=g: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki, off, g=g: (bi, hi // g, ki, 0)),
            pl.BlockSpec((1, 8, block_k), lambda bi, hi, qi, ki, off: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki, off: (bi, hi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
        # CPU (virtual-mesh dryruns / tests) runs in interpret mode natively
        interpret=jax.default_backend() == "cpu",
    )(row_offset, qt, kt, vt, pad_mask)

    out = jnp.swapaxes(out, 1, 2)  # [B, T_pad, H, D]
    return out[:, :t]


def flash_attention_prefill_sharded(mesh, q, k, v, pad_mask, causal: bool = True,
                                    model_axis: str = "model") -> jnp.ndarray:
    """Tensor-parallel flash prefill: q/k/v heads sharded over `model_axis`,
    each shard attends its local heads (GQA groups are shard-local when the
    axis size divides KVH)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[model_axis]
    if k.shape[2] % mp:
        raise ValueError(f"model axis {mp} must divide num_key_value_heads {k.shape[2]}")
    hs = P(None, None, model_axis, None)

    def f(q, k, v, pm):
        return flash_attention_prefill(q, k, v, pm, causal=causal)
    return shard_map(f, mesh=mesh,
                     in_specs=(hs, hs, hs, P(None, None)),
                     out_specs=hs, check_vma=False)(q, k, v, pad_mask)


__all__ = ["flash_attention_prefill", "flash_attention_prefill_sharded"]

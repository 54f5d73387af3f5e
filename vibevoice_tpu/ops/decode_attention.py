"""Pallas decode attention with length-aware block skipping.

The decode step attends one query position against a preallocated KV cache
whose VALID prefix is usually much shorter than its static width (e.g. a
64K-wide cache holding 2K tokens early in a 90-minute generation).  XLA's
dense attention reads the full width every step; this kernel clamps the
block index map at the per-sample valid length so Mosaic elides the DMAs of
never-visible blocks — decode cache reads scale with the LIVE context, not
the allocated width.

The kernel reads the FULL stacked cache [L, B, S, KVH*D] directly, with the
(static) layer index folded into the block index map.  Slicing the layer out
in XLA instead would materialize a full-width copy of the slice (plus a
retiling reshape) per layer per step — measured at ~20 ms/frame of pure
staging traffic on a 64K cache — so the operand must be the whole buffer.
The last two dims are pre-fused to (S, KVH*D) so Mosaic tiles (8, 128)
natively; KVH as its own dim would tile (2, 128) with 8x padding.

Layout: q [B, H, D] (one query position per row), cache k/v [L, B, S, KVH*D],
visibility mask [B, S], lengths [B] (scalar-prefetched upper bound of the
visible prefix).  Grid (B, S/block_k), k-blocks innermost, online-softmax
scratch accumulators.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(len_ref, q_ref, k_ref, v_ref, vis_ref, *rest,
            scale: float, block_k: int, kvh: int, group: int, quant: bool):
    if quant:
        ks_ref, vs_ref, o_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = rest
    b = pl.program_id(0)
    ik = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    in_range = (ik * block_k) < len_ref[b]

    @pl.when(in_range)
    def _body():
        q = q_ref[0]              # [H, D]
        vis = vis_ref[0, 0]       # [block_k]
        d = q_ref.shape[-1]
        if quant:
            # per-slot scales lie along LANES of the [G, bk] logits, so they
            # fold into the logits / probabilities instead of scaling k/v
            # rows (which would need an unsupported 16-bit lane->sublane
            # reshape): q·(k*ks) == (q·k)*ks and p@(v*vs) == (p*vs)@v.
            ksc = ks_ref[0, 0, 0].astype(jnp.float32)[None, :]  # [1, bk]
            vsc = vs_ref[0, 0, 0].astype(jnp.float32)[None, :]
        for hk in range(kvh):
            k = k_ref[0, 0][:, hk * d:(hk + 1) * d]    # [bk, D]
            v = v_ref[0, 0][:, hk * d:(hk + 1) * d]
            if quant:
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
            qh = q[hk * group:(hk + 1) * group]  # [G, D]
            s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale  # [G, bk]
            if quant:
                s = s * ksc
            s = jnp.where(vis[None, :] > 0, s, NEG_INF)

            rows = slice(hk * group, (hk + 1) * group)
            m_prev = m_scratch[rows, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scratch[rows, 0:1] = alpha * l_scratch[rows, 0:1] + jnp.sum(p, -1, keepdims=True)
            pv = (p * vsc) if quant else p
            acc_scratch[rows, :] = acc_scratch[rows, :] * alpha + jax.lax.dot_general(
                pv.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scratch[rows, 0:1] = m_new

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scratch[:, 0:1]
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,        # [B, H, D]
    k_full: jnp.ndarray,   # [L, B, S, KVH*D] — full stacked cache
    v_full: jnp.ndarray,   # [L, B, S, KVH*D]
    layer: int,            # static layer index
    visible: jnp.ndarray,  # [B, S] int (1 = attendable)
    lengths: jnp.ndarray,  # [B] int32: visible slots all < lengths[b]
    block_k: int = 2048,
    k_scale: jnp.ndarray = None,  # [L, B, 8, S] per-slot scales (int8 cache)
    v_scale: jnp.ndarray = None,
) -> jnp.ndarray:
    """Returns [B, H, D]."""
    quant = k_scale is not None
    b, h, d = q.shape
    s = k_full.shape[2]
    kvh = k_full.shape[3] // d
    group = h // kvh
    scale = 1.0 / (d ** 0.5)

    block_k = min(block_k, s)
    while s % block_k:
        block_k //= 2
    # Contract: callers allocate caches so blocks stay tileable (the Engine
    # rounds to 2048-slot multiples).  A width like 2056 would halve down to
    # degenerate 8-wide blocks — reject instead of silently running slow.
    # (Sub-128 widths are allowed as a single block: tiny-cache tests.)
    if block_k < min(128, s):
        raise ValueError(
            f"cache width {s} only tiles into {block_k}-wide blocks; allocate "
            f"the cache in 128-slot (ideally 2048-slot) multiples")
    nk = s // block_k
    # TPU blocks need sublane divisible by 8: broadcast the mask to 8 rows.
    # (one instance per step — CSE dedupes it across the 28 layer calls)
    visible = jnp.broadcast_to(visible.astype(jnp.int32)[:, None, :], (b, 8, s))
    lengths = lengths.astype(jnp.int32)

    def _clamped(ib, ik, len_ref):
        # beyond-length blocks re-map to the last needed block: unchanged
        # index -> Mosaic skips the DMA
        last = jnp.maximum((len_ref[ib] - 1) // block_k, 0)
        return (layer, ib, jnp.minimum(ik, last), 0)

    def _clamped_vis(ib, ik, len_ref):
        last = jnp.maximum((len_ref[ib] - 1) // block_k, 0)
        return (ib, 0, jnp.minimum(ik, last))

    def _clamped_scale(ib, ik, len_ref):
        last = jnp.maximum((len_ref[ib] - 1) // block_k, 0)
        return (layer, ib, 0, jnp.minimum(ik, last))

    in_specs = [
        pl.BlockSpec((1, h, d), lambda ib, ik, len_ref: (ib, 0, 0)),
        pl.BlockSpec((1, 1, block_k, kvh * d), _clamped),
        pl.BlockSpec((1, 1, block_k, kvh * d), _clamped),
        pl.BlockSpec((1, 8, block_k), _clamped_vis),
    ]
    operands = [lengths, q, k_full, v_full, visible]
    if quant:
        in_specs += [pl.BlockSpec((1, 1, 8, block_k), _clamped_scale),
                     pl.BlockSpec((1, 1, 8, block_k), _clamped_scale)]
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), lambda ib, ik, len_ref: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, scale=scale, block_k=block_k,
                               kvh=kvh, group=group, quant=quant)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        # CPU (virtual-mesh dryruns / tests) runs the kernel in interpret
        # mode natively — no pallas_call monkeypatching needed
        interpret=jax.default_backend() == "cpu",
    )(*operands)


def decode_attention_sharded(
    mesh, q, k_full, v_full, layer: int, visible, lengths,
    k_scale=None, v_scale=None, model_axis: str = "model",
) -> jnp.ndarray:
    """Tensor-parallel decode attention: heads (and the cache's fused KVH*D
    lanes) stay sharded over `model_axis`; each shard runs the kernel on its
    local heads — NO cache gather.  GQA groups are shard-local as long as the
    axis size divides KVH (1.5B: KVH=2 -> TP<=2; 7B: KVH=4 -> TP<=4), which
    the HF tp_plan the reference declares (configuration_vibevoice.py:175-183)
    assumes too.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mp = mesh.shape[model_axis]
    d = q.shape[-1]
    kvh = k_full.shape[3] // d
    if kvh % mp:
        raise ValueError(f"model axis {mp} must divide num_key_value_heads {kvh}")

    qs = P(None, model_axis, None)
    cs = P(None, None, None, model_axis)
    quant = k_scale is not None

    if quant:
        def f(q, k, v, vis, ln, ks, vs):
            return decode_attention(q, k, v, layer, vis, ln, k_scale=ks, v_scale=vs)
        return shard_map(
            f, mesh=mesh,
            in_specs=(qs, cs, cs, P(None, None), P(None), P(), P()),
            out_specs=qs, check_vma=False,
        )(q, k_full, v_full, visible, lengths, k_scale, v_scale)

    def f(q, k, v, vis, ln):
        return decode_attention(q, k, v, layer, vis, ln)
    return shard_map(
        f, mesh=mesh,
        in_specs=(qs, cs, cs, P(None, None), P(None)),
        out_specs=qs, check_vma=False,
    )(q, k_full, v_full, visible, lengths)


__all__ = ["decode_attention", "decode_attention_sharded"]

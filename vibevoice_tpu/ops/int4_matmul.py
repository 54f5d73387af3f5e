"""Pallas int4 weight-only dequant-matmul for decode GEMVs.

The decode step is weight-bandwidth-bound: every 7.5 Hz frame streams all LM
(and diffusion-head) weights.  int8 halves bf16's bytes; int4 halves them
again — but the two XLA-level routes are measured dead ends (jnp.int4 cannot
cross jit boundaries in this environment, and an XLA nibble-unpack
materializes the unpacked matrix, 5x slower than int8).  This kernel unpacks
INSIDE a fused Pallas matmul:

  * weights are stored nibble-packed `[K/2, N]` int8, INTERLEAVED rows:
    byte row i holds original row 2i in its low nibble and row 2i+1 in its
    high nibble — exactly the row expansion `pltpu.bitcast(int8 -> int4)`
    performs (doubles the sublane dim), so the unpack is a single
    hardware-native bitcast + convert, no shifts
  * per-output-channel fp scales are applied to the fp32 accumulator
    ([1, n_blk] per block — negligible VPU work), or per-(group, channel)
    scales to the weight block when `group_size` is set (quality option;
    costs one extra VPU multiply per weight value)
  * grid over N blocks; x `[M, K]` stays VMEM-resident (decode M = 2B)

The reference has no analogue (its perf story is flash-attn + torch.compile,
`demo/inference_from_file.py:266`); this exists to push the decode roofline
below int8.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pack_int4(q) -> jnp.ndarray:
    """Interleave-pack int4 values [K, N] (in [-8, 7]) into int8 [K/2, N].

    Row order matches pltpu.bitcast's sublane expansion: byte row i = (low
    nibble: row 2i, high nibble: row 2i+1).  jnp ops — runs on-device, so
    quantizing a model never pulls weights through the host."""
    k = q.shape[0]
    assert k % 2 == 0, "K must be even to nibble-pack"
    q = jnp.asarray(q, jnp.int32)
    lo, hi = q[0::2], q[1::2]
    packed_u8 = (((hi & 0xF) << 4) | (lo & 0xF)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(packed_u8, jnp.int8)


@functools.partial(jax.jit, static_argnums=(1,))
def _quantize_int4_impl(w, group_size: Optional[int]):
    wf = jnp.asarray(w, jnp.float32)
    k, n = wf.shape
    if group_size is None:
        amax = jnp.abs(wf).max(axis=0, keepdims=True)  # [1, N]
        scale = jnp.maximum(amax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scale), -8, 7)
    else:
        g = wf.reshape(k // group_size, group_size, n)
        amax = jnp.abs(g).max(axis=1)  # [G, N]
        scale = jnp.maximum(amax / 7.0, 1e-8)
        q = jnp.clip(jnp.round(g / scale[:, None]), -8, 7).reshape(k, n)
    return pack_int4(q), scale.astype(jnp.float32)


def quantize_int4(w, group_size: Optional[int] = None):
    """Symmetric int4: w [K, N] -> packed int8 [K/2, N] + fp scales.

    scales [1, N] (per output channel) or [K/group_size, N] when grouped.
    Runs once at load time; jitted per weight shape (a whole-model jit would
    exceed remote-tunnel compile limits, eager would cost ~10 dispatches per
    weight over the tunnel).
    """
    if group_size is not None:
        assert w.shape[0] % group_size == 0 and group_size % 2 == 0
    q, scale = _quantize_int4_impl(jnp.asarray(w), group_size)
    return {"qint4": q, "scale4": scale}


def _kernel(x_ref, p_ref, s_ref, o_ref, *, group_size: Optional[int]):
    x = x_ref[:]
    w = pltpu.bitcast(p_ref[:], jnp.int4).astype(x.dtype)  # [K, n_blk]
    if group_size is None:
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[0, :]).astype(o_ref.dtype)
    else:
        g, n_blk = s_ref.shape
        k = w.shape[0]
        # expand [G, n_blk] -> [K, n_blk] with row r = scale[r // gs]
        s = jnp.broadcast_to(s_ref[:][:, None, :], (g, group_size, n_blk))
        w = w * s.reshape(k, n_blk).astype(x.dtype)
        o_ref[:] = jnp.dot(x, w,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                n_blk: Optional[int] = None,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [M, K] @ dequant(packed [K/2, N], scale) -> [M, N] in x.dtype.

    scale [1, N] (per-channel) or [G, N] (per-group); M is expected tiny
    (decode GEMV) — the whole x stays VMEM-resident per block.
    """
    m, k = x.shape
    n = packed.shape[1]
    g = scale.shape[0]
    group_size = None if g == 1 else k // g
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if n_blk is None:
        # keep packed block + unpacked bf16 + double buffering well under VMEM
        n_blk = 512 if k <= 4096 else 256
    n_blk = min(n_blk, n)
    kernel = functools.partial(_kernel, group_size=group_size)
    return pl.pallas_call(
        kernel,
        grid=(_cdiv(n, n_blk),),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, n_blk), lambda i: (0, i)),
            pl.BlockSpec((g, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, packed, scale)


def dequant_int4_xla(packed: jnp.ndarray, scale: jnp.ndarray,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """XLA-level dequantization (for prefill, where the weight read amortizes
    over many tokens and a materialized unpack is fine)."""
    kh, n = packed.shape
    w4 = jax.lax.bitcast_convert_type(packed, jnp.int4)  # [K/2, N, 2]? no: [K/2, N] i8 -> [K/2, N, 2]
    w = jnp.swapaxes(w4, 1, 2).reshape(kh * 2, n).astype(jnp.float32)
    g = scale.shape[0]
    if g == 1:
        return (w * scale).astype(dtype)
    return (w.reshape(g, (kh * 2) // g, n) * scale[:, None]).reshape(kh * 2, n).astype(dtype)


__all__ = ["quantize_int4", "pack_int4", "int4_matmul", "dequant_int4_xla"]

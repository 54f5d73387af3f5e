"""Tiled fused Block1D-stage kernel for the σ-VAE LARGE-T stages.

The round-3 stage ablation (scripts/experiments/sigma_vae_stage_ablation.py)
located the batched σ-VAE cost: at B=8 the large-T stages' Block1D chains
(T ∈ {200..3200}, D ∈ {32..256}) cost 1.97 ms of the 6.15 ms batch-step —
1.4 ms FFN + 0.57 ms mixers — despite negligible weight bytes.  The XLA
path materializes every matmul output ([B·T, 4D] ≈ 6 MB each) to HBM and
runs the exact-GELU erf on the VPU over those tensors; at small D the lane
dim is 4x-underutilized on every elementwise op.

This kernel runs a WHOLE stage (N sequential Block1Ds) over T tiles with
the running activation resident in VMEM: per (batch row, tile) grid step it
applies all N blocks — fp32 RMSNorm, causal depthwise conv k=7 via 7
vectorized shifted FMAs with a cross-tile carry, layer-scale residuals, and
the GELU FFN with the bias folded into an augmented matmul (same packed
layout as ops/fused_blocks.py, reusing `pack_stage`) — and only the final
stage output returns to HBM.  Weights for these stages are tiny (<= 3 MB
bf16 at D=256) and stay VMEM-resident across all tiles.

Unlike ops/fused_blocks.py (grid over blocks, T <= 8, weights streamed),
the batch dim here is an EXPLICIT leading grid axis — grid (B, num_tiles) —
so the per-block conv carry scratch re-initializes per batch row without
relying on vmap's grid-axis semantics.

GELU uses the Abramowitz-Stegun rational erf (|err| < 1.5e-7; Mosaic has no
native erf lowering), and all intra-stage arithmetic is fp32 — numerics
match the XLA path to bf16 rounding (parity-tested with tolerances in
tests/test_fused_stage.py).  Ref anchor: Block1D,
modular_vibevoice_tokenizer.py:620-684.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_blocks import CTX, _erf, pack_stage


def _kernel(vecs_ref, mixw_ref, w1_ref, w2_ref, ctx_in_ref,
            x_ref, o_ref, ctx_out_ref, carry,
            *, n: int, tt: int, d: int, eps: float):
    it = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(it == 0)
    def _load_ctx():
        carry[:] = ctx_in_ref[0].astype(jnp.float32)  # [N, 8, D], rows 0..5 used

    x = x_ref[0].astype(jnp.float32)  # [Tt, D]
    for b in range(n):
        norm_w = vecs_ref[b, 0]
        mixer_b = vecs_ref[b, 1]
        gamma = vecs_ref[b, 2]
        ffn_norm_w = vecs_ref[b, 3]
        ffn_gamma = vecs_ref[b, 4]
        ffn2_b = vecs_ref[b, 5]

        # mixer: fp32 RMSNorm -> causal depthwise conv (7 shifted FMAs over
        # [ctx(6); h]) -> layer-scale residual
        h = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = h * norm_w[None, :]
        hh = jnp.concatenate([carry[b, :CTX], h], axis=0)  # [Tt+6, D]
        carry[b, :CTX] = h[tt - CTX:]
        m = mixer_b[None, :]
        for k in range(7):
            m = m + hh[k:k + tt] * mixw_ref[b, k][None, :]
        x = x + gamma[None, :] * m

        # FFN: fp32 RMSNorm -> [Tt, D+8] @ w1 (bias folded via the all-ones
        # row) -> exact GELU -> @ w2 -> layer-scale residual.
        # Matmul INPUTS take the pack dtype (bf16 in production): the MXU
        # runs bf16 natively (fp32 inputs cost 3-6 passes), accumulation
        # stays fp32, and the plain XLA path's matmuls are bf16-input too —
        # so this is both faster AND closer to the reference numerics.
        wdt = w1_ref.dtype
        hn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        hn = hn * ffn_norm_w[None, :]
        ones = jnp.ones((tt, 1), jnp.float32)
        zeros = jnp.zeros((tt, 7), jnp.float32)
        hn_aug = jnp.concatenate([hn, ones, zeros], axis=-1)
        a = jax.lax.dot_general(hn_aug.astype(wdt), w1_ref[b],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
        y = jax.lax.dot_general(a.astype(wdt), w2_ref[b],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = x + ffn_gamma[None, :] * (y + ffn2_b[None, :])

    o_ref[0] = x.astype(o_ref.dtype)

    @pl.when(it == nt - 1)
    def _emit_ctx():
        ctx_out_ref[0] = carry[:].astype(ctx_out_ref.dtype)


def _tile(t: int, want: int = 400) -> int:
    if t <= want:
        return t
    for tt in range(want, CTX, -1):
        if t % tt == 0:
            return tt
    return t


def fused_stage_chain(packed, x: jnp.ndarray, ctx: jnp.ndarray,
                      eps: float = 1e-5,
                      tile_want: int = 400) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run one large-T stage for a batch.

    x [B, T, D] (T > 8, statically tiled), ctx [B, N, 6, D] per-block conv
    context -> (y [B, T, D], new_ctx [B, N, 6, D]).  `tile_want` sets the
    T-tile target (on-chip sweep: scripts/experiments/stage_tile_sweep.py).
    """
    bsz, t, d = x.shape
    n = packed["vecs"].shape[0]
    f = packed["w1"].shape[2]
    tt = _tile(t, tile_want)
    assert t % tt == 0 and tt > CTX
    nt = t // tt
    ctx_pad = jnp.pad(ctx, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))

    kernel = functools.partial(_kernel, n=n, tt=tt, d=d, eps=eps)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, d + 8, f), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, f, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, n, 8, d), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, tt, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, 8, d), lambda b, i: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
            jax.ShapeDtypeStruct((bsz, n, 8, d), ctx.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n, 8, d), jnp.float32)],
    )(packed["vecs"], packed["mixw"], packed["w1"], packed["w2"], ctx_pad, x)
    return y, new_ctx[:, :, :CTX]


__all__ = ["fused_stage_chain", "pack_stage"]

"""Tiled fused Block1D-stage kernel for the σ-VAE LARGE-T stages.

The round-3 stage ablation (scripts/experiments/sigma_vae_stage_ablation.py)
located the batched σ-VAE cost: at B=8 the large-T stages' Block1D chains
(T ∈ {200..3200}, D ∈ {32..256}) cost 1.97 ms of the 6.15 ms batch-step —
1.4 ms FFN + 0.57 ms mixers — despite negligible weight bytes.  The XLA
path materializes every matmul output ([B·T, 4D] ≈ 6 MB each) to HBM and
runs the exact-GELU erf on the VPU over those tensors; at small D the lane
dim is 4x-underutilized on every elementwise op.

This kernel runs a WHOLE stage (N sequential Block1Ds) over (row-group,
T-tile) grid steps with the running activation resident in VMEM: per step
it applies all N blocks — fp32 RMSNorm, causal depthwise conv k=7 via 7
vectorized shifted FMAs with a cross-tile carry, layer-scale residuals, and
the GELU FFN with the bias folded into an augmented matmul (same packed
layout as ops/fused_blocks.py, reusing `pack_stage`) — and only the final
stage output returns to HBM.  Weights for these stages are tiny (<= 3 MB
bf16 at D=256) and stay VMEM-resident across all tiles.

Batching (round 4): R batch rows ride ONE grid step as a [R, Tt, D] block.
The conv/norm/residual path vectorizes over the leading row axis; the FFN
matmuls flatten rows into the M dim ([R*Tt, D+8] @ [D+8, F]) — the r3
per-row matmuls at M=Tt with tiny K ran ~10x off the MXU roofline, and M
is the only free axis that amortizes the K/N-granularity waste.  Matmul
INPUTS take the pack dtype (bf16 in production -> native MXU passes; fp32
accumulation), matching the plain XLA path's bf16-input matmuls.

GELU uses the Abramowitz-Stegun rational erf (|err| < 1.5e-7; Mosaic has no
native erf lowering); other intra-stage arithmetic is fp32 — numerics match
the XLA path to bf16 rounding (parity-tested with tolerances in
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
            *, n: int, tt: int, d: int, r: int, eps: float):
    it = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(it == 0)
    def _load_ctx():
        carry[:] = ctx_in_ref[:].astype(jnp.float32)  # [R, N, 8, D], rows 0..5 used

    x = x_ref[:].astype(jnp.float32)  # [R, Tt, D]
    wdt = w1_ref.dtype
    for b in range(n):
        norm_w = vecs_ref[b, 0]
        mixer_b = vecs_ref[b, 1]
        gamma = vecs_ref[b, 2]
        ffn_norm_w = vecs_ref[b, 3]
        ffn_gamma = vecs_ref[b, 4]
        ffn2_b = vecs_ref[b, 5]

        # mixer: fp32 RMSNorm -> causal depthwise conv (7 shifted FMAs over
        # [ctx(6); h], vectorized over the R rows) -> layer-scale residual
        h = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = h * norm_w[None, None, :]
        hh = jnp.concatenate([carry[:, b, :CTX], h], axis=1)  # [R, Tt+6, D]
        carry[:, b, :CTX] = h[:, tt - CTX:]
        m = jnp.broadcast_to(mixer_b[None, None, :], (r, tt, d))
        for k in range(7):
            m = m + hh[:, k:k + tt] * mixw_ref[b, k][None, None, :]
        x = x + gamma[None, None, :] * m

        # FFN: fp32 RMSNorm -> rows flattened into M -> [R*Tt, D+8] @ w1
        # (bias folded via the all-ones column) -> exact GELU -> @ w2 ->
        # layer-scale residual
        hn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        hn = hn * ffn_norm_w[None, None, :]
        hn2 = hn.reshape(r * tt, d)
        ones = jnp.ones((r * tt, 1), jnp.float32)
        zeros = jnp.zeros((r * tt, 7), jnp.float32)
        hn_aug = jnp.concatenate([hn2, ones, zeros], axis=-1)
        a = jax.lax.dot_general(hn_aug.astype(wdt), w1_ref[b],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
        y = jax.lax.dot_general(a.astype(wdt), w2_ref[b],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = x + ffn_gamma[None, None, :] * (y.reshape(r, tt, d) + ffn2_b[None, None, :])

    o_ref[:] = x.astype(o_ref.dtype)

    @pl.when(it == nt - 1)
    def _emit_ctx():
        ctx_out_ref[:] = carry[:].astype(ctx_out_ref.dtype)


def _tile(t: int, want: int = 400) -> int:
    if t <= want:
        return t
    for tt in range(want, CTX, -1):
        if t % tt == 0:
            return tt
    return t


def _rows_per_step(bsz: int, tt: int, d: int, f: int) -> int:
    """Largest divisor of B such that the fp32 FFN intermediate [R*Tt, F+]
    stays comfortably VMEM-resident (~<= 8 MB)."""
    best = 1
    for r in range(1, bsz + 1):
        if bsz % r:
            continue
        inter = r * tt * max(f, d + 8) * 4  # fp32 activation high-water
        if inter <= 8 * 1024 * 1024 and r <= 8:
            best = r
    return best


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
    r = _rows_per_step(bsz, tt, d, f)
    ctx_pad = jnp.pad(ctx, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))

    kernel = functools.partial(_kernel, n=n, tt=tt, d=d, r=r, eps=eps)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(bsz // r, nt),
        in_specs=[
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, d + 8, f), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, f, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((r, n, 8, d), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((r, tt, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((r, tt, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((r, n, 8, d), lambda b, i: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
            jax.ShapeDtypeStruct((bsz, n, 8, d), ctx.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((r, n, 8, d), jnp.float32)],
    )(packed["vecs"], packed["mixw"], packed["w1"], packed["w2"], ctx_pad, x)
    return y, new_ctx[:, :, :CTX]


__all__ = ["fused_stage_chain", "pack_stage"]

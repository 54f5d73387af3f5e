"""Fused Block1D-chain Pallas kernel for the vocoder/semantic conv stacks.

A tokenizer stage is a sequential chain of `Block1D`s (RMSNorm -> depthwise
conv -> layer-scale -> residual -> RMSNorm -> GELU FFN -> layer-scale ->
residual, ref modular_vibevoice_tokenizer.py:620-684).  At streaming decode
the per-frame T is tiny (1..8), so XLA executes ~8 small ops per block with
poor arithmetic intensity.  This kernel runs the WHOLE chain in one
`pallas_call`: grid (block, ffn_tile), the running activation lives in VMEM
scratch across all grid steps, and only the FFN weight tiles stream from HBM
— one kernel instead of ~8N ops.

Weight packing (per stage, N blocks, dim D, hidden F = ffn_expansion*D):
  vecs  [N, 8, D]   rows: 0 norm_w, 1 mixer_b, 2 gamma, 3 ffn_norm_w,
                          4 ffn_gamma, 5 ffn2_b, 6-7 zero
  mixw  [N, 8, D]   rows 0..6 = depthwise kernel taps, row 7 zero
  w1    [N, D+8, F] rows 0..D-1 = ffn1 weight, row D = ffn1 bias (folded via
                     an all-ones activation row), rows D+1.. zero
  w2    [N, F, D]
  ctx   [N, 8, D]   rows 0..5 = mixer streaming context (last 6 inputs)

Activations: x [T8, D] where T8 = 8 (T <= 8 frames padded; static T).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CTX = 6  # depthwise kernel 7 -> 6 context rows

# scratch budget per batched-chain row group (see fused_block_chain_batched)
_CHAIN_GROUP_BUDGET = 17 * 1024 * 1024


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7); Mosaic has no
    native erf/erfc lowering."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(vecs_ref, mixw_ref, w1_ref, w2_ref, ctx_in_ref,
            x_ref, o_ref, ctx_out_ref,
            x_scratch, y_scratch, hn_scratch, acc_scratch,
            *, t: int, d: int, tile_f: int, eps: float):
    ib = pl.program_id(0)
    it = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(it == 0)
    def _mixer():
        @pl.when(ib == 0)
        def _load_x():
            x_scratch[:] = x_ref[:].astype(jnp.float32)

        x = x_scratch[:]
        norm_w = vecs_ref[0, 0]
        mixer_b = vecs_ref[0, 1]
        gamma = vecs_ref[0, 2]
        ffn_norm_w = vecs_ref[0, 3]

        h = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = h * norm_w[None, :]
        # streaming context: rows [ctx(6) | h(:t)]
        ctx = ctx_in_ref[0][:CTX].astype(jnp.float32)   # [6, D]
        # new context = last 6 rows of [ctx; h[:t]]
        if t >= CTX:
            new_ctx = h[t - CTX:t]
        else:
            new_ctx = jnp.concatenate([ctx[t:], h[:t]], axis=0)
        ctx_out_ref[0, :CTX] = new_ctx.astype(ctx_out_ref.dtype)
        ctx_out_ref[0, CTX:] = jnp.zeros((8 - CTX, d), ctx_out_ref.dtype)

        # causal depthwise conv, taps k=0..6 over [ctx; h] — rows built
        # statically (scatter ops don't lower on Mosaic)
        taps = [mixw_ref[0, k].astype(jnp.float32) for k in range(7)]
        rows = []
        for i in range(t):
            acc_row = jnp.zeros((d,), jnp.float32)
            for k in range(7):
                j = i + k
                src = ctx[j] if j < CTX else h[j - CTX]
                acc_row = acc_row + src * taps[k]
            rows.append(acc_row[None, :])
        t8 = x_scratch.shape[0]
        if t < t8:
            rows.append(jnp.zeros((t8 - t, d), jnp.float32))
        m = jnp.concatenate(rows, axis=0)
        m = m + mixer_b[None, :]
        y = x + gamma[None, :] * m
        y_scratch[:] = y
        hn = y * jax.lax.rsqrt(jnp.mean(y * y, axis=-1, keepdims=True) + eps)
        hn_scratch[:] = hn * ffn_norm_w[None, :]
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # FFN tile: a = gelu([hn | 1 | 0...] @ w1_tile); acc += a @ w2_tile
    hn = hn_scratch[:]
    ones = jnp.ones((hn.shape[0], 1), jnp.float32)
    zeros = jnp.zeros((hn.shape[0], 7), jnp.float32)
    hn_aug = jnp.concatenate([hn, ones, zeros], axis=-1)       # [T8, D+8]
    w1 = w1_ref[0].astype(jnp.float32)                          # [D+8, tile_f]
    a = jax.lax.dot_general(hn_aug, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # exact GELU via rational erf (erf/erfc don't lower in Mosaic)
    a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
    w2 = w2_ref[0].astype(jnp.float32)                          # [tile_f, D]
    acc_scratch[:] = acc_scratch[:] + jax.lax.dot_general(
        a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(it == nt - 1)
    def _finish_block():
        ffn_gamma = vecs_ref[0, 4]
        ffn2_b = vecs_ref[0, 5]
        x_scratch[:] = y_scratch[:] + ffn_gamma[None, :] * (acc_scratch[:] + ffn2_b[None, :])

        @pl.when(ib == nb - 1)
        def _emit():
            o_ref[:] = x_scratch[:].astype(o_ref.dtype)


def pack_stage(blocks, dtype=jnp.float32):
    """Stack a stage's Block1D param dicts into the kernel's packed layout."""
    if any(isinstance(bp["ffn1"]["w"], dict) for bp in blocks):
        raise ValueError(
            "fused Block1D kernel packs plain weights only — it is mutually "
            "exclusive with quantize_tokenizer (the quantized path's fused "
            "dequant-matmul already covers these stages' weight reads)")
    n = len(blocks)
    d = blocks[0]["norm_w"].shape[0]
    f = blocks[0]["ffn1"]["w"].shape[1]
    vecs = jnp.zeros((n, 8, d), dtype)
    mixw = jnp.zeros((n, 8, d), dtype)
    w1 = jnp.zeros((n, d + 8, f), dtype)
    w2 = jnp.zeros((n, f, d), dtype)
    for i, bp in enumerate(blocks):
        vecs = vecs.at[i, 0].set(bp["norm_w"].astype(dtype))
        vecs = vecs.at[i, 1].set((bp["mixer"]["b"] if bp["mixer"]["b"] is not None
                                  else jnp.zeros(d)).astype(dtype))
        vecs = vecs.at[i, 2].set(bp["gamma"].astype(dtype))
        vecs = vecs.at[i, 3].set(bp["ffn_norm_w"].astype(dtype))
        vecs = vecs.at[i, 4].set(bp["ffn_gamma"].astype(dtype))
        vecs = vecs.at[i, 5].set((bp["ffn2"]["b"] if bp["ffn2"]["b"] is not None
                                  else jnp.zeros(d)).astype(dtype))
        # depthwise weight [7, 1, D] -> taps [7, D]
        mixw = mixw.at[i, :7].set(bp["mixer"]["w"][:, 0, :].astype(dtype))
        w1 = w1.at[i, :d].set(bp["ffn1"]["w"].astype(dtype))
        if bp["ffn1"]["b"] is not None:
            w1 = w1.at[i, d].set(bp["ffn1"]["b"].astype(dtype))
        w2 = w2.at[i].set(bp["ffn2"]["w"].astype(dtype))
    return {"vecs": vecs, "mixw": mixw, "w1": w1, "w2": w2}


def pack_stage_q(blocks):
    """int4 weight pack for the chain kernel: FFN matmul weights are
    nibble-packed (interleaved rows, `ops.int4_matmul.pack_int4`) with
    per-output-channel fp32 scales, streamed at HALF the int8 bytes and
    dequantized in-VMEM by the hardware bitcast — this beats both the int8
    XLA path (2x the reads) and per-matmul int4 GEMV kernels (~22 kernel
    launches per frame vs ONE per stage).  ffn1's bias leaves the augmented
    matmul (it cannot be nibble-packed) and rides in `sb1` row 1.
    """
    from .int4_matmul import quantize_int4
    n = len(blocks)
    if any(isinstance(bp["ffn1"]["w"], dict) for bp in blocks):
        raise ValueError(
            "pack_stage_q needs the original (unquantized) stage weights — "
            "exclude these stages from quantize_tokenizer (max_dim)")
    d = blocks[0]["norm_w"].shape[0]
    f = blocks[0]["ffn1"]["w"].shape[1]
    vecs = jnp.zeros((n, 8, d), jnp.float32)
    mixw = jnp.zeros((n, 8, d), jnp.float32)
    w1q = jnp.zeros((n, d // 2, f), jnp.int8)
    sb1 = jnp.zeros((n, 2, f), jnp.float32)
    w2q = jnp.zeros((n, f // 2, d), jnp.int8)
    s2 = jnp.zeros((n, 1, d), jnp.float32)
    for i, bp in enumerate(blocks):
        vecs = vecs.at[i, 0].set(bp["norm_w"].astype(jnp.float32))
        vecs = vecs.at[i, 1].set((bp["mixer"]["b"] if bp["mixer"]["b"] is not None
                                  else jnp.zeros(d)).astype(jnp.float32))
        vecs = vecs.at[i, 2].set(bp["gamma"].astype(jnp.float32))
        vecs = vecs.at[i, 3].set(bp["ffn_norm_w"].astype(jnp.float32))
        vecs = vecs.at[i, 4].set(bp["ffn_gamma"].astype(jnp.float32))
        vecs = vecs.at[i, 5].set((bp["ffn2"]["b"] if bp["ffn2"]["b"] is not None
                                  else jnp.zeros(d)).astype(jnp.float32))
        mixw = mixw.at[i, :7].set(bp["mixer"]["w"][:, 0, :].astype(jnp.float32))
        q1 = quantize_int4(bp["ffn1"]["w"])
        w1q = w1q.at[i].set(q1["qint4"])
        sb1 = sb1.at[i, 0].set(q1["scale4"][0])
        if bp["ffn1"]["b"] is not None:
            sb1 = sb1.at[i, 1].set(bp["ffn1"]["b"].astype(jnp.float32))
        q2 = quantize_int4(bp["ffn2"]["w"])
        w2q = w2q.at[i].set(q2["qint4"])
        s2 = s2.at[i, 0].set(q2["scale4"][0])
    return {"vecs": vecs, "mixw": mixw, "w1q": w1q, "sb1": sb1,
            "w2q": w2q, "s2": s2}


def _kernel_q(vecs_ref, mixw_ref, w1q_ref, sb1_ref, w2q_ref, s2_ref,
              ctx_in_ref, x_ref, o_ref, ctx_out_ref,
              x_scratch, y_scratch, hn_scratch, acc_scratch,
              *, bsz: int, t: int, d: int, tile_f: int, eps: float):
    """Batched int4 chain kernel: `bsz` batch rows ride INSIDE the kernel
    rows ([bsz*8, D] scratch), so each int4 weight tile streams from HBM
    once for ALL of them — unlike a vmapped single-row kernel, which
    re-streams the weights per row (measured 119.7 vs 195.4 audio-sec/s at
    B=8).  The grid is (row_groups, block, ffn_tile): batches larger than
    one group's VMEM budget split over the leading grid dim (weights then
    stream once per GROUP — B=128 support, r5)."""
    ib = pl.program_id(1)
    it = pl.program_id(2)
    nb = pl.num_programs(1)
    nt = pl.num_programs(2)
    t8 = 8

    @pl.when(it == 0)
    def _mixer():
        @pl.when(ib == 0)
        def _load_x():
            x_scratch[:] = x_ref[:].astype(jnp.float32).reshape(bsz * t8, d)

        x = x_scratch[:]
        norm_w = vecs_ref[0, 0]
        mixer_b = vecs_ref[0, 1]
        gamma = vecs_ref[0, 2]
        ffn_norm_w = vecs_ref[0, 3]

        h = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = h * norm_w[None, :]
        taps = [mixw_ref[0, k].astype(jnp.float32) for k in range(7)]
        rows = []
        for b in range(bsz):
            hb = h[b * t8:(b + 1) * t8]
            ctx = ctx_in_ref[b, 0][:CTX].astype(jnp.float32)
            if t >= CTX:
                new_ctx = hb[t - CTX:t]
            else:
                new_ctx = jnp.concatenate([ctx[t:], hb[:t]], axis=0)
            ctx_out_ref[b, 0, :CTX] = new_ctx.astype(ctx_out_ref.dtype)
            ctx_out_ref[b, 0, CTX:] = jnp.zeros((8 - CTX, d), ctx_out_ref.dtype)
            for i in range(t):
                acc_row = jnp.zeros((d,), jnp.float32)
                for k in range(7):
                    j = i + k
                    src = ctx[j] if j < CTX else hb[j - CTX]
                    acc_row = acc_row + src * taps[k]
                rows.append(acc_row[None, :])
            if t < t8:
                rows.append(jnp.zeros((t8 - t, d), jnp.float32))
        m = jnp.concatenate(rows, axis=0)
        m = m + mixer_b[None, :]
        y = x + gamma[None, :] * m
        y_scratch[:] = y
        hn = y * jax.lax.rsqrt(jnp.mean(y * y, axis=-1, keepdims=True) + eps)
        hn_scratch[:] = hn * ffn_norm_w[None, :]
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # FFN tile, int4 weights: a = gelu((hn @ deq(w1)) * s1 + b1);
    # acc += a @ deq(w2) (w2's per-channel scale applied once at the end)
    hn = hn_scratch[:]
    w1 = pltpu.bitcast(w1q_ref[0], jnp.int4).astype(jnp.float32)  # [D, tile_f]
    a = jax.lax.dot_general(hn, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a * sb1_ref[0, 0][None, :] + sb1_ref[0, 1][None, :]
    a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
    w2 = pltpu.bitcast(w2q_ref[0], jnp.int4).astype(jnp.float32)  # [tile_f, D]
    acc_scratch[:] = acc_scratch[:] + jax.lax.dot_general(
        a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(it == nt - 1)
    def _finish_block():
        ffn_gamma = vecs_ref[0, 4]
        ffn2_b = vecs_ref[0, 5]
        x_scratch[:] = y_scratch[:] + ffn_gamma[None, :] * (
            acc_scratch[:] * s2_ref[0, 0][None, :] + ffn2_b[None, :])

        @pl.when(ib == nb - 1)
        def _emit():
            o_ref[:] = x_scratch[:].reshape(o_ref.shape).astype(o_ref.dtype)


def fused_block_chain_batched(packed, x: jnp.ndarray, ctx: jnp.ndarray,
                              eps: float = 1e-5, tile_f: int = 256
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int4-pack chain for a BATCH: x [B, T, D] (T <= 8), ctx [B, N, 6, D]
    -> (y [B, T, D], new_ctx [B, N, 6, D]).  The batch lives inside the
    kernel rows, so the int4 weights stream once per tile for all rows."""
    bsz, t, d = x.shape
    n = packed["vecs"].shape[0]
    f = packed["w1q"].shape[2]
    assert t <= 8
    t8 = 8
    tile_f = min(tile_f, f)
    nt = -(-f // tile_f)
    x_pad = jnp.pad(x, ((0, 0), (0, t8 - t), (0, 0)))
    ctx_pad = jnp.pad(ctx, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))

    # rows per grid group: keep the 4 [rg*8, D] fp32 scratches (+ ~same again
    # of mixer/FFN temps) inside the budget — B=64 at D=2048 fits one
    # group; larger batches split over the leading grid dim (weights stream
    # once per group, still amortized over rg rows)
    rg = bsz
    while rg > 1 and (rg * t8 * d * 16 > _CHAIN_GROUP_BUDGET or bsz % rg):
        rg -= 1
    ng = bsz // rg

    kernel = functools.partial(_kernel_q, bsz=rg, t=t, d=d, tile_f=tile_f,
                               eps=eps)
    # the scratches outgrow Mosaic's default 16 MB scoped-vmem stack around
    # rg>=32 at D=2048; v5e VMEM is 128 MB
    need = rg * t8 * d * 4 * 4
    compiler_params = None
    if need > 6 * 1024 * 1024:
        limit = 96 if need > 40 * 1024 * 1024 else 64
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=limit * 1024 * 1024)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        compiler_params=compiler_params,
        grid=(ng, n, nt),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda g, ib, it: (ib, 0, 0)),
            pl.BlockSpec((1, 8, d), lambda g, ib, it: (ib, 0, 0)),
            pl.BlockSpec((1, d // 2, tile_f), lambda g, ib, it: (ib, 0, it)),
            pl.BlockSpec((1, 2, tile_f), lambda g, ib, it: (ib, 0, it)),
            pl.BlockSpec((1, tile_f // 2, d), lambda g, ib, it: (ib, it, 0)),
            pl.BlockSpec((1, 1, d), lambda g, ib, it: (ib, 0, 0)),
            pl.BlockSpec((rg, 1, 8, d), lambda g, ib, it: (g, ib, 0, 0)),
            pl.BlockSpec((rg, t8, d), lambda g, ib, it: (g, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rg, t8, d), lambda g, ib, it: (g, 0, 0)),
            pl.BlockSpec((rg, 1, 8, d), lambda g, ib, it: (g, ib, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t8, d), x.dtype),
            jax.ShapeDtypeStruct((bsz, n, 8, d), ctx.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((rg * t8, d), jnp.float32),
            pltpu.VMEM((rg * t8, d), jnp.float32),
            pltpu.VMEM((rg * t8, d), jnp.float32),
            pltpu.VMEM((rg * t8, d), jnp.float32),
        ],
    )(packed["vecs"], packed["mixw"], packed["w1q"], packed["sb1"],
      packed["w2q"], packed["s2"], ctx_pad, x_pad)
    return y[:, :t], new_ctx[:, :, :CTX]


def _fused_block_chain_q(packed, x: jnp.ndarray, ctx: jnp.ndarray,
                         eps: float, tile_f: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    y, new_ctx = fused_block_chain_batched(packed, x[None], ctx[None],
                                           eps=eps, tile_f=tile_f)
    return y[0], new_ctx[0]


def fused_block_chain(packed, x: jnp.ndarray, ctx: jnp.ndarray,
                      eps: float = 1e-5, tile_f: int = 256
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused chain for ONE batch row.

    x [T, D] (T <= 8), ctx [N, 6, D] -> (y [T, D], new_ctx [N, 6, D]).
    Dispatches on the pack layout: bf16/f32 packs (`pack_stage`) or int4
    packs (`pack_stage_q`).
    """
    if "w1q" in packed:
        return _fused_block_chain_q(packed, x, ctx, eps=eps, tile_f=tile_f)
    n, _, d = packed["vecs"].shape
    f = packed["w1"].shape[2]
    t = x.shape[0]
    assert t <= 8
    t8 = 8
    tile_f = min(tile_f, f)
    nt = -(-f // tile_f)
    x_pad = jnp.pad(x, ((0, t8 - t), (0, 0)))
    ctx_pad = jnp.pad(ctx, ((0, 0), (0, 8 - CTX), (0, 0)))

    kernel = functools.partial(_kernel, t=t, d=d, tile_f=tile_f, eps=eps)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda ib, it: (ib, 0, 0)),
            pl.BlockSpec((1, 8, d), lambda ib, it: (ib, 0, 0)),
            pl.BlockSpec((1, d + 8, tile_f), lambda ib, it: (ib, 0, it)),
            pl.BlockSpec((1, tile_f, d), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec((1, 8, d), lambda ib, it: (ib, 0, 0)),
            pl.BlockSpec((t8, d), lambda ib, it: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((t8, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, 8, d), lambda ib, it: (ib, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t8, d), x.dtype),
            jax.ShapeDtypeStruct((n, 8, d), ctx.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((t8, d), jnp.float32),
            pltpu.VMEM((t8, d), jnp.float32),
            pltpu.VMEM((t8, d), jnp.float32),
            pltpu.VMEM((t8, d), jnp.float32),
        ],
    )(packed["vecs"], packed["mixw"], packed["w1"], packed["w2"], ctx_pad, x_pad)
    return y[:t], new_ctx[:, :CTX]


__all__ = ["pack_stage", "pack_stage_q", "fused_block_chain",
           "fused_block_chain_batched", "CTX"]

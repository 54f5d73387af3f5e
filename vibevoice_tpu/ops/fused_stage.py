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

Folded stage-transition convs (round 4): the decoder's stride-r transposed
"up" conv (k=2r, ref SConvTranspose1d modular_vibevoice_tokenizer.py:421-576)
and the encoder's strided "down" conv (ref SConv1d :258-418) that precede a
stage can run INSIDE the stage kernel as per-tap MXU matmuls (see
`_kernel_conv` — Mosaic cannot shape-cast the lane dim, so the natural
single-matmul forms don't lower), with the overlap-add tail / conv context
carried across tiles in an extra slot of the ctx tensors ([R, N+1, 8, D]),
streaming-identical to the `ops/conv.py` primitives.  This removes the
upsampled [B, T, D] HBM round trip and the overlap-add materializations at
every stage boundary — measured a +3.8% win at B=1 and a 10-17% LOSS at
B>=4 (the lane-padded per-tap work serializes in-kernel), so the Engine
auto-folds at B==1 only.

GELU uses the Abramowitz-Stegun rational erf (|err| < 1.5e-7; Mosaic has no
native erf lowering); other intra-stage arithmetic is fp32 — numerics match
the XLA path to bf16 rounding (parity-tested with tolerances in
tests/test_fused_stage.py).  Ref anchor: Block1D,
modular_vibevoice_tokenizer.py:620-684.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_blocks import CTX, _erf, pack_stage


@jax.tree_util.register_pytree_node_class
class ConvPack:
    """Folded transition-conv weights + static geometry.  A pytree whose
    leaves are the (w, b) arrays and whose aux data is the static shape info
    — so packs can ride inside jitted params trees."""

    def __init__(self, kind: str, w, b, s: int, k: int, cin: int):
        self.kind, self.w, self.b = kind, w, b
        self.s, self.k, self.cin = s, k, cin

    def tree_flatten(self):
        return (self.w, self.b), (self.kind, self.s, self.k, self.cin)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, s, k, cin = aux
        w, b = children
        return cls(kind, w, b, s, k, cin)


def _apply_blocks(vecs_ref, mixw_ref, w1_ref, w2_ref, carry, x,
                  *, n: int, tt: int, d: int, r: int, eps: float):
    """The N-Block1D chain on a VMEM-resident [R, Tt, D] activation."""
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
    return x


def _kernel(vecs_ref, mixw_ref, w1_ref, w2_ref, ctx_in_ref,
            x_ref, o_ref, ctx_out_ref, carry,
            *, n: int, tt: int, d: int, r: int, eps: float):
    it = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(it == 0)
    def _load_ctx():
        carry[:] = ctx_in_ref[:].astype(jnp.float32)  # [R, N, 8, D], rows 0..5 used

    x = x_ref[:].astype(jnp.float32)  # [R, Tt, D]
    x = _apply_blocks(vecs_ref, mixw_ref, w1_ref, w2_ref, carry, x,
                      n=n, tt=tt, d=d, r=r, eps=eps)
    o_ref[:] = x.astype(o_ref.dtype)

    @pl.when(it == nt - 1)
    def _emit_ctx():
        ctx_out_ref[:] = carry[:].astype(ctx_out_ref.dtype)


def _kernel_conv(vecs_ref, mixw_ref, w1_ref, w2_ref, cw_ref, cb_ref, ctx_in_ref,
                 x_ref, o_ref, ctx_out_ref, carry,
                 *, n: int, tt: int, d: int, r: int, eps: float,
                 kind: str, s: int, k: int, cin: int, ctxlen: int):
    """Stage kernel with the preceding transition conv folded in.

    kind="up": x_ref is the PRE-upsample [R, Tt//s, Din] tile.  The
    transposed conv (k=2s) runs as 2s per-tap matmuls ([R·Ti, Din] @
    [Din, D], one per (half-window, sub-sample)); sub-samples are
    interleaved by stacking along a fresh axis and collapsing SUBLANE dims
    only (Mosaic cannot shape-cast the lane dim), and the overlap-add tail
    (the second half-window of the last input row) carries across tiles in
    `carry` slot N — identical streaming semantics to
    causal_conv_transpose1d_streaming.

    kind="down": x_ref is the raw [R, Tt*s, Cin] input tile.  The strided
    conv runs as k per-tap matmuls over [carried ctx; tile] (ctxlen = k - s
    rows); tap outputs are summed at shifted offsets and the stride-s
    decimation is a sublane split + index — identical streaming semantics
    to causal_conv1d_streaming.
    """
    it = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(it == 0)
    def _load_ctx():
        carry[:] = ctx_in_ref[:].astype(jnp.float32)  # [R, N+1, 8, D]

    wdt = cw_ref.dtype
    xin = x_ref[:].astype(jnp.float32)
    if kind == "up":
        ti = tt // s
        x2 = xin.reshape(r * ti, cin).astype(wdt)
        ya, yb = [], []
        # taps: out[t = i·s + j] = xin[i] @ W[j] + xin[i-1] @ W[s+j]
        for j in range(s):
            a = jax.lax.dot_general(x2, cw_ref[j], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            bm = jax.lax.dot_general(x2, cw_ref[s + j], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ya.append(a.reshape(r, ti, 1, d))
            yb.append(bm.reshape(r, ti, 1, d))
        ya = jnp.concatenate(ya, axis=2)  # [R, Ti, s, D]
        yb = jnp.concatenate(yb, axis=2)
        tail = carry[:, n, :s, :][:, None]  # [R, 1, s, D]
        prev = (jnp.concatenate([tail, yb[:, :ti - 1]], axis=1)
                if ti > 1 else tail)
        carry[:, n, :s, :] = yb[:, ti - 1]
        x = (ya + prev).reshape(r, tt, d) + cb_ref[0][None, None, :]
    else:
        ctx = carry[:, n, :ctxlen, :cin]
        full = jnp.concatenate([ctx, xin], axis=1)  # [R, ctxlen + Tt*s, Cin]
        carry[:, n, :ctxlen, :cin] = full[:, full.shape[1] - ctxlen:]
        rows = tt * s
        f2 = full.reshape(r * (ctxlen + rows), cin).astype(wdt)
        z = None
        # out[t] = Σ_τ full[t·s + τ] @ W[τ]  -> per-tap matmul over all rows,
        # summed at shifted offsets, then stride-s decimation.  Taps with
        # τ > ctxlen overrun the row budget by τ - ctxlen; the overrun rows
        # only reach z[u] with u > rows - s, which the decimation never
        # reads, so they are padded with zeros.
        for tau in range(k):
            yt = jax.lax.dot_general(f2, cw_ref[tau], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            yt = yt.reshape(r, ctxlen + rows, d)[:, tau:tau + rows]
            short = rows - yt.shape[1]
            if short > 0:
                yt = jnp.concatenate(
                    [yt, jnp.zeros((r, short, d), jnp.float32)], axis=1)
            z = yt if z is None else z + yt
        if s > 1:
            z = z.reshape(r, tt, s, d)[:, :, 0]
        x = z + cb_ref[0][None, None, :]

    x = _apply_blocks(vecs_ref, mixw_ref, w1_ref, w2_ref, carry, x,
                      n=n, tt=tt, d=d, r=r, eps=eps)
    o_ref[:] = x.astype(o_ref.dtype)

    @pl.when(it == nt - 1)
    def _emit_ctx():
        ctx_out_ref[:] = carry[:].astype(ctx_out_ref.dtype)


def _tile(t: int, want: int = 400, mult: int = 1) -> int:
    """Largest tile <= want dividing t and divisible by `mult`.  `mult`
    encodes Mosaic's second-minor-dim constraint (blocks not equal to the
    full array dim must have their second-minor dim % 8 == 0): 8 for plain
    and down-conv stages, 8*s for folded up convs (the input block's
    second-minor is tt/s).  tt == t is always legal (full-array blocks)."""
    if t <= want:
        return t
    for tt in range(want, CTX, -1):
        if t % tt == 0 and tt % mult == 0:
            return tt
    return t


def _rows_per_step(bsz: int, tt: int, d: int, f: int,
                   extra_per_r: int = 0, budget: int = 8 * 1024 * 1024) -> int:
    """Largest divisor of B such that the fp32 FFN intermediate [R*Tt, F+]
    (plus `extra_per_r` bytes of folded-conv intermediates) stays inside
    `budget` — Mosaic's scoped-vmem stack is 16 MB and holds roughly 1.5-2x
    the live-tensor estimate, so budgets stay well under half of it."""
    best = 1
    for r in range(1, bsz + 1):
        if bsz % r:
            continue
        inter = r * (tt * max(f, d + 8) * 4 + extra_per_r)
        if inter <= budget and r <= 8:
            best = r
    return best


def pack_up_conv(up: dict, stride: int, dtype=jnp.float32) -> dict:
    """Transposed-conv pack: weight [Cin, K=2s, Cout] -> per-tap stack
    [K, Cin, Cout] (tap g·s+j maps input frame i to output sample
    (i+g)·s + j), bias -> [1, Cout]."""
    w = up["w"]
    if isinstance(w, dict):
        raise ValueError("folded transition conv expects plain weights")
    cin, k, cout = w.shape
    assert k == 2 * stride, "transposed conv folding expects k == 2*stride"
    b = up["b"] if up["b"] is not None else jnp.zeros((cout,))
    return ConvPack("up", jnp.transpose(w, (1, 0, 2)).astype(dtype),
                    b.reshape(1, cout).astype(dtype), stride, k, cin)


def pack_down_conv(dp: dict, stride: int, dtype=jnp.float32) -> dict:
    """Strided/causal-conv pack: weight kept as the per-tap stack
    [K, Cin, Cout], bias -> [1, Cout].  Supports k == 2·s (stride blocks)
    and s == 1 (shifted-tap sums, any k)."""
    w = dp["w"]
    if isinstance(w, dict):
        raise ValueError("folded transition conv expects plain weights")
    k, cin, cout = w.shape
    assert (stride == 1) or (k == 2 * stride), (
        "down-conv folding expects s == 1 or k == 2*stride")
    ctxlen = k - stride  # == causal_pad_amount(k, stride)
    assert 0 < ctxlen <= 8, "conv context must fit the ctx slot"
    b = dp["b"] if dp["b"] is not None else jnp.zeros((cout,))
    return ConvPack("down", w.astype(dtype),
                    b.reshape(1, cout).astype(dtype), stride, k, cin)


def fused_stage_chain(packed, x: jnp.ndarray, ctx: jnp.ndarray,
                      eps: float = 1e-5,
                      tile_want: int = 400,
                      conv_state: Optional[jnp.ndarray] = None):
    """Run one large-T stage for a batch.

    Without a folded conv: x [B, T, D] (T > 8, statically tiled), ctx
    [B, N, 6, D] per-block conv context -> (y [B, T, D], new_ctx).

    With packed["conv"] present, x is the PRE-transition tensor
    ([B, T//s, Din] for "up", [B, T·s, Cin] for "down") and `conv_state` the
    conv's streaming state rows ([B, s, D] transposed-conv tail / [B, k-s,
    Cin] conv buf) -> (y, new_ctx, new_conv_state).  `tile_want` sets the
    T-tile target (on-chip sweep: scripts/experiments/stage_tile_sweep.py).
    """
    conv = packed.get("conv") if isinstance(packed, dict) else None
    n = packed["vecs"].shape[0]
    f = packed["w1"].shape[2]
    if conv is None:
        bsz, t, d = x.shape
        tt = _tile(t, tile_want, mult=8)
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

    kind, s, k, cin = conv.kind, conv.s, conv.k, conv.cin
    d = packed["vecs"].shape[2]
    bsz = x.shape[0]
    t = x.shape[1] * s if kind == "up" else x.shape[1] // s
    tt = _tile(t, tile_want, mult=8 * s if kind == "up" else 8)
    assert t % tt == 0 and tt > CTX and (kind != "up" or tt % s == 0)
    nt = t // tt
    ctxlen = k - s

    # VMEM accounting: Mosaic pads the lane (last) dim to 128 and fp32
    # sublanes to 8, so small-D stages cost up to 4x their logical bytes
    def _lpad(x: int) -> int:
        return -(-x // 128) * 128

    d_eff, cin_eff, f_eff = _lpad(d), _lpad(cin), _lpad(max(f, d + 8))
    if kind == "up":
        # ya/yb/prev stacks + per-tap dot outputs + the input tile
        extra = (3 * tt * d_eff + 2 * s * (tt // s) * d_eff
                 + (tt // s) * cin_eff) * 4
    else:
        # full input + z/yt accumulators over the pre-decimation rows
        extra = ((ctxlen + tt * s) * cin_eff + 2 * tt * s * d_eff) * 4
    r = _rows_per_step(bsz, tt, d_eff, f_eff, extra_per_r=extra,
                       budget=24 * 1024 * 1024)

    # ctx slot N carries the conv streaming state (zero-padded to [8, D])
    ctx_pad = jnp.pad(ctx, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))
    cdim = d if kind == "up" else cin
    crows = s if kind == "up" else ctxlen
    cslot = jnp.pad(conv_state.astype(ctx.dtype),
                    ((0, 0), (0, 8 - crows), (0, d - cdim)))[:, None]
    ctx_pad = jnp.concatenate([ctx_pad, cslot], axis=1)  # [B, N+1, 8, D]

    if kind == "up":
        in_block = (r, tt // s, cin)
    else:
        in_block = (r, tt * s, cin)

    kernel = functools.partial(_kernel_conv, n=n, tt=tt, d=d, r=r, eps=eps,
                               kind=kind, s=s, k=k, cin=cin, ctxlen=ctxlen)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        # the conv intermediates exceed Mosaic's default 16 MB scoped-vmem
        # stack at large row groups; v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        grid=(bsz // r, nt),
        in_specs=[
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, d + 8, f), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, f, d), lambda b, i: (0, 0, 0)),
            pl.BlockSpec(conv.w.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(conv.b.shape, lambda b, i: (0, 0)),
            pl.BlockSpec((r, n + 1, 8, d), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec(in_block, lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((r, tt, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((r, n + 1, 8, d), lambda b, i: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
            jax.ShapeDtypeStruct((bsz, n + 1, 8, d), ctx.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((r, n + 1, 8, d), jnp.float32)],
    )(packed["vecs"], packed["mixw"], packed["w1"], packed["w2"],
      conv.w, conv.b, ctx_pad, x)
    new_conv_state = new_ctx[:, n, :crows, :cdim]
    return y, new_ctx[:, :n, :CTX], new_conv_state


__all__ = ["fused_stage_chain", "pack_stage", "pack_up_conv", "pack_down_conv",
           "ConvPack"]

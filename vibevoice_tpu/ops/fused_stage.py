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
    — so packs can ride inside jitted params trees.

    Weights are the per-tap stack [K, Cin, D]; the kernel runs K sequential
    dots.  (A lane-packed single-matmul layout — taps stacked into [Cin,
    K*D] + lane slices — was built and retired in r5: its sub-tile lane
    slices fail Mosaic lowering on the real chip, and the composed-B=8
    attribution caps ALL transition convs at 0.13 ms/batch-step, so there
    is no prize; see ROUND5_NOTES.md.)"""

    def __init__(self, kind: str, w, b, s: int, k: int, cin: int):
        self.kind, self.w, self.b = kind, w, b
        self.s, self.k, self.cin = s, k, cin

    def tree_flatten(self):
        return (self.w, self.b), (self.kind, self.s, self.k, self.cin)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, s, k, cin = aux[:4]
        w, b = children
        return cls(kind, w, b, s, k, cin)


@jax.tree_util.register_pytree_node_class
class HeadPack:
    """Folded final-RMSNorm + head-conv (D -> 1) epilogue weights for the
    LAST decoder stage (ref TokenizerDecoder tail, modular_vibevoice_tokenizer
    .py:948-951): `w` rows are [norm_w; tap_0..tap_{k-1}] ([k+1, D]), `b` the
    scalar conv bias ([1] or None, added OUTSIDE the kernel — XLA fuses it
    into the consumer and a VMEM scalar load stays off the Mosaic risk
    list)."""

    def __init__(self, w, b, k: int, has_norm: bool):
        self.w, self.b, self.k, self.has_norm = w, b, k, has_norm

    def tree_flatten(self):
        return (self.w, self.b), (self.k, self.has_norm)

    @classmethod
    def tree_unflatten(cls, aux, children):
        k, has_norm = aux
        w, b = children
        return cls(w, b, k, has_norm)


def pack_head(head: dict, final_norm_w, dtype=jnp.float32) -> HeadPack:
    """Pack the decoder tail for in-kernel folding.  Head conv weight
    [k, D, 1] with cout == 1 (waveform channels) and k - 1 <= 8 (context
    fits one ctx slot)."""
    w = head["w"]
    if isinstance(w, dict):
        raise ValueError("folded head expects plain weights")
    k, d, cout = w.shape
    assert cout == 1, "head folding requires a mono waveform head"
    assert 0 < k - 1 <= 8, "head conv context must fit the ctx slot"
    norm = (final_norm_w if final_norm_w is not None else jnp.ones((d,)))
    rows = jnp.concatenate([norm.astype(jnp.float32)[None],
                            w[:, :, 0].astype(jnp.float32)])  # [k+1, D]
    b = head["b"]
    return HeadPack(rows.astype(dtype),
                    None if b is None else b.reshape(1).astype(jnp.float32),
                    k, final_norm_w is not None)


def _apply_head(hw_ref, carry, x, *, slot: int, tt: int, hk: int,
                hnorm: bool, eps: float):
    """Fold the final RMSNorm + causal head conv (D -> 1, k taps as shifted
    FMAs + a lane reduction) onto the VMEM-resident stage output; the k-1
    post-norm context rows carry across tiles in ctx slot `slot`."""
    h = x
    if hnorm:
        h = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h = h * hw_ref[0][None, None, :]
    c = hk - 1
    hh = jnp.concatenate([carry[:, slot, :c], h], axis=1)  # [R, Tt+k-1, D]
    carry[:, slot, :c] = h[:, tt - c:]
    m = hh[:, 0:tt] * hw_ref[1][None, None, :]
    for tap in range(1, hk):
        m = m + hh[:, tap:tap + tt] * hw_ref[1 + tap][None, None, :]
    return jnp.sum(m, axis=-1, keepdims=True)  # [R, Tt, 1]


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


def _make_kernel(*, n: int, tt: int, d: int, r: int, eps: float,
                 conv=None, head=None):
    """Build the stage kernel with an optional folded transition-conv
    PROLOGUE and an optional folded norm+head EPILOGUE.

    conv=(kind, s, k, cin, ctxlen) folds the preceding transition conv:

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

    head=(hk, hnorm) folds the decoder tail (final RMSNorm + k-tap causal
    head conv D -> 1, `_apply_head`) so the LAST stage emits the waveform
    tile [R, Tt, 1] directly and the [B, T, D] stage output never
    round-trips HBM; the post-norm context rides in the last ctx slot.
    Ref slot order: vecs, mixw, w1, w2, [cw, cb,] [hw,] ctx_in, x.
    """
    def kernel(*refs):
        vecs_ref, mixw_ref, w1_ref, w2_ref = refs[:4]
        idx = 4
        if conv is not None:
            cw_ref, cb_ref = refs[idx:idx + 2]
            idx += 2
        if head is not None:
            hw_ref = refs[idx]
            idx += 1
        ctx_in_ref, x_ref, o_ref, ctx_out_ref, carry = refs[idx:idx + 5]

        it = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(it == 0)
        def _load_ctx():
            carry[:] = ctx_in_ref[:].astype(jnp.float32)  # [R, slots, 8, D]

        xin = x_ref[:].astype(jnp.float32)
        if conv is None:
            x = xin  # [R, Tt, D]
        else:
            kind, s, k, cin, ctxlen = conv
            wdt = cw_ref.dtype
            if kind == "up":
                ti = tt // s
                x2 = xin.reshape(r * ti, cin).astype(wdt)
                tap = []
                for j in range(k):
                    yj = jax.lax.dot_general(x2, cw_ref[j],
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                    tap.append(yj.reshape(r, ti, 1, d))
                # taps: out[t = i·s + j] = xin[i] @ W[j] + xin[i-1] @ W[s+j]
                ya = jnp.concatenate(tap[:s], axis=2)   # [R, Ti, s, D]
                yb = jnp.concatenate(tap[s:], axis=2)
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
                # out[t] = Σ_τ full[t·s + τ] @ W[τ]  -> per-tap matmul over
                # all rows, summed at shifted offsets, then stride-s
                # decimation.  Taps with τ > ctxlen overrun the row budget by
                # τ - ctxlen; the overrun rows only reach z[u] with
                # u > rows - s, which the decimation never reads, so they are
                # padded with zeros.
                for tau in range(k):
                    yt = jax.lax.dot_general(f2, cw_ref[tau],
                                             (((1,), (0,)), ((), ())),
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
        if head is None:
            o_ref[:] = x.astype(o_ref.dtype)
        else:
            hk, hnorm = head
            slot = n + (1 if conv is not None else 0)
            y = _apply_head(hw_ref, carry, x, slot=slot, tt=tt, hk=hk,
                            hnorm=hnorm, eps=eps)
            o_ref[:] = y.astype(o_ref.dtype)

        @pl.when(it == nt - 1)
        def _emit_ctx():
            ctx_out_ref[:] = carry[:].astype(ctx_out_ref.dtype)

    return kernel


def pack_stage_rowlane(blocks, r: int, dtype=jnp.float32):
    """Row-lane pack (round 5): R batch rows ride the LANE dim so the small-D
    stages run full 128-lane vectors.

    The r5 composed-B=8 attribution puts 1.07 ms/batch-step in the stage
    kernels against ~0.14 ms of MXU-roofline FLOPs — the kernels are
    VPU-bound, and at D=32/64 every [R, Tt, D] vector op pads D to 128
    lanes (up to 4x waste).  This layout keeps the activation as
    [Tt, R*D]: all elementwise/mixer work runs at full lanes; the RMSNorm's
    per-row mean-over-D becomes a matmul with a block-diagonal averaging
    matrix (each lane receives its group's mean); the FFN matmuls take
    block-diagonal weights kron(I_R, W) so rows stay independent.

    Fields: vecs/mixw as the plain pack but lane-tiled to [N, 8, R*D];
    w1 [N, R*D, R*F] / w2 [N, R*F, R*D] block-diagonal (bias NOT folded —
    at full lanes a plain add is cheap, b1 rides [N, 1, R*F]); avg
    [R*D, R*D] the block-diagonal ones/D."""
    base = pack_stage(blocks, dtype=dtype)
    n, _, d = base["vecs"].shape
    f = base["w1"].shape[2]
    eye = jnp.eye(r, dtype=dtype)
    w1w = base["w1"][:, :d]                       # [N, D, F] weight rows
    b1 = base["w1"][:, d]                         # [N, F] bias row
    w1_rl = jax.vmap(lambda w: jnp.kron(eye, w))(w1w)        # [N, RD, RF]
    w2_rl = jax.vmap(lambda w: jnp.kron(eye, w))(base["w2"])  # [N, RF, RD]
    tile = lambda v: jnp.tile(v, (1, 1, r))       # [N, 8, D] -> [N, 8, RD]
    avg = jnp.kron(jnp.eye(r, dtype=jnp.float32),
                   jnp.full((d, d), 1.0 / d, jnp.float32))
    # no static ints in the dict: the pack rides jitted params trees where
    # plain ints become traced leaves — rows/d are derived from shapes
    return {"vecs": tile(base["vecs"]), "mixw": tile(base["mixw"]),
            "w1": w1_rl, "b1": jnp.tile(b1[:, None, :], (1, 1, r)),
            "w2": w2_rl, "avg": avg}


def _make_kernel_rowlane(*, n: int, tt: int, rd: int, eps: float):
    """Stage kernel on the row-lane layout: x [Tt, RD], full-lane VPU ops,
    group means via the avg matmul, block-diagonal FFN matmuls."""
    def kernel(vecs_ref, mixw_ref, w1_ref, b1_ref, w2_ref, avg_ref,
               ctx_in_ref, x_ref, o_ref, ctx_out_ref, carry):
        it = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(it == 0)
        def _load_ctx():
            carry[:] = ctx_in_ref[0].astype(jnp.float32)  # [N, 8, RD]

        wdt = w1_ref.dtype
        x = x_ref[0].astype(jnp.float32)  # [Tt, RD]
        for b in range(n):
            norm_w = vecs_ref[b, 0]
            mixer_b = vecs_ref[b, 1]
            gamma = vecs_ref[b, 2]
            ffn_norm_w = vecs_ref[b, 3]
            ffn_gamma = vecs_ref[b, 4]
            ffn2_b = vecs_ref[b, 5]

            # fp32 RMSNorm: each lane gets its row-group's mean via the
            # block-diagonal avg matmul (ones/D per group)
            m = jax.lax.dot_general(x * x, avg_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            h = x * jax.lax.rsqrt(m + eps) * norm_w[None, :]
            hh = jnp.concatenate([carry[b, :CTX], h], axis=0)  # [Tt+6, RD]
            carry[b, :CTX] = h[tt - CTX:]
            mix = jnp.broadcast_to(mixer_b[None, :], (tt, rd))
            for k in range(7):
                mix = mix + hh[k:k + tt] * mixw_ref[b, k][None, :]
            x = x + gamma[None, :] * mix

            m2 = jax.lax.dot_general(x * x, avg_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            hn = x * jax.lax.rsqrt(m2 + eps) * ffn_norm_w[None, :]
            a = jax.lax.dot_general(hn.astype(wdt), w1_ref[b],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = a + b1_ref[b, 0][None, :]
            a = 0.5 * a * (1.0 + _erf(a * 0.7071067811865476))
            y = jax.lax.dot_general(a.astype(wdt), w2_ref[b],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            x = x + ffn_gamma[None, :] * (y + ffn2_b[None, :])

        o_ref[0] = x.astype(o_ref.dtype)

        @pl.when(it == nt - 1)
        def _emit_ctx():
            ctx_out_ref[0] = carry[:].astype(ctx_out_ref.dtype)

    return kernel


def rowlane_rows(d: int, bsz: int) -> int:
    """Largest row-group <= 128/D lanes that divides the batch (1 = layout
    not applicable)."""
    cap = max(1, 128 // d)
    for r in range(min(cap, bsz), 0, -1):
        if bsz % r == 0:
            return r
    return 1


def _fused_stage_chain_rowlane(packed, x, ctx, eps, tile_want):
    rl = packed["rowlane"]
    d = packed["vecs"].shape[2]
    rd = rl["vecs"].shape[2]
    r = rd // d
    n = rl["vecs"].shape[0]
    bsz, t, _ = x.shape
    g = bsz // r
    tt = _tile(t, tile_want, mult=8)
    assert t % tt == 0 and tt > CTX
    nt = t // tt

    # host-side layout transform: rows -> lane groups ([B,T,D] -> [G,T,RD]);
    # XLA fuses these relayouts with the surrounding HBM reads/writes
    xr = x.reshape(g, r, t, d).transpose(0, 2, 1, 3).reshape(g, t, rd)
    cr = (ctx.reshape(g, r, n, CTX, d).transpose(0, 2, 3, 1, 4)
          .reshape(g, n, CTX, d * r))
    cr = jnp.pad(cr, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))

    kernel = _make_kernel_rowlane(n=n, tt=tt, rd=rd, eps=eps)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(g, nt),
        in_specs=[
            pl.BlockSpec((n, 8, rd), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, 8, rd), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, rd, rl["w1"].shape[2]), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, 1, rl["b1"].shape[2]), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((n, rl["w2"].shape[1], rd), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((rd, rd), lambda b, i: (0, 0)),
            pl.BlockSpec((1, n, 8, rd), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, tt, rd), lambda b, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, rd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n, 8, rd), lambda b, i: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, t, rd), x.dtype),
            jax.ShapeDtypeStruct((g, n, 8, rd), ctx.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n, 8, rd), jnp.float32)],
    )(rl["vecs"], rl["mixw"], rl["w1"], rl["b1"], rl["w2"], rl["avg"], cr, xr)

    yo = y.reshape(g, t, r, d).transpose(0, 2, 1, 3).reshape(bsz, t, d)
    co = (new_ctx[:, :, :CTX].reshape(g, n, CTX, r, d).transpose(0, 3, 1, 2, 4)
          .reshape(bsz, n, CTX, d))
    return yo, co


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
                      conv_state: Optional[jnp.ndarray] = None,
                      head_state: Optional[jnp.ndarray] = None):
    """Run one large-T stage for a batch.

    Without folds: x [B, T, D] (T > 8, statically tiled), ctx [B, N, 6, D]
    per-block conv context -> (y [B, T, D], new_ctx).

    With packed["conv"] present, x is the PRE-transition tensor
    ([B, T//s, Din] for "up", [B, T·s, Cin] for "down") and `conv_state` the
    conv's streaming state rows ([B, s, D] transposed-conv tail / [B, k-s,
    Cin] conv buf); `new_conv_state` is appended to the returns.

    With packed["head"] present (a HeadPack — the decoder tail folded onto
    the LAST stage), `head_state` is the head conv's [B, hk-1, D] post-norm
    context, y becomes the waveform [B, T, 1], and `new_head_state` is
    appended last.  `tile_want` sets the T-tile target (on-chip sweep:
    scripts/experiments/stage_tile_sweep.py).
    """
    conv = packed.get("conv") if isinstance(packed, dict) else None
    hp = packed.get("head") if isinstance(packed, dict) else None
    # row-lane layout (round 5): taken when packed and the batch divides its
    # row group — covers the no-fold batch path only (folds are B=1 modes).
    # The row count is static from shapes (RD / D).
    if (isinstance(packed, dict) and "rowlane" in packed and conv is None
            and hp is None):
        rl_r = packed["rowlane"]["vecs"].shape[2] // packed["vecs"].shape[2]
        if rl_r > 1 and x.shape[0] % rl_r == 0:
            return _fused_stage_chain_rowlane(packed, x, ctx, eps, tile_want)
    n = packed["vecs"].shape[0]
    d = packed["vecs"].shape[2]
    f = packed["w1"].shape[2]
    bsz = x.shape[0]
    if conv is None:
        t = x.shape[1]
        tt = _tile(t, tile_want, mult=8)
    else:
        t = x.shape[1] * conv.s if conv.kind == "up" else x.shape[1] // conv.s
        tt = _tile(t, tile_want, mult=8 * conv.s if conv.kind == "up" else 8)
    assert t % tt == 0 and tt > CTX
    assert conv is None or conv.kind != "up" or tt % conv.s == 0
    assert hp is None or tt > hp.k - 1
    nt = t // tt

    # VMEM accounting: Mosaic pads the lane (last) dim to 128 and fp32
    # sublanes to 8, so small-D stages cost up to 4x their logical bytes
    def _lpad(v: int) -> int:
        return -(-v // 128) * 128

    d_eff, f_eff = _lpad(d), _lpad(max(f, d + 8))
    extra = 0
    if conv is not None:
        cin_eff = _lpad(conv.cin)
        ctxlen = conv.k - conv.s
        if conv.kind == "up":
            # ya/yb/prev stacks + per-tap dot outputs + the input tile
            extra += (3 * tt * d_eff + 2 * conv.s * (tt // conv.s) * d_eff
                      + (tt // conv.s) * cin_eff) * 4
        else:
            # full input + z/yt accumulators over the pre-decimation rows
            extra += ((ctxlen + tt * conv.s) * cin_eff
                      + 2 * tt * conv.s * d_eff) * 4
    if hp is not None:
        extra += 2 * tt * d_eff * 4  # post-norm window + tap accumulator
    if conv is None and hp is None:
        r = _rows_per_step(bsz, tt, d, f)
    else:
        r = _rows_per_step(bsz, tt, d_eff, f_eff, extra_per_r=extra,
                           budget=24 * 1024 * 1024)

    # ctx slots after the N block contexts: [conv state][head context],
    # each zero-padded to [8, D]
    nslots = n + (1 if conv is not None else 0) + (1 if hp is not None else 0)
    parts = [jnp.pad(ctx, ((0, 0), (0, 0), (0, 8 - CTX), (0, 0)))]
    if conv is not None:
        cdim = d if conv.kind == "up" else conv.cin
        crows = conv.s if conv.kind == "up" else conv.k - conv.s
        parts.append(jnp.pad(conv_state.astype(ctx.dtype),
                             ((0, 0), (0, 8 - crows), (0, d - cdim)))[:, None])
    if hp is not None:
        hc = hp.k - 1
        parts.append(jnp.pad(head_state.astype(ctx.dtype),
                             ((0, 0), (0, 8 - hc), (0, 0)))[:, None])
    ctx_full = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    in_specs = [
        pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((n, 8, d), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((n, d + 8, f), lambda b, i: (0, 0, 0)),
        pl.BlockSpec((n, f, d), lambda b, i: (0, 0, 0)),
    ]
    inputs = [packed["vecs"], packed["mixw"], packed["w1"], packed["w2"]]
    if conv is not None:
        in_specs += [pl.BlockSpec(conv.w.shape, lambda b, i: (0, 0, 0)),
                     pl.BlockSpec(conv.b.shape, lambda b, i: (0, 0))]
        inputs += [conv.w, conv.b]
    if hp is not None:
        in_specs.append(pl.BlockSpec(hp.w.shape, lambda b, i: (0, 0)))
        inputs.append(hp.w)
    in_specs.append(pl.BlockSpec((r, nslots, 8, d), lambda b, i: (b, 0, 0, 0)))
    inputs.append(ctx_full)
    if conv is None:
        in_block = (r, tt, d)
    elif conv.kind == "up":
        in_block = (r, tt // conv.s, conv.cin)
    else:
        in_block = (r, tt * conv.s, conv.cin)
    in_specs.append(pl.BlockSpec(in_block, lambda b, i: (b, i, 0)))
    inputs.append(x)

    od = 1 if hp is not None else d
    kernel = _make_kernel(
        n=n, tt=tt, d=d, r=r, eps=eps,
        conv=None if conv is None else (conv.kind, conv.s, conv.k, conv.cin,
                                        conv.k - conv.s),
        head=None if hp is None else (hp.k, hp.has_norm))
    # the folded-conv/head intermediates exceed Mosaic's default 16 MB
    # scoped-vmem stack at large row groups; v5e VMEM is 128 MB
    compiler_params = (pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
                       if (conv is not None or hp is not None) else None)
    y, new_ctx = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        compiler_params=compiler_params,
        grid=(bsz // r, nt),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((r, tt, od), lambda b, i: (b, i, 0)),
            pl.BlockSpec((r, nslots, 8, d), lambda b, i: (b, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, t, od), x.dtype),
            jax.ShapeDtypeStruct((bsz, nslots, 8, d), ctx.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((r, nslots, 8, d), jnp.float32)],
    )(*inputs)

    if hp is not None and hp.b is not None:
        y = y + hp.b.astype(y.dtype)
    out = (y, new_ctx[:, :n, :CTX])
    slot = n
    if conv is not None:
        out += (new_ctx[:, slot, :crows, :cdim],)
        slot += 1
    if hp is not None:
        out += (new_ctx[:, slot, :hp.k - 1, :],)
    return out


__all__ = ["fused_stage_chain", "pack_stage", "pack_stage_rowlane",
           "rowlane_rows", "pack_up_conv", "pack_down_conv",
           "pack_head", "ConvPack", "HeadPack"]

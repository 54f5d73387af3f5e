"""Fused int4 diffusion-head solver-step kernel.

The adaLN head (ref modular_vibevoice_diffusion_head.py:191-280) runs once
per solver step — `ddpm_steps` (5 in production) times per generated frame —
and each run re-reads every layer's gate/up/down FFN weights (~85 MB int8 at
1.5B: 4 layers x 3 x [1536, 4608]).  The composed-config attribution
(scripts/experiments/composed_ablation.py, r4) puts the LM+diffusion limb at
63% of the B=8 batch step; the 5x head re-read (~0.6 ms/frame at int8) is
its second-largest bandwidth term after the LM weights.

Per-matmul int4 GEMV kernels were measured a wash here (~0.1 ms/step of
dispatch vs ~43 MB/step saved — utils/quantize.quantize_model docstring).
This kernel removes the dispatch side of that trade the same way the σ-VAE
chain kernel did (ops/fused_blocks._kernel_q): ONE pallas_call per solver
step walks grid (layer, ffn_tile), the running activation x [N, H] stays in
VMEM scratch across all grid steps, and only nibble-packed int4 weight tiles
stream from HBM (dequantized in-VMEM by the hardware bitcast).  The adaLN
modulations are precomputed outside the solver scan
(diffusion_head.precompute_modulations) and arrive per step as [L, N, 3H];
the norm/residual/SwiGLU arithmetic is fp32 in-kernel.

Quantizing the head DOES touch the output latent (the docstring above keeps
int8 as the default for that reason) — this path is OPT-IN
(quantize_diffusion="int4k") and gated by the quality harness like int4k for
the tokenizer stacks.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_head_solver_q(head_params: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """int4 pack of the per-solver-step FFN weights (gate/up/down) + the
    per-layer norm weights.  Build from the ORIGINAL (unquantized) head."""
    from .int4_matmul import quantize_int4
    layers = head_params["layers"]
    if any(isinstance(lp["gate"], dict) or "gateup" in lp for lp in layers):
        raise ValueError("pack_head_solver_q needs the original (unquantized) "
                         "diffusion-head weights")
    n = len(layers)
    h = layers[0]["norm_w"].shape[0]
    f = layers[0]["gate"].shape[1]
    norms = jnp.zeros((n, 8, h), jnp.float32)
    wgq = jnp.zeros((n, h // 2, f), jnp.int8)
    sg = jnp.zeros((n, 1, f), jnp.float32)
    wuq = jnp.zeros((n, h // 2, f), jnp.int8)
    su = jnp.zeros((n, 1, f), jnp.float32)
    wdq = jnp.zeros((n, f // 2, h), jnp.int8)
    sd = jnp.zeros((n, 1, h), jnp.float32)
    for i, lp in enumerate(layers):
        norms = norms.at[i, 0].set(lp["norm_w"].astype(jnp.float32))
        qg = quantize_int4(lp["gate"])
        wgq = wgq.at[i].set(qg["qint4"])
        sg = sg.at[i, 0].set(qg["scale4"][0])
        qu = quantize_int4(lp["up"])
        wuq = wuq.at[i].set(qu["qint4"])
        su = su.at[i, 0].set(qu["scale4"][0])
        qd = quantize_int4(lp["down"])
        wdq = wdq.at[i].set(qd["qint4"])
        sd = sd.at[i, 0].set(qd["scale4"][0])
    return {"norms": norms, "wgq": wgq, "sg": sg, "wuq": wuq, "su": su,
            "wdq": wdq, "sd": sd}


def _kernel(norms_ref, wgq_ref, sg_ref, wuq_ref, su_ref, wdq_ref, sd_ref,
            mods_ref, fmod_ref, fl_ref, x_ref, o_ref,
            x_s, h_s, acc_s,
            *, h: int, eps: float):
    """Grid (layer, ffn_tile).  x_s carries the residual stream across all
    grid steps; h_s the modulated post-norm input; acc_s the down-proj
    accumulator (per-channel int4 scale applied once at layer end)."""
    il = pl.program_id(0)
    it = pl.program_id(1)
    nl = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(jnp.logical_and(il == 0, it == 0))
    def _load_x():
        x_s[:] = x_ref[:].astype(jnp.float32)

    @pl.when(it == 0)
    def _modulate():
        x = x_s[:]
        shift = mods_ref[0, :, 0:h].astype(jnp.float32)
        scale = mods_ref[0, :, h:2 * h].astype(jnp.float32)
        norm_w = norms_ref[0, 0]
        xn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        h_s[:] = (xn * norm_w[None, :]) * (1.0 + scale) + shift
        acc_s[:] = jnp.zeros_like(acc_s)

    # FFN tile: silu(hn @ deq(wg)) * (hn @ deq(wu)) @ deq(wd), accumulated
    hn = h_s[:]
    wg = pltpu.bitcast(wgq_ref[0], jnp.int4).astype(jnp.float32)  # [H, tf]
    g = jax.lax.dot_general(hn, wg, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g * sg_ref[0, 0][None, :]
    wu = pltpu.bitcast(wuq_ref[0], jnp.int4).astype(jnp.float32)
    u = jax.lax.dot_general(hn, wu, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = u * su_ref[0, 0][None, :]
    a = (g / (1.0 + jnp.exp(-g))) * u  # silu(g) * u
    wd = pltpu.bitcast(wdq_ref[0], jnp.int4).astype(jnp.float32)  # [tf, H]
    acc_s[:] = acc_s[:] + jax.lax.dot_general(
        a, wd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(it == nt - 1)
    def _residual():
        gate = mods_ref[0, :, 2 * h:3 * h].astype(jnp.float32)
        x_s[:] = x_s[:] + gate * (acc_s[:] * sd_ref[0, 0][None, :])

        @pl.when(il == nl - 1)
        def _final():
            x = x_s[:]
            fshift = fmod_ref[:, 0:h].astype(jnp.float32)
            fscale = fmod_ref[:, h:2 * h].astype(jnp.float32)
            xn = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
            xn = xn * (1.0 + fscale) + fshift
            v = jax.lax.dot_general(xn, fl_ref[:].astype(jnp.float32),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[:] = v.astype(o_ref.dtype)


def fused_head_solver_step(pack: Dict[str, jnp.ndarray], x: jnp.ndarray,
                           layer_mods: jnp.ndarray, final_mod: jnp.ndarray,
                           final_linear: jnp.ndarray, eps: float,
                           tile_f: int = 512) -> jnp.ndarray:
    """One denoise step: x [N, H] (post noisy_proj), layer_mods [L, N, 3H]
    (this step's precomputed adaLN modulations), final_mod [N, 2H],
    final_linear [H, latent] -> v-prediction [N, latent].

    Matches diffusion_head.apply_with_modulations up to int4 weight
    quantization + fp32-vs-bf16 intra-step rounding."""
    n, h = x.shape
    nl = pack["norms"].shape[0]
    f = pack["wgq"].shape[2]
    lat = final_linear.shape[1]
    # tile_f must be even (the wdq BlockSpec below tiles at tile_f // 2) and
    # divide F — enforce both even for caller-passed tiles that divide F
    assert f % 2 == 0, f"fused head requires an even FFN dim, got {f}"
    if f % tile_f or tile_f % 2:  # largest even divisor of F at or under target
        tile_f = next(tf for tf in range(min(tile_f, f), 0, -1)
                      if f % tf == 0 and tf % 2 == 0)
    nt = f // tile_f
    n8 = -(-n // 8) * 8  # pad rows to the fp32 sublane quantum
    if n8 != n:
        x = jnp.pad(x, ((0, n8 - n), (0, 0)))
        layer_mods = jnp.pad(layer_mods, ((0, 0), (0, n8 - n), (0, 0)))
        final_mod = jnp.pad(final_mod, ((0, n8 - n), (0, 0)))

    kernel = functools.partial(_kernel, h=h, eps=eps)
    v = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(nl, nt),
        in_specs=[
            pl.BlockSpec((1, 8, h), lambda il, it: (il, 0, 0)),
            pl.BlockSpec((1, h // 2, tile_f), lambda il, it: (il, 0, it)),
            pl.BlockSpec((1, 1, tile_f), lambda il, it: (il, 0, it)),
            pl.BlockSpec((1, h // 2, tile_f), lambda il, it: (il, 0, it)),
            pl.BlockSpec((1, 1, tile_f), lambda il, it: (il, 0, it)),
            pl.BlockSpec((1, tile_f // 2, h), lambda il, it: (il, it, 0)),
            pl.BlockSpec((1, 1, h), lambda il, it: (il, 0, 0)),
            pl.BlockSpec((1, n8, 3 * h), lambda il, it: (il, 0, 0)),
            pl.BlockSpec((n8, 2 * h), lambda il, it: (0, 0)),
            pl.BlockSpec((h, lat), lambda il, it: (0, 0)),
            pl.BlockSpec((n8, h), lambda il, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n8, lat), lambda il, it: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n8, lat), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n8, h), jnp.float32),
            pltpu.VMEM((n8, h), jnp.float32),
            pltpu.VMEM((n8, h), jnp.float32),
        ],
    )(pack["norms"], pack["wgq"], pack["sg"], pack["wuq"], pack["su"],
      pack["wdq"], pack["sd"], layer_mods, final_mod, final_linear, x)
    return v[:n]


__all__ = ["pack_head_solver_q", "fused_head_solver_step"]

"""Functional DPM-Solver(++) multistep scheduler for JAX.

Numerics match the reference's vendored diffusers fork
(`vibevoice/schedule/dpm_solver.py:122-1065`) including the extra `cosine`
beta schedule (:51-83, :239-245), but the stateful class is re-designed as:

  * `SolverConfig`      — static hashable config
  * `make_tables`       — fp32 alpha/sigma tables precomputed once (host)
  * `set_timesteps`     — inference schedule: int timesteps + sigma ladder
  * `step`              — pure function `(state, model_output, sample) -> ...`
                          indexed by the scan counter, so an entire sampling
                          trajectory is ONE `jax.lax.scan` (no Python loop,
                          no mutable `self.model_outputs` — the history is a
                          stacked array carried through the scan).

fp32 islands follow the reference: `step` upcasts the sample to float32
(:992-993) and casts the result back.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SolverConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "cosine"          # linear | scaled_linear | cosine | squaredcos_cap_v2 | cauchy | laplace
    prediction_type: str = "v_prediction"  # epsilon | sample | v_prediction
    algorithm_type: str = "dpmsolver++"    # dpmsolver++ | sde-dpmsolver++
    solver_order: int = 2
    solver_type: str = "midpoint"
    lower_order_final: bool = True
    euler_at_final: bool = False
    final_sigmas_type: str = "zero"        # zero | sigma_min
    timestep_spacing: str = "linspace"
    lambda_min_clipped: float = -float("inf")


def _betas_for_alpha_bar(n: int, kind: str, max_beta: float = 0.999) -> np.ndarray:
    """ref betas_for_alpha_bar :35-83."""
    if kind == "cosine":
        def ab(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    elif kind == "exp":
        def ab(t):
            return math.exp(t * -12.0)
    elif kind == "cauchy":
        def ab(t, gamma=1, mu=3):
            snr = mu + gamma * math.tan(math.pi * (0.5 - t) * 0.9)
            return 1 - 1 / (math.exp(snr) + 1.1)
    elif kind == "laplace":
        def ab(t, mu=0, b=1):
            snr = mu - b * math.copysign(1, 0.5 - t) * math.log(1 - 2 * abs(t - 0.5) * 0.98)
            return 1 - 1 / (math.exp(snr) + 1.02)
    else:
        raise ValueError(kind)
    betas = [min(1 - ab((i + 1) / n) / ab(i / n), max_beta) for i in range(n)]
    return np.array(betas, dtype=np.float32)


class SolverTables(NamedTuple):
    alphas_cumprod: np.ndarray  # [T] fp32
    alpha_t: np.ndarray         # sqrt(alphas_cumprod)
    sigma_t: np.ndarray         # sqrt(1 - alphas_cumprod)
    lambda_t: np.ndarray        # log(alpha) - log(sigma)
    sigmas_train: np.ndarray    # ((1-ac)/ac)**0.5


def make_tables(cfg: SolverConfig) -> SolverTables:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float32)
    elif cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n, dtype=np.float32) ** 2
    elif cfg.beta_schedule in ("cosine", "squaredcos_cap_v2"):
        betas = _betas_for_alpha_bar(n, "cosine")
    elif cfg.beta_schedule in ("cauchy", "laplace"):
        betas = _betas_for_alpha_bar(n, cfg.beta_schedule)
    else:
        raise NotImplementedError(cfg.beta_schedule)
    # torch.cumprod accumulates in extended precision; f64 cumprod rounded to
    # f32 reproduces it bit-exactly (np's f32 cumprod does not)
    alphas_cumprod = np.cumprod((1.0 - betas).astype(np.float64)).astype(np.float32)
    alpha_t = np.sqrt(alphas_cumprod).astype(np.float32)
    sigma_t = np.sqrt(np.float32(1.0) - alphas_cumprod).astype(np.float32)
    lambda_t = (np.log(alpha_t) - np.log(sigma_t)).astype(np.float32)
    sigmas_train = (((np.float32(1.0) - alphas_cumprod) / alphas_cumprod) ** 0.5).astype(np.float32)
    return SolverTables(alphas_cumprod, alpha_t, sigma_t, lambda_t, sigmas_train)


class Schedule(NamedTuple):
    """Inference-time schedule (device arrays; shapes static per step count)."""
    timesteps: jnp.ndarray  # [N] int32 train-timestep indices, descending
    sigmas: jnp.ndarray     # [N+1] fp32 sigma ladder (last entry 0 for 'zero')
    num_steps: int


def set_timesteps(cfg: SolverConfig, tables: SolverTables, num_inference_steps: int) -> Schedule:
    """ref set_timesteps :321-423 ('linspace' spacing path)."""
    if math.isinf(cfg.lambda_min_clipped):
        last_timestep = cfg.num_train_timesteps
    else:
        flipped = tables.lambda_t[::-1]
        clipped_idx = int(np.searchsorted(flipped, cfg.lambda_min_clipped))
        last_timestep = cfg.num_train_timesteps - clipped_idx

    if cfg.timestep_spacing == "linspace":
        timesteps = (
            np.linspace(0, last_timestep - 1, num_inference_steps + 1)
            .round()[::-1][:-1].copy().astype(np.int64)
        )
    elif cfg.timestep_spacing == "trailing":
        step_ratio = cfg.num_train_timesteps / num_inference_steps
        timesteps = np.arange(last_timestep, 0, -step_ratio).round().astype(np.int64) - 1
    else:
        raise NotImplementedError(cfg.timestep_spacing)

    sigmas_full = np.asarray(tables.sigmas_train, dtype=np.float64)
    sigmas = np.interp(timesteps, np.arange(len(sigmas_full)), sigmas_full)
    if cfg.final_sigmas_type == "sigma_min":
        sigma_last = float(((1 - tables.alphas_cumprod[0]) / tables.alphas_cumprod[0]) ** 0.5)
    else:
        sigma_last = 0.0
    sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
    return Schedule(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        sigmas=jnp.asarray(sigmas),
        num_steps=len(timesteps),
    )


class SolverState(NamedTuple):
    """Carried through `lax.scan` over inference steps."""
    history: jnp.ndarray         # [order, *sample_shape] converted model outputs
    lower_order_nums: jnp.ndarray  # scalar int32


def init_state(cfg: SolverConfig, sample_shape: Tuple[int, ...], dtype=jnp.float32) -> SolverState:
    # history always fp32 (solver math runs in an fp32 island, ref :992-993)
    del dtype
    return SolverState(
        history=jnp.zeros((cfg.solver_order,) + tuple(sample_shape), jnp.float32),
        lower_order_nums=jnp.zeros((), jnp.int32),
    )


def _alpha_sigma(sigma):
    alpha_t = 1.0 / (sigma ** 2 + 1.0) ** 0.5
    return alpha_t, sigma * alpha_t


def convert_model_output(cfg: SolverConfig, sigma, model_output, sample):
    """ref convert_model_output :528-594 (dpmsolver++ family -> x0 prediction)."""
    alpha_t, sigma_t = _alpha_sigma(sigma)
    if cfg.prediction_type == "epsilon":
        return (sample - sigma_t * model_output) / alpha_t
    if cfg.prediction_type == "sample":
        return model_output
    if cfg.prediction_type == "v_prediction":
        return alpha_t * sample - sigma_t * model_output
    raise ValueError(cfg.prediction_type)


def step(
    cfg: SolverConfig,
    sched: Schedule,
    i: jnp.ndarray,
    state: SolverState,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, SolverState]:
    """One solver step at scan counter `i` (ref step :935-1022).

    Both first- and second-order updates are evaluated and selected with
    `jnp.where` — they are tiny elementwise ops on the 64-dim latent, far
    cheaper than a `lax.cond` round-trip.
    """
    assert cfg.solver_order in (1, 2), "orders 1-2 supported (reference default is 2)"
    n = sched.num_steps
    x0 = convert_model_output(cfg, sched.sigmas[i], model_output, sample)

    # shift history (kept in fp32)
    x0f = x0.astype(jnp.float32)
    if cfg.solver_order == 1:
        history = state.history.at[0].set(x0f)
    else:
        history = jnp.stack([state.history[-1], x0f]) if cfg.solver_order == 2 else None

    sample32 = sample.astype(jnp.float32)
    x0_32 = x0.astype(jnp.float32)

    sigma_t_raw = sched.sigmas[i + 1]
    sigma_s0_raw = sched.sigmas[i]
    alpha_t, sigma_t = _alpha_sigma(sigma_t_raw)
    alpha_s0, sigma_s0 = _alpha_sigma(sigma_s0_raw)
    lam_t = jnp.log(alpha_t) - jnp.log(sigma_t)
    lam_s0 = jnp.log(alpha_s0) - jnp.log(sigma_s0)
    h = lam_t - lam_s0

    if cfg.algorithm_type == "dpmsolver++":
        first = (sigma_t / sigma_s0) * sample32 - (alpha_t * (jnp.exp(-h) - 1.0)) * x0_32
    elif cfg.algorithm_type == "sde-dpmsolver++":
        assert noise is not None, "sde-dpmsolver++ needs per-step noise"
        first = (
            (sigma_t / sigma_s0 * jnp.exp(-h)) * sample32
            + (alpha_t * (1 - jnp.exp(-2.0 * h))) * x0_32
            + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise.astype(jnp.float32)
        )
    else:
        raise NotImplementedError(cfg.algorithm_type)

    if cfg.solver_order == 2:
        sigma_s1_raw = sched.sigmas[jnp.maximum(i - 1, 0)]
        alpha_s1, sigma_s1 = _alpha_sigma(sigma_s1_raw)
        lam_s1 = jnp.log(alpha_s1) - jnp.log(sigma_s1)
        h_0 = lam_s0 - lam_s1
        r0 = h_0 / h
        m0 = x0_32
        m1 = history[0].astype(jnp.float32)
        d0 = m0
        d1 = (1.0 / r0) * (m0 - m1)
        if cfg.algorithm_type == "dpmsolver++":
            if cfg.solver_type == "midpoint":
                second = (
                    (sigma_t / sigma_s0) * sample32
                    - (alpha_t * (jnp.exp(-h) - 1.0)) * d0
                    - 0.5 * (alpha_t * (jnp.exp(-h) - 1.0)) * d1
                )
            else:  # heun
                second = (
                    (sigma_t / sigma_s0) * sample32
                    - (alpha_t * (jnp.exp(-h) - 1.0)) * d0
                    + (alpha_t * ((jnp.exp(-h) - 1.0) / h + 1.0)) * d1
                )
        else:  # sde-dpmsolver++
            if cfg.solver_type == "midpoint":
                second = (
                    (sigma_t / sigma_s0 * jnp.exp(-h)) * sample32
                    + (alpha_t * (1 - jnp.exp(-2.0 * h))) * d0
                    + 0.5 * (alpha_t * (1 - jnp.exp(-2.0 * h))) * d1
                    + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise.astype(jnp.float32)
                )
            else:
                second = (
                    (sigma_t / sigma_s0 * jnp.exp(-h)) * sample32
                    + (alpha_t * (1 - jnp.exp(-2.0 * h))) * d0
                    + (alpha_t * ((1.0 - jnp.exp(-2.0 * h)) / (-2.0 * h) + 1.0)) * d1
                    + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise.astype(jnp.float32)
                )

        # order selection (ref :977-1008)
        lower_order_final = jnp.logical_and(
            i == n - 1,
            cfg.euler_at_final or (cfg.lower_order_final and n < 15) or cfg.final_sigmas_type == "zero",
        )
        use_first = jnp.logical_or(state.lower_order_nums < 1, lower_order_final)
        prev = jnp.where(use_first, first, second)
    else:
        prev = first

    new_lon = jnp.minimum(state.lower_order_nums + 1, cfg.solver_order)
    return prev.astype(model_output.dtype), SolverState(history=history, lower_order_nums=new_lon)


def add_noise(tables: SolverTables, original: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """ref add_noise :1024-1044."""
    a = jnp.asarray(tables.alpha_t, original.dtype)[timesteps]
    s = jnp.asarray(tables.sigma_t, original.dtype)[timesteps]
    shape = timesteps.shape + (1,) * (original.ndim - timesteps.ndim)
    return a.reshape(shape) * original + s.reshape(shape) * noise


def get_velocity(tables: SolverTables, original: jnp.ndarray, noise: jnp.ndarray,
                 timesteps: jnp.ndarray) -> jnp.ndarray:
    """ref get_velocity :1046-1062."""
    a = jnp.asarray(tables.alpha_t, original.dtype)[timesteps]
    s = jnp.asarray(tables.sigma_t, original.dtype)[timesteps]
    shape = timesteps.shape + (1,) * (original.ndim - timesteps.ndim)
    return a.reshape(shape) * noise - s.reshape(shape) * original


__all__ = [
    "SolverConfig",
    "SolverTables",
    "Schedule",
    "SolverState",
    "make_tables",
    "set_timesteps",
    "init_state",
    "step",
    "convert_model_output",
    "add_noise",
    "get_velocity",
]

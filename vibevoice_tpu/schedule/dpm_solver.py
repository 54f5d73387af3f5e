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

Full surface parity with the reference fork:
  * algorithms: dpmsolver++ / sde-dpmsolver++ (data prediction) and
    dpmsolver / sde-dpmsolver (noise prediction) — ref :596-625, :640-694
  * solver orders 1-3 (third-order multistep, ref :819-933; the reference
    implements no sde third order, mirrored here as a config-time error)
  * timestep spacing: linspace / leading (+steps_offset) / trailing
    (ref :357-381)
  * karras / lu-lambdas sigma schedules (ref :490-526) with the
    interpolating `_sigma_to_t` inverse (ref :441-463)
  * `rescale_betas_zero_snr` (ref rescale_zero_terminal_snr :87-120, applied
    at :249-258 with the 2**-24 terminal alphas_cumprod patch)

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

_ALGORITHMS = ("dpmsolver++", "sde-dpmsolver++", "dpmsolver", "sde-dpmsolver")


@dataclass(frozen=True)
class SolverConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "cosine"          # linear | scaled_linear | cosine | squaredcos_cap_v2 | cauchy | laplace
    prediction_type: str = "v_prediction"  # epsilon | sample | v_prediction
    algorithm_type: str = "dpmsolver++"    # dpmsolver++ | sde-dpmsolver++ | dpmsolver | sde-dpmsolver
    solver_order: int = 2
    solver_type: str = "midpoint"
    lower_order_final: bool = True
    euler_at_final: bool = False
    final_sigmas_type: str = "zero"        # zero | sigma_min
    timestep_spacing: str = "linspace"     # linspace | leading | trailing
    steps_offset: int = 0
    lambda_min_clipped: float = -float("inf")
    use_karras_sigmas: bool = False
    use_lu_lambdas: bool = False
    rescale_betas_zero_snr: bool = False
    # pre-trained beta table (ref dpm_solver.py:139,209,232-233); a tuple so
    # the config stays hashable (closed over by jit)
    trained_betas: Optional[Tuple[float, ...]] = None
    # dynamic thresholding of the x0 prediction (ref :148-154,212-215,:425-457)
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0

    def __post_init__(self):
        if self.algorithm_type not in _ALGORITHMS:
            raise ValueError(f"unknown algorithm_type {self.algorithm_type}")
        if self.solver_order not in (1, 2, 3):
            raise ValueError("solver_order must be 1, 2 or 3")
        if self.solver_order == 3 and self.algorithm_type.startswith("sde"):
            # the reference implements no sde third-order update (:819-933
            # covers dpmsolver++/dpmsolver only)
            raise NotImplementedError("third order is not defined for sde solvers")
        if self.use_karras_sigmas and self.use_lu_lambdas:
            raise ValueError("choose at most one of karras / lu sigma schedules")
        if self.algorithm_type in ("dpmsolver", "sde-dpmsolver") and self.final_sigmas_type == "zero":
            # noise-prediction solvers divide by sigma; a zero final sigma is
            # rejected by the reference too (ref :280-284)
            raise ValueError(
                f"final_sigmas_type 'zero' is not supported for {self.algorithm_type}; "
                "use 'sigma_min'")

    @property
    def data_prediction(self) -> bool:
        return self.algorithm_type in ("dpmsolver++", "sde-dpmsolver++")

    @property
    def is_sde(self) -> bool:
        return self.algorithm_type.startswith("sde")


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


def _rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """ref rescale_zero_terminal_snr :87-120 (arXiv 2305.08891 alg. 1).

    Shifts sqrt(alphas_cumprod) so the terminal value is exactly zero, then
    rescales so the first value is unchanged; betas are recovered from the
    adjusted cumprod.  Math in float64, rounded to fp32 like torch fp32 ops.
    """
    alphas = 1.0 - betas.astype(np.float64)
    ac = np.cumprod(alphas)
    abs_sqrt = np.sqrt(ac)
    a0, aT = abs_sqrt[0], abs_sqrt[-1]
    abs_sqrt = (abs_sqrt - aT) * (a0 / (a0 - aT))
    ab = abs_sqrt ** 2
    alphas = np.concatenate([ab[:1], ab[1:] / ab[:-1]])
    return (1.0 - alphas).astype(np.float32)


class SolverTables(NamedTuple):
    alphas_cumprod: np.ndarray  # [T] fp32
    alpha_t: np.ndarray         # sqrt(alphas_cumprod)
    sigma_t: np.ndarray         # sqrt(1 - alphas_cumprod)
    lambda_t: np.ndarray        # log(alpha) - log(sigma)
    sigmas_train: np.ndarray    # ((1-ac)/ac)**0.5


def make_tables(cfg: SolverConfig) -> SolverTables:
    n = cfg.num_train_timesteps
    if cfg.trained_betas is not None:
        betas = np.asarray(cfg.trained_betas, dtype=np.float32)
        if betas.shape != (n,):
            raise ValueError(
                f"trained_betas must have length num_train_timesteps={n}, "
                f"got {betas.shape}")
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float32)
    elif cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n, dtype=np.float32) ** 2
    elif cfg.beta_schedule in ("cosine", "squaredcos_cap_v2"):
        betas = _betas_for_alpha_bar(n, "cosine")
    elif cfg.beta_schedule in ("cauchy", "laplace"):
        betas = _betas_for_alpha_bar(n, cfg.beta_schedule)
    else:
        raise NotImplementedError(cfg.beta_schedule)
    if cfg.rescale_betas_zero_snr:
        betas = _rescale_zero_terminal_snr(betas)
    # torch.cumprod accumulates in extended precision; f64 cumprod rounded to
    # f32 reproduces it bit-exactly (np's f32 cumprod does not)
    alphas_cumprod = np.cumprod((1.0 - betas).astype(np.float64)).astype(np.float32)
    if cfg.rescale_betas_zero_snr:
        # "close to 0 without being 0 so first sigma is not inf" (ref :255-258)
        alphas_cumprod[-1] = 2.0 ** -24
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


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Fractional train-timestep for each sigma by piecewise-log-linear
    inversion of the training sigma table (ref _sigma_to_t :441-463)."""
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, np.newaxis]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return ((1 - w) * low_idx + w * high_idx).reshape(sigma.shape)


def set_timesteps(cfg: SolverConfig, tables: SolverTables, num_inference_steps: int) -> Schedule:
    """ref set_timesteps :321-423."""
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
    elif cfg.timestep_spacing == "leading":
        step_ratio = last_timestep // (num_inference_steps + 1)
        timesteps = (
            (np.arange(0, num_inference_steps + 1) * step_ratio)
            .round()[::-1][:-1].copy().astype(np.int64)
        )
        timesteps += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        step_ratio = cfg.num_train_timesteps / num_inference_steps
        timesteps = np.arange(last_timestep, 0, -step_ratio).round().astype(np.int64) - 1
    else:
        raise NotImplementedError(cfg.timestep_spacing)

    sigmas_full = np.asarray(tables.sigmas_train, dtype=np.float64)
    # the reference takes log in float32 (np.log of the fp32 sigma table);
    # mirroring that keeps _sigma_to_t's rounding decisions identical
    log_sigmas = np.log(np.asarray(tables.sigmas_train, dtype=np.float32))
    if cfg.use_karras_sigmas:
        # Karras et al. (2022) rho-7 ramp between the training range extremes
        # (ref _convert_to_karras :490-510)
        in_sigmas = np.flip(np.asarray(tables.sigmas_train, dtype=np.float32))
        sigma_min, sigma_max = float(in_sigmas[-1]), float(in_sigmas[0])
        rho = 7.0
        ramp = np.linspace(0, 1, num_inference_steps)
        sigmas = (sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
        timesteps = _sigma_to_t(sigmas, log_sigmas).round()
    elif cfg.use_lu_lambdas:
        # Lu et al. (2022) uniform-log-sigma ramp (ref _convert_to_lu :512-524;
        # rho=1 so the ramp is linear in log sigma)
        in_lambdas = np.flip(log_sigmas)
        lmin, lmax = float(in_lambdas[-1]), float(in_lambdas[0])
        lambdas = lmax + np.linspace(0, 1, num_inference_steps) * (lmin - lmax)
        sigmas = np.exp(lambdas)
        timesteps = _sigma_to_t(sigmas, log_sigmas).round()
    else:
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


def _threshold_sample(cfg: SolverConfig, sample):
    """Dynamic thresholding of the x0 prediction (ref _threshold_sample
    :425-457, arXiv 2205.11487): clamp each sample to its
    `dynamic_thresholding_ratio` absolute-value percentile s (clipped to
    [1, sample_max_value]) and divide by s."""
    shape = sample.shape
    flat = sample.astype(jnp.float32).reshape(shape[0], -1)
    s = jnp.quantile(jnp.abs(flat), cfg.dynamic_thresholding_ratio, axis=1)
    s = jnp.clip(s, 1.0, cfg.sample_max_value)[:, None]
    out = jnp.clip(flat, -s, s) / s
    return out.reshape(shape).astype(sample.dtype)


def convert_model_output(cfg: SolverConfig, sigma, model_output, sample):
    """ref convert_model_output :528-625.

    Data-prediction solvers (++) convert to an x0 prediction; noise-prediction
    solvers (dpmsolver / sde-dpmsolver) convert to an epsilon prediction.
    With `thresholding`, the x0 prediction is dynamically thresholded
    (ref :591-592 for ++, :618-622 round-trip for noise solvers).
    """
    alpha_t, sigma_t = _alpha_sigma(sigma)
    if cfg.data_prediction:
        if cfg.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif cfg.prediction_type == "sample":
            x0 = model_output
        elif cfg.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        else:
            raise ValueError(cfg.prediction_type)
        if cfg.thresholding:
            x0 = _threshold_sample(cfg, x0)
        return x0
    if cfg.prediction_type == "epsilon":
        epsilon = model_output
    elif cfg.prediction_type == "sample":
        epsilon = (sample - alpha_t * model_output) / sigma_t
    elif cfg.prediction_type == "v_prediction":
        epsilon = alpha_t * model_output + sigma_t * sample
    else:
        raise ValueError(cfg.prediction_type)
    if cfg.thresholding:
        x0 = (sample - sigma_t * epsilon) / alpha_t
        x0 = _threshold_sample(cfg, x0)
        epsilon = (sample - alpha_t * x0) / sigma_t
    return epsilon


def _first_order(cfg, coef, m0, sample, noise):
    """ref dpm_solver_first_order_update :627-694."""
    alpha_t, sigma_t, alpha_s0, sigma_s0, h = (
        coef["alpha_t"], coef["sigma_t"], coef["alpha_s0"], coef["sigma_s0"], coef["h"])
    if cfg.algorithm_type == "dpmsolver++":
        return (sigma_t / sigma_s0) * sample - (alpha_t * (jnp.exp(-h) - 1.0)) * m0
    if cfg.algorithm_type == "dpmsolver":
        return (alpha_t / alpha_s0) * sample - (sigma_t * (jnp.exp(h) - 1.0)) * m0
    if cfg.algorithm_type == "sde-dpmsolver++":
        return (
            (sigma_t / sigma_s0 * jnp.exp(-h)) * sample
            + (alpha_t * (1 - jnp.exp(-2.0 * h))) * m0
            + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise
        )
    # sde-dpmsolver
    return (
        (alpha_t / alpha_s0) * sample
        - 2.0 * (sigma_t * (jnp.exp(h) - 1.0)) * m0
        + sigma_t * jnp.sqrt(jnp.exp(2 * h) - 1.0) * noise
    )


def _second_order(cfg, coef, m0, m1, sample, noise):
    """ref multistep_dpm_solver_second_order_update :696-817."""
    alpha_t, sigma_t, alpha_s0, sigma_s0, h = (
        coef["alpha_t"], coef["sigma_t"], coef["alpha_s0"], coef["sigma_s0"], coef["h"])
    h_0 = coef["h_0"]
    r0 = h_0 / h
    d0, d1 = m0, (1.0 / r0) * (m0 - m1)
    mid = cfg.solver_type == "midpoint"
    if cfg.algorithm_type == "dpmsolver++":
        if mid:
            return ((sigma_t / sigma_s0) * sample
                    - (alpha_t * (jnp.exp(-h) - 1.0)) * d0
                    - 0.5 * (alpha_t * (jnp.exp(-h) - 1.0)) * d1)
        return ((sigma_t / sigma_s0) * sample
                - (alpha_t * (jnp.exp(-h) - 1.0)) * d0
                + (alpha_t * ((jnp.exp(-h) - 1.0) / h + 1.0)) * d1)
    if cfg.algorithm_type == "dpmsolver":
        if mid:
            return ((alpha_t / alpha_s0) * sample
                    - (sigma_t * (jnp.exp(h) - 1.0)) * d0
                    - 0.5 * (sigma_t * (jnp.exp(h) - 1.0)) * d1)
        return ((alpha_t / alpha_s0) * sample
                - (sigma_t * (jnp.exp(h) - 1.0)) * d0
                - (sigma_t * ((jnp.exp(h) - 1.0) / h - 1.0)) * d1)
    if cfg.algorithm_type == "sde-dpmsolver++":
        sde_noise = sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise
        if mid:
            return ((sigma_t / sigma_s0 * jnp.exp(-h)) * sample
                    + (alpha_t * (1 - jnp.exp(-2.0 * h))) * d0
                    + 0.5 * (alpha_t * (1 - jnp.exp(-2.0 * h))) * d1
                    + sde_noise)
        return ((sigma_t / sigma_s0 * jnp.exp(-h)) * sample
                + (alpha_t * (1 - jnp.exp(-2.0 * h))) * d0
                + (alpha_t * ((1.0 - jnp.exp(-2.0 * h)) / (-2.0 * h) + 1.0)) * d1
                + sde_noise)
    # sde-dpmsolver
    sde_noise = sigma_t * jnp.sqrt(jnp.exp(2 * h) - 1.0) * noise
    if mid:
        return ((alpha_t / alpha_s0) * sample
                - 2.0 * (sigma_t * (jnp.exp(h) - 1.0)) * d0
                - (sigma_t * (jnp.exp(h) - 1.0)) * d1
                + sde_noise)
    return ((alpha_t / alpha_s0) * sample
            - 2.0 * (sigma_t * (jnp.exp(h) - 1.0)) * d0
            - 2.0 * (sigma_t * ((jnp.exp(h) - 1.0) / h - 1.0)) * d1
            + sde_noise)


def _third_order(cfg, coef, m0, m1, m2, sample):
    """ref multistep_dpm_solver_third_order_update :819-933."""
    alpha_t, sigma_t, alpha_s0, sigma_s0, h = (
        coef["alpha_t"], coef["sigma_t"], coef["alpha_s0"], coef["sigma_s0"], coef["h"])
    h_0, h_1 = coef["h_0"], coef["h_1"]
    r0, r1 = h_0 / h, h_1 / h
    d0 = m0
    d1_0, d1_1 = (1.0 / r0) * (m0 - m1), (1.0 / r1) * (m1 - m2)
    d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
    d2 = (1.0 / (r0 + r1)) * (d1_0 - d1_1)
    if cfg.algorithm_type == "dpmsolver++":
        return (
            (sigma_t / sigma_s0) * sample
            - (alpha_t * (jnp.exp(-h) - 1.0)) * d0
            + (alpha_t * ((jnp.exp(-h) - 1.0) / h + 1.0)) * d1
            - (alpha_t * ((jnp.exp(-h) - 1.0 + h) / h ** 2 - 0.5)) * d2
        )
    # dpmsolver (sde third order is rejected at config time)
    return (
        (alpha_t / alpha_s0) * sample
        - (sigma_t * (jnp.exp(h) - 1.0)) * d0
        - (sigma_t * ((jnp.exp(h) - 1.0) / h - 1.0)) * d1
        - (sigma_t * ((jnp.exp(h) - 1.0 - h) / h ** 2 - 0.5)) * d2
    )


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

    All orders are evaluated and selected with `jnp.where` — they are tiny
    elementwise ops on the 64-dim latent, far cheaper than a `lax.cond`
    round-trip.  The order-selection chain mirrors the reference
    (:988-1013): first order while warming up or at the stabilized final
    step, second order next (or at the second-to-last step of short
    schedules), third order only once two history entries are live.
    """
    n = sched.num_steps
    converted = convert_model_output(cfg, sched.sigmas[i], model_output, sample)

    # shift history (kept in fp32): history[-1] = current, history[-2] = prev
    x0f = converted.astype(jnp.float32)
    history = jnp.concatenate([state.history[1:], x0f[None]], axis=0)

    sample32 = sample.astype(jnp.float32)
    m0 = x0f
    if cfg.is_sde:
        assert noise is not None, f"{cfg.algorithm_type} needs per-step noise"
        noise = noise.astype(jnp.float32)

    sigma_t_raw = sched.sigmas[i + 1]
    sigma_s0_raw = sched.sigmas[i]
    alpha_t, sigma_t = _alpha_sigma(sigma_t_raw)
    alpha_s0, sigma_s0 = _alpha_sigma(sigma_s0_raw)
    lam_t = jnp.log(alpha_t) - jnp.log(sigma_t)
    lam_s0 = jnp.log(alpha_s0) - jnp.log(sigma_s0)
    coef = {"alpha_t": alpha_t, "sigma_t": sigma_t,
            "alpha_s0": alpha_s0, "sigma_s0": sigma_s0,
            "h": lam_t - lam_s0}

    prev = _first_order(cfg, coef, m0, sample32, noise)

    if cfg.solver_order >= 2:
        alpha_s1, sigma_s1 = _alpha_sigma(sched.sigmas[jnp.maximum(i - 1, 0)])
        lam_s1 = jnp.log(alpha_s1) - jnp.log(sigma_s1)
        coef["h_0"] = lam_s0 - lam_s1
        m1 = history[-2].astype(jnp.float32)
        second = _second_order(cfg, coef, m0, m1, sample32, noise)

        lower_order_final = jnp.logical_and(
            i == n - 1,
            cfg.euler_at_final or (cfg.lower_order_final and n < 15) or cfg.final_sigmas_type == "zero",
        )
        use_first = jnp.logical_or(state.lower_order_nums < 1, lower_order_final)

        if cfg.solver_order == 2:
            prev = jnp.where(use_first, prev, second)
        else:
            alpha_s2, sigma_s2 = _alpha_sigma(sched.sigmas[jnp.maximum(i - 2, 0)])
            lam_s2 = jnp.log(alpha_s2) - jnp.log(sigma_s2)
            coef["h_1"] = lam_s1 - lam_s2
            m2 = history[-3].astype(jnp.float32)
            third = _third_order(cfg, coef, m0, m1, m2, sample32)
            lower_order_second = jnp.logical_and(
                i == n - 2, cfg.lower_order_final and n < 15)
            use_second = jnp.logical_or(state.lower_order_nums < 2, lower_order_second)
            prev = jnp.where(use_first, prev, jnp.where(use_second, second, third))

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

"""Trajectory parity: functional DPM-Solver vs the reference's vendored class."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.schedule import dpm_solver as ds

torch = pytest.importorskip("torch")


def _ref_scheduler(reference_path, **kw):
    from vibevoice.schedule.dpm_solver import DPMSolverMultistepScheduler
    return DPMSolverMultistepScheduler(**kw)


@pytest.mark.parametrize("schedule", ["cosine", "linear"])
def test_tables_match(reference_path, schedule):
    ref = _ref_scheduler(reference_path, num_train_timesteps=1000, beta_schedule=schedule,
                         prediction_type="v_prediction")
    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule=schedule,
                          prediction_type="v_prediction")
    tab = ds.make_tables(cfg)
    # fp32 cumprod accumulates ~1e-6 relative drift vs torch's sequential cumprod
    np.testing.assert_allclose(tab.alphas_cumprod, ref.alphas_cumprod.numpy(), rtol=1e-5)
    np.testing.assert_allclose(tab.alpha_t, ref.alpha_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(tab.sigma_t, ref.sigma_t.numpy(), rtol=1e-5)


@pytest.mark.parametrize("steps", [5, 10, 20])
def test_timesteps_and_sigmas_match(reference_path, steps):
    ref = _ref_scheduler(reference_path, num_train_timesteps=1000, beta_schedule="cosine",
                         prediction_type="v_prediction")
    ref.set_timesteps(steps)
    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="cosine",
                          prediction_type="v_prediction")
    sched = ds.set_timesteps(cfg, ds.make_tables(cfg), steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ref.timesteps.numpy())
    np.testing.assert_allclose(np.asarray(sched.sigmas), ref.sigmas.numpy(), rtol=1e-6)


@pytest.mark.parametrize("steps,pred", [(5, "v_prediction"), (10, "v_prediction"), (20, "epsilon")])
def test_trajectory_matches(reference_path, steps, pred):
    """Feed identical pseudo model outputs through both steppers."""
    torch.manual_seed(0)
    ref = _ref_scheduler(reference_path, num_train_timesteps=1000, beta_schedule="cosine",
                         prediction_type=pred)
    ref.set_timesteps(steps)

    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="cosine", prediction_type=pred)
    tab = ds.make_tables(cfg)
    sched = ds.set_timesteps(cfg, tab, steps)

    x_ref = torch.randn(3, 64)
    x = jnp.asarray(x_ref.numpy())
    outs = [torch.randn(3, 64) for _ in range(steps)]

    state = ds.init_state(cfg, x.shape)
    for i, t in enumerate(ref.timesteps):
        x_ref = ref.step(outs[i], t, x_ref).prev_sample
        x, state = ds.step(cfg, sched, jnp.int32(i), state, jnp.asarray(outs[i].numpy()), x)
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=2e-5, rtol=1e-5)


def test_sde_trajectory_matches(reference_path):
    """sde-dpmsolver++ path (gradio_demo.py:114-118) with injected noise."""
    torch.manual_seed(1)
    steps = 5
    ref = _ref_scheduler(reference_path, num_train_timesteps=1000,
                         beta_schedule="squaredcos_cap_v2", prediction_type="v_prediction",
                         algorithm_type="sde-dpmsolver++")
    ref.set_timesteps(steps)
    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="squaredcos_cap_v2",
                          prediction_type="v_prediction", algorithm_type="sde-dpmsolver++")
    sched = ds.set_timesteps(cfg, ds.make_tables(cfg), steps)

    x_ref = torch.randn(2, 64)
    x = jnp.asarray(x_ref.numpy())
    state = ds.init_state(cfg, x.shape)
    for i, t in enumerate(ref.timesteps):
        out = torch.randn(2, 64)
        noise = torch.randn(2, 64)
        x_ref = ref.step(out, t, x_ref, variance_noise=noise).prev_sample
        x, state = ds.step(cfg, sched, jnp.int32(i), state,
                           jnp.asarray(out.numpy()), x, noise=jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# full scheduler-surface parity (VERDICT round-1 item 5): solver order 3,
# non-++ dpmsolver/sde-dpmsolver, karras/lu sigmas, rescale_zero_terminal_snr,
# leading spacing, heun, sigma_min finals — trajectories vs the reference fork
# ---------------------------------------------------------------------------

def _run_pair(ref_kwargs, cfg_kwargs, steps, sde, seed=3, batch=2):
    torch.manual_seed(seed)
    ref = _ref_scheduler(None, num_train_timesteps=1000, **ref_kwargs)
    ref.set_timesteps(steps)
    cfg = ds.SolverConfig(num_train_timesteps=1000, **cfg_kwargs)
    sched = ds.set_timesteps(cfg, ds.make_tables(cfg), steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ref.timesteps.numpy())
    np.testing.assert_allclose(np.asarray(sched.sigmas), ref.sigmas.numpy(),
                               rtol=2e-5, atol=1e-7)

    x_ref = torch.randn(batch, 64)
    x = jnp.asarray(x_ref.numpy())
    state = ds.init_state(cfg, x.shape)
    for i, t in enumerate(ref.timesteps):
        out = torch.randn(batch, 64)
        noise = torch.randn(batch, 64) if sde else None
        x_ref = ref.step(out, t, x_ref,
                         variance_noise=noise).prev_sample
        x, state = ds.step(cfg, sched, jnp.int32(i), state,
                           jnp.asarray(out.numpy()), x,
                           noise=None if noise is None else jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=5e-5, rtol=1e-4)


SURFACE_CASES = [
    # (name, scheduler kwargs, steps)
    ("dpmsolver-o1", dict(algorithm_type="dpmsolver", solver_order=1, final_sigmas_type="sigma_min",
                          prediction_type="epsilon", beta_schedule="linear"), 10),
    ("dpmsolver-o2", dict(algorithm_type="dpmsolver", solver_order=2, final_sigmas_type="sigma_min",
                          prediction_type="v_prediction", beta_schedule="cosine"), 10),
    ("dpmsolver-o2-heun", dict(algorithm_type="dpmsolver", solver_order=2, solver_type="heun", final_sigmas_type="sigma_min",
                               prediction_type="epsilon", beta_schedule="scaled_linear"), 12),
    ("dpmsolver-o3", dict(algorithm_type="dpmsolver", solver_order=3, final_sigmas_type="sigma_min",
                          prediction_type="epsilon", beta_schedule="linear"), 20),
    ("dpmsolver++-o3", dict(algorithm_type="dpmsolver++", solver_order=3,
                            prediction_type="v_prediction", beta_schedule="cosine"), 20),
    ("dpmsolver++-heun", dict(algorithm_type="dpmsolver++", solver_order=2, solver_type="heun",
                              prediction_type="v_prediction", beta_schedule="cosine"), 10),
    ("dpmsolver++-sample-pred", dict(algorithm_type="dpmsolver++", solver_order=2,
                                     prediction_type="sample", beta_schedule="cosine"), 10),
    ("dpmsolver-sample-pred", dict(algorithm_type="dpmsolver", solver_order=2, final_sigmas_type="sigma_min",
                                   prediction_type="sample", beta_schedule="cosine"), 10),
    ("leading", dict(algorithm_type="dpmsolver++", solver_order=2, steps_offset=1,
                     prediction_type="v_prediction", beta_schedule="cosine",
                     timestep_spacing="leading"), 10),
    ("trailing", dict(algorithm_type="dpmsolver++", solver_order=2,
                      prediction_type="v_prediction", beta_schedule="cosine",
                      timestep_spacing="trailing"), 10),
    ("karras", dict(algorithm_type="dpmsolver++", solver_order=2,
                    prediction_type="epsilon", beta_schedule="linear",
                    use_karras_sigmas=True), 10),
    ("lu-lambdas", dict(algorithm_type="dpmsolver++", solver_order=2,
                        prediction_type="epsilon", beta_schedule="linear",
                        use_lu_lambdas=True), 10),
    ("zero-snr", dict(algorithm_type="dpmsolver++", solver_order=2,
                      prediction_type="v_prediction", beta_schedule="linear",
                      rescale_betas_zero_snr=True), 10),
    ("sigma-min-final", dict(algorithm_type="dpmsolver++", solver_order=2,
                             prediction_type="v_prediction", beta_schedule="cosine",
                             final_sigmas_type="sigma_min"), 10),
    ("euler-at-final", dict(algorithm_type="dpmsolver++", solver_order=2,
                            prediction_type="v_prediction", beta_schedule="cosine",
                            euler_at_final=True), 10),
    ("long-schedule-o2", dict(algorithm_type="dpmsolver++", solver_order=2,
                              prediction_type="v_prediction", beta_schedule="cosine"), 25),
    ("cauchy-beta", dict(algorithm_type="dpmsolver++", solver_order=2,
                         prediction_type="v_prediction", beta_schedule="cauchy"), 10),
    ("laplace-beta", dict(algorithm_type="dpmsolver++", solver_order=2,
                          prediction_type="v_prediction", beta_schedule="laplace"), 10),
]


@pytest.mark.parametrize("name,kw,steps", SURFACE_CASES,
                         ids=[c[0] for c in SURFACE_CASES])
def test_surface_trajectory_parity(reference_path, name, kw, steps):
    _run_pair(kw, kw, steps, sde=False)


SDE_CASES = [
    ("sde-dpmsolver-o1", dict(algorithm_type="sde-dpmsolver", solver_order=1, final_sigmas_type="sigma_min",
                              prediction_type="epsilon", beta_schedule="linear"), 10),
    ("sde-dpmsolver-o2", dict(algorithm_type="sde-dpmsolver", solver_order=2, final_sigmas_type="sigma_min",
                              prediction_type="v_prediction", beta_schedule="cosine"), 10),
    ("sde-dpmsolver-o2-heun", dict(algorithm_type="sde-dpmsolver", solver_order=2, final_sigmas_type="sigma_min",
                                   solver_type="heun", prediction_type="epsilon",
                                   beta_schedule="linear"), 10),
    ("sde-dpmsolver++-heun", dict(algorithm_type="sde-dpmsolver++", solver_order=2,
                                  solver_type="heun", prediction_type="v_prediction",
                                  beta_schedule="squaredcos_cap_v2"), 8),
    ("sde-dpmsolver++-o1", dict(algorithm_type="sde-dpmsolver++", solver_order=1,
                                prediction_type="v_prediction", beta_schedule="cosine"), 10),
]


@pytest.mark.parametrize("name,kw,steps", SDE_CASES, ids=[c[0] for c in SDE_CASES])
def test_sde_surface_trajectory_parity(reference_path, name, kw, steps):
    _run_pair(kw, kw, steps, sde=True)


def test_sde_third_order_rejected():
    with pytest.raises(NotImplementedError):
        ds.SolverConfig(algorithm_type="sde-dpmsolver++", solver_order=3)


def test_add_noise_and_velocity(reference_path):
    torch.manual_seed(2)
    ref = _ref_scheduler(reference_path, num_train_timesteps=1000, beta_schedule="cosine",
                         prediction_type="v_prediction")
    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="cosine",
                          prediction_type="v_prediction")
    tab = ds.make_tables(cfg)
    x = torch.randn(7, 64)
    n = torch.randn(7, 64)
    t = torch.randint(0, 1000, (7,))
    np.testing.assert_allclose(
        np.asarray(ds.add_noise(tab, jnp.asarray(x.numpy()), jnp.asarray(n.numpy()),
                                jnp.asarray(t.numpy()))),
        ref.add_noise(x, n, t).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ds.get_velocity(tab, jnp.asarray(x.numpy()), jnp.asarray(n.numpy()),
                                   jnp.asarray(t.numpy()))),
        ref.get_velocity(x, n, t).numpy(), atol=1e-6)


def test_trained_betas_trajectory_matches(reference_path):
    """trained_betas surface (ref dpm_solver.py:139,209,232-233): a custom
    beta table replaces the schedule formula end to end."""
    torch.manual_seed(3)
    steps = 8
    n = 1000
    rng = np.random.default_rng(0)
    betas = np.sort(rng.uniform(1e-4, 0.02, n)).astype(np.float32)
    ref = _ref_scheduler(reference_path, num_train_timesteps=n,
                         trained_betas=betas, prediction_type="v_prediction")
    ref.set_timesteps(steps)
    cfg = ds.SolverConfig(num_train_timesteps=n, prediction_type="v_prediction",
                          trained_betas=tuple(float(b) for b in betas))
    tab = ds.make_tables(cfg)
    np.testing.assert_allclose(tab.alphas_cumprod, ref.alphas_cumprod.numpy(), rtol=1e-5)
    sched = ds.set_timesteps(cfg, tab, steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ref.timesteps.numpy())

    x_ref = torch.randn(2, 64)
    x = jnp.asarray(x_ref.numpy())
    outs = [torch.randn(2, 64) for _ in range(steps)]
    state = ds.init_state(cfg, x.shape)
    for i, t in enumerate(ref.timesteps):
        x_ref = ref.step(outs[i], t, x_ref).prev_sample
        x, state = ds.step(cfg, sched, jnp.int32(i), state, jnp.asarray(outs[i].numpy()), x)
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("algorithm", ["dpmsolver++", "dpmsolver"])
def test_thresholding_trajectory_matches(reference_path, algorithm):
    """Dynamic thresholding surface (ref :148-154,212-215,:425-457): clamp
    the x0 prediction to its 0.995 abs percentile each step.  Outputs are
    scaled up so the threshold actually activates (s > 1)."""
    torch.manual_seed(4)
    steps = 6
    kw = dict(num_train_timesteps=1000, beta_schedule="cosine",
              prediction_type="epsilon", thresholding=True,
              dynamic_thresholding_ratio=0.9, sample_max_value=1.5)
    if algorithm == "dpmsolver":
        kw["algorithm_type"] = "dpmsolver"
        kw["final_sigmas_type"] = "sigma_min"
    ref = _ref_scheduler(reference_path, **kw)
    ref.set_timesteps(steps)
    cfg = ds.SolverConfig(num_train_timesteps=1000, beta_schedule="cosine",
                          prediction_type="epsilon", thresholding=True,
                          dynamic_thresholding_ratio=0.9, sample_max_value=1.5,
                          algorithm_type=algorithm,
                          final_sigmas_type=("sigma_min" if algorithm == "dpmsolver"
                                             else "zero"))
    sched = ds.set_timesteps(cfg, ds.make_tables(cfg), steps)

    # the reference's _threshold_sample unpacks (batch, channels, *rest), so
    # it only accepts >=3-D samples; use an image-shaped latent here
    x_ref = 4.0 * torch.randn(2, 4, 16)
    x = jnp.asarray(x_ref.numpy())
    outs = [2.0 * torch.randn(2, 4, 16) for _ in range(steps)]
    state = ds.init_state(cfg, x.shape)
    for i, t in enumerate(ref.timesteps):
        x_ref = ref.step(outs[i], t, x_ref).prev_sample
        x, state = ds.step(cfg, sched, jnp.int32(i), state, jnp.asarray(outs[i].numpy()), x)
    np.testing.assert_allclose(np.asarray(x), x_ref.numpy(), atol=2e-5, rtol=1e-5)

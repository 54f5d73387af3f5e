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

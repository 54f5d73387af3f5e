"""Fused int4 diffusion-head solver-step kernel (ops/fused_head.py) vs the
XLA path with dequantized-int4 weights (interpret mode on CPU), plus the
sample_speech_latents integration."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import DiffusionHeadConfig, tiny_config
from vibevoice_tpu.models import diffusion_head as dh
from vibevoice_tpu.ops import fused_head as fh
from vibevoice_tpu.ops.int4_matmul import dequant_int4_xla, quantize_int4


def _head_cfg():
    # H and F must be lane-aligned (128) like the production head (1536/4608)
    return DiffusionHeadConfig(hidden_size=256, latent_size=16, head_layers=3,
                               head_ffn_ratio=3.0, ddpm_num_steps=50,
                               ddpm_num_inference_steps=4)


def _rand_head(key, cfg):
    params = dh.init(key, cfg, dtype=jnp.float32)
    # init zeros ada/final weights; randomize so modulations and output bite
    ks = jax.random.split(key, 3 + len(params["layers"]))
    h = cfg.hidden_size
    params["final_ada_w"] = jax.random.normal(ks[0], (h, 2 * h)) * 0.05
    params["final_linear"] = jax.random.normal(ks[1], (h, cfg.latent_size)) * 0.05
    for i, lp in enumerate(params["layers"]):
        lp["ada_w"] = jax.random.normal(ks[3 + i], (h, 3 * h)) * 0.05
        lp["norm_w"] = 1.0 + jax.random.normal(jax.random.fold_in(ks[3 + i], 1), (h,)) * 0.1
    return params


def _dequant_head(params):
    """Reference head whose FFN weights equal the kernel's int4 values."""
    out = dict(params, layers=[])
    for lp in params["layers"]:
        nl = dict(lp)
        for name in ("gate", "up", "down"):
            q = quantize_int4(lp[name])
            nl[name] = dequant_int4_xla(q["qint4"], q["scale4"], jnp.float32)
        out["layers"].append(nl)
    return out


@pytest.mark.parametrize("n", [2, 8, 16])
def test_fused_head_step_matches_dequant(n):
    cfg = _head_cfg()
    key = jax.random.PRNGKey(0)
    params = _rand_head(key, cfg)
    pack = fh.pack_head_solver_q(params)
    ref_params = _dequant_head(params)

    cond = jax.random.normal(jax.random.fold_in(key, 5), (n, cfg.hidden_size))
    tsteps = jnp.asarray([3.0, 17.0])
    layer_mods, final_mod = dh.precompute_modulations(params, cfg, cond, tsteps)
    noisy = jax.random.normal(jax.random.fold_in(key, 6), (n, cfg.latent_size))

    for s in range(2):
        ref = dh.apply_with_modulations(ref_params, cfg, noisy,
                                        [m[s] for m in layer_mods],
                                        final_mod[s])
        xp = noisy @ params["noisy_proj"]
        mods = jnp.stack([m[s] for m in layer_mods], axis=0)
        got = fh.fused_head_solver_step(pack, xp, mods, final_mod[s],
                                        params["final_linear"],
                                        cfg.rms_norm_eps, tile_f=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-3)


def test_sample_speech_latents_uses_pack():
    """The packed path must produce the same trajectory as running the
    solver with the dequantized-int4 head on the plain path."""
    from vibevoice_tpu.models import vibevoice as V
    from vibevoice_tpu.schedule import dpm_solver as ds

    cfg = tiny_config(vocab_size=320)
    # tiny head dims are lane-unaligned; use an aligned head for the kernel
    dh_cfg = _head_cfg()
    cfg = type(cfg)(**{**cfg.__dict__, "diffusion_head": dh_cfg,
                       "acoustic_vae_dim": dh_cfg.latent_size})
    key = jax.random.PRNGKey(1)
    head = _rand_head(key, dh_cfg)

    solver_cfg = ds.SolverConfig(num_train_timesteps=dh_cfg.ddpm_num_steps,
                                 beta_schedule=dh_cfg.ddpm_beta_schedule,
                                 prediction_type=dh_cfg.prediction_type)
    sched = ds.set_timesteps(solver_cfg, ds.make_tables(solver_cfg), 3)
    n = 2
    cond = jax.random.normal(jax.random.fold_in(key, 2), (n, dh_cfg.hidden_size))
    neg = jax.random.normal(jax.random.fold_in(key, 3), (n, dh_cfg.hidden_size))
    x0 = jax.random.normal(jax.random.fold_in(key, 4), (n, dh_cfg.latent_size))

    params_pack = {"diffusion_head": head,
                   "_diffusion_head_packq": fh.pack_head_solver_q(head)}
    params_ref = {"diffusion_head": _dequant_head(head)}
    got = V.sample_speech_latents(params_pack, cfg, solver_cfg, sched,
                                  cond, neg, 1.3, x0)
    ref = V.sample_speech_latents(params_ref, cfg, solver_cfg, sched,
                                  cond, neg, 1.3, x0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-3)


def test_pipeline_quantize_diffusion_smoke():
    """quantize_diffusion='int4k' must build the pack, drop the per-step FFN
    weights, and still generate audio end-to-end."""
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    from vibevoice_tpu.engine import generate as G
    from tests.test_pipeline_smoke import _force_diffusion_engine

    cfg = tiny_config(vocab_size=320)
    tts = VibeVoiceTTS.from_random(cfg=cfg, dtype=jnp.float32, ddpm_steps=3,
                                   prompt_bucket=256, quantize="int8",
                                   quantize_diffusion="int4k")
    assert "_diffusion_head_packq" in tts.params
    assert all(lp["gate"] is None and lp["down"] is None
               for lp in tts.params["diffusion_head"]["layers"])
    _force_diffusion_engine(tts, 1, 256, 6)
    voice = [np.random.default_rng(0).normal(0, 0.05, 64).astype(np.float32)]
    res, metrics = tts.generate("Speaker 1: Hello world.", voice,
                                max_new_tokens=6)
    hop = cfg.speech_compress_ratio
    assert res.audio[0] is not None and len(res.audio[0]) == 6 * hop
    assert np.all(np.isfinite(np.asarray(res.audio[0])))

"""Data-parallel engine inference (VERDICT r3 item 3): the engine with the
utterance batch sharded over the `data` mesh axis must exactly match the
unsharded run (with injected latent noise) and compile with ZERO per-step
cross-replica collectives — samples are independent (ref per-sample batch
semantics modeling_vibevoice_inference.py:390-399; BASELINE "DP at 2 hosts"
correctness half)."""
import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.parallel import mesh as M

B = 4
PROMPT = 16
STEPS = 6


def _inputs():
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 90, (B, PROMPT)).astype(np.int32)
    mask = np.ones((B, PROMPT), np.int32)
    # ragged prompts: left-pad two samples (per-sample positions/visibility)
    mask[1, :3] = 0
    mask[3, :5] = 0
    sim = np.zeros((B, PROMPT), bool)
    noise = rng.normal(0, 1, (STEPS + 1, B, 8)).astype(np.float32)
    return ids, mask, sim, noise


def _gen_cfg():
    return G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                              speech_diffusion_id=102, eos_id=1,
                              ddpm_steps=3, force_diffusion=True)


def _run(params, cfg, mesh=None):
    ids, mask, sim, noise = _inputs()
    eng = G.Engine(params, cfg, _gen_cfg(), max_steps=STEPS, batch=B,
                   prompt_len=PROMPT, inject_latent_noise=True, mesh=mesh)
    state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(7),
                           latent_noise=noise)
    state, _ = eng.decode_chunk(state, STEPS - 1)
    return eng, state


@pytest.fixture()
def dp_mesh():
    assert len(jax.devices()) >= 8
    return M.make_mesh(data=4, model=1)


def test_dp_sharded_decode_matches_unsharded(dp_mesh):
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    _, state_ref = _run(params, cfg)
    sharded = M.shard_params(params, dp_mesh, cfg=cfg)
    eng_dp, state_dp = _run(sharded, cfg, mesh=dp_mesh)
    assert eng_dp.dp_mesh is dp_mesh and eng_dp.mesh is None

    # per-sample outputs identical (injected noise makes rng paths equal)
    np.testing.assert_array_equal(np.asarray(state_dp.tokens),
                                  np.asarray(state_ref.tokens))
    np.testing.assert_allclose(np.asarray(state_dp.audio),
                               np.asarray(state_ref.audio), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(state_dp.frames),
                                  np.asarray(state_ref.frames))

    # the carried state is genuinely batch-sharded over `data`
    sh = state_dp.cache.k.sharding
    assert "data" in sh.spec, sh.spec


def test_dp_decode_step_hlo_has_no_collectives(dp_mesh):
    """The DP performance property: one decode chunk compiles to a program
    with NO cross-replica collectives (each shard serves its samples
    independently; params replicated, nothing to synchronize per step)."""
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    sharded = M.shard_params(params, dp_mesh, cfg=cfg)
    ids, mask, sim, noise = _inputs()
    eng = G.Engine(sharded, cfg, _gen_cfg(), max_steps=STEPS, batch=B,
                   prompt_len=PROMPT, inject_latent_noise=True, mesh=dp_mesh)
    state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(7),
                           latent_noise=noise)
    compiled = eng._chunk.lower(eng.params, state, 4).compile()
    hlo = compiled.as_text()
    bad = [ln.strip() for ln in hlo.splitlines()
           if re.search(r"(all-reduce|all-gather|collective-permute|"
                        r"all-to-all|reduce-scatter)(-start)?\(", ln)]
    assert not bad, "per-step cross-replica collectives found:\n" + "\n".join(bad[:10])


def test_dp_rejects_unsplittable_batch_and_mixed_mesh():
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    mesh = M.make_mesh(data=4, model=1)
    with pytest.raises(ValueError):
        G.Engine(params, cfg, _gen_cfg(), max_steps=4, batch=3,
                 prompt_len=8, mesh=mesh)
    mixed = M.make_mesh(data=2, model=2)
    with pytest.raises(NotImplementedError):
        G.Engine(params, cfg, _gen_cfg(), max_steps=4, batch=4,
                 prompt_len=8, mesh=mixed)

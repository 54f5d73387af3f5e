"""Multi-device training: full train step jitted over an 8-device CPU mesh
(SURVEY.md §4: multi-host tests via xla_force_host_platform_device_count)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.parallel import mesh as M
from vibevoice_tpu import train as T


def _tiny_batch(cfg, b=4, t=24, frames=2):
    hop = cfg.speech_compress_ratio
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (b, t), 0, cfg.decoder.vocab_size)
    att = jnp.ones((b, t), jnp.int32)
    labels = jnp.where(jax.random.uniform(key, (b, t)) < 0.8, ids, -100)
    n = b  # one voice clip per sample
    speech = jax.random.normal(key, (n, frames * hop)) * 0.1
    smask = jnp.ones((n, frames), bool)
    sem = jax.random.normal(key, (n, frames, cfg.semantic_vae_dim)) * 0.1
    aim = jnp.zeros((b, t), bool).at[:, 2:2 + frames].set(True)
    alm = jnp.zeros((b, t), bool).at[:, 2:2 + frames].set(True)
    return T.TrainBatch(ids, att, labels, speech, smask, sem, aim, alm)


def test_train_step_single_device():
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    import optax
    opt = optax.adam(1e-3)  # constant lr (make_optimizer warms up from 0)
    step = T.make_train_step(cfg, opt)
    batch = _tiny_batch(cfg)
    opt_state = opt.init(params)
    params2, opt_state, metrics = jax.jit(step)(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["diffusion_loss"]))
    # params actually changed
    d = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b_: jnp.mean(jnp.abs(a - b_)),
                               jax.tree_util.tree_map(jnp.asarray, params),
                               jax.tree_util.tree_map(jnp.asarray, params2)), 0.0)
    assert d > 0


def test_train_step_dp_tp_mesh():
    """data=2 x model=4 mesh: sharded params + batch, one jitted step."""
    assert len(jax.devices()) >= 8, "conftest must set up 8 virtual CPU devices"
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    mesh = M.make_mesh(data=2, model=4)
    sharded = M.shard_params(params, mesh, cfg=cfg)
    opt = T.make_optimizer()
    step = T.make_train_step(cfg, opt)
    batch = _tiny_batch(cfg)
    bspec = M.batch_specs()
    batch = T.TrainBatch(
        input_ids=jax.device_put(batch.input_ids, NamedSharding(mesh, P("data", None))),
        attention_mask=jax.device_put(batch.attention_mask, NamedSharding(mesh, P("data", None))),
        labels=jax.device_put(batch.labels, NamedSharding(mesh, P("data", None))),
        speech_tensors=jax.device_put(batch.speech_tensors, NamedSharding(mesh, P("data", None))),
        speech_masks=jax.device_put(batch.speech_masks, NamedSharding(mesh, P("data", None))),
        speech_semantic_tensors=jax.device_put(batch.speech_semantic_tensors,
                                               NamedSharding(mesh, P("data", None, None))),
        acoustic_input_mask=jax.device_put(batch.acoustic_input_mask,
                                           NamedSharding(mesh, P("data", None))),
        acoustic_loss_mask=jax.device_put(batch.acoustic_loss_mask,
                                          NamedSharding(mesh, P("data", None))),
    )
    opt_state = jax.jit(opt.init)(sharded)
    params2, opt_state, metrics = jax.jit(step)(sharded, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # q projection stays sharded over the model axis
    q = params2["lm"]["layers"][0]["q"]["w"]
    assert len(q.sharding.device_set) >= 4


def test_scaling_stats_match_reference_semantics():
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    batch = _tiny_batch(cfg)
    params = T.init_scaling_stats(params, cfg, jax.random.PRNGKey(3), batch)
    assert np.isfinite(float(params["speech_scaling_factor"]))
    assert np.isfinite(float(params["speech_bias_factor"]))

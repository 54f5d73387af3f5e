"""Constrained logits head: subset columns must reproduce the full-vocab
bias-masked selection exactly (ref VibeVoiceTokenConstraintProcessor
modeling_vibevoice_inference.py:54-67 — only control tokens are selectable,
so the engine gathers just those head columns; see
vibevoice.lm_head_subset)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.utils import quantize as Q


IDS = [200, 201, 202, 50]  # start/end/diffusion/eos (unsorted on purpose)


def _full_masked_argmax(params, cfg, hidden, ids):
    logits = vibevoice.lm_logits(params, cfg, hidden).astype(jnp.float32)
    bias = np.full((cfg.decoder.vocab_size,), -np.inf, np.float32)
    bias[ids] = 0.0
    return jnp.argmax(logits + bias, axis=-1)


@pytest.mark.parametrize("mode", ["bf16", "untied", "int8", "int8_embed", "int4"])
def test_subset_matches_full_masked_argmax(mode):
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    params = vibevoice.init_model(key, cfg, dtype=jnp.float32)
    if mode == "untied":
        h = cfg.decoder.hidden_size
        params["lm_head"] = jax.random.normal(
            jax.random.PRNGKey(9), (h, cfg.decoder.vocab_size), jnp.float32) * 0.02
    elif mode == "int8":
        params["lm_head"] = Q.quantize_weight(params["lm"]["embed"].T)
    elif mode == "int8_embed":
        params["lm"] = dict(params["lm"])
        params["lm"]["embed"] = Q.quantize_weight(params["lm"]["embed"], axis=1)
    elif mode == "int4":
        k = params["lm"]["embed"].shape[1]
        if k % 2:
            pytest.skip("odd hidden dim")
        params["lm_head"] = Q.quantize_weight_int4(params["lm"]["embed"].T)

    hidden = jax.random.normal(jax.random.PRNGKey(1), (7, cfg.decoder.hidden_size),
                               jnp.float32)
    sub = vibevoice.lm_head_subset(params, IDS, dtype=jnp.float32)
    sub_logits = vibevoice.lm_logits_subset(sub, hidden)
    allowed = jnp.asarray(sorted(set(IDS)), jnp.int32)
    got = allowed[jnp.argmax(sub_logits, axis=-1)]

    want = _full_masked_argmax(params, cfg, hidden, IDS)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_subset_logit_values_match_full_columns():
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (3, cfg.decoder.hidden_size),
                               jnp.float32)
    full = vibevoice.lm_logits(params, cfg, hidden)
    sub = vibevoice.lm_head_subset(params, IDS, dtype=jnp.float32)
    got = vibevoice.lm_logits_subset(sub, hidden)
    want = full[:, jnp.asarray(sorted(set(IDS)))]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_engine_allowed_ids_sorted_and_stashed():
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    gen = G.GenerationConfig(speech_start_id=200, speech_end_id=201,
                             speech_diffusion_id=202, eos_id=50, ddpm_steps=2)
    eng = G.Engine(params, cfg, gen, max_steps=4, batch=1, prompt_len=8)
    assert np.asarray(eng.allowed_ids).tolist() == [50, 200, 201, 202]
    assert "_lm_head_sub" in eng.params
    w = eng.params["_lm_head_sub"].get("w")
    assert w is not None and w.shape == (cfg.decoder.hidden_size, 4)

"""Engine-level equivalence of the Pallas decode-attention path vs the XLA
path (interpret mode on CPU, tiny model)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.ops import decode_attention as da


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(da.pl, "pallas_call", interp)


def _run(params, cfg, use_flash_decode):
    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=3, force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=5, batch=1, prompt_len=16)
    eng.use_flash_decode = use_flash_decode
    ids = np.random.default_rng(0).integers(5, 90, (1, 16)).astype(np.int32)
    mask = np.ones((1, 16), np.int32)
    sim = np.zeros((1, 16), bool)
    state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(3))
    for _ in range(4):
        state, _ = eng.step(state)
    return np.asarray(state.audio), np.asarray(state.tokens)


def test_flash_decode_path_matches_xla(interpret_pallas):
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    audio_xla, tok_xla = _run(params, cfg, use_flash_decode=False)
    audio_fl, tok_fl = _run(params, cfg, use_flash_decode=True)
    np.testing.assert_array_equal(tok_fl, tok_xla)
    np.testing.assert_allclose(audio_fl, audio_xla, atol=2e-5)


def test_fused_vocoder_engine_matches_regular(monkeypatch):
    from vibevoice_tpu.ops import fused_blocks as fb
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fb.pl, "pallas_call", interp)

    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)

    def run(use_fused):
        gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                                 speech_diffusion_id=102, eos_id=1,
                                 ddpm_steps=3, force_diffusion=True)
        eng = G.Engine(params, cfg, gen, max_steps=4, batch=1, prompt_len=16,
                       use_fused_vocoder=use_fused)
        ids = np.random.default_rng(1).integers(5, 90, (1, 16)).astype(np.int32)
        mask = np.ones((1, 16), np.int32)
        sim = np.zeros((1, 16), bool)
        state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(4))
        for _ in range(3):
            state, _ = eng.step(state)
        return np.asarray(state.audio)

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(b, a, atol=3e-5)

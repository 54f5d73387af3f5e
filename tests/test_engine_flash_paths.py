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


def test_flash_decode_cache_len_rounded_to_block(interpret_pallas):
    """Long caches round up to the Pallas kernel's 2048-token block size;
    the extra slots are never written or visible, and generation still
    emits frames."""
    import dataclasses
    cfg = tiny_config()
    # head_dim 128 so the engine auto-selects the Pallas decode path
    cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
        cfg.decoder, hidden_size=256, intermediate_size=512,
        num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=8192))
    cfg = dataclasses.replace(cfg, diffusion_head=dataclasses.replace(
        cfg.diffusion_head, hidden_size=256))
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=2, force_diffusion=True)
    eng = G.Engine(params, cfg, gen, max_steps=10, batch=1, prompt_len=4090)
    assert eng.use_flash_decode
    assert eng.cache_len == 6144  # 4100 rounded up to a 2048 multiple

    ids = np.zeros((1, 4090), np.int32)
    mask = np.ones((1, 4090), np.int32)
    sim = np.zeros((1, 4090), bool)
    state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(5))
    assert state.cache.k.shape[2] == 6144
    for _ in range(2):
        state, _ = eng.step(state)
    assert int(np.asarray(state.frames)[0]) == 3
    assert np.isfinite(np.asarray(state.audio)).all()


def test_fused_semantic_engine_matches_regular(monkeypatch):
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
        eng = G.Engine(params, cfg, gen, max_steps=4, batch=2, prompt_len=16,
                       use_fused_semantic=use_fused)
        if use_fused:
            assert len(eng.params["_semantic_packs"]) > 0
        ids = np.random.default_rng(2).integers(5, 90, (2, 16)).astype(np.int32)
        mask = np.ones((2, 16), np.int32)
        sim = np.zeros((2, 16), bool)
        state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(4))
        for _ in range(3):
            state, _ = eng.step(state)
        return np.asarray(state.audio), np.asarray(state.tokens)

    (a, ta) = run(False)
    (b, tb) = run(True)
    np.testing.assert_array_equal(tb, ta)
    np.testing.assert_allclose(b, a, atol=3e-5)

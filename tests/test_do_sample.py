"""Sampled token selection (`do_sample=True`) — VERDICT r2 missing #3.

The reference supports multinomial selection over the constrained logits
(`modeling_vibevoice_inference.py:502-507`).  Cross-framework token parity
can never be asserted for the sampled path (different RNG streams), so the
coverage here is (a) a distributional check of the engine's exact fold_in
key scheme against the target softmax, and (b) an engine smoke test: tokens
stay in the constrained set, streams advance, finished flags latch.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.models import vibevoice


def test_select_token_matches_softmax_distribution():
    """Replay the engine's per-step key chain (rng' = split(rng)[0], token
    key = fold_in(split(rng)[0], step)) over fixed logits; the empirical
    distribution must match softmax(logits) and steps must not repeat keys."""
    vocab = 16
    allowed = np.array([3, 7, 11])
    probs = np.array([0.5, 0.3, 0.2])
    logits = np.full((1, vocab), -np.inf, np.float32)
    logits[0, allowed] = np.log(probs)
    logits = jnp.asarray(logits)

    n = 8192

    @jax.jit
    def draw(rng0):
        def body(rng, step):
            tok = G.select_token(logits, rng, step, do_sample=True)
            rng, _ = jax.random.split(rng)
            return rng, tok[0]
        _, toks = lax.scan(body, rng0, jnp.arange(n, dtype=jnp.int32))
        return toks

    toks = np.asarray(draw(jax.random.PRNGKey(0)))
    assert set(np.unique(toks)) <= set(allowed.tolist())
    freq = np.array([(toks == a).mean() for a in allowed])
    np.testing.assert_allclose(freq, probs, atol=0.02)

    # distinct per-step keys: the sequence is not constant, and re-running
    # the same chain reproduces it exactly
    assert len(np.unique(toks[:64])) > 1
    np.testing.assert_array_equal(np.asarray(draw(jax.random.PRNGKey(0))), toks)
    assert (np.asarray(draw(jax.random.PRNGKey(1))) != toks).any()

    # greedy ignores the rng and returns the argmax
    g = G.select_token(logits, jax.random.PRNGKey(5), jnp.int32(3), do_sample=False)
    assert int(g[0]) == int(allowed[np.argmax(probs)])


def _run_engine(seed: int):
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=2, do_sample=True)
    eng = G.Engine(params, cfg, gen, max_steps=16, batch=2, prompt_len=12)
    ids = np.random.default_rng(3).integers(5, 90, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    sim = np.zeros((2, 12), bool)
    state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(seed))
    state, _ = eng.decode_chunk(state, 15)
    return gen, state


def test_engine_sampled_path_smoke():
    gen, state = _run_engine(seed=11)
    tokens = np.asarray(state.tokens)          # [B, 16]
    frames = np.asarray(state.frames)
    emitted = np.asarray(state.emitted)

    valid = {gen.speech_start_id, gen.speech_end_id, gen.speech_diffusion_id,
             gen.eos_id}
    assert set(np.unique(tokens)) <= valid, f"token escaped constraint: {np.unique(tokens)}"

    for b in range(tokens.shape[0]):
        row = tokens[b]
        eos_at = np.nonzero(row == gen.eos_id)[0]
        if eos_at.size:
            # finished flag latches: everything after the first eos is eos
            assert (row[eos_at[0]:] == gen.eos_id).all()
            # no frame is emitted after finishing
            assert not emitted[b, eos_at[0] + 1:].any()
        # the frame counter equals the emitted map (stream advanced per
        # sampled diffusion token)
        assert frames[b] == emitted[b].sum()
        if frames[b] > 0:
            audio = np.asarray(state.audio)[b][emitted[b]]
            assert np.isfinite(audio).all()

    # same seed reproduces; a different seed diverges (near-flat logits over
    # 4 allowed tokens x 15 steps: collision probability ~4^-30)
    _, state_same = _run_engine(seed=11)
    np.testing.assert_array_equal(np.asarray(state_same.tokens), tokens)
    _, state_diff = _run_engine(seed=12)
    assert (np.asarray(state_diff.tokens) != tokens).any()

"""σ-VAE stack quantization: the acoustic decoder + semantic encoder FFN
weights are the dominant per-frame reads once the LM is quantized (the deep
D=2048 stage is ~537 MB bf16 per stack per frame at the reference topology,
modular_vibevoice_tokenizer.py:687-951).  `quantize_tokenizer_stack` makes
them int8/int4; these tests pin numerics closeness, streaming consistency,
config plumbing, and the fused-kernel exclusivity guard."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import tokenizer as tok
from vibevoice_tpu.utils import quantize as qz

CFG = tiny_config(vocab_size=320)
AC = CFG.acoustic_tokenizer
SE = CFG.semantic_tokenizer


def _activate(p):
    """Init weights are tiny and layer-scale starts at 1e-6, which would hide
    quantization error entirely (the FFN contribution would be ~0 and any
    closeness assertion trivially true).  Rescale weights and set layer
    scales to O(1) so the quantized matmuls actually shape the output."""
    p = jax.tree_util.tree_map(lambda w: w * 10.0, p)
    for blocks in p["stages"]:
        for bp in blocks:
            bp["gamma"] = jnp.ones_like(bp["gamma"])
            bp["ffn_gamma"] = jnp.ones_like(bp["ffn_gamma"])
    return p


def _decoder_params(seed=0):
    return _activate(tok.init_decoder(jax.random.PRNGKey(seed), AC))


def _encoder_params(seed=1):
    return _activate(tok.init_encoder(jax.random.PRNGKey(seed), SE))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_decoder_close_to_fp(mode):
    p = _decoder_params()
    pq = qz.quantize_tokenizer_stack(p, mode=mode, min_dim=1, conv_min_params=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 3, AC.vae_dim))
    y_fp = tok.decoder_apply(p, AC, z)
    y_q = tok.decoder_apply(pq, AC, z)
    assert y_q.shape == y_fp.shape
    corr = float(jnp.corrcoef(y_fp.reshape(-1), y_q.reshape(-1))[0, 1])
    # int4 at the tiny test dims (K down to 4) is the worst case by far —
    # relative error shrinks ~1/sqrt(K) and real stacks only quantize K>=512
    assert corr > (0.999 if mode == "int8" else 0.9)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_encoder_close_to_fp(mode):
    p = _encoder_params()
    pq = qz.quantize_tokenizer_stack(p, mode=mode, min_dim=1, conv_min_params=1)
    hop = CFG.speech_compress_ratio
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * hop, 1)) * 0.1
    y_fp = tok.encoder_apply(p, SE, x)
    y_q = tok.encoder_apply(pq, SE, x)
    corr = float(jnp.corrcoef(y_fp.reshape(-1), y_q.reshape(-1))[0, 1])
    assert corr > (0.999 if mode == "int8" else 0.9)


def test_min_dim_threshold_skips_small_stages():
    p = _decoder_params()
    dims = tok.decoder_dims(AC.decoder_n_filters, len(AC.decoder_depths_resolved()))
    cut = max(dims)  # only the largest stage qualifies
    pq = qz.quantize_tokenizer_stack(p, mode="int8", min_dim=cut)
    for blocks, d in zip(pq["stages"], dims):
        for bp in blocks:
            if d >= cut:
                assert isinstance(bp["ffn1"]["w"], dict)
                assert isinstance(bp["ffn2"]["w"], dict)
            else:
                assert not isinstance(bp["ffn1"]["w"], dict)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_streaming_matches_batch(mode):
    """Chunked streaming decode over quantized weights must agree with the
    non-streaming apply on the concatenated input (same invariant the bf16
    path pins in test_tokenizer.py)."""
    p = _decoder_params()
    pq = qz.quantize_tokenizer_stack(p, mode=mode, min_dim=1, conv_min_params=1)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 4, AC.vae_dim))
    full = tok.decoder_apply(pq, AC, z)
    states = tok.decoder_state_init(AC, 1)
    outs = []
    for i in range(4):
        y, states = tok.decoder_apply_streaming(pq, AC, z[:, i:i + 1], states)
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    # int4 streams through the Pallas GEMV kernel at small T but the XLA
    # dequant matmul at large T — identical quantized weights, fp-order-only
    # differences
    np.testing.assert_allclose(np.asarray(full), np.asarray(stream),
                               atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_encoder_streaming_matches_batch(mode):
    """Chunked streaming encode (the engine's per-frame semantic re-encode
    path, including the quantized window-matmul downsample convs) must agree
    with the non-streaming apply."""
    p = _encoder_params()
    pq = qz.quantize_tokenizer_stack(p, mode=mode, min_dim=1, conv_min_params=1)
    hop = CFG.speech_compress_ratio
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3 * hop, 1)) * 0.1
    full = tok.encoder_apply(pq, SE, x)
    states = tok.encoder_state_init(SE, 2)
    outs = []
    for i in range(3):
        y, states = tok.encoder_apply_streaming(pq, SE, x[:, i * hop:(i + 1) * hop], states)
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stream),
                               atol=5e-5, rtol=1e-3)


def test_quantized_conv_ops_close_to_fp():
    """The int8 conv paths in isolation: window-matmul downsample conv and
    in-dot dequant transposed conv vs their fp references."""
    from vibevoice_tpu.ops import conv as C
    key = jax.random.PRNGKey(6)
    r, cin, cout = 4, 16, 32
    w = jax.random.normal(key, (2 * r, cin, cout)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3 * r, cin))
    b = jnp.zeros((cout,))
    y_fp = C.causal_conv1d(x, w, b, stride=r)
    y_q = C.causal_conv1d(x, qz.quantize_conv_weight(w), b, stride=r)
    assert y_q.shape == y_fp.shape
    np.testing.assert_allclose(np.asarray(y_fp), np.asarray(y_q), atol=0.05, rtol=0.1)
    # streaming agrees with non-streaming on the quantized weight
    st = C.conv_state_init(2, cin, 2 * r, r)
    y_s, _ = C.causal_conv1d_streaming(x, st, qz.quantize_conv_weight(w), b, stride=r)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_s), atol=1e-5, rtol=1e-4)

    wt = jax.random.normal(key, (cin, 2 * r, cout)) * 0.1
    y_fp = C.causal_conv_transpose1d(x, wt, b, stride=r)
    y_q = C.causal_conv_transpose1d(x, qz.quantize_convt_weight(wt), b, stride=r)
    np.testing.assert_allclose(np.asarray(y_fp), np.asarray(y_q), atol=0.05, rtol=0.1)


def test_quantize_model_tokenizer_mode():
    from vibevoice_tpu.models import vibevoice as V
    params = V.init_model(jax.random.PRNGKey(0), CFG)
    out = qz.quantize_model(params, tie_word_embeddings=True, mode="int8",
                            tokenizer_mode="int8", tokenizer_min_dim=1)
    assert isinstance(out["acoustic_decoder"]["stages"][0][0]["ffn1"]["w"], dict)
    assert isinstance(out["semantic_encoder"]["stages"][0][0]["ffn1"]["w"], dict)
    # prefill-only acoustic encoder stays plain
    assert not isinstance(out["acoustic_encoder"]["stages"][0][0]["ffn1"]["w"], dict)


def test_fused_pack_rejects_quantized():
    from vibevoice_tpu.ops import fused_blocks as fb
    p = _decoder_params()
    pq = qz.quantize_tokenizer_stack(p, mode="int8", min_dim=1)
    with pytest.raises(ValueError, match="quantize_tokenizer"):
        fb.pack_stage(pq["stages"][0])


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_engine_runs_with_quantized_tokenizer(mode):
    """End-to-end engine smoke on the quantized σ-VAE path: forced-diffusion
    decode emits finite audio close to the unquantized engine's (the LM is
    identical, so the token path and latents match exactly; only the
    vocoder/semantic numerics differ)."""
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice as V

    params = V.init_model(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    pq = dict(params)
    pq = qz.quantize_tokenizers(pq, mode=mode, min_dim=1, conv_min_params=1)

    gen = G.GenerationConfig(
        speech_start_id=256, speech_end_id=257, speech_diffusion_id=258,
        eos_id=259, ddpm_steps=2, force_diffusion=True)
    ids = np.zeros((1, 16), np.int32)
    att = np.ones((1, 16), np.int32)
    sim = np.zeros((1, 16), bool)

    def _run(p):
        eng = G.Engine(p, CFG, gen, max_steps=4, batch=1, prompt_len=16,
                       dtype=jnp.float32)
        state, _ = eng.prefill(ids, att, sim)
        state, _ = eng.decode_chunk(state, 3)
        return np.asarray(state.audio), np.asarray(state.frames)

    audio_fp, frames_fp = _run(params)
    audio_q, frames_q = _run(pq)
    assert np.array_equal(frames_fp, frames_q)
    assert np.isfinite(audio_q).all()
    corr = np.corrcoef(audio_fp.reshape(-1), audio_q.reshape(-1))[0, 1]
    assert corr > 0.98


def test_pipeline_flag_plumbing():
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    t = VibeVoiceTTS.from_random(cfg=CFG, dtype=jnp.float32,
                                 quantize_tokenizer="int8")
    # default min_dim=512 quantizes nothing at tiny dims — the flag must
    # still round-trip without touching other components
    assert t.params["lm"]["layers"][0]["q"]["w"].dtype != jnp.int8
    with pytest.raises(ValueError, match="quantize_tokenizer"):
        VibeVoiceTTS.from_random(cfg=CFG, quantize_tokenizer="fp8")


def test_pipeline_int4k_mode():
    """quantize_tokenizer='int4k': deep (T<=8) stages become int4-weight
    chain-kernel packs (built from the original weights), their tree FFN
    weights are dropped, everything else is int8-quantized, and engines run
    the fused appliers end-to-end."""
    from vibevoice_tpu.pipeline import VibeVoiceTTS
    from vibevoice_tpu.engine import generate as G

    t = VibeVoiceTTS.from_random(cfg=CFG, dtype=jnp.float32,
                                 quantize_tokenizer="int4k")
    assert "_vocoder_packs" in t.params and t.params["_vocoder_packs"]
    assert "_semantic_packs" in t.params and t.params["_semantic_packs"]
    for name, packs_key in (("acoustic_decoder", "_vocoder_packs"),
                            ("semantic_encoder", "_semantic_packs")):
        for i in t.params[packs_key]:
            assert "w1q" in t.params[packs_key][i]
            for bp in t.params[name]["stages"][i]:
                assert bp["ffn1"]["w"] is None and bp["ffn2"]["w"] is None

    gen = G.GenerationConfig(
        speech_start_id=t.tokenizer.speech_start_id,
        speech_end_id=t.tokenizer.speech_end_id,
        speech_diffusion_id=t.tokenizer.speech_diffusion_id,
        eos_id=t.tokenizer.eos_id, ddpm_steps=2, force_diffusion=True)
    eng = G.Engine(t.params, t.cfg, gen, max_steps=4, batch=1, prompt_len=256,
                   dtype=t.dtype, use_fused_vocoder=True, use_fused_semantic=True)
    t._engine = lambda b, p, m: eng
    res, _ = t.generate("Speaker 1: int4k path.", None, max_new_tokens=4)
    assert res.audio[0] is not None and np.isfinite(res.audio[0]).all()

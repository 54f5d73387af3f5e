"""Weight-only int8: mm dispatch, round-trip accuracy, LM output closeness."""
import numpy as np
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import Qwen2Config
from vibevoice_tpu.models import qwen2 as q
from vibevoice_tpu.utils import quantize as qz

CFG = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                  max_position_embeddings=256)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    qd = qz.quantize_weight(w)
    deq = qd["qint8"].astype(jnp.float32) * qd["scale"].astype(jnp.float32)
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # per-channel int8: <1% of channel max


def test_mm_dispatch():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.1
    plain = qz.mm(x, w)
    quant = qz.mm(x, qz.quantize_weight(w))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(quant), atol=2e-2, rtol=0.1)


def test_quantized_lm_close_to_fp():
    params = q.init(jax.random.PRNGKey(0), CFG)
    qlm = qz.quantize_lm(params["lm"] if "lm" in params else params)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, CFG.vocab_size)
    embeds = params["embed"][ids]
    mask = jnp.ones((1, 12), jnp.int32)
    pos = q.positions_from_mask(mask)
    bias = q.causal_bias(mask, 12)
    h_fp, _ = q.forward(params, CFG, embeds, pos, bias)
    h_q, _ = q.forward(qlm, CFG, embeds, pos, bias)
    # int8 noise grows through depth; outputs should stay well-correlated
    corr = float(jnp.corrcoef(h_fp.reshape(-1), h_q.reshape(-1))[0, 1])
    assert corr > 0.99


def test_quantized_diffusion_head_close_to_fp():
    from vibevoice_tpu.configs import DiffusionHeadConfig
    from vibevoice_tpu.models import diffusion_head as dh

    cfg = DiffusionHeadConfig(hidden_size=64, latent_size=16, head_layers=2,
                              freq_embed_size=32)
    params = dh.init(jax.random.PRNGKey(0), cfg)
    # zero-init adaLN/final would make outputs trivially zero; randomize
    for lp in params["layers"]:
        lp["ada_w"] = jax.random.normal(jax.random.PRNGKey(1), lp["ada_w"].shape) * 0.05
    params["final_ada_w"] = jax.random.normal(jax.random.PRNGKey(2), params["final_ada_w"].shape) * 0.05
    params["final_linear"] = jax.random.normal(jax.random.PRNGKey(3), params["final_linear"].shape) * 0.05
    qp = qz.quantize_diffusion_head(params)

    noisy = jax.random.normal(jax.random.PRNGKey(4), (3, 16))
    t = jnp.asarray([10.0, 500.0, 900.0])
    cond = jax.random.normal(jax.random.PRNGKey(5), (3, 64))
    y_fp = dh.apply(params, cfg, noisy, t, cond)
    y_q = dh.apply(qp, cfg, noisy, t, cond)
    corr = float(jnp.corrcoef(y_fp.reshape(-1), y_q.reshape(-1))[0, 1])
    assert corr > 0.999


def test_quantized_engine_generates():
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice

    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    qparams = qz.quantize_model(params, cfg.decoder.tie_word_embeddings)

    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=3, force_diffusion=True)
    eng = G.Engine(qparams, cfg, gen, max_steps=4, batch=1, prompt_len=16)
    ids = np.zeros((1, 16), np.int32)
    mask = np.ones((1, 16), np.int32)
    sim = np.zeros((1, 16), bool)
    state, _ = eng.prefill(ids, mask, sim)
    for _ in range(3):
        state, _ = eng.step(state)
    audio = np.asarray(state.audio)
    assert np.isfinite(audio).all()
    assert int(np.asarray(state.frames)[0]) == 4


def test_int8_embed_rows_and_tied_logits():
    params = q.init(jax.random.PRNGKey(7), CFG)
    qlm = qz.quantize_lm(params, quantize_embed=True)
    ids = jnp.asarray([[3, 17, 250]])
    rows_fp = params["embed"][ids]
    rows_q = q.embed_rows(qlm, ids)
    corr = float(jnp.corrcoef(rows_fp.reshape(-1), rows_q.reshape(-1).astype(jnp.float32))[0, 1])
    assert corr > 0.999
    h = jax.random.normal(jax.random.PRNGKey(8), (1, CFG.hidden_size)) * 0.3
    lg_fp = q.logits(params, CFG, h)
    lg_q = q.logits(qlm, CFG, h)
    corr = float(jnp.corrcoef(lg_fp.reshape(-1), lg_q.reshape(-1))[0, 1])
    assert corr > 0.999


def test_quantized_lm_int4_close_to_fp():
    params = q.init(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, CFG.vocab_size)
    embeds = params["embed"][ids]
    mask = jnp.ones((1, 12), jnp.int32)
    pos = q.positions_from_mask(mask)
    bias = q.causal_bias(mask, 12)
    h_fp, _ = q.forward(params, CFG, embeds, pos, bias)
    for gs in (None, 32):
        qlm = qz.quantize_lm(params, mode="int4", group_size=gs)
        h_q, _ = q.forward(qlm, CFG, embeds, pos, bias)
        corr = float(jnp.corrcoef(h_fp.reshape(-1), h_q.reshape(-1))[0, 1])
        assert corr > 0.95, f"group_size={gs}: corr {corr}"


def test_int4_group_scales_tighter_than_per_channel():
    """Per-group scales must reduce LM output error vs per-channel (the
    quality rationale for group_size)."""
    params = q.init(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, CFG.vocab_size)
    embeds = params["embed"][ids]
    mask = jnp.ones((1, 12), jnp.int32)
    pos = q.positions_from_mask(mask)
    bias = q.causal_bias(mask, 12)
    h_fp, _ = q.forward(params, CFG, embeds, pos, bias)

    def err(gs):
        qlm = qz.quantize_lm(params, mode="int4", group_size=gs)
        h_q, _ = q.forward(qlm, CFG, embeds, pos, bias)
        return float(jnp.abs(h_q - h_fp).mean())

    assert err(16) < err(None)


def test_int4_engine_generates_and_prefill_path_consistent():
    """End-to-end engine with int4 weights: the prefill (XLA dequant) and
    decode (Pallas kernel) paths must agree on the same weights."""
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice

    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    qparams = qz.quantize_model(params, cfg.decoder.tie_word_embeddings, mode="int4")

    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=3, force_diffusion=True)
    # prompt_len 64 > 32 forces the XLA-dequant prefill path; decode uses
    # the Pallas kernel (m = 2B = 2)
    eng = G.Engine(qparams, cfg, gen, max_steps=4, batch=1, prompt_len=64)
    ids = np.zeros((1, 64), np.int32)
    mask = np.ones((1, 64), np.int32)
    sim = np.zeros((1, 64), bool)
    state, _ = eng.prefill(ids, mask, sim)
    for _ in range(3):
        state, _ = eng.step(state)
    audio = np.asarray(state.audio)
    assert np.isfinite(audio).all()
    assert int(np.asarray(state.frames)[0]) == 4

    # cross-path consistency: the same hidden state through mm's GEMV
    # (Pallas) and dequant (XLA) routes
    from vibevoice_tpu.ops.int4_matmul import dequant_int4_xla, int4_matmul
    wq = qparams["lm"]["layers"][0]["gateup"]
    x = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.decoder.hidden_size))
    y_pallas = qz.mm(x, wq)
    y_xla = x @ dequant_int4_xla(wq["qint4"], wq["scale4"], x.dtype)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla),
                               rtol=5e-3, atol=5e-4)


def test_keep_audio_false_streams_same_chunks():
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice

    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=3, force_diffusion=True)

    def run(keep_audio):
        eng = G.Engine(params, cfg, gen, max_steps=4, batch=1, prompt_len=16,
                       keep_audio=keep_audio)
        ids = np.zeros((1, 16), np.int32)
        mask = np.ones((1, 16), np.int32)
        sim = np.zeros((1, 16), bool)
        state, out = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(2))
        chunks = [np.asarray(out.audio_chunk)]
        for _ in range(3):
            state, out = eng.step(state)
            chunks.append(np.asarray(out.audio_chunk))
        return np.concatenate(chunks, axis=1), state

    full, state_full = run(True)
    slim, state_slim = run(False)
    np.testing.assert_allclose(slim, full, atol=1e-6)
    assert state_slim.audio.shape[1] == 1       # buffer dropped
    assert state_full.audio.shape[1] == 4


def test_int8_kv_cache_engine_close_to_bf16():
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice

    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=100, speech_end_id=101,
                             speech_diffusion_id=102, eos_id=1,
                             ddpm_steps=3, force_diffusion=True)

    def run(kv_dtype):
        eng = G.Engine(params, cfg, gen, max_steps=5, batch=1, prompt_len=16,
                       kv_dtype=kv_dtype)
        ids = np.zeros((1, 16), np.int32)
        mask = np.ones((1, 16), np.int32)
        sim = np.zeros((1, 16), bool)
        state, _ = eng.prefill(ids, mask, sim, rng=jax.random.PRNGKey(2))
        for _ in range(4):
            state, _ = eng.step(state)
        return np.asarray(state.audio).reshape(-1), np.asarray(state.tokens)

    a_fp, t_fp = run("model")
    a_q, t_q = run("int8")
    np.testing.assert_array_equal(t_q, t_fp)  # same control-token path
    assert np.isfinite(a_q).all()
    corr = float(np.corrcoef(a_fp, a_q)[0, 1])
    assert corr > 0.99


def test_int4f_mixed_layout():
    """mode='int4f': int4 FFN kernels + int8 attention projections (fused
    qkv), int4 logits head — the call-count/bandwidth trade probe."""
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.models import vibevoice as V

    cfg = tiny_config(vocab_size=320)
    params = V.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    out = qz.quantize_model(params, tie_word_embeddings=True, mode="int4f")
    lp = out["lm"]["layers"][0]
    assert "qint8" in lp["qkv"]["w"] and "qint8" in lp["o"]["w"]
    assert "qint4" in lp["gateup"] and "qint4" in lp["down"]
    assert "qint4" in out["lm_head"]
    # head defaults to int8 like plain int4
    assert "qint8" in out["diffusion_head"]["layers"][0]["gate"]

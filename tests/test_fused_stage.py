"""Tiled large-T fused stage kernel (ops/fused_stage.py) vs the per-op path
(interpret mode on CPU), plus the tokenizer-level streaming integration."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import AcousticTokenizerConfig, tiny_config
from vibevoice_tpu.models import tokenizer as tok
from vibevoice_tpu.ops import fused_stage as fs
from vibevoice_tpu.ops.conv import ConvState


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fs.pl, "pallas_call", interp)


def _blocks(key, d, n, cfg):
    blocks = [tok._block_init(k, d, cfg, jnp.float32)
              for k in jax.random.split(key, n)]
    for i, bp in enumerate(blocks):
        kk = jax.random.fold_in(key, 100 + i)
        bp["gamma"] = jax.random.normal(kk, (d,)) * 0.1
        bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(kk, 1), (d,)) * 0.1
    return blocks


def _plain_stage(blocks, cfg, x, ctx):
    """Per-op stage apply with injected streaming contexts."""
    states = [ConvState(buf=ctx[:, j]) for j in range(len(blocks))]
    s = list(states)
    h = x
    for bp in blocks:
        h = tok._block_apply(bp, h, cfg.layernorm_eps, h.shape[-1], s)
    new_ctx = jnp.stack([st.buf for st in s], axis=1)
    return h, new_ctx


@pytest.mark.parametrize("b,t,d,n", [(1, 16, 32, 3), (2, 24, 16, 2), (2, 800, 8, 1), (4, 800, 16, 2), (3, 400, 8, 1)])
def test_fused_stage_matches_blocks(interpret_pallas, b, t, d, n):
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(0)
    blocks = _blocks(key, d, n, cfg)
    x = jax.random.normal(jax.random.fold_in(key, 7), (b, t, d)) * 0.5
    ctx = jax.random.normal(jax.random.fold_in(key, 8), (b, n, 6, d)) * 0.5

    packed = fs.pack_stage(blocks, dtype=jnp.float32)
    y, new_ctx = fs.fused_stage_chain(packed, x, ctx, eps=cfg.layernorm_eps)
    y_ref, ctx_ref = _plain_stage(blocks, cfg, x, ctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(new_ctx), np.asarray(ctx_ref),
                               atol=2e-4, rtol=2e-3)


def test_fused_stage_tiling_carries_context(interpret_pallas):
    """T spanning multiple tiles must equal the single-tile result (the conv
    carry crosses tile boundaries through the scratch)."""
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(1)
    d, n, t = 8, 2, 1600  # tiles at 400 -> 4 grid steps
    blocks = _blocks(key, d, n, cfg)
    x = jax.random.normal(jax.random.fold_in(key, 7), (1, t, d)) * 0.5
    ctx = jnp.zeros((1, n, 6, d))
    packed = fs.pack_stage(blocks, dtype=jnp.float32)
    y, _ = fs.fused_stage_chain(packed, x, ctx, eps=cfg.layernorm_eps)
    y_ref, _ = _plain_stage(blocks, cfg, x, ctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-3)


def test_streaming_fused_stages_match_plain(interpret_pallas):
    """decoder/encoder_apply_streaming_fused with large packs must match the
    plain streaming path across multiple chunks (state round-trips through
    the kernel ctx outputs)."""
    cfg = tiny_config(vocab_size=320)
    ac, se = cfg.acoustic_tokenizer, cfg.semantic_tokenizer
    hop = cfg.speech_compress_ratio
    key = jax.random.PRNGKey(2)

    dp = tok.init_decoder(key, ac, dtype=jnp.float32)
    for blocks in dp["stages"]:
        for bp in blocks:
            bp["gamma"] = jnp.ones_like(bp["gamma"])
            bp["ffn_gamma"] = jnp.ones_like(bp["ffn_gamma"])
    packs = tok.pack_decoder_stages_large(dp, ac, t_min=4)
    assert packs, "tiny config must produce at least one large pack"
    last = len(ac.decoder_depths_resolved()) - 1
    assert "head" in packs[last], "decoder tail must fold into the last stage"
    # head folding OFF must also hold (the plain tail path stays reachable)
    packs_nh = tok.pack_decoder_stages_large(dp, ac, t_min=4, fold_head=False)
    assert "head" not in packs_nh[last]
    z = jax.random.normal(jax.random.fold_in(key, 3), (2, 3, ac.vae_dim))
    s_plain = tok.decoder_state_init(ac, 2)
    s_fused = tok.decoder_state_init(ac, 2)
    s_nh = tok.decoder_state_init(ac, 2)
    for i in range(3):
        y_p, s_plain = tok.decoder_apply_streaming(dp, ac, z[:, i:i + 1], s_plain)
        y_f, s_fused = tok.decoder_apply_streaming_fused(
            dp, ac, z[:, i:i + 1], s_fused, large_packs=packs)
        y_n, s_nh = tok.decoder_apply_streaming_fused(
            dp, ac, z[:, i:i + 1], s_nh, large_packs=packs_nh)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_f),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                                   atol=2e-4, rtol=2e-3)

    ep = tok.init_encoder(jax.random.fold_in(key, 9), se, dtype=jnp.float32)
    for blocks in ep["stages"]:
        for bp in blocks:
            bp["gamma"] = jnp.ones_like(bp["gamma"])
            bp["ffn_gamma"] = jnp.ones_like(bp["ffn_gamma"])
    packs_e = tok.pack_encoder_stages_large(ep, se, chunk_t=hop, t_min=4)
    assert packs_e
    x = jax.random.normal(jax.random.fold_in(key, 4), (2, 2 * hop, 1)) * 0.1
    s_plain = tok.encoder_state_init(se, 2)
    s_fused = tok.encoder_state_init(se, 2)
    for i in range(2):
        y_p, s_plain = tok.encoder_apply_streaming(ep, se, x[:, i * hop:(i + 1) * hop], s_plain)
        y_f, s_fused = tok.encoder_apply_streaming_fused(
            ep, se, x[:, i * hop:(i + 1) * hop], s_fused, large_packs=packs_e)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_f),
                                   atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("s,din,d,t,chunks", [(5, 16, 8, 40, 2), (2, 8, 16, 800, 2)])
def test_folded_up_conv_matches_plain(interpret_pallas, s, din, d, t, chunks):
    """[transposed up conv + stage] folded into one kernel call == the
    separate streaming conv + per-op stage, across chunks (the overlap-add
    tail round-trips through the ctx slot)."""
    from vibevoice_tpu.ops import conv as C
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(3)
    n = 2
    blocks = _blocks(key, d, n, cfg)
    up = {"w": jax.random.normal(jax.random.fold_in(key, 20), (din, 2 * s, d)) * 0.2,
          "b": jax.random.normal(jax.random.fold_in(key, 21), (d,)) * 0.1}
    packed = fs.pack_stage(blocks, dtype=jnp.float32)
    packed["conv"] = fs.pack_up_conv(up, s, dtype=jnp.float32)

    tail_p = C.conv_transpose_state_init(2, d, 2 * s, s).tail
    tail_f = jnp.asarray(tail_p)
    ctx_p = jnp.zeros((2, n, 6, d))
    ctx_f = jnp.zeros((2, n, 6, d))
    for c in range(chunks):
        x = jax.random.normal(jax.random.fold_in(key, 30 + c), (2, t // s, din)) * 0.5
        h_ref, st = C.causal_conv_transpose1d_streaming(
            x, C.ConvTState(tail=tail_p), up["w"], up["b"], stride=s)
        tail_p = st.tail
        y_ref, ctx_p = _plain_stage(blocks, cfg, h_ref, ctx_p)
        y, ctx_f, tail_f = fs.fused_stage_chain(packed, x, ctx_f, eps=cfg.layernorm_eps,
                                                conv_state=tail_f)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(tail_f), np.asarray(tail_p),
                                   atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("s,k,cin,d,t", [(1, 7, 1, 8, 40), (2, 4, 4, 8, 800), (4, 8, 8, 16, 200)])
def test_folded_down_conv_matches_plain(interpret_pallas, s, k, cin, d, t):
    """[strided down conv + stage] folded == separate streaming conv + per-op
    stage, across chunks (the conv context buf round-trips the ctx slot)."""
    from vibevoice_tpu.ops import conv as C
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(4)
    n = 2
    blocks = _blocks(key, d, n, cfg)
    dp = {"w": jax.random.normal(jax.random.fold_in(key, 20), (k, cin, d)) * 0.2,
          "b": jax.random.normal(jax.random.fold_in(key, 21), (d,)) * 0.1}
    packed = fs.pack_stage(blocks, dtype=jnp.float32)
    packed["conv"] = fs.pack_down_conv(dp, s, dtype=jnp.float32)

    buf_p = C.conv_state_init(2, cin, k, s).buf
    buf_f = jnp.asarray(buf_p)
    ctx_p = jnp.zeros((2, n, 6, d))
    ctx_f = jnp.zeros((2, n, 6, d))
    for c in range(2):
        x = jax.random.normal(jax.random.fold_in(key, 30 + c), (2, t * s, cin)) * 0.5
        h_ref, st = C.causal_conv1d_streaming(
            x, C.ConvState(buf=buf_p), dp["w"], dp["b"], stride=s)
        buf_p = st.buf
        y_ref, ctx_p = _plain_stage(blocks, cfg, h_ref, ctx_p)
        y, ctx_f, buf_f = fs.fused_stage_chain(packed, x, ctx_f, eps=cfg.layernorm_eps,
                                               conv_state=buf_f)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(buf_f), np.asarray(buf_p),
                                   atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("b,t,d,n,r", [(8, 40, 8, 2, 4), (4, 800, 16, 3, 2),
                                       (2, 24, 32, 1, 2)])
def test_rowlane_stage_matches_blocks(interpret_pallas, b, t, d, n, r):
    """Row-lane layout (R batch rows in the lane dim, block-diagonal FFN
    weights, matmul group means) == the per-op stage path, including the
    streaming context round-trip across two chunks."""
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(5)
    blocks = _blocks(key, d, n, cfg)
    packed = fs.pack_stage(blocks, dtype=jnp.float32)
    packed["rowlane"] = fs.pack_stage_rowlane(blocks, r, dtype=jnp.float32)
    ctx_p = jax.random.normal(jax.random.fold_in(key, 8), (b, n, 6, d)) * 0.5
    ctx_f = ctx_p
    for c in range(2):
        x = jax.random.normal(jax.random.fold_in(key, 30 + c), (b, t, d)) * 0.5
        y, ctx_f = fs.fused_stage_chain(packed, x, ctx_f, eps=cfg.layernorm_eps)
        y_ref, ctx_p = _plain_stage(blocks, cfg, x, ctx_p)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_p),
                                   atol=2e-4, rtol=2e-3)


def test_rowlane_rows_policy():
    assert fs.rowlane_rows(32, 8) == 4
    assert fs.rowlane_rows(64, 8) == 2
    assert fs.rowlane_rows(32, 2) == 2
    assert fs.rowlane_rows(128, 8) == 1   # no waste at D>=128
    assert fs.rowlane_rows(32, 1) == 1
    assert fs.rowlane_rows(32, 6) == 3    # must divide the batch


def test_engine_rowlane_smoke(interpret_pallas):
    """Engine(fused_stage_rowlane=True) at batch == plain engine outputs."""
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice as V

    cfg = tiny_config(vocab_size=320)
    params = V.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=256, speech_end_id=257,
                             speech_diffusion_id=258, eos_id=259,
                             ddpm_steps=2, force_diffusion=True)
    ids = np.zeros((2, 16), np.int32)
    att = np.ones((2, 16), np.int32)
    sim = np.zeros((2, 16), bool)

    def _run(**kw):
        eng = G.Engine(dict(params), cfg, gen, max_steps=3, batch=2,
                       prompt_len=16, dtype=jnp.float32, use_fused_stages=True,
                       fused_stage_t_min=7, **kw)
        state, _ = eng.prefill(ids, att, sim)
        state, _ = eng.decode_chunk(state, 2)
        return np.asarray(state.audio), np.asarray(state.tokens)

    audio_p, tokens_p = _run()
    audio_r, tokens_r = _run(fused_stage_rowlane=True)
    np.testing.assert_array_equal(tokens_p, tokens_r)
    np.testing.assert_allclose(audio_p, audio_r, atol=2e-4, rtol=2e-3)


def test_engine_auto_policies():
    """The measured batch policies (PERFORMANCE.md r4): transition-conv
    folding on iff B==1; stage T-tile 200 iff B>=8 else 400."""
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice as V

    cfg = tiny_config(vocab_size=320)
    params = V.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=256, speech_end_id=257,
                             speech_diffusion_id=258, eos_id=259, ddpm_steps=2)

    def build(b, **kw):
        return G.Engine(params, cfg, gen, max_steps=2, batch=b, prompt_len=16,
                        dtype=jnp.float32, use_fused_stages=True,
                        fused_stage_t_min=7, **kw)

    e1, e8 = build(1), build(8)
    assert e1.fused_stage_tile == 400 and e8.fused_stage_tile == 200
    packs1 = e1.params["_vocoder_packs_large"]
    packs8 = e8.params["_vocoder_packs_large"]
    assert any("conv" in p for p in packs1.values()), "B=1 must fold convs"
    assert not any("conv" in p for p in packs8.values()), "B>=2 must not fold"
    # head folding measured NEGATIVE at B=1 (-6%) and a wash at B=8 (r5
    # head_fold_ab) -> off at every batch unless explicitly requested
    assert not any("head" in p for p in packs1.values())
    assert not any("head" in p for p in packs8.values())
    e1h = build(1, fused_stage_fold_head=True)
    assert any("head" in p for p in e1h.params["_vocoder_packs_large"].values())
    # rowlane measured +3-4% at B=2/4 and +2-4% at B>=32, wash at B=8/16 ->
    # auto-on at 2<=B<=4 and B>=32
    e4 = build(4)
    assert any("rowlane" in p for p in e4.params["_vocoder_packs_large"].values())
    assert not any("rowlane" in p for p in packs1.values())
    assert not any("rowlane" in p for p in packs8.values())
    e32 = build(32)
    assert any("rowlane" in p for p in e32.params["_vocoder_packs_large"].values())
    # explicit override beats the auto policy
    e8f = build(8, fused_stage_fold_conv=True, fused_stage_tile=80)
    assert e8f.fused_stage_tile == 80
    assert any("conv" in p for p in e8f.params["_vocoder_packs_large"].values())


def test_engine_fused_stages_smoke(interpret_pallas):
    """Engine(use_fused_stages=True) end-to-end against the plain engine:
    same tokens, close audio."""
    from vibevoice_tpu.engine import generate as G
    from vibevoice_tpu.models import vibevoice as V

    cfg = tiny_config(vocab_size=320)
    params = V.init_model(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    gen = G.GenerationConfig(speech_start_id=256, speech_end_id=257,
                             speech_diffusion_id=258, eos_id=259,
                             ddpm_steps=2, force_diffusion=True)
    ids = np.zeros((1, 16), np.int32)
    att = np.ones((1, 16), np.int32)
    sim = np.zeros((1, 16), bool)

    def _run(**kw):
        if kw.get("use_fused_stages"):
            kw["fused_stage_t_min"] = 7  # tiny config Ts are 4..16
        eng = G.Engine(params, cfg, gen, max_steps=3, batch=1, prompt_len=16,
                       dtype=jnp.float32, **kw)
        state, _ = eng.prefill(ids, att, sim)
        state, _ = eng.decode_chunk(state, 2)
        return np.asarray(state.audio), np.asarray(state.tokens)

    audio_p, tokens_p = _run()
    audio_f, tokens_f = _run(use_fused_stages=True)
    np.testing.assert_array_equal(tokens_p, tokens_f)
    np.testing.assert_allclose(audio_p, audio_f, atol=2e-4, rtol=2e-3)

"""Fused Block1D-chain kernel vs the reference per-op implementation
(interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import AcousticTokenizerConfig
from vibevoice_tpu.models import tokenizer as tok
from vibevoice_tpu.ops import fused_blocks as fb
from vibevoice_tpu.ops.conv import conv_state_init


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fb.pl, "pallas_call", interp)


@pytest.mark.parametrize("t,d,n_blocks", [(1, 64, 3), (8, 128, 2), (4, 64, 1)])
def test_fused_chain_matches_blocks(interpret_pallas, t, d, n_blocks):
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(0)
    blocks = [tok._block_init(k, d, cfg, jnp.float32)
              for k in jax.random.split(key, n_blocks)]
    # randomize layer scales away from 1e-6 for a meaningful test
    for i, bp in enumerate(blocks):
        kk = jax.random.fold_in(key, 100 + i)
        bp["gamma"] = jax.random.normal(kk, (d,)) * 0.1
        bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(kk, 1), (d,)) * 0.1

    x = jax.random.normal(jax.random.fold_in(key, 7), (1, t, d)) * 0.5
    ctx = jax.random.normal(jax.random.fold_in(key, 8), (n_blocks, 6, d)) * 0.5

    # reference: per-block streaming apply
    states = [type(conv_state_init(1, d, 7))(buf=ctx[i][None]) for i in range(n_blocks)]
    h = x
    slist = list(states)
    for i, bp in enumerate(blocks):
        h = tok._block_apply(bp, h, cfg.layernorm_eps, d, slist)
    ref = h[0]
    new_states_ref = jnp.stack([s.buf[0] for s in slist])

    packed = fb.pack_stage(blocks)
    y, new_ctx = fb.fused_block_chain(packed, x[0], ctx, eps=cfg.layernorm_eps)

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_ctx), np.asarray(new_states_ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_decoder_streaming_matches_regular(interpret_pallas):
    from vibevoice_tpu.configs import AcousticTokenizerConfig
    cfg = AcousticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, decoder_n_filters=4,
        encoder_ratios=(4, 2, 2), decoder_ratios=(4, 2, 2),
        encoder_depths=(1, 2, 1, 2),
    )
    key = jax.random.PRNGKey(0)
    params = tok.init_decoder(key, cfg)
    # randomize layer scales for a meaningful comparison
    def bump(p, k):
        for stage in p["stages"]:
            for bp in stage:
                k = jax.random.fold_in(k, 1)
                bp["gamma"] = jax.random.normal(k, bp["gamma"].shape) * 0.1
                bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(k, 2),
                                                    bp["ffn_gamma"].shape) * 0.1
        return p
    params = bump(params, key)

    packs = tok.pack_decoder_stages(params, cfg)
    assert len(packs) >= 2  # stages at T=1 and T<=8 qualify

    z = jax.random.normal(jax.random.fold_in(key, 9), (2, 3, 8)) * 0.5
    st_a = tok.decoder_state_init(cfg, 2)
    st_b = tok.decoder_state_init(cfg, 2)
    outs_a, outs_b = [], []
    for f in range(3):
        ya, st_a = tok.decoder_apply_streaming(params, cfg, z[:, f:f + 1], st_a)
        yb, st_b = tok.decoder_apply_streaming_fused(params, cfg, z[:, f:f + 1],
                                                     st_b, packs)
        outs_a.append(ya)
        outs_b.append(yb)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs_b, 1)),
                               np.asarray(jnp.concatenate(outs_a, 1)),
                               atol=3e-5, rtol=1e-4)


def test_fused_encoder_streaming_matches_regular(interpret_pallas):
    from vibevoice_tpu.configs import SemanticTokenizerConfig
    cfg = SemanticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4,
        encoder_ratios=(4, 2, 2), encoder_depths=(1, 2, 1, 2),
    )
    key = jax.random.PRNGKey(1)
    params = tok.init_encoder(key, cfg)
    for stage in params["stages"]:
        for bp in stage:
            key = jax.random.fold_in(key, 1)
            bp["gamma"] = jax.random.normal(key, bp["gamma"].shape) * 0.1
            bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(key, 2),
                                                bp["ffn_gamma"].shape) * 0.1

    hop = 4 * 2 * 2  # one frame of audio per streaming step
    packs = tok.pack_encoder_stages(params, cfg, chunk_t=hop)
    # tail stages (T<=8): after strides [1,4,2,2] the chunk is 16,4,2,1
    assert sorted(packs) == [1, 2, 3]

    x = jax.random.normal(jax.random.fold_in(key, 9), (2, 3 * hop, 1)) * 0.5
    st_a = tok.encoder_state_init(cfg, 2)
    st_b = tok.encoder_state_init(cfg, 2)
    outs_a, outs_b = [], []
    for f in range(3):
        chunk = x[:, f * hop:(f + 1) * hop]
        ya, st_a = tok.encoder_apply_streaming(params, cfg, chunk, st_a)
        yb, st_b = tok.encoder_apply_streaming_fused(params, cfg, chunk, st_b, packs)
        outs_a.append(ya)
        outs_b.append(yb)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs_b, 1)),
                               np.asarray(jnp.concatenate(outs_a, 1)),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("t,d,n_blocks", [(1, 64, 2), (8, 32, 2)])
def test_fused_chain_int4_close(interpret_pallas, t, d, n_blocks):
    """int4-pack chain kernel (pack_stage_q): per-output-channel int4 FFN
    weights dequantized in-VMEM; must track the fp path to int4 tolerance
    and round-trip the streaming context exactly like the fp pack."""
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(3)
    blocks = [tok._block_init(k, d, cfg, jnp.float32)
              for k in jax.random.split(key, n_blocks)]
    for i, bp in enumerate(blocks):
        kk = jax.random.fold_in(key, 200 + i)
        bp["gamma"] = jax.random.normal(kk, (d,)) * 0.1
        bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(kk, 1), (d,)) * 0.1

    x = jax.random.normal(jax.random.fold_in(key, 7), (t, d)) * 0.5
    ctx = jax.random.normal(jax.random.fold_in(key, 8), (n_blocks, 6, d)) * 0.5

    packed_q = fb.pack_stage_q(blocks)
    y_q, ctx_q = fb.fused_block_chain(packed_q, x, ctx, eps=cfg.layernorm_eps)

    # fp reference via the per-op path
    states = [conv_state_init(1, d, 7, 1) for _ in range(n_blocks)]
    for j in range(n_blocks):
        states[j] = states[j]._replace(buf=ctx[None, j])
    s = list(states)
    h = x[None]
    for bp in blocks:
        h = tok._block_apply(bp, h, cfg.layernorm_eps, d, s)
    y_ref = h[0]
    ctx_ref = jnp.stack([st.buf[0] for st in s], axis=0)

    # block 0's context is pre-FFN (unquantized math) and matches tightly;
    # later blocks' inputs — and the output — carry int4 weight error
    np.testing.assert_allclose(np.asarray(ctx_q[0]), np.asarray(ctx_ref[0]),
                               atol=1e-4, rtol=1e-3)
    corr = float(jnp.corrcoef(ctx_q.reshape(-1), ctx_ref.reshape(-1))[0, 1])
    assert corr > 0.97, corr
    corr = float(jnp.corrcoef(y_q.reshape(-1), y_ref.reshape(-1))[0, 1])
    assert corr > 0.97, corr


def test_pack_stage_q_rejects_quantized():
    cfg = AcousticTokenizerConfig()
    blocks = [tok._block_init(jax.random.PRNGKey(0), 16, cfg, jnp.float32)]
    blocks[0]["ffn1"] = {"w": {"qint8": jnp.zeros((16, 64), jnp.int8)}, "b": None}
    with pytest.raises(ValueError, match="unquantized"):
        fb.pack_stage_q(blocks)


def test_fused_chain_int4_batched_matches_single(interpret_pallas):
    """Batched int4 chain == per-row results (batch lives in the kernel
    rows; weights stream once)."""
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(5)
    d, n, t, b = 32, 2, 8, 3
    blocks = [tok._block_init(k, d, cfg, jnp.float32)
              for k in jax.random.split(key, n)]
    for i, bp in enumerate(blocks):
        kk = jax.random.fold_in(key, 300 + i)
        bp["gamma"] = jax.random.normal(kk, (d,)) * 0.1
        bp["ffn_gamma"] = jax.random.normal(jax.random.fold_in(kk, 1), (d,)) * 0.1
    x = jax.random.normal(jax.random.fold_in(key, 7), (b, t, d)) * 0.5
    ctx = jax.random.normal(jax.random.fold_in(key, 8), (b, n, 6, d)) * 0.5
    packed = fb.pack_stage_q(blocks)
    y_b, ctx_b = fb.fused_block_chain_batched(packed, x, ctx)
    for r in range(b):
        y_r, ctx_r = fb.fused_block_chain(packed, x[r], ctx[r])
        np.testing.assert_allclose(np.asarray(y_b[r]), np.asarray(y_r),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ctx_b[r]), np.asarray(ctx_r),
                                   atol=1e-5, rtol=1e-4)


def test_fused_chain_int4_batched_row_groups(interpret_pallas, monkeypatch):
    """Batches beyond one group's VMEM budget split over the leading grid
    dim (r5 B=128 support) — force tiny groups and check parity."""
    cfg = AcousticTokenizerConfig()
    key = jax.random.PRNGKey(6)
    d, n, t, b = 32, 2, 8, 4
    blocks = [tok._block_init(k, d, cfg, jnp.float32)
              for k in jax.random.split(key, n)]
    x = jax.random.normal(jax.random.fold_in(key, 7), (b, t, d)) * 0.5
    ctx = jax.random.normal(jax.random.fold_in(key, 8), (b, n, 6, d)) * 0.5
    packed = fb.pack_stage_q(blocks)
    y_full, ctx_full = fb.fused_block_chain_batched(packed, x, ctx)
    # budget of one row-group: rg=1, ng=4
    monkeypatch.setattr(fb, "_CHAIN_GROUP_BUDGET", 1 * 8 * d * 16)
    y_g, ctx_g = fb.fused_block_chain_batched(packed, x, ctx)
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_full),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ctx_g), np.asarray(ctx_full),
                               atol=1e-5, rtol=1e-4)

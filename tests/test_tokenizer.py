"""Parity: sigma-VAE tokenizer encoder/decoder vs the torch reference, plus
streaming-equals-full invariants."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import AcousticTokenizerConfig
from vibevoice_tpu.models import tokenizer as tok
from vibevoice_tpu.utils import torch_bridge as tb

torch = pytest.importorskip("torch")

TINY = dict(
    channels=1, vae_dim=8,
    encoder_n_filters=4, decoder_n_filters=4,
    encoder_ratios=(4, 2, 2), decoder_ratios=(4, 2, 2),
    encoder_depths=(1, 1, 1, 2),
)


def tiny_cfg() -> AcousticTokenizerConfig:
    return AcousticTokenizerConfig(**TINY)


@pytest.fixture(scope="module")
def ref_model(reference_path):
    from vibevoice.modular.configuration_vibevoice import VibeVoiceAcousticTokenizerConfig
    from vibevoice.modular.modular_vibevoice_tokenizer import VibeVoiceAcousticTokenizerModel
    cfg = VibeVoiceAcousticTokenizerConfig(
        channels=1, vae_dim=8,
        encoder_n_filters=4, decoder_n_filters=4,
        encoder_ratios=[4, 2, 2], decoder_ratios=[4, 2, 2],
        encoder_depths="1-1-1-2", decoder_depths=None,
        fix_std=0.5, std_dist_type="gaussian",
        conv_bias=True, causal=True, pad_mode="constant",
        layernorm="RMSNorm", layernorm_eps=1e-5,
        layer_scale_init_value=1e-6, disable_last_norm=True,
        mixer_layer="depthwise_conv", weight_init_value=0.02,
    )
    torch.manual_seed(0)
    m = VibeVoiceAcousticTokenizerModel(cfg)
    m.eval()
    return m


def test_encoder_parity(ref_model):
    cfg = tiny_cfg()
    params = tb.encoder_from_torch(ref_model.encoder)
    hop = cfg.hop_length
    x = torch.randn(2, 1, hop * 6)
    with torch.no_grad():
        lat_ref = ref_model.encode(x).mean.numpy()  # [B, F, D]
    lat = tok.encoder_apply(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    assert lat.shape == lat_ref.shape
    np.testing.assert_allclose(np.asarray(lat), lat_ref, atol=2e-5)


def test_decoder_parity(ref_model):
    cfg = tiny_cfg()
    params = tb.decoder_from_torch(ref_model.decoder)
    z = torch.randn(2, 5, 8)
    with torch.no_grad():
        audio_ref = ref_model.decode(z).numpy()  # [B, 1, T]
    audio = tok.decoder_apply(params, cfg, jnp.asarray(z.numpy()))
    assert audio.shape == (2, 5 * cfg.hop_length, 1)
    np.testing.assert_allclose(np.asarray(audio).transpose(0, 2, 1), audio_ref, atol=2e-5)


def test_encoder_streaming_equals_full(ref_model):
    cfg = tiny_cfg()
    params = tb.encoder_from_torch(ref_model.encoder)
    hop = cfg.hop_length
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, hop * 8, 1))
    full = tok.encoder_apply(params, cfg, x)
    states = tok.encoder_state_init(cfg, 2)
    outs = []
    for i in range(0, 8, 2):
        y, states = tok.encoder_apply_streaming(params, cfg, x[:, i * hop:(i + 2) * hop], states)
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full), atol=1e-5)


def test_decoder_streaming_equals_full(ref_model):
    """Frame-by-frame streaming decode == full decode (the generation hot path)."""
    cfg = tiny_cfg()
    params = tb.decoder_from_torch(ref_model.decoder)
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (2, 6, 8))
    full = tok.decoder_apply(params, cfg, z)
    states = tok.decoder_state_init(cfg, 2)
    outs = []
    for f in range(6):
        y, states = tok.decoder_apply_streaming(params, cfg, z[:, f:f + 1], states)
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full), atol=1e-5)


def test_decoder_streaming_matches_reference_streaming(ref_model):
    """Our carried-state streaming == reference dict-cache streaming."""
    from vibevoice.modular.modular_vibevoice_tokenizer import VibeVoiceTokenizerStreamingCache
    cfg = tiny_cfg()
    params = tb.decoder_from_torch(ref_model.decoder)
    torch.manual_seed(3)
    z = torch.randn(1, 4, 8)
    cache = VibeVoiceTokenizerStreamingCache()
    idx = torch.tensor([0])
    ref_chunks = []
    with torch.no_grad():
        for f in range(4):
            ref_chunks.append(ref_model.decode(z[:, f:f + 1], cache=cache,
                                               sample_indices=idx, use_cache=True).numpy())
    states = tok.decoder_state_init(cfg, 1)
    for f in range(4):
        y, states = tok.decoder_apply_streaming(params, cfg, jnp.asarray(z[:, f:f + 1].numpy()), states)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref_chunks[f], atol=2e-5)


def test_state_reset_where():
    cfg = tiny_cfg()
    states = tok.decoder_state_init(cfg, 2)
    states = jax.tree_util.tree_map(lambda a: a + 1.0, states)
    reset = tok.state_reset_where(states, jnp.array([True, False]))
    for leaf in jax.tree_util.tree_leaves(reset):
        assert float(jnp.abs(leaf[0]).sum()) == 0.0
        assert float(jnp.abs(leaf[1]).sum()) > 0.0

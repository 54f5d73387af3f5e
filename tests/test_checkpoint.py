"""Checkpoint round-trips: HF safetensors import and native save/load."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibevoice_tpu.configs import tiny_config
from vibevoice_tpu.models import vibevoice
from vibevoice_tpu.utils import checkpoint as ckpt


def test_native_roundtrip(tmp_path):
    cfg = tiny_config()
    params = vibevoice.init_model(jax.random.PRNGKey(0), cfg)
    params["speech_scaling_factor"] = jnp.asarray(0.7)
    params["speech_bias_factor"] = jnp.asarray(-0.1)
    path = str(tmp_path / "params")
    ckpt.save_native(params, path)
    loaded = ckpt.load_native(path, like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_hf_flat_import(reference_path, tmp_path):
    """Round-trip: reference torch model state_dict -> flat names ->
    params_from_flat == direct torch_bridge transfer."""
    torch = pytest.importorskip("torch")
    from tests.test_generate_parity import tiny_jax_cfg
    from vibevoice_tpu.utils import torch_bridge as tb
    from vibevoice.modular.configuration_vibevoice import VibeVoiceConfig
    from vibevoice.modular.modeling_vibevoice_inference import (
        VibeVoiceForConditionalGenerationInference,
    )

    ac = dict(channels=1, vae_dim=8, encoder_n_filters=4, decoder_n_filters=4,
              encoder_ratios=[4, 2, 2], decoder_ratios=[4, 2, 2],
              encoder_depths="1-1-1-2", decoder_depths=None,
              fix_std=0.0, std_dist_type="none", conv_bias=True, causal=True,
              pad_mode="constant", layernorm="RMSNorm", layernorm_eps=1e-5,
              layer_scale_init_value=1e-6, disable_last_norm=True,
              mixer_layer="depthwise_conv", weight_init_value=0.02)
    se = dict(ac, vae_dim=16)
    hf_cfg = VibeVoiceConfig(
        acoustic_tokenizer_config=ac, semantic_tokenizer_config=se,
        diffusion_head_config=dict(hidden_size=64, latent_size=8, head_layers=2,
                                   head_ffn_ratio=3.0, rms_norm_eps=1e-5,
                                   ddpm_num_steps=100, ddpm_num_inference_steps=4,
                                   ddpm_beta_schedule="cosine",
                                   prediction_type="v_prediction", speech_vae_dim=8),
        decoder_config=dict(model_type="qwen2", vocab_size=64, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2,
                            max_position_embeddings=512, rope_theta=1e6,
                            rms_norm_eps=1e-6, tie_word_embeddings=True),
        acoustic_vae_dim=8, semantic_vae_dim=16,
    )
    torch.manual_seed(0)
    m = VibeVoiceForConditionalGenerationInference(hf_cfg)
    with torch.no_grad():
        m.model.speech_scaling_factor.copy_(torch.tensor(0.8))
        m.model.speech_bias_factor.copy_(torch.tensor(0.1))

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    cfg = tiny_jax_cfg()
    via_flat = ckpt.params_from_flat(sd, cfg)
    via_bridge = tb.vibevoice_params_from_torch(m)

    flat_a = jax.tree_util.tree_leaves(via_flat)
    flat_b = jax.tree_util.tree_leaves(via_bridge)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

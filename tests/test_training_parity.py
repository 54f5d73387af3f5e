"""Training-head parity: logits + diffusion loss vs the reference's
`VibeVoiceForConditionalGeneration.forward` (modeling_vibevoice.py:332-477)
with injected noise/timesteps."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vibevoice_tpu.schedule import dpm_solver as ds
from vibevoice_tpu.models import vibevoice as V
from vibevoice_tpu.utils import torch_bridge as tb
from tests.test_generate_parity import tiny_jax_cfg, HOP


@pytest.fixture(scope="module")
def ref_train_model(reference_path):
    from vibevoice.modular.configuration_vibevoice import VibeVoiceConfig
    from vibevoice.modular.modeling_vibevoice import VibeVoiceForConditionalGeneration
    ac = dict(channels=1, vae_dim=8, encoder_n_filters=4, decoder_n_filters=4,
              encoder_ratios=[4, 2, 2], decoder_ratios=[4, 2, 2],
              encoder_depths="1-1-1-2", decoder_depths=None,
              fix_std=0.0, std_dist_type="none", conv_bias=True, causal=True,
              pad_mode="constant", layernorm="RMSNorm", layernorm_eps=1e-5,
              layer_scale_init_value=1e-6, disable_last_norm=True,
              mixer_layer="depthwise_conv", weight_init_value=0.02)
    se = dict(ac, vae_dim=16)
    cfg = VibeVoiceConfig(
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
                            rms_norm_eps=1e-6, tie_word_embeddings=True,
                            attn_implementation="sdpa"),
        acoustic_vae_dim=8, semantic_vae_dim=16,
    )
    torch.manual_seed(0)
    m = VibeVoiceForConditionalGeneration(cfg)
    with torch.no_grad():
        m.model.speech_scaling_factor.copy_(torch.tensor(0.8))
        m.model.speech_bias_factor.copy_(torch.tensor(0.1))
    m.eval()
    # the reference training path indexes encode(...) as [0][0]
    # (modeling_vibevoice.py:290) which assumes an older tuple return; wrap
    orig_encode = m.model.acoustic_tokenizer.encode
    m.model.acoustic_tokenizer.encode = lambda *a, **k: ((orig_encode(*a, **k),),)
    return m


def test_training_forward_parity(ref_train_model):
    cfg = tiny_jax_cfg()
    params = tb.vibevoice_params_from_torch(ref_train_model)
    mul = 2

    torch.manual_seed(5)
    b, t, frames = 2, 14, 2
    ids = torch.randint(5, 60, (b, t))
    att = torch.ones(b, t, dtype=torch.long)
    wav = torch.randn(b, frames * HOP) * 0.1
    smask = torch.ones(b, frames, dtype=torch.bool)
    sem = torch.randn(b, frames, 16) * 0.1
    aim = torch.zeros(b, t, dtype=torch.bool)
    aim[:, 2:2 + frames] = True
    alm = aim.clone()

    n = b * frames
    noise = torch.randn(n * mul, 8)
    timesteps = torch.randint(0, 100, (n * mul,))

    # reference forward with patched RNG draws
    orig_randn, orig_multinomial = torch.randn, torch.multinomial
    try:
        torch.randn = lambda *a, **k: noise.to(k.get("dtype") or noise.dtype) \
            if tuple(a[0] if isinstance(a[0], (tuple, list)) else a) == (n * mul, 8) \
            else orig_randn(*a, **k)
        torch.multinomial = lambda *a, **k: timesteps
        with torch.no_grad():
            out_ref = ref_train_model(
                input_ids=ids, attention_mask=att,
                speech_tensors=wav, speech_masks=smask,
                speech_semantic_tensors=sem,
                acoustic_input_mask=aim, acoustic_loss_mask=alm,
                ddpm_batch_mul=mul,
            )
    finally:
        torch.randn, torch.multinomial = orig_randn, orig_multinomial

    solver_cfg = ds.SolverConfig(num_train_timesteps=100, beta_schedule="cosine",
                                 prediction_type="v_prediction")
    tables = ds.make_tables(solver_cfg)
    out = V.training_forward(
        params, cfg, tables, jax.random.PRNGKey(0),
        input_ids=jnp.asarray(ids.numpy()),
        attention_mask=jnp.asarray(att.numpy()),
        speech_tensors=jnp.asarray(wav.numpy()),
        speech_masks=jnp.asarray(smask.numpy()),
        speech_semantic_tensors=jnp.asarray(sem.numpy()),
        acoustic_input_mask=jnp.asarray(aim.numpy()),
        acoustic_loss_mask=jnp.asarray(alm.numpy()),
        ddpm_batch_mul=mul,
        injected_noise=jnp.asarray(noise.numpy()),
        injected_timesteps=jnp.asarray(timesteps.numpy()),
    )

    np.testing.assert_allclose(np.asarray(out.logits), out_ref.logits.numpy(),
                               atol=5e-4, rtol=1e-3)
    # reference diffusion loss normalization: /latent/mul (sum-reduction MSE)
    np.testing.assert_allclose(float(out.diffusion_loss),
                               float(out_ref.diffusion_loss), rtol=1e-3)

"""END-TO-END parity: our fused generation engine vs the reference's
`VibeVoiceForConditionalGenerationInference.generate` on a tiny random model
(CPU, fp32, greedy, fixed seeds, injected diffusion noise).

This is the round-1 milestone test from SURVEY.md §7 step 4-5: identical
token sequences and allclose waveforms.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vibevoice_tpu import configs as C
from vibevoice_tpu.engine import generate as G
from vibevoice_tpu.utils import torch_bridge as tb

# tiny ids within a 64-token vocab
EOS, SPEECH_START, SPEECH_END, DIFF = 1, 60, 61, 62
HOP = 16  # ratios (4,2,2)


def tiny_jax_cfg():
    return C.VibeVoiceConfig(
        acoustic_tokenizer=C.AcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, decoder_n_filters=4,
            encoder_ratios=(4, 2, 2), decoder_ratios=(4, 2, 2),
            encoder_depths=(1, 1, 1, 2), std_dist_type="none", fix_std=0.0,
        ),
        semantic_tokenizer=C.SemanticTokenizerConfig(
            vae_dim=16, encoder_n_filters=4,
            encoder_ratios=(4, 2, 2), encoder_depths=(1, 1, 1, 2),
        ),
        diffusion_head=C.DiffusionHeadConfig(
            hidden_size=64, latent_size=8, head_layers=2,
            ddpm_num_steps=100, ddpm_num_inference_steps=4,
        ),
        decoder=C.Qwen2Config(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512,
        ),
        acoustic_vae_dim=8, semantic_vae_dim=16,
    )


@pytest.fixture(scope="module")
def ref_model(reference_path):
    from vibevoice.modular.configuration_vibevoice import (
        VibeVoiceConfig, VibeVoiceAcousticTokenizerConfig,
        VibeVoiceSemanticTokenizerConfig, VibeVoiceDiffusionHeadConfig,
    )
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
    cfg = VibeVoiceConfig(
        acoustic_tokenizer_config=ac,
        semantic_tokenizer_config=se,
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
    # newer transformers reads decoder attrs off the composite config during
    # cache setup; mirror them (the real checkpoints' config JSON has them too)
    for attr in ("num_hidden_layers", "num_attention_heads", "num_key_value_heads",
                 "hidden_size", "max_position_embeddings", "vocab_size"):
        setattr(cfg, attr, getattr(cfg.decoder_config, attr))
    torch.manual_seed(0)
    m = VibeVoiceForConditionalGenerationInference(cfg)
    with torch.no_grad():
        m.model.speech_scaling_factor.copy_(torch.tensor(0.8))
        m.model.speech_bias_factor.copy_(torch.tensor(0.1))
    m.eval()

    # installed transformers (4.57) dropped the `device` arg the reference passes
    orig_prep = m._prepare_cache_for_generation

    def _prep_shim(generation_config, model_kwargs, gen_mode, batch_size,
                   max_cache_length, device=None):
        return orig_prep(generation_config, model_kwargs, gen_mode, batch_size,
                         max_cache_length)

    m._prepare_cache_for_generation = _prep_shim

    # transformers 4.57 renamed DynamicCache.key_cache/value_cache -> layers[i].keys/values
    from transformers.cache_utils import DynamicCache
    if not hasattr(DynamicCache, "key_cache"):
        # skip not-yet-materialized layers, matching the old empty-list behavior
        DynamicCache.key_cache = property(
            lambda self: [l.keys for l in self.layers if l.keys is not None])
        DynamicCache.value_cache = property(
            lambda self: [l.values for l in self.layers if l.values is not None])
    return m


class MockTok:
    bos_token_id = None
    eos_token_id = EOS
    pad_token_id = 2
    speech_start_id = SPEECH_START
    speech_end_id = SPEECH_END
    speech_diffusion_id = DIFF


def _build_prompt(voice_frames: int):
    """system-ish tokens + voice segment + text tokens + speech_start."""
    ids = [10, 11, 12]
    sim = [False] * 3
    ids += [20, SPEECH_START] + [DIFF] * voice_frames + [SPEECH_END, 21]
    sim += [False, False] + [True] * voice_frames + [False, False]
    ids += [30, 31, 32, 33, SPEECH_START]
    sim += [False] * 5
    return ids, sim


def _zero_noise_sampler(model):
    """Replace the reference's x_T ~ N(0, I) with zeros (deterministic CFG
    sampling) so batched runs need no noise replay."""
    import types

    def sample(self, condition, neg_condition, cfg_scale=3.0):
        self.model.noise_scheduler.set_timesteps(self.ddpm_inference_steps)
        condition = torch.cat([condition, neg_condition], dim=0)
        speech = torch.zeros(condition.shape[0], self.config.acoustic_vae_dim).to(condition)
        for t in self.model.noise_scheduler.timesteps:
            half = speech[: len(speech) // 2]
            combined = torch.cat([half, half], dim=0)
            eps = self.model.prediction_head(combined, t.repeat(combined.shape[0]).to(combined),
                                             condition=condition)
            cond_eps, uncond_eps = torch.split(eps, len(eps) // 2, dim=0)
            half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
            eps = torch.cat([half_eps, half_eps], dim=0)
            speech = self.model.noise_scheduler.step(eps, t, speech).prev_sample
        return speech[: len(speech) // 2]

    model.sample_speech_tokens = types.MethodType(sample, model)


def test_generate_batched_mixed_parity(ref_model):
    """B=2, different prompt lengths (left padding), zero diffusion noise.

    Exercises the per-sample branch mix the reference handles with Python
    cache-shift loops (modeling_vibevoice_inference.py:609-639) and ours
    handles with masked pointers."""
    max_new = 12
    cfg = tiny_jax_cfg()
    params = tb.vibevoice_params_from_torch(ref_model)

    ids_a, sim_a = _build_prompt(3)
    ids_b, sim_b = _build_prompt(2)
    ids_b = ids_b + [33, 34, SPEECH_START]
    sim_b = sim_b + [False] * 3
    t0 = max(len(ids_a), len(ids_b))
    PAD = 2

    def leftpad(ids, sim):
        n = t0 - len(ids)
        return [PAD] * n + ids, [0] * n + [1] * len(ids), [False] * n + sim

    ia, ma, sa = leftpad(ids_a, sim_a)
    ib, mb, sb = leftpad(ids_b, sim_b)
    input_ids = torch.tensor([ia, ib])
    attention_mask = torch.tensor([ma, mb])
    speech_input_mask = torch.tensor([sa, sb])
    torch.manual_seed(9)
    wav = torch.randn(2, 3 * HOP) * 0.1
    wav[1, 2 * HOP:] = 0.0
    frame_mask = torch.tensor([[True] * 3, [True, True, False]])

    _zero_noise_sampler(ref_model)
    try:
        ref_out = ref_model.generate(
            input_ids=input_ids, attention_mask=attention_mask,
            speech_tensors=wav, speech_masks=frame_mask,
            speech_input_mask=speech_input_mask,
            tokenizer=MockTok(), max_new_tokens=max_new, max_length_times=16,
            cfg_scale=1.5, show_progress_bar=False, verbose=False,
        )
    finally:
        del ref_model.sample_speech_tokens  # restore the class method
    ref_tokens = ref_out.sequences[:, t0:].numpy()

    gen = G.GenerationConfig(
        speech_start_id=SPEECH_START, speech_end_id=SPEECH_END,
        speech_diffusion_id=DIFF, eos_id=EOS, cfg_scale=1.5,
        ddpm_steps=4, max_length_times=16,
    )
    eng = G.Engine(params, cfg, gen, max_steps=max_new, batch=2, prompt_len=t0,
                   inject_latent_noise=True)
    res = G.generate(eng, np.array([ia, ib]), np.array([ma, mb], np.int32),
                     np.array([sa, sb]),
                     speech_tensors=wav.numpy(), speech_frame_masks=frame_mask.numpy(),
                     latent_noise=np.zeros((max_new, 2, 8), np.float32))

    n = min(ref_tokens.shape[1], res.tokens.shape[1])
    np.testing.assert_array_equal(res.tokens[:, :n], ref_tokens[:, :n])

    for i in range(2):
        ref_audio = ref_out.speech_outputs[i]
        if ref_audio is None:
            continue
        ref_audio = ref_audio.numpy().reshape(-1)
        ours = res.audio[i]
        assert ours is not None
        m = min(len(ours), len(ref_audio))
        np.testing.assert_allclose(ours[:m], ref_audio[:m], atol=5e-4)


@pytest.mark.parametrize("max_new", [16])
def test_generate_token_and_audio_parity(ref_model, max_new):
    cfg = tiny_jax_cfg()
    params = tb.vibevoice_params_from_torch(ref_model)

    voice_frames = 3
    ids, sim = _build_prompt(voice_frames)
    t0 = len(ids)
    input_ids = torch.tensor([ids])
    attention_mask = torch.ones(1, t0, dtype=torch.long)
    speech_input_mask = torch.tensor([sim])
    torch.manual_seed(7)
    wav = torch.randn(1, voice_frames * HOP) * 0.1
    frame_mask = torch.ones(1, voice_frames, dtype=torch.bool)

    # --- record reference x_T noise draws: re-seed and pre-draw the sequence
    torch.manual_seed(123)
    ref_out = ref_model.generate(
        input_ids=input_ids, attention_mask=attention_mask,
        speech_tensors=wav, speech_masks=frame_mask,
        speech_input_mask=speech_input_mask,
        tokenizer=MockTok(), max_new_tokens=max_new, max_length_times=16,
        cfg_scale=1.5, show_progress_bar=False, verbose=False,
    )
    ref_tokens = ref_out.sequences[0, t0:].numpy()
    ref_audio = ref_out.speech_outputs[0]
    ref_audio = None if ref_audio is None else ref_audio.numpy().reshape(-1)

    # replay the same noise stream: one randn(2,8) per diffusion event
    torch.manual_seed(123)
    noise = np.stack([torch.randn(2, 8).numpy()[:1] for _ in range(max_new)])  # [F, 1, 8]

    gen = G.GenerationConfig(
        speech_start_id=SPEECH_START, speech_end_id=SPEECH_END,
        speech_diffusion_id=DIFF, eos_id=EOS, cfg_scale=1.5,
        ddpm_steps=4, max_length_times=16,
    )
    eng = G.Engine(params, cfg, gen, max_steps=max_new, batch=1, prompt_len=t0,
                   inject_latent_noise=True)
    res = G.generate(eng, np.array([ids]), np.ones((1, t0), np.int32),
                     np.array([sim]),
                     speech_tensors=wav.numpy(), speech_frame_masks=frame_mask.numpy(),
                     latent_noise=noise)

    n = min(len(ref_tokens), res.tokens.shape[1])
    np.testing.assert_array_equal(res.tokens[0, :n], ref_tokens[:n])

    if ref_audio is not None:
        ours = res.audio[0]
        assert ours is not None
        m = min(len(ours), len(ref_audio))
        assert m > 0
        np.testing.assert_allclose(ours[:m], ref_audio[:m], atol=5e-4)

"""VibeVoice model assembly: LM + tokenizers + connectors + diffusion head.

Re-designs `VibeVoiceModel` / `VibeVoiceForConditionalGeneration`
(`vibevoice/modular/modeling_vibevoice.py:107-477`) as a params pytree plus
pure functions:

  * `init_model`            — full parameter tree
  * `sample_speech_latents` — per-frame CFG diffusion sampling as ONE
                              `lax.scan` over solver steps (ref
                              `sample_speech_tokens`
                              modeling_vibevoice_inference.py:712-725)
  * `training_forward`      — LM logits + diffusion MSE loss (ref forward
                              :332-477), mask-based splice instead of
                              boolean-index assignment
  * speech scaling stats via `psum`-friendly masked reductions (ref
    dist.all_reduce :312-317)
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configs import VibeVoiceConfig
from ..schedule import dpm_solver as ds
from . import connectors, diffusion_head, qwen2, tokenizer

Params = Dict[str, Any]


def init_model(key, cfg: VibeVoiceConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    h = cfg.decoder.hidden_size
    params = {
        "lm": qwen2.init(ks[0], cfg.decoder, dtype),
        "acoustic_encoder": tokenizer.init_encoder(ks[1], cfg.acoustic_tokenizer, dtype),
        "acoustic_decoder": tokenizer.init_decoder(ks[2], cfg.acoustic_tokenizer, dtype),
        "semantic_encoder": tokenizer.init_encoder(ks[3], cfg.semantic_tokenizer, dtype),
        "acoustic_connector": connectors.init(ks[4], cfg.acoustic_vae_dim, h, dtype),
        "semantic_connector": connectors.init(ks[5], cfg.semantic_vae_dim, h, dtype),
        "diffusion_head": diffusion_head.init(ks[6], cfg.diffusion_head, dtype),
        # NaN until the first training batch computes them (ref :131-132)
        "speech_scaling_factor": jnp.asarray(jnp.nan, jnp.float32),
        "speech_bias_factor": jnp.asarray(jnp.nan, jnp.float32),
    }
    if not cfg.decoder.tie_word_embeddings:
        params["lm_head"] = (jax.random.normal(ks[7], (h, cfg.decoder.vocab_size), jnp.float32) * 0.02).astype(dtype)
    else:
        params["lm_head"] = None
    return params


def lm_logits(params: Params, cfg: VibeVoiceConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    return qwen2.logits(params["lm"], cfg.decoder, hidden, params["lm_head"])


def lm_head_subset(params: Params, ids, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Column subset of the logits head for the constrained decode vocab.

    During generation only the 4-5 control tokens are ever selectable (ref
    `VibeVoiceTokenConstraintProcessor`
    modeling_vibevoice_inference.py:54-67, valid set :405-413), yet a full
    logits matmul reads the whole [H, V] head — 466 MB bf16 at 1.5B — every
    decode step.  Gathering the allowed columns ONCE reduces the per-step
    head read to [H, n].  Each subset column is computed with the identical
    reduction (same dtype path, same per-column dot) as the full matmul, so
    argmax over the subset equals argmax over the bias-masked full vocab
    (ids are sorted ascending, preserving lowest-index tie-breaking).

    Returns {"q": int8 [H, n], "scale": [n]} for int8 heads or
    {"w": [H, n]} otherwise; feed to `lm_logits_subset`.
    """
    import numpy as np
    ids = np.asarray(sorted(set(int(i) for i in ids)), np.int32)
    head = params.get("lm_head")
    if head is None:
        e = params["lm"]["embed"]
        if isinstance(e, dict):  # int8 embed, per-row scales (rows = vocab)
            return {"q": jnp.transpose(e["qint8"][ids]), "scale": e["scale"][ids]}
        return {"w": jnp.transpose(e[ids])}
    if isinstance(head, dict):
        if "qint4" in head:
            from ..ops.int4_matmul import dequant_int4_xla

            # ONE jit: int4 arrays cannot cross jit/eager boundaries in this
            # environment (see ops/int4_matmul.py docstring) — the eager
            # column-gather + bitcast path RecursionErrors on the TPU backend
            @jax.jit
            def _sub(q, s):
                return dequant_int4_xla(q[:, ids], s[:, ids], dtype)

            return {"w": _sub(head["qint4"], head["scale4"])}
        return {"q": head["qint8"][:, ids], "scale": head["scale"][ids]}
    return {"w": head[:, ids]}


def lm_logits_subset(sub: Dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
    """Logits over the allowed-token subset (see `lm_head_subset`)."""
    if "q" in sub:
        return (hidden @ sub["q"].astype(hidden.dtype)) * sub["scale"].astype(hidden.dtype)
    return hidden @ sub["w"].astype(hidden.dtype)


# ---------------------------------------------------------------------------
# CFG diffusion sampling (inference hot loop)
# ---------------------------------------------------------------------------

def sample_speech_latents(
    params: Params,
    cfg: VibeVoiceConfig,
    solver_cfg: ds.SolverConfig,
    sched: ds.Schedule,
    condition: jnp.ndarray,      # [N, H] positive LM hidden states
    neg_condition: jnp.ndarray,  # [N, H] negative (CFG) hidden states
    cfg_scale: float,
    x_init: jnp.ndarray,         # [N, latent] initial noise ~ N(0, I)
    step_noise: Optional[jnp.ndarray] = None,  # [steps, N, latent] for SDE solver
    sde_rng: Optional[jnp.ndarray] = None,     # PRNG key: draw SDE noise per step
) -> jnp.ndarray:
    """DPM-Solver sampling with classifier-free guidance, as one lax.scan.

    Mirrors `sample_speech_tokens` (ref :712-725): each step runs the head on
    the [cond; neg] doubled batch and combines `uncond + s*(cond-uncond)`.
    """
    dh_cfg = cfg.diffusion_head
    cond2 = jnp.concatenate([condition, neg_condition], axis=0)
    state0 = ds.init_state(solver_cfg, x_init.shape, x_init.dtype)

    # conditioning math hoisted out of the sequential solver chain: all
    # adaLN modulations for all steps in one batched matmul
    layer_mods, final_mod = diffusion_head.precompute_modulations(
        params["diffusion_head"], dh_cfg, cond2, sched.timesteps)
    # opt-in fused int4 solver-step kernel (ops/fused_head.py): one pallas
    # call per step streams the nibble-packed FFN weights — halves the 5x
    # per-frame head re-read the int8 path pays
    packq = params.get("_diffusion_head_packq")
    if packq is not None:
        from ..ops import fused_head
        from ..utils.quantize import mm as _mm
        mods_stack = jnp.stack(layer_mods, axis=1)  # [S, L, N, 3H]

    def body(carry, i):
        x, st = carry
        x2 = jnp.concatenate([x, x], axis=0)
        if packq is not None:
            xp = _mm(x2, params["diffusion_head"]["noisy_proj"])
            eps = fused_head.fused_head_solver_step(
                packq, xp, mods_stack[i], final_mod[i],
                params["diffusion_head"]["final_linear"],
                dh_cfg.rms_norm_eps)
        else:
            eps = diffusion_head.apply_with_modulations(
                params["diffusion_head"], dh_cfg, x2,
                [m[i] for m in layer_mods], final_mod[i])
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        noise = None
        if step_noise is not None:
            noise = step_noise[i]
        elif sde_rng is not None:
            noise = jax.random.normal(jax.random.fold_in(sde_rng, i),
                                      x.shape, jnp.float32)
        x_new, st = ds.step(solver_cfg, sched, i, st, guided, x, noise=noise)
        return (x_new, st), None

    (x, _), _ = lax.scan(body, (x_init, state0),
                         jnp.arange(sched.num_steps, dtype=jnp.int32))
    return x


# ---------------------------------------------------------------------------
# speech feature path (voice prompts + training)
# ---------------------------------------------------------------------------

def compute_scaling_stats(latents: jnp.ndarray, mask: jnp.ndarray,
                          axis_name: Optional[str] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """scaling = 1/std(masked latents), bias = -mean (ref :307-317).

    With `axis_name` set, the per-rank stats are averaged with `lax.pmean`
    (the GSPMD analogue of the reference's NCCL all_reduce).
    """
    m = mask[..., None].astype(latents.dtype)
    n = jnp.maximum(m.sum() * latents.shape[-1], 1.0)
    mean = (latents * m).sum() / n
    var = (((latents - mean) * m) ** 2).sum() / jnp.maximum(n - 1.0, 1.0)
    scaling = 1.0 / jnp.sqrt(var)
    bias = -mean
    if axis_name is not None:
        scaling = lax.pmean(scaling, axis_name)
        bias = lax.pmean(bias, axis_name)
    return scaling, bias


def encode_voice_prompts(
    params: Params,
    cfg: VibeVoiceConfig,
    key,
    speech_tensors: jnp.ndarray,  # [N, T] audio
    sample_noise: bool = True,
) -> jnp.ndarray:
    """audio -> sampled acoustic latents [N, F, vae_dim]
    (ref _process_speech_inputs modeling_vibevoice_inference.py:150-164)."""
    lat = tokenizer.encoder_apply(params["acoustic_encoder"], cfg.acoustic_tokenizer,
                                  speech_tensors[..., None])
    ac = cfg.acoustic_tokenizer
    if sample_noise and ac.std_dist_type == "gaussian":
        lat = tokenizer.vae_sample_gaussian(key, lat, ac.fix_std)
    elif sample_noise and ac.std_dist_type == "fix":
        lat = tokenizer.vae_sample_fix(key, lat, ac.fix_std)
    return lat


def scale_latents(params: Params, latents: jnp.ndarray) -> jnp.ndarray:
    """(latents + bias) * scaling (ref :159, :325)."""
    return (latents + params["speech_bias_factor"].astype(latents.dtype)) * \
        params["speech_scaling_factor"].astype(latents.dtype)


def unscale_latents(params: Params, latents: jnp.ndarray) -> jnp.ndarray:
    """latents / scaling - bias (ref :651)."""
    return latents / params["speech_scaling_factor"].astype(latents.dtype) - \
        params["speech_bias_factor"].astype(latents.dtype)


def splice_speech_embeds(inputs_embeds: jnp.ndarray, speech_embeds: jnp.ndarray,
                         speech_input_mask: jnp.ndarray) -> jnp.ndarray:
    """Place flattened speech embeddings at masked positions.

    The reference does boolean-index assignment
    (`inputs_embeds[speech_input_mask] = speech_embeds`,
    modeling_vibevoice_inference.py:225).  Static-shape equivalent: the n-th
    True position (row-major) takes `speech_embeds[n]`.
    """
    b, t, h = inputs_embeds.shape
    flat_mask = speech_input_mask.reshape(-1)
    idx = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    idx = jnp.clip(idx, 0, speech_embeds.shape[0] - 1)
    gathered = speech_embeds[idx].astype(inputs_embeds.dtype)
    flat = inputs_embeds.reshape(-1, h)
    out = jnp.where(flat_mask[:, None], gathered, flat)
    return out.reshape(b, t, h)


# ---------------------------------------------------------------------------
# training forward (ref VibeVoiceForConditionalGeneration.forward :332-477)
# ---------------------------------------------------------------------------

class TrainingOutput(NamedTuple):
    logits: jnp.ndarray
    diffusion_loss: jnp.ndarray
    ce_loss: jnp.ndarray


def training_forward(
    params: Params,
    cfg: VibeVoiceConfig,
    solver_tables: ds.SolverTables,
    key,
    input_ids: jnp.ndarray,            # [B, T]
    attention_mask: jnp.ndarray,       # [B, T]
    speech_tensors: jnp.ndarray,       # [N, Ta] voice audio
    speech_masks: jnp.ndarray,         # [N, F] valid-frame mask
    speech_semantic_tensors: jnp.ndarray,  # [N, F, sem_dim]
    acoustic_input_mask: jnp.ndarray,  # [B, T] bool: speech positions in sequence
    acoustic_loss_mask: jnp.ndarray,   # [B, T] bool: positions w/ diffusion loss
    labels: Optional[jnp.ndarray] = None,  # [B, T] (-100 = ignore)
    ddpm_batch_mul: int = 1,
    speeches_loss_input: Optional[jnp.ndarray] = None,  # [N, F]: frames w/ diffusion loss
    injected_noise: Optional[jnp.ndarray] = None,      # [N*mul, latent] parity tests
    injected_timesteps: Optional[jnp.ndarray] = None,  # [N*mul]
) -> TrainingOutput:
    """Training-shaped forward. Scaling factors must already be set
    (use `compute_scaling_stats` + tree update on first batch)."""
    dec = cfg.decoder
    k_vae, k_noise, k_t = jax.random.split(key, 3)

    # embed text then splice speech features (ref :358-383).  With
    # `speeches_loss_input` the splice adds semantic features (ref :371);
    # the default path splices acoustic-connector features only (ref :383).
    embeds = params["lm"]["embed"][input_ids]
    sem_connect = connectors.apply(params["semantic_connector"], speech_semantic_tensors)
    latents = encode_voice_prompts(params, cfg, k_vae, speech_tensors)
    latents = lax.stop_gradient(latents)  # tokenizer is frozen (ref no_grad :287)
    audio_features = scale_latents(params, latents)           # [N, F, vae]
    ac_connect = connectors.apply(params["acoustic_connector"], audio_features)
    if speeches_loss_input is not None:
        combined = (ac_connect + sem_connect).reshape(-1, dec.hidden_size)
    else:
        combined = ac_connect.reshape(-1, dec.hidden_size)
    flat_valid = speech_masks.reshape(-1)
    # keep only valid frames, packed to the front (matches [speech_masks] select)
    order = jnp.argsort(~flat_valid, stable=True)
    packed = combined[order]
    embeds = splice_speech_embeds(embeds, packed, acoustic_input_mask)

    pos = qwen2.positions_from_mask(attention_mask)
    bias = qwen2.causal_bias(attention_mask, input_ids.shape[1])
    hidden, _ = qwen2.forward(params["lm"], dec, embeds, pos, bias)
    logits = lm_logits(params, cfg, hidden)

    # CE loss (left to the outer script in the reference :404-406; we provide it)
    if labels is not None:
        valid = labels != -100
        oh = jax.nn.one_hot(jnp.where(valid, labels, 0), dec.vocab_size, dtype=logits.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -(oh * logp).sum(-1)
        ce_loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1)
    else:
        ce_loss = jnp.zeros((), jnp.float32)

    # diffusion loss (ref :411-455); with speeches_loss_input only the
    # flagged frames contribute (ref :374-375)
    if speeches_loss_input is not None:
        flat_valid = (speech_masks & speeches_loss_input).reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)
    flat_latents = audio_features.reshape(-1, cfg.acoustic_vae_dim)[order]
    cond = hidden.reshape(-1, dec.hidden_size)
    loss_sel = jnp.argsort(~acoustic_loss_mask.reshape(-1), stable=True)
    cond_packed = cond[loss_sel]
    n_loss = acoustic_loss_mask.sum()

    speech_rep = jnp.repeat(flat_latents, ddpm_batch_mul, axis=0)
    cond_rep = jnp.repeat(cond_packed[: flat_latents.shape[0]], ddpm_batch_mul, axis=0)
    n_rep = speech_rep.shape[0]
    if injected_noise is not None:
        noise = injected_noise.astype(speech_rep.dtype)
        timesteps = injected_timesteps
    else:
        noise = jax.random.normal(k_noise, speech_rep.shape, speech_rep.dtype)
        timesteps = jax.random.randint(k_t, (n_rep,), 0, cfg.diffusion_head.ddpm_num_steps)

    noisy = ds.add_noise(solver_tables, speech_rep, noise, timesteps)
    pred = diffusion_head.apply(params["diffusion_head"], cfg.diffusion_head,
                                noisy, timesteps.astype(speech_rep.dtype), cond_rep)
    if cfg.diffusion_head.prediction_type == "epsilon":
        target = noise
    else:
        target = ds.get_velocity(solver_tables, speech_rep, noise, timesteps)

    frame_valid = jnp.repeat(flat_valid[order], ddpm_batch_mul, axis=0)
    se = ((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2).sum(-1)
    diffusion_loss = (se * frame_valid).sum() / cfg.acoustic_vae_dim / ddpm_batch_mul
    return TrainingOutput(logits=logits, diffusion_loss=diffusion_loss, ce_loss=ce_loss)


__all__ = [
    "init_model",
    "lm_logits",
    "lm_head_subset",
    "lm_logits_subset",
    "sample_speech_latents",
    "compute_scaling_stats",
    "encode_voice_prompts",
    "scale_latents",
    "unscale_latents",
    "splice_speech_embeds",
    "training_forward",
    "TrainingOutput",
]

"""Training step: LM cross-entropy + diffusion loss, GSPMD-sharded.

The reference ships only the training-shaped forward
(`vibevoice/modular/modeling_vibevoice.py:332-477`); the loop lives outside
the repo ("release training code" TODO, README.md:42).  Here the full step is
provided: loss = CE + diffusion MSE, optax update, jit over a `(data, model)`
mesh with parameter shardings from `parallel/mesh.py` — the GSPMD equivalent
of the reference's DDP + declared-but-unused HF TP plan.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .configs import VibeVoiceConfig
from .models import vibevoice
from .schedule import dpm_solver as ds


class TrainBatch(NamedTuple):
    input_ids: jnp.ndarray             # [B, T]
    attention_mask: jnp.ndarray        # [B, T]
    labels: jnp.ndarray                # [B, T] (-100 ignore)
    speech_tensors: jnp.ndarray        # [N, Ta]
    speech_masks: jnp.ndarray          # [N, F]
    speech_semantic_tensors: jnp.ndarray  # [N, F, sem]
    acoustic_input_mask: jnp.ndarray   # [B, T]
    acoustic_loss_mask: jnp.ndarray    # [B, T]


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup_steps: int = 100, total_steps: int = 10000):
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay,
                    mask=lambda p: jax.tree_util.tree_map(lambda x: x.ndim > 1, p)),
    )


def make_train_step(cfg: VibeVoiceConfig, optimizer,
                    ddpm_batch_mul: Optional[int] = None,
                    diffusion_loss_weight: float = 1.0):
    """Returns jittable `train_step(params, opt_state, batch, key)`.

    Sharding: caller device_puts params/opt_state with
    `parallel.mesh.shard_params` and the batch with `batch_specs`; GSPMD
    propagates and inserts the collectives (grad psum over `data`,
    activation all-gathers over `model`)."""
    solver_cfg = ds.SolverConfig(
        num_train_timesteps=cfg.diffusion_head.ddpm_num_steps,
        beta_schedule=cfg.diffusion_head.ddpm_beta_schedule,
        prediction_type=cfg.diffusion_head.prediction_type,
    )
    tables = ds.make_tables(solver_cfg)
    bm = ddpm_batch_mul if ddpm_batch_mul is not None else cfg.diffusion_head.ddpm_batch_mul

    def loss_fn(params, batch: TrainBatch, key):
        out = vibevoice.training_forward(
            params, cfg, tables, key,
            input_ids=batch.input_ids,
            attention_mask=batch.attention_mask,
            speech_tensors=batch.speech_tensors,
            speech_masks=batch.speech_masks,
            speech_semantic_tensors=batch.speech_semantic_tensors,
            acoustic_input_mask=batch.acoustic_input_mask,
            acoustic_loss_mask=batch.acoustic_loss_mask,
            labels=batch.labels,
            ddpm_batch_mul=bm,
        )
        loss = out.ce_loss + diffusion_loss_weight * out.diffusion_loss
        return loss, {"ce_loss": out.ce_loss, "diffusion_loss": out.diffusion_loss}

    def train_step(params, opt_state, batch: TrainBatch, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return train_step


def init_scaling_stats(params, cfg: VibeVoiceConfig, key, batch: TrainBatch,
                       axis_name: Optional[str] = None):
    """First-batch scaling/bias computation (ref :307-323): encode the batch's
    speech, compute global stats (pmean across ranks), write into params."""
    latents = vibevoice.encode_voice_prompts(params, cfg, key, batch.speech_tensors)
    scaling, bias = vibevoice.compute_scaling_stats(latents, batch.speech_masks, axis_name)
    params = dict(params)
    params["speech_scaling_factor"] = scaling.astype(jnp.float32)
    params["speech_bias_factor"] = bias.astype(jnp.float32)
    return params


__all__ = ["TrainBatch", "make_optimizer", "make_train_step", "init_scaling_stats"]

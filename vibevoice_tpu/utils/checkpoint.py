"""Checkpoint import/export.

Import path: HF-format VibeVoice checkpoints (safetensors shards, the output
of the reference's converter
`vibevoice/scripts/convert_nnscaler_checkpoint_to_transformers.py:20-131` —
name scheme incl. `model.model.` stripping :53 and tied lm_head :46-56) into
our params pytree.  Export path: orbax (or npz fallback) of the native tree.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp


def _conv_w(a):
    return jnp.asarray(np.asarray(a).transpose(2, 1, 0))


def _convt_w(a):
    return jnp.asarray(np.asarray(a).transpose(0, 2, 1))


def _lin_w(a):
    return jnp.asarray(np.asarray(a).T)


def _vec(a):
    return jnp.asarray(np.asarray(a))


def _tok_encoder_from_flat(sd: Dict[str, np.ndarray], prefix: str, n_stages: int,
                           depths) -> Dict[str, Any]:
    def conv(name):
        w = sd[f"{name}.weight"]
        b = sd.get(f"{name}.bias")
        return {"w": _conv_w(w), "b": None if b is None else _vec(b)}

    down = [conv(f"{prefix}.downsample_layers.{i}.0.conv.conv") for i in range(n_stages)]
    stages = []
    for i in range(n_stages):
        blocks = []
        for j in range(depths[i]):
            base = f"{prefix}.stages.{i}.{j}"
            blocks.append({
                "norm_w": _vec(sd[f"{base}.norm.weight"]),
                "mixer": conv(f"{base}.mixer.conv.conv.conv"),
                "gamma": _vec(sd[f"{base}.gamma"]),
                "ffn_norm_w": _vec(sd[f"{base}.ffn_norm.weight"]),
                "ffn1": {"w": _lin_w(sd[f"{base}.ffn.linear1.weight"]),
                         "b": _vec(sd[f"{base}.ffn.linear1.bias"]) if f"{base}.ffn.linear1.bias" in sd else None},
                "ffn2": {"w": _lin_w(sd[f"{base}.ffn.linear2.weight"]),
                         "b": _vec(sd[f"{base}.ffn.linear2.bias"]) if f"{base}.ffn.linear2.bias" in sd else None},
                "ffn_gamma": _vec(sd[f"{base}.ffn_gamma"]),
            })
        stages.append(blocks)
    final = _vec(sd[f"{prefix}.norm.weight"]) if f"{prefix}.norm.weight" in sd else None
    return {"down": down, "stages": stages, "final_norm_w": final,
            "head": conv(f"{prefix}.head.conv.conv")}


def _tok_decoder_from_flat(sd, prefix: str, n_stages: int, depths) -> Dict[str, Any]:
    def conv(name):
        return {"w": _conv_w(sd[f"{name}.weight"]),
                "b": _vec(sd[f"{name}.bias"]) if f"{name}.bias" in sd else None}

    def convt(name):
        return {"w": _convt_w(sd[f"{name}.weight"]),
                "b": _vec(sd[f"{name}.bias"]) if f"{name}.bias" in sd else None}

    up = [conv(f"{prefix}.upsample_layers.0.0.conv.conv")]
    for i in range(1, n_stages):
        up.append(convt(f"{prefix}.upsample_layers.{i}.0.convtr.convtr"))
    enc_like = _tok_encoder_from_flat(
        {k.replace(".upsample_layers.", ".downsample_layers."): v for k, v in sd.items()},
        prefix, 0, [])
    stages = []
    for i in range(n_stages):
        blocks = []
        for j in range(depths[i]):
            base = f"{prefix}.stages.{i}.{j}"
            blocks.append({
                "norm_w": _vec(sd[f"{base}.norm.weight"]),
                "mixer": conv(f"{base}.mixer.conv.conv.conv"),
                "gamma": _vec(sd[f"{base}.gamma"]),
                "ffn_norm_w": _vec(sd[f"{base}.ffn_norm.weight"]),
                "ffn1": {"w": _lin_w(sd[f"{base}.ffn.linear1.weight"]),
                         "b": _vec(sd[f"{base}.ffn.linear1.bias"]) if f"{base}.ffn.linear1.bias" in sd else None},
                "ffn2": {"w": _lin_w(sd[f"{base}.ffn.linear2.weight"]),
                         "b": _vec(sd[f"{base}.ffn.linear2.bias"]) if f"{base}.ffn.linear2.bias" in sd else None},
                "ffn_gamma": _vec(sd[f"{base}.ffn_gamma"]),
            })
        stages.append(blocks)
    final = _vec(sd[f"{prefix}.norm.weight"]) if f"{prefix}.norm.weight" in sd else None
    return {"up": up, "stages": stages, "final_norm_w": final,
            "head": conv(f"{prefix}.head.conv.conv")}


def _connector_from_flat(sd, prefix: str) -> Dict[str, Any]:
    return {
        "fc1": {"w": _lin_w(sd[f"{prefix}.fc1.weight"]), "b": _vec(sd[f"{prefix}.fc1.bias"])},
        "norm_w": _vec(sd[f"{prefix}.norm.weight"]),
        "fc2": {"w": _lin_w(sd[f"{prefix}.fc2.weight"]), "b": _vec(sd[f"{prefix}.fc2.bias"])},
    }


def params_from_flat(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Flat HF state dict -> params pytree (cfg: VibeVoiceConfig)."""
    lm_prefix = "model.language_model"
    layers = []
    for i in range(cfg.decoder.num_hidden_layers):
        b = f"{lm_prefix}.layers.{i}"
        layers.append({
            "input_norm_w": _vec(sd[f"{b}.input_layernorm.weight"]),
            "q": {"w": _lin_w(sd[f"{b}.self_attn.q_proj.weight"]),
                  "b": _vec(sd[f"{b}.self_attn.q_proj.bias"]) if f"{b}.self_attn.q_proj.bias" in sd else None},
            "k": {"w": _lin_w(sd[f"{b}.self_attn.k_proj.weight"]),
                  "b": _vec(sd[f"{b}.self_attn.k_proj.bias"]) if f"{b}.self_attn.k_proj.bias" in sd else None},
            "v": {"w": _lin_w(sd[f"{b}.self_attn.v_proj.weight"]),
                  "b": _vec(sd[f"{b}.self_attn.v_proj.bias"]) if f"{b}.self_attn.v_proj.bias" in sd else None},
            "o": {"w": _lin_w(sd[f"{b}.self_attn.o_proj.weight"]), "b": None},
            "post_norm_w": _vec(sd[f"{b}.post_attention_layernorm.weight"]),
            "gate": _lin_w(sd[f"{b}.mlp.gate_proj.weight"]),
            "up": _lin_w(sd[f"{b}.mlp.up_proj.weight"]),
            "down": _lin_w(sd[f"{b}.mlp.down_proj.weight"]),
        })

    ac = cfg.acoustic_tokenizer
    se = cfg.semantic_tokenizer
    n_enc = len(ac.encoder_depths)
    dec_depths = ac.decoder_depths_resolved()

    params = {
        "lm": {
            "embed": _vec(sd[f"{lm_prefix}.embed_tokens.weight"]),
            "layers": layers,
            "final_norm_w": _vec(sd[f"{lm_prefix}.norm.weight"]),
        },
        "acoustic_encoder": _tok_encoder_from_flat(sd, "model.acoustic_tokenizer.encoder",
                                                   n_enc, ac.encoder_depths),
        "acoustic_decoder": _tok_decoder_from_flat(sd, "model.acoustic_tokenizer.decoder",
                                                   len(dec_depths), dec_depths),
        "semantic_encoder": _tok_encoder_from_flat(sd, "model.semantic_tokenizer.encoder",
                                                   len(se.encoder_depths), se.encoder_depths),
        "acoustic_connector": _connector_from_flat(sd, "model.acoustic_connector"),
        "semantic_connector": _connector_from_flat(sd, "model.semantic_connector"),
        "diffusion_head": {
            "noisy_proj": _lin_w(sd["model.prediction_head.noisy_images_proj.weight"]),
            "cond_proj": _lin_w(sd["model.prediction_head.cond_proj.weight"]),
            "t_mlp1": _lin_w(sd["model.prediction_head.t_embedder.mlp.0.weight"]),
            "t_mlp2": _lin_w(sd["model.prediction_head.t_embedder.mlp.2.weight"]),
            "layers": [
                {
                    "ada_w": _lin_w(sd[f"model.prediction_head.layers.{i}.adaLN_modulation.1.weight"]),
                    "norm_w": _vec(sd[f"model.prediction_head.layers.{i}.norm.weight"]),
                    "gate": _lin_w(sd[f"model.prediction_head.layers.{i}.ffn.gate_proj.weight"]),
                    "up": _lin_w(sd[f"model.prediction_head.layers.{i}.ffn.up_proj.weight"]),
                    "down": _lin_w(sd[f"model.prediction_head.layers.{i}.ffn.down_proj.weight"]),
                }
                for i in range(cfg.diffusion_head.head_layers)
            ],
            "final_ada_w": _lin_w(sd["model.prediction_head.final_layer.adaLN_modulation.1.weight"]),
            "final_linear": _lin_w(sd["model.prediction_head.final_layer.linear.weight"]),
        },
        "speech_scaling_factor": _vec(sd.get("model.speech_scaling_factor", np.float32(np.nan))),
        "speech_bias_factor": _vec(sd.get("model.speech_bias_factor", np.float32(np.nan))),
        "lm_head": _lin_w(sd["lm_head.weight"]) if "lm_head.weight" in sd
                   and not cfg.decoder.tie_word_embeddings else None,
    }
    return params


def load_hf_checkpoint(model_path: str, cfg=None, dtype=None) -> Dict[str, Any]:
    """Load an HF-format VibeVoice checkpoint directory into a params tree."""
    from ..configs import config_from_json
    if cfg is None:
        cfg = config_from_json(os.path.join(model_path, "config.json"))

    sd: Dict[str, np.ndarray] = {}
    index_path = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    elif os.path.exists(os.path.join(model_path, "model.safetensors")):
        shards = ["model.safetensors"]
    else:
        raise FileNotFoundError(f"no safetensors found under {model_path}")

    from safetensors import safe_open
    for shard in shards:
        with safe_open(os.path.join(model_path, shard), framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)

    params = params_from_flat(sd, cfg)
    if dtype is not None:
        import jax
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "astype") and
            jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    return params, cfg


def save_native(params, path: str):
    """Save the params tree with orbax (npz fallback)."""
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), params)
        ckptr.wait_until_finished()
        return
    except Exception:
        import jax
        flat, treedef = jax.tree_util.tree_flatten(params)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 *[np.asarray(x) for x in flat])


def load_native(path: str, like=None):
    """Load a native checkpoint saved by `save_native`.

    `like`: an abstract/concrete params tree with the target structure —
    required for the npz fallback and used by orbax for restore typing.
    """
    import jax
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz_path):
        if like is None:
            raise ValueError("npz restore needs a `like` tree for structure")
        data = np.load(npz_path)
        flat, treedef = jax.tree_util.tree_flatten(like)
        arrays = [jnp.asarray(data[k]) for k in data.files]
        assert len(arrays) == len(flat), "checkpoint/tree leaf count mismatch"
        return jax.tree_util.tree_unflatten(treedef, arrays)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(os.path.abspath(path), abstract)
    return ckptr.restore(os.path.abspath(path))


__all__ = ["params_from_flat", "load_hf_checkpoint", "save_native", "load_native"]

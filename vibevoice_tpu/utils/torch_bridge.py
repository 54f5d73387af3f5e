"""Bridge: PyTorch reference weights -> JAX param pytrees.

Used by the parity test-suite (which instantiates the read-only reference
modules on CPU) and by the checkpoint importer.  Layout conversions:

  torch Conv1d.weight          [Cout, Cin/g, K] -> ours [K, Cin/g, Cout]
  torch ConvTranspose1d.weight [Cin, Cout, K]   -> ours [Cin, K, Cout]
  torch Linear.weight          [Out, In]        -> ours [In, Out]

Name scheme follows the reference module tree so the same walker serves both
live modules (tests) and safetensors state dicts (checkpoint import); see
`vibevoice/scripts/convert_nnscaler_checkpoint_to_transformers.py:53` for the
reference's own name handling.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (detached, fp32-preserving)."""
    return np.asarray(x.detach().cpu().numpy())


def conv_w(w) -> jnp.ndarray:
    return jnp.asarray(_t(w).transpose(2, 1, 0))


def convt_w(w) -> jnp.ndarray:
    return jnp.asarray(_t(w).transpose(0, 2, 1))


def linear_w(w) -> jnp.ndarray:
    return jnp.asarray(_t(w).T)


def vec(w) -> jnp.ndarray:
    return jnp.asarray(_t(w))


def _sconv(m) -> Dict[str, Any]:
    conv = m.conv.conv  # SConv1d -> NormConv1d -> nn.Conv1d
    return {"w": conv_w(conv.weight), "b": vec(conv.bias) if conv.bias is not None else None}


def _sconvt(m) -> Dict[str, Any]:
    convtr = m.convtr.convtr
    return {"w": convt_w(convtr.weight), "b": vec(convtr.bias) if convtr.bias is not None else None}


def _block(b) -> Dict[str, Any]:
    return {
        "norm_w": vec(b.norm.weight),
        "mixer": _sconv(b.mixer.conv),
        "gamma": vec(b.gamma),
        "ffn_norm_w": vec(b.ffn_norm.weight),
        "ffn1": {"w": linear_w(b.ffn.linear1.weight),
                 "b": vec(b.ffn.linear1.bias) if b.ffn.linear1.bias is not None else None},
        "ffn2": {"w": linear_w(b.ffn.linear2.weight),
                 "b": vec(b.ffn.linear2.bias) if b.ffn.linear2.bias is not None else None},
        "ffn_gamma": vec(b.ffn_gamma),
    }


def encoder_from_torch(enc) -> Dict[str, Any]:
    """reference TokenizerEncoder module -> our encoder params."""
    down = [_sconv(seq[0]) for seq in enc.downsample_layers]
    stages = [[_block(b) for b in stage] for stage in enc.stages]
    final = vec(enc.norm.weight) if hasattr(enc.norm, "weight") else None
    return {"down": down, "stages": stages, "final_norm_w": final, "head": _sconv(enc.head)}


def decoder_from_torch(dec) -> Dict[str, Any]:
    """reference TokenizerDecoder module -> our decoder params."""
    up = []
    for i, seq in enumerate(dec.upsample_layers):
        layer = seq[0]
        up.append(_sconv(layer) if i == 0 else _sconvt(layer))
    stages = [[_block(b) for b in stage] for stage in dec.stages]
    final = vec(dec.norm.weight) if hasattr(dec.norm, "weight") else None
    return {"up": up, "stages": stages, "final_norm_w": final, "head": _sconv(dec.head)}


def diffusion_head_from_torch(head) -> Dict[str, Any]:
    """reference VibeVoiceDiffusionHead -> our params (see models/diffusion_head.py)."""
    return {
        "noisy_proj": linear_w(head.noisy_images_proj.weight),
        "cond_proj": linear_w(head.cond_proj.weight),
        "t_mlp1": linear_w(head.t_embedder.mlp[0].weight),
        "t_mlp2": linear_w(head.t_embedder.mlp[2].weight),
        "layers": [
            {
                "ada_w": linear_w(l.adaLN_modulation[1].weight),
                "norm_w": vec(l.norm.weight),
                "gate": linear_w(l.ffn.gate_proj.weight),
                "up": linear_w(l.ffn.up_proj.weight),
                "down": linear_w(l.ffn.down_proj.weight),
            }
            for l in head.layers
        ],
        "final_ada_w": linear_w(head.final_layer.adaLN_modulation[1].weight),
        "final_linear": linear_w(head.final_layer.linear.weight),
    }


def qwen2_from_torch(model) -> Dict[str, Any]:
    """transformers Qwen2Model -> our params (see models/qwen2.py)."""
    layers = []
    for l in model.layers:
        layers.append({
            "input_norm_w": vec(l.input_layernorm.weight),
            "q": {"w": linear_w(l.self_attn.q_proj.weight),
                  "b": vec(l.self_attn.q_proj.bias) if l.self_attn.q_proj.bias is not None else None},
            "k": {"w": linear_w(l.self_attn.k_proj.weight),
                  "b": vec(l.self_attn.k_proj.bias) if l.self_attn.k_proj.bias is not None else None},
            "v": {"w": linear_w(l.self_attn.v_proj.weight),
                  "b": vec(l.self_attn.v_proj.bias) if l.self_attn.v_proj.bias is not None else None},
            "o": {"w": linear_w(l.self_attn.o_proj.weight), "b": None},
            "post_norm_w": vec(l.post_attention_layernorm.weight),
            "gate": linear_w(l.mlp.gate_proj.weight),
            "up": linear_w(l.mlp.up_proj.weight),
            "down": linear_w(l.mlp.down_proj.weight),
        })
    return {
        "embed": vec(model.embed_tokens.weight),
        "layers": layers,
        "final_norm_w": vec(model.norm.weight),
    }


def connector_from_torch(conn) -> Dict[str, Any]:
    """reference SpeechConnector (modeling_vibevoice.py:58-69) -> our params."""
    return {
        "fc1": {"w": linear_w(conn.fc1.weight), "b": vec(conn.fc1.bias)},
        "norm_w": vec(conn.norm.weight),
        "fc2": {"w": linear_w(conn.fc2.weight), "b": vec(conn.fc2.bias)},
    }


def vibevoice_params_from_torch(model) -> Dict[str, Any]:
    """Full reference model (`VibeVoiceForConditionalGeneration[Inference]`)
    -> our params tree (see models/vibevoice.py:init_model)."""
    core = model.model
    tied = bool(getattr(core.language_model.config, "tie_word_embeddings", False))
    return {
        "lm": qwen2_from_torch(core.language_model),
        "acoustic_encoder": encoder_from_torch(core.acoustic_tokenizer.encoder),
        "acoustic_decoder": decoder_from_torch(core.acoustic_tokenizer.decoder),
        "semantic_encoder": encoder_from_torch(core.semantic_tokenizer.encoder),
        "acoustic_connector": connector_from_torch(core.acoustic_connector),
        "semantic_connector": connector_from_torch(core.semantic_connector),
        "diffusion_head": diffusion_head_from_torch(core.prediction_head),
        "speech_scaling_factor": vec(core.speech_scaling_factor),
        "speech_bias_factor": vec(core.speech_bias_factor),
        "lm_head": None if tied else linear_w(model.lm_head.weight),
    }


__all__ = [
    "vibevoice_params_from_torch",
    "encoder_from_torch",
    "decoder_from_torch",
    "diffusion_head_from_torch",
    "qwen2_from_torch",
    "connector_from_torch",
    "conv_w",
    "convt_w",
    "linear_w",
    "vec",
]

"""Mesh + GSPMD sharding rules.

The reference declares an HF tensor-parallel plan (colwise/rowwise for
q/k/v/o and gate/up/down — `configuration_vibevoice.py:175-183`,
`lm_head: colwise_rep` modeling_vibevoice.py:214) but never executes it
in-repo; its only collective is an all_reduce of scaling stats
(`modeling_vibevoice.py:312-317`).  Here the same split is expressed as
GSPMD `PartitionSpec`s over a `(data, model)` mesh: XLA inserts the
collectives, ICI carries them.

  * `model` axis: attention heads + MLP hidden (col/row split), KV cache
    sharded with heads, diffusion-head FFN hidden.
  * `data` axis: utterance batches; scaling stats become a `pmean`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import VibeVoiceConfig


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = data * model
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _linear_col(bias: bool = True):
    """Output-dim (column) sharded linear: w [in, out_sharded]."""
    p = {"w": P(None, "model")}
    p["b"] = P("model") if bias else None
    return p


def _linear_row():
    """Input-dim (row) sharded linear: w [in_sharded, out]."""
    return {"w": P("model", None), "b": None}


def _replicated_like(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def qwen2_param_specs(n_layers: int) -> Dict[str, Any]:
    layer = {
        "input_norm_w": P(),
        "q": _linear_col(), "k": _linear_col(), "v": _linear_col(),
        "o": _linear_row(),
        "post_norm_w": P(),
        "gate": P(None, "model"), "up": P(None, "model"), "down": P("model", None),
    }
    return {
        "embed": P(None, None),
        "layers": [dict(layer) for _ in range(n_layers)],
        "final_norm_w": P(),
    }


def model_param_specs(params: Dict[str, Any], cfg: VibeVoiceConfig) -> Dict[str, Any]:
    """PartitionSpec tree matching `vibevoice.init_model` output."""
    specs: Dict[str, Any] = {
        "lm": qwen2_param_specs(cfg.decoder.num_hidden_layers),
        # conv stacks are small; replicate (they are the vocoder, bandwidth-bound)
        "acoustic_encoder": _replicated_like(params["acoustic_encoder"]),
        "acoustic_decoder": _replicated_like(params["acoustic_decoder"]),
        "semantic_encoder": _replicated_like(params["semantic_encoder"]),
        "acoustic_connector": _replicated_like(params["acoustic_connector"]),
        "semantic_connector": _replicated_like(params["semantic_connector"]),
        "diffusion_head": {
            "noisy_proj": P(), "cond_proj": P(), "t_mlp1": P(), "t_mlp2": P(),
            "layers": [
                {"ada_w": P(), "norm_w": P(),
                 "gate": P(None, "model"), "up": P(None, "model"),
                 "down": P("model", None)}
                for _ in range(cfg.diffusion_head.head_layers)
            ],
            "final_ada_w": P(), "final_linear": P(),
        },
        "speech_scaling_factor": P(),
        "speech_bias_factor": P(),
        "lm_head": None if params.get("lm_head") is None else P(None, "model"),
    }
    return specs


def adapt_specs_to_quantized(params, specs):
    """Reconcile plain-weight partition specs with an int8-quantized param
    tree (utils/quantize.py): wherever the params hold `{"qint8", "scale"}`
    in place of a weight array, the packed matrix keeps the weight's spec
    and the per-output-channel scale takes the OUT axis's sharding (col-split
    weights shard their scales; row-split weights replicate them).

    The realistic multi-chip deployment is exactly this shape — 7B bf16
    does not fit a 16 GB v5e, so TP serving runs int8 (+int8 KV).  int4's
    fused qkv/gateup layout renames keys and is not TP-adapted (use int8
    for sharded serving).
    """
    if isinstance(params, dict) and "qint8" in params:
        wspec = specs if isinstance(specs, P) else P()
        out_axis = wspec[-1] if len(wspec) >= 2 else None
        return {"qint8": wspec, "scale": P(out_axis)}
    if isinstance(params, dict):
        if not isinstance(specs, dict):
            raise ValueError(
                "param tree has keys the specs lack — int4's fused layout is "
                "not TP-adaptable; quantize with mode='int8' for sharding")
        return {k: (adapt_specs_to_quantized(params[k], specs[k])
                    if k in specs else _replicated_like(params[k]))
                for k in params}
    if isinstance(params, list):
        return [adapt_specs_to_quantized(p, s) for p, s in zip(params, specs)]
    return specs


def shard_params(params, mesh: Mesh, specs=None, cfg: Optional[VibeVoiceConfig] = None):
    if specs is None:
        specs = model_param_specs(params, cfg)
    specs = adapt_specs_to_quantized(params, specs)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None else jax.device_put(x, NamedSharding(mesh, s or P())),
        params, specs, is_leaf=lambda x: x is None)


def batch_specs() -> Dict[str, P]:
    """Input shardings: utterance batch over the data axis."""
    return {
        "input_ids": P("data", None),
        "attention_mask": P("data", None),
        "speech_input_mask": P("data", None),
        "speech_tensors": P("data", None),
        "speech_masks": P("data", None),
        "labels": P("data", None),
    }


__all__ = ["make_mesh", "model_param_specs", "qwen2_param_specs",
           "adapt_specs_to_quantized", "shard_params", "batch_specs"]

#!/usr/bin/env python
"""Convert an nnscaler training checkpoint to this framework's params tree.

Equivalent of the reference's
`vibevoice/scripts/convert_nnscaler_checkpoint_to_transformers.py:20-131`:
strips the `model.model.` prefix (:53), handles tied/untied lm_head (:46-56),
merges `model_part-*` shards, writes either an HF-style flat safetensors file
or a native orbax/npz checkpoint, and verifies by reloading.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_nnscaler_state(ckpt_path: str) -> dict:
    """torch.load the checkpoint (single file or model_part-* shards) and
    return a flat numpy state dict with `model.model.` stripped."""
    import torch

    paths = [ckpt_path]
    if os.path.isdir(ckpt_path):
        parts = sorted(glob.glob(os.path.join(ckpt_path, "*model_part-*")))
        paths = parts or sorted(glob.glob(os.path.join(ckpt_path, "*.pt")))
    sd = {}
    for p in paths:
        blob = torch.load(p, map_location="cpu", weights_only=False)
        state = blob.get("model", blob.get("state_dict", blob)) if isinstance(blob, dict) else blob
        for k, v in state.items():
            if not hasattr(v, "numpy"):
                continue
            # nnscaler prefixes the wrapped module with an extra `model.`
            if k.startswith("model.model."):
                k = k[len("model."):]
            sd[k] = v.float().numpy()
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="nnscaler ckpt file/dir")
    ap.add_argument("--config", required=True, help="model config JSON (reference layout)")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--format", choices=["native", "safetensors"], default="native")
    args = ap.parse_args()

    from vibevoice_tpu.configs import config_from_json
    from vibevoice_tpu.utils.checkpoint import params_from_flat, save_native

    cfg = config_from_json(args.config)
    sd = load_nnscaler_state(args.checkpoint)
    print(f"loaded {len(sd)} tensors")

    if "lm_head.weight" not in sd and not cfg.decoder.tie_word_embeddings:
        # untied head missing -> fall back to tied weights (ref :46-56)
        sd["lm_head.weight"] = sd["model.language_model.embed_tokens.weight"]

    os.makedirs(args.output, exist_ok=True)
    if args.format == "safetensors":
        from safetensors.numpy import save_file
        save_file(sd, os.path.join(args.output, "model.safetensors"))
        import shutil
        shutil.copy(args.config, os.path.join(args.output, "config.json"))
        # verify by reloading through the importer
        from vibevoice_tpu.utils.checkpoint import load_hf_checkpoint
        params, _ = load_hf_checkpoint(args.output, cfg)
        print("reload verification OK")
    else:
        params = params_from_flat(sd, cfg)
        save_native(params, os.path.join(args.output, "params"))
        print("native checkpoint saved")
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"total parameters: {n/1e9:.2f}B -> {args.output}")


if __name__ == "__main__":
    main()

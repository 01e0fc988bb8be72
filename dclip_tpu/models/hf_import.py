"""Import HuggingFace `CLIPModel` weights into `CLIPModule` Flax params.

Replaces the reference's `CLIPModel.from_pretrained(...)` weight loading
(training/image_tokenizer.py:25 etc.). Works from an in-memory torch
state_dict, a `pytorch_model.bin`, or a `model.safetensors` file; the
result is a pure JAX pytree, so the torch dependency is confined to import
time and never touches the TPU compute path.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np

from dclip_tpu.core.config import CLIPConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module level
    return t.detach().cpu().numpy()


def _layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Convert one HF CLIPEncoderLayer to flax param dict."""

    def dense(name):
        return {
            "kernel": _np(sd[f"{prefix}.{name}.weight"]).T,
            "bias": _np(sd[f"{prefix}.{name}.bias"]),
        }

    def ln(name):
        return {
            "scale": _np(sd[f"{prefix}.{name}.weight"]),
            "bias": _np(sd[f"{prefix}.{name}.bias"]),
        }

    return {
        "self_attn": {
            "q_proj": dense("self_attn.q_proj"),
            "k_proj": dense("self_attn.k_proj"),
            "v_proj": dense("self_attn.v_proj"),
            "out_proj": dense("self_attn.out_proj"),
        },
        "layer_norm1": ln("layer_norm1"),
        "layer_norm2": ln("layer_norm2"),
        "mlp": {"fc1": dense("mlp.fc1"), "fc2": dense("mlp.fc2")},
    }


def _ln(sd, key):
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def convert_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Dict[str, Any]:
    """torch CLIPModel state_dict -> flax params for CLIPModule."""
    text_layers = {
        f"layers_{i}": _layer(sd, f"text_model.encoder.layers.{i}")
        for i in range(cfg.text.num_layers)
    }
    vis_layers = {
        f"layers_{i}": _layer(sd, f"vision_model.encoder.layers.{i}")
        for i in range(cfg.vision.num_layers)
    }
    # HF spells it "pre_layrnorm" (typo preserved in their checkpoint keys).
    pre_ln_key = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    params = {
        "text_model": {
            "token_embedding": {
                "embedding": _np(sd["text_model.embeddings.token_embedding.weight"])
            },
            "position_embedding": _np(
                sd["text_model.embeddings.position_embedding.weight"]
            ),
            "encoder": text_layers,
            "final_layer_norm": _ln(sd, "text_model.final_layer_norm"),
        },
        "vision_model": {
            "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
            "patch_embedding": {
                # torch OIHW [D,3,ph,pw] -> flax HWIO [ph,pw,3,D]
                "kernel": _np(
                    sd["vision_model.embeddings.patch_embedding.weight"]
                ).transpose(2, 3, 1, 0)
            },
            "position_embedding": _np(
                sd["vision_model.embeddings.position_embedding.weight"]
            ),
            "pre_layernorm": _ln(sd, pre_ln_key),
            "encoder": vis_layers,
            "post_layernorm": _ln(sd, "vision_model.post_layernorm"),
        },
        "text_projection": {"kernel": _np(sd["text_projection.weight"]).T},
        "visual_projection": {"kernel": _np(sd["visual_projection.weight"]).T},
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    return params


def load_pretrained(path_or_dir: str, cfg: CLIPConfig) -> Dict[str, Any]:
    """Load weights from a local HF snapshot dir / .bin / .safetensors file."""
    path = path_or_dir
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"No weight file in {path_or_dir}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, cfg)


def nchw_to_nhwc(pixel_values: np.ndarray) -> np.ndarray:
    """Convert torch NCHW pixel batches to the NHWC layout CLIPModule uses."""
    return np.transpose(pixel_values, (0, 2, 3, 1))

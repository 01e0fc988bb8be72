"""Export `CLIPModule` Flax params as a HuggingFace CLIP snapshot.

The exact inverse of `models/hf_import.py`: a trained student checkpoint
becomes a directory that `transformers.CLIPModel.from_pretrained(...)`
loads directly — so downstream consumers of the reference's `.pth`
checkpoints (eval_scripts/flickr30k_eval.py:126-132 loads them into torch)
get an equally portable artifact from this framework: the standard HF
format instead of a bespoke one.

Writes:
  model.safetensors         weights, HF `CLIPModel` key names/layouts
  config.json               transformers `CLIPConfig` (model_type "clip")
  preprocessor_config.json  CLIP image preprocessing contract

No torch/transformers import is needed to export; those are only used by
the parity tests.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import numpy as np

from dclip_tpu.core.config import CLIPConfig

# HF CLIPImageProcessor constants (the same values the input pipeline and
# the reference's CLIPProcessor use).
CLIP_IMAGE_MEAN = [0.48145466, 0.4578275, 0.40821073]
CLIP_IMAGE_STD = [0.26862954, 0.26130258, 0.27577711]


def _arr(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype == np.float64:
        return a.astype(np.float32)
    if a.dtype.kind not in "fiub":  # ml_dtypes bfloat16 etc.
        return a.astype(np.float32)
    return a


def _dense(out: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _arr(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _arr(p["bias"])


def _ln(out: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _arr(p["scale"])
    out[f"{prefix}.bias"] = _arr(p["bias"])


def _layers(out: Dict[str, np.ndarray], prefix: str, enc: Mapping[str, Any]) -> None:
    for name, layer in enc.items():
        i = int(name.split("_")[-1])
        lp = f"{prefix}.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _dense(out, f"{lp}.self_attn.{proj}", layer["self_attn"][proj])
        _ln(out, f"{lp}.layer_norm1", layer["layer_norm1"])
        _ln(out, f"{lp}.layer_norm2", layer["layer_norm2"])
        _dense(out, f"{lp}.mlp.fc1", layer["mlp"]["fc1"])
        _dense(out, f"{lp}.mlp.fc2", layer["mlp"]["fc2"])


def export_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Flax `CLIPModule` params -> HF `CLIPModel` state dict (numpy).

    Inverse of `hf_import.convert_state_dict`, including the transposes
    (flax dense [in,out] -> torch [out,in]; patch conv HWIO -> OIHW) and
    HF's `pre_layrnorm` checkpoint-key typo, which current transformers
    still expects."""
    sd: Dict[str, np.ndarray] = {}
    t = params["text_model"]
    sd["text_model.embeddings.token_embedding.weight"] = _arr(
        t["token_embedding"]["embedding"]
    )
    sd["text_model.embeddings.position_embedding.weight"] = _arr(
        t["position_embedding"]
    )
    _layers(sd, "text_model.encoder", t["encoder"])
    _ln(sd, "text_model.final_layer_norm", t["final_layer_norm"])

    v = params["vision_model"]
    sd["vision_model.embeddings.class_embedding"] = _arr(v["class_embedding"])
    sd["vision_model.embeddings.patch_embedding.weight"] = _arr(
        v["patch_embedding"]["kernel"]
    ).transpose(3, 2, 0, 1)
    sd["vision_model.embeddings.position_embedding.weight"] = _arr(
        v["position_embedding"]
    )
    _ln(sd, "vision_model.pre_layrnorm", v["pre_layernorm"])
    _layers(sd, "vision_model.encoder", v["encoder"])
    _ln(sd, "vision_model.post_layernorm", v["post_layernorm"])

    sd["text_projection.weight"] = _arr(params["text_projection"]["kernel"]).T
    sd["visual_projection.weight"] = _arr(params["visual_projection"]["kernel"]).T
    sd["logit_scale"] = _arr(params["logit_scale"]).reshape(())
    # C-contiguous copies: safetensors' numpy writer serializes the raw
    # buffer, so a transposed VIEW (every .weight above) would land on disk
    # untransposed — silently, with the right shape in the header.
    return {k: np.ascontiguousarray(v) for k, v in sd.items()}


def hf_config_dict(cfg: CLIPConfig) -> Dict[str, Any]:
    """transformers `CLIPConfig` json for this architecture.

    `quick_gelu` is pinned explicitly: it is what OpenAI CLIP checkpoints
    (and `CLIPModule`) compute, and relying on the transformers default
    would silently change numerics if that default ever moves."""
    return {
        "architectures": ["CLIPModel"],
        "model_type": "clip",
        "projection_dim": cfg.projection_dim,
        "logit_scale_init_value": cfg.logit_scale_init,
        "text_config": {
            "model_type": "clip_text_model",
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.mlp_dim,
            "num_hidden_layers": cfg.text.num_layers,
            "num_attention_heads": cfg.text.num_heads,
            "max_position_embeddings": cfg.text.max_length,
            "layer_norm_eps": cfg.text.layer_norm_eps,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
            "eos_token_id": cfg.text.eos_token_id,
            "bos_token_id": cfg.text.eos_token_id - 1,
            "pad_token_id": cfg.text.eos_token_id,
            "projection_dim": cfg.projection_dim,
        },
        "vision_config": {
            "model_type": "clip_vision_model",
            "hidden_size": cfg.vision.hidden_size,
            "intermediate_size": cfg.vision.mlp_dim,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
            "layer_norm_eps": cfg.vision.layer_norm_eps,
            "hidden_act": "quick_gelu",
            "attention_dropout": 0.0,
            "num_channels": 3,
            "projection_dim": cfg.projection_dim,
        },
    }


def preprocessor_config_dict(cfg: CLIPConfig) -> Dict[str, Any]:
    return {
        "image_processor_type": "CLIPImageProcessor",
        "processor_class": "CLIPProcessor",
        "do_resize": True,
        "size": {"shortest_edge": cfg.vision.image_size},
        "resample": 3,  # PIL BICUBIC — the pipeline's resize_crop_uint8
        "do_center_crop": True,
        "crop_size": {
            "height": cfg.vision.image_size,
            "width": cfg.vision.image_size,
        },
        "do_rescale": True,
        "rescale_factor": 1 / 255,
        "do_normalize": True,
        "image_mean": CLIP_IMAGE_MEAN,
        "image_std": CLIP_IMAGE_STD,
        "do_convert_rgb": True,
    }


def save_pretrained(params: Mapping[str, Any], cfg: CLIPConfig, out_dir: str,
                    tokenizer_dir: str | None = None) -> None:
    """Write an HF snapshot dir loadable by `CLIPModel.from_pretrained`.

    `tokenizer_dir`: optionally copy vocab.json + merges.txt alongside (and
    a minimal tokenizer_config.json) so `CLIPProcessor.from_pretrained`
    works on the export too."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = export_state_dict(params)
    # metadata format "pt": transformers' safetensors loader rejects files
    # that don't declare a torch-compatible format.
    save_file(sd, os.path.join(out_dir, "model.safetensors"),
              metadata={"format": "pt"})
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_config_dict(cfg), f, indent=2)
    with open(os.path.join(out_dir, "preprocessor_config.json"), "w") as f:
        json.dump(preprocessor_config_dict(cfg), f, indent=2)
    if tokenizer_dir:
        import shutil

        for name in ("vocab.json", "merges.txt"):
            src = os.path.join(tokenizer_dir, name)
            if not os.path.exists(src):
                raise FileNotFoundError(
                    f"--tokenizer_dir given but {src} does not exist"
                )
            shutil.copy(src, os.path.join(out_dir, name))
        with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
            json.dump({"tokenizer_class": "CLIPTokenizer",
                       "model_max_length": cfg.text.max_length}, f, indent=2)

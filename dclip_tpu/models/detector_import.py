"""Ultralytics YOLOv8 -> FlaxYOLO checkpoint converter.

The reference's region proposals come from ultralytics YOLOv8x torch
weights (/root/reference/training/image_tokenizer.py:23, loaded as
`YOLO("./yolov8x.pt")`). This module imports those weights into the
TPU-native detector (`dclip_tpu.models.detector.FlaxYOLO`) so the faithful
proposal source can run without torch/ultralytics at inference time.

Input format (zero-egress friendly): a flat mapping of ultralytics
state-dict names to arrays — produced by e.g.
    torch.save(YOLO("yolov8x.pt").model.state_dict(), "yolov8x_sd.pt")
and loadable here from .pt (torch.load weights_only), .npz, or
.safetensors. The converter maps names, transposes conv kernels OIHW->HWIO,
and routes BatchNorm statistics into the `batch_stats` collection (kept
separate rather than folded: folding would break further fine-tuning with
`models.detector_loss`; XLA folds the scale into the conv at compile time
anyway for inference graphs).

The ultralytics `model.22.dfl.conv.weight` (a frozen arange(reg_max)
convolution implementing the DFL expectation) has no parameter here:
`decode_predictions` computes softmax(bins) @ arange directly.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from dclip_tpu.models.detector import DetectorConfig, FlaxYOLO

# Ultralytics DetectionModel layer index -> FlaxYOLO module name
# (yolov8.yaml backbone/head order; Detect is index 22 for every v8 size).
_BLOCKS = {
    0: ("conv", "stem"),
    1: ("conv", "down1"),
    2: ("c2f", "c2f1"),
    3: ("conv", "down2"),
    4: ("c2f", "c2f2"),
    5: ("conv", "down3"),
    6: ("c2f", "c2f3"),
    7: ("conv", "down4"),
    8: ("c2f", "c2f4"),
    9: ("sppf", "sppf"),
    12: ("c2f", "neck1"),
    15: ("c2f", "neck2"),
    16: ("conv", "neck_down1"),
    18: ("c2f", "neck3"),
    19: ("conv", "neck_down2"),
    21: ("c2f", "neck4"),
    22: ("detect", None),
}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convbn_entries(dst_name: Tuple[str, ...], src_prefix: str):
    """(src_key, collection, dst_path, transform) rows for one Conv+BN."""
    conv = dst_name + ("conv", "kernel")
    return [
        (f"{src_prefix}.conv.weight", "params", conv, "oihw"),
        (f"{src_prefix}.bn.weight", "params", dst_name + ("bn", "scale"), None),
        (f"{src_prefix}.bn.bias", "params", dst_name + ("bn", "bias"), None),
        (f"{src_prefix}.bn.running_mean", "batch_stats", dst_name + ("bn", "mean"), None),
        (f"{src_prefix}.bn.running_var", "batch_stats", dst_name + ("bn", "var"), None),
    ]


def _plan(cfg: DetectorConfig):
    """Full (src_key -> destination) mapping for this config."""
    rows = []
    depths = {  # C2f bottleneck counts per block name
        "c2f1": cfg.depth, "c2f2": 2 * cfg.depth, "c2f3": 2 * cfg.depth,
        "c2f4": cfg.depth, "neck1": cfg.depth, "neck2": cfg.depth,
        "neck3": cfg.depth, "neck4": cfg.depth,
    }
    for idx, (kind, name) in _BLOCKS.items():
        src = f"model.{idx}"
        if kind == "conv":
            rows += _convbn_entries((name,), src)
        elif kind == "sppf":
            rows += _convbn_entries((name, "cv1"), f"{src}.cv1")
            rows += _convbn_entries((name, "cv2"), f"{src}.cv2")
        elif kind == "c2f":
            rows += _convbn_entries((name, "cv1"), f"{src}.cv1")
            rows += _convbn_entries((name, "cv2"), f"{src}.cv2")
            for j in range(depths[name]):
                rows += _convbn_entries(
                    (name, f"m{j}", "cv1"), f"{src}.m.{j}.cv1"
                )
                rows += _convbn_entries(
                    (name, f"m{j}", "cv2"), f"{src}.m.{j}.cv2"
                )
        elif kind == "detect":
            for s in range(3):
                rows += _convbn_entries(
                    (f"head_box_a{s}",), f"{src}.cv2.{s}.0"
                )
                rows += _convbn_entries(
                    (f"head_box_b{s}",), f"{src}.cv2.{s}.1"
                )
                rows += [
                    (f"{src}.cv2.{s}.2.weight", "params",
                     (f"head_box_out{s}", "kernel"), "oihw"),
                    (f"{src}.cv2.{s}.2.bias", "params",
                     (f"head_box_out{s}", "bias"), None),
                ]
                rows += _convbn_entries(
                    (f"head_cls_a{s}",), f"{src}.cv3.{s}.0"
                )
                rows += _convbn_entries(
                    (f"head_cls_b{s}",), f"{src}.cv3.{s}.1"
                )
                rows += [
                    (f"{src}.cv3.{s}.2.weight", "params",
                     (f"head_cls_out{s}", "kernel"), "oihw"),
                    (f"{src}.cv3.{s}.2.bias", "params",
                     (f"head_cls_out{s}", "bias"), None),
                ]
    return rows


def expected_manifest(cfg: DetectorConfig) -> Dict[str, Tuple[int, ...]]:
    """{ultralytics key: expected torch shape} for this config — the
    shape manifest tests and users can validate a checkpoint against."""
    import jax
    import jax.numpy as jnp

    model = FlaxYOLO(cfg)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )
    )
    out = {}
    for src_key, coll, path, transform in _plan(cfg):
        node: Any = variables[coll]
        for p in path:
            node = node[p]
        shape = tuple(node.shape)
        if transform == "oihw":
            if len(shape) == 4:  # HWIO -> OIHW
                shape = (shape[3], shape[2], shape[0], shape[1])
        out[src_key] = shape
    return out


def _normalize_keys(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        if k.startswith("model.model."):  # YOLO wrapper vs DetectionModel
            k = k[len("model."):]
        if k.endswith("num_batches_tracked") or ".dfl." in k:
            continue
        out[k] = v
    return out


def infer_config(state_dict: Mapping[str, Any], **overrides) -> DetectorConfig:
    """Derive width/depth/p5_ch/num_classes/reg_max from checkpoint shapes."""
    sd = _normalize_keys(state_dict)
    width = int(_to_np(sd["model.0.conv.weight"]).shape[0])
    # "model.2.m.{j}.cv1.conv.weight" -> distinct bottleneck indices j.
    depth = len(
        {k.split(".")[3] for k in sd if k.startswith("model.2.m.")}
    )
    p5 = int(_to_np(sd["model.9.cv2.conv.weight"]).shape[0])
    head_out = _to_np(sd["model.22.cv2.0.2.weight"]).shape[0]
    reg_max = int(head_out) // 4
    num_classes = int(_to_np(sd["model.22.cv3.0.2.weight"]).shape[0])
    kw = dict(
        width=width, depth=depth, p5_ch=p5, reg_max=reg_max,
        num_classes=num_classes,
    )
    kw.update(overrides)
    return DetectorConfig(**kw)


def convert_ultralytics_state_dict(
    cfg: DetectorConfig, state_dict: Mapping[str, Any]
) -> Dict[str, Any]:
    """Flat ultralytics state dict -> FlaxYOLO variables
    {"params": ..., "batch_stats": ...}. Raises with the full lists of
    missing / mismatched keys — a silent partial import would produce a
    plausibly-wrong detector."""
    sd = _normalize_keys(state_dict)
    manifest = expected_manifest(cfg)
    missing = [k for k in manifest if k not in sd]
    if missing:
        raise ValueError(
            f"checkpoint is missing {len(missing)} keys for this config "
            f"(width={cfg.width}, depth={cfg.depth}, p5={cfg.p5}); first "
            f"few: {missing[:8]}"
        )
    mismatched = []
    variables: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for src_key, coll, path, transform in _plan(cfg):
        arr = _to_np(sd[src_key]).astype(np.float32)
        if transform == "oihw" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        want = manifest[src_key]
        got = tuple(_to_np(sd[src_key]).shape)
        if got != want:
            mismatched.append((src_key, got, want))
            continue
        _set(variables[coll], path, arr)
    if mismatched:
        raise ValueError(f"shape mismatches (key, got, want): {mismatched[:8]}")
    unused = sorted(set(sd) - set(manifest))
    if unused:
        print(f"detector import: {len(unused)} unused checkpoint keys "
              f"(e.g. {unused[:4]})")
    return variables


def load_ultralytics_checkpoint(
    path: str, cfg: Optional[DetectorConfig] = None, **cfg_overrides
) -> Tuple[DetectorConfig, Dict[str, Any]]:
    """Load a state-dict file (.pt via torch weights_only, .npz, or
    .safetensors) and convert. cfg=None infers the architecture from
    shapes (image_size etc. via cfg_overrides)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            sd = {k: z[k] for k in z.files}
    elif path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    if cfg is None:
        cfg = infer_config(sd, **cfg_overrides)
    return cfg, convert_ultralytics_state_dict(cfg, sd)

"""AOT export/load of the CLIP encode functions (`jax.export`).

A serving container should ship a model ARTIFACT, not the framework's
module code: `export_encoders` lowers the text/image encode functions to
StableHLO for each serving bucket and writes them (plus a manifest and
one `params.npz`) to a directory; `load_exported` rehydrates callables
from the artifact alone — no Flax model, no config classes.

Weights travel as an ARGUMENT of the exported functions, stored once in
`params.npz`, not baked into each StableHLO blob. Two reasons this is
the only correct layout:
  * one copy — baked constants are duplicated per (modality, bucket)
    entry, so a 3-bucket artifact would carry the model six times;
  * int8 stays int8 — a closure-captured numpy tree is CONCRETE during
    tracing, so the weight dequant (`q.astype(f32) * scale`) would
    constant-fold at trace time and bake dequantized f32 weights,
    silently quadrupling the artifact the quantization exists to shrink.
    As a jit argument the dequant is traced and fuses into the GEMM's
    operand read on device, exactly like the live `ClipService` path.

New capability vs the reference (its eval scripts re-instantiate
`CLIPModel.from_pretrained` everywhere; there is no deployment artifact).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dclip_tpu.serve.service import _pad_rows  # one padding rule for live + exported paths

_MANIFEST = "manifest.json"
_PARAMS = "params.npz"
_KEY_SEP = "//"  # path separator in params.npz keys ('/' can appear in names)


def _save_params_npz(path: str, tree: Dict[str, Any]) -> int:
    """Write a nested dict of arrays as a flat npz; returns bytes written."""
    flat: Dict[str, np.ndarray] = {}

    from collections.abc import Mapping

    def walk(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(prefix + [str(k)], v)
        else:
            flat[_KEY_SEP.join(prefix)] = np.asarray(node)

    walk([], tree)
    with open(path, "wb") as f:
        np.savez(f, **flat)
    return os.path.getsize(path)


def _load_params_npz(path: str) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split(_KEY_SEP)
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return tree


def export_encoders(
    model,
    variables: Dict[str, Any],
    cfg,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Optional[Sequence[str]] = None,
    quantize: Optional[str] = None,
) -> Dict[str, int]:
    """Serialize text/image encoders for each batch size into `out_dir`.

    platforms: lowering targets (default: the current backend). Pass
    e.g. ("cpu", "tpu") for an artifact loadable on both.
    quantize="int8" stores int8 weights in params.npz (serve.quant,
    ~4x smaller sidecar, weight-only dequant fused on device).
    Returns {artifact_name: bytes_written} incl. "params.npz".
    """
    os.makedirs(out_dir, exist_ok=True)
    text_len = cfg.text.max_length
    img_size = cfg.vision.image_size

    def _norm(emb):
        emb = emb.astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    if quantize is None:
        params_tree: Dict[str, Any] = variables

        def text_fn(params, ids, mask):
            return _norm(model.apply(
                params, ids, mask, method=model.get_text_features
            ))

        def image_fn(params, pixels):
            return _norm(model.apply(
                params, pixels, method=model.get_image_features
            ))

    elif quantize == "int8":
        from dclip_tpu.serve.quant import (
            quantize_clip,
            quantized_image_features,
            quantized_text_features,
        )

        params_tree = quantize_clip(variables, cfg)

        def text_fn(params, ids, mask):
            return _norm(quantized_text_features(cfg, params, ids, mask))

        def image_fn(params, pixels):
            return _norm(quantized_image_features(cfg, params, pixels))

    else:
        raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")

    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    written: Dict[str, int] = {}
    written[_PARAMS] = _save_params_npz(
        os.path.join(out_dir, _PARAMS), params_tree
    )
    params_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params_tree,
    )
    entries = []
    for b in sorted(set(batch_sizes)):
        specs = {
            "text": (
                text_fn,
                (
                    jax.ShapeDtypeStruct((b, text_len), jnp.int32),
                    jax.ShapeDtypeStruct((b, text_len), jnp.int32),
                ),
            ),
            "image": (
                image_fn,
                (jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32),),
            ),
        }
        for modality, (fn, args) in specs.items():
            exp = jax_export.export(jax.jit(fn), **kw)(params_shapes, *args)
            name = f"{modality}_b{b}.stablehlo"
            blob = bytes(exp.serialize())
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            written[name] = len(blob)
            entries.append(
                {
                    "modality": modality,
                    "batch": b,
                    "file": name,
                    "platforms": list(exp.platforms),
                }
            )
    manifest = {
        "format": "dclip_tpu.serve.export/2",
        "params_file": _PARAMS,
        "projection_dim": cfg.projection_dim,
        "text_max_length": text_len,
        "image_size": img_size,
        "quantize": quantize,
        "entries": entries,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return written


class ExportedEncoders:
    """Rehydrated artifact: `.encode_texts_ids(ids, mask)` and
    `.encode_images(pixels)` pick the smallest exported batch >= n and
    pad (mirroring ClipService's bucketing)."""

    def __init__(self, manifest: dict, fns: Dict[Tuple[str, int], Callable]):
        self.manifest = manifest
        self._fns = fns
        self.text_buckets = sorted(
            b for (m, b) in fns.keys() if m == "text"
        )
        self.image_buckets = sorted(
            b for (m, b) in fns.keys() if m == "image"
        )

    def _run(self, modality: str, buckets, arrays) -> np.ndarray:
        n = arrays[0].shape[0]
        if n == 0:
            return np.zeros((0, self.manifest["projection_dim"]), np.float32)
        out = []
        step = max(buckets)
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            b = next(bb for bb in buckets if bb >= hi - lo)
            padded = [_pad_rows(a[lo:hi], b) for a in arrays]
            out.append(np.asarray(self._fns[(modality, b)](*padded))[: hi - lo])
        return np.concatenate(out, axis=0)

    def encode_texts_ids(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return self._run("text", self.text_buckets, [ids, mask])

    def encode_images(self, pixels: np.ndarray) -> np.ndarray:
        return self._run("image", self.image_buckets, [pixels])


def load_exported(out_dir: str) -> ExportedEncoders:
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    fmt = manifest.get("format", "")
    if not fmt.startswith("dclip_tpu.serve.export/"):
        raise ValueError(f"not a dclip export artifact: {out_dir} ({fmt!r})")
    params = None
    if manifest.get("params_file"):
        # One device_put at load; every exp.call then reuses the same
        # device buffers (no per-request weight transfer).
        params = jax.device_put(
            _load_params_npz(os.path.join(out_dir, manifest["params_file"]))
        )
    fns: Dict[Tuple[str, int], Callable] = {}
    for e in manifest["entries"]:
        with open(os.path.join(out_dir, e["file"]), "rb") as f:
            exp = jax_export.deserialize(bytearray(f.read()))
        call = exp.call
        if params is not None:
            call = functools.partial(call, params)
        fns[(e["modality"], int(e["batch"]))] = call
    return ExportedEncoders(manifest, fns)



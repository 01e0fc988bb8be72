"""Shared batched-encode helper: one jitted forward, pad-to-batch tails.

Used by the retrieval eval (eval/retrieval.py) and the patch-index builder
(data/index.py) so the pad/stack/slice idiom exists once.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.models.clip import CLIPModule

# Memoized jitted forwards, keyed per model INSTANCE. A fresh `jax.jit`
# wrapper per call defeats jit's dispatch cache (every eval invocation
# re-traces — and on a tunneled chip, potentially re-compiles). The cache
# value keeps a strong reference to the model so id() can never be reused
# by a different instance; eval scripts hold O(1) models.
_JIT_FORWARDS: dict = {}


def _memoized_jit(model, kind: str, make):
    key = (id(model), kind)
    hit = _JIT_FORWARDS.get(key)
    if hit is None:
        hit = (model, jax.jit(make()))
        _JIT_FORWARDS[key] = hit
    return hit[1]


def text_forward(model: CLIPModule):
    """Jitted (variables, ids, mask) -> text features; stable across calls."""
    return _memoized_jit(
        model,
        "text",
        lambda: lambda v, i, m: model.apply(v, i, m, method=model.get_text_features),
    )


def packed_text_forward(model: CLIPModule):
    """Jitted packed-caption text features (ops.packing layout): several
    captions' content tokens per row, EOS-gathered back to caption order —
    numerics match `text_forward` (parity pinned in tests/test_packing.py)."""
    return _memoized_jit(
        model,
        "packed_text",
        lambda: lambda v, ids, seg, pos, er, ec: model.apply(
            v, ids, seg, pos, er, ec,
            method=model.get_packed_text_features,
        ),
    )


def image_forward(model: CLIPModule):
    """Jitted (variables, pixels) -> image features; stable across calls."""
    return _memoized_jit(
        model,
        "image",
        lambda: lambda v, p: model.apply(v, p, method=model.get_image_features),
    )


def zero_shot_logits_forward(model: CLIPModule):
    """Jitted (variables, pixels, text_features[C,D]) -> [B,C] 100*cosine
    logits (reference test_zero_shot_ImageNet.py:82). text_features is an
    ARGUMENT so one compile serves every dataset/prompt set."""
    from dclip_tpu.ops.losses import l2_normalize

    def make():
        def fwd(v, pixels, text_features):
            img = model.apply(v, pixels, method=model.get_image_features)
            img = l2_normalize(img.astype(jnp.float32))
            return 100.0 * img @ text_features.T

        return fwd

    return _memoized_jit(model, "zero_shot_logits", make)


def make_image_encoder(
    model: CLIPModule,
    variables: Dict[str, Any],
    batch_size: int = 256,
    mesh=None,
    data_axis: str = "data",
    fused: bool | None = None,
) -> Callable[[Sequence[np.ndarray]], np.ndarray]:
    """Returns encode(pixels) mapping a list/array of preprocessed NHWC
    images -> [N, D] features, in fixed-size jitted batches (the tail batch
    is zero-padded so one compiled shape serves every call).

    With a `mesh`, batches are sharded over its data axis and params
    replicated — multi-chip eval embedding with zero code change in the
    model (XLA inserts the collectives).

    `fused=None` auto-selects the fully fused encoder-block kernels
    (kernels.vit_block) on single-device TPU bf16 runs — the cropless
    forward is where they win (~16% on B/16) — and keeps the module path
    everywhere else (f32 eval, CPU, sharded meshes)."""
    if mesh is not None:
        from dclip_tpu.parallel.mesh import batch_sharding, replicate_tree

        variables = replicate_tree(variables, mesh)
        in_sharding = batch_sharding(mesh, data_axis)
        if batch_size % mesh.shape[data_axis] != 0:
            raise ValueError(
                f"the data-axis size ({mesh.shape[data_axis]}) must divide "
                f"batch_size {batch_size}"
            )
    else:
        # Device-commit once: hf_import returns host numpy, and jit
        # re-transfers numpy args on every call — a full-weight H2D per
        # batch otherwise (devastating through a tunneled chip).
        variables = jax.device_put(variables)
        in_sharding = None
    if fused is None:
        from dclip_tpu.core.platform import default_is_tpu

        fused = mesh is None and default_is_tpu() and model.dtype == jnp.bfloat16
        if fused:
            from dclip_tpu.kernels import pallas_available

            fused = pallas_available()
    if fused:
        from dclip_tpu.kernels.vit_block import fused_image_features

        fwd = jax.jit(
            lambda v, p: fused_image_features(model.cfg, v, p, dtype=model.dtype)
        )
    else:
        fwd = jax.jit(
            lambda v, p: model.apply(v, p, method=model.get_image_features)
        )

    def encode(pixels: Sequence[np.ndarray]) -> np.ndarray:
        out = []
        for start in range(0, len(pixels), batch_size):
            chunk = np.stack(pixels[start : start + batch_size])
            n = chunk.shape[0]
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n,) + chunk.shape[1:], chunk.dtype)]
                )
            dev = (
                jax.device_put(chunk, in_sharding)
                if in_sharding is not None
                else jnp.asarray(chunk)
            )
            out.append(np.asarray(fwd(variables, dev))[:n])
        return (
            np.concatenate(out, 0)
            if out
            else np.zeros((0, model.cfg.projection_dim), np.float32)
        )

    return encode

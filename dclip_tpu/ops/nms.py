"""Fixed-shape non-maximum suppression, jittable.

Support op for the native Flax detector (`dclip_tpu.models.detector`) — the
pure-TPU alternative to the reference's ultralytics YOLO dependency
(image_tokenizer.py:23). Standard NMS is data-dependent (dynamic output
count); this version is XLA-friendly: exactly `max_outputs` iterations of
pick-argmax / suppress-by-IoU inside a `lax.fori_loop`, returning padded
results + a validity mask. Greedy order matches torchvision.ops.nms.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [K, 4]
    scores: jnp.ndarray  # [K]
    indices: jnp.ndarray  # [K] int32 into the input, -1 for padding
    mask: jnp.ndarray  # [K] 1.0 = valid


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: [N, 4] x [M, 4] -> [N, M]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(
    boxes: jnp.ndarray,  # [N, 4] xyxy
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
    max_outputs: int = 32,
) -> NMSResult:
    """Greedy NMS with a static output budget."""
    n = boxes.shape[0]
    iou = iou_matrix(boxes, boxes)
    live = scores > score_threshold

    def body(k, state):
        live, out_idx, out_scores = state
        masked = jnp.where(live, scores, -jnp.inf)
        best = jnp.argmax(masked)
        valid = masked[best] > -jnp.inf
        out_idx = out_idx.at[k].set(jnp.where(valid, best, -1))
        out_scores = out_scores.at[k].set(jnp.where(valid, scores[best], 0.0))
        # Suppress the pick itself + everything overlapping it.
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        live = live & jnp.where(valid, ~suppress, live)
        return live, out_idx, out_scores

    out_idx = jnp.full((max_outputs,), -1, jnp.int32)
    out_scores = jnp.zeros((max_outputs,), jnp.float32)
    _, out_idx, out_scores = jax.lax.fori_loop(
        0, max_outputs, body, (live, out_idx, out_scores)
    )
    mask = (out_idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(out_idx, 0)
    return NMSResult(
        boxes=boxes[safe] * mask[:, None],
        scores=out_scores,
        indices=out_idx,
        mask=mask,
    )


def batched_class_nms(
    boxes: jnp.ndarray,  # [N, 4]
    scores: jnp.ndarray,  # [N]
    classes: jnp.ndarray,  # [N] int
    iou_threshold: float = 0.45,
    score_threshold: float = 0.0,
    max_outputs: int = 32,
    class_offset: float = 4096.0,
) -> NMSResult:
    """Class-aware NMS via the coordinate-offset trick (ultralytics /
    torchvision `batched_nms` semantics): boxes of different classes are
    shifted apart so they never suppress each other."""
    offsets = classes.astype(jnp.float32)[:, None] * class_offset
    shifted = boxes + offsets
    res = nms(shifted, scores, iou_threshold, score_threshold, max_outputs)
    safe = jnp.maximum(res.indices, 0)
    return NMSResult(
        boxes=boxes[safe] * res.mask[:, None],
        scores=res.scores,
        indices=res.indices,
        mask=res.mask,
    )

"""Teacher aggregation math: masked, fixed-shape, jittable.

Reference semantics (training/patch_text_aggregation.py):
- `temperature_aggregate` = `aggregation` (:243-265): importance of each
  token = cosine similarity to the sequence mean; softmax(sim / temp) over
  the sequence; weighted sum -> one global embedding per example.
- `patch_weights` = `compute_image_patch_weight` (:168-204): per-patch
  weight = box_area * detector_confidence * best-text-similarity, normalized
  to sum 1; uniform fallback when the total is 0.
- `best_text_similarity` = the max-over-texts cosine similarity of
  `compute_patch_text_similarity` (:126-165).
- `fuse_global` (:647): 0.5 * text_global + 0.5 * image_global.

TPU deltas (deliberate, documented): every function takes a validity mask so
padded slots are inert. The reference pads to the batch max and lets zero
rows participate in the mean/softmax (an artifact of its dynamic padding);
with `mask=None` these functions reproduce that exact behavior for parity
testing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from dclip_tpu.ops.losses import l2_normalize

_NEG = jnp.finfo(jnp.float32).min


def temperature_aggregate(
    x: jnp.ndarray,
    temperature: float = 2.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[B, S, D], optional [B, S] mask -> [B, D] global embedding."""
    x = x.astype(jnp.float32)
    if mask is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        sims = jnp.sum(
            l2_normalize(x) * l2_normalize(mean), axis=-1
        )  # [B, S] cosine to mean
        weights = jnp.exp(sims / temperature)
        weights = weights / jnp.sum(weights, axis=1, keepdims=True)
    else:
        m = mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * m[..., None], axis=1, keepdims=True) / denom[..., None]
        sims = jnp.sum(l2_normalize(x) * l2_normalize(mean), axis=-1)
        logits = jnp.where(m > 0, sims / temperature, _NEG)
        weights = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True))
        weights = weights * m
        weights = weights / jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-12)
    return jnp.sum(x * weights[..., None], axis=1)


def best_text_similarity(
    text_embeddings: jnp.ndarray,
    patch_embeddings: jnp.ndarray,
    text_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each patch, the max cosine similarity over texts and its argmax.

    text_embeddings: [B, T, D]; patch_embeddings: [B, P, D];
    returns (max_sim [B, P], best_idx [B, P]).
    (reference :152-156: sim_matrix.max(dim=0) over [n_text, n_patch])
    """
    t = l2_normalize(text_embeddings.astype(jnp.float32))
    p = l2_normalize(patch_embeddings.astype(jnp.float32))
    sim = jnp.einsum("btd,bpd->btp", t, p, preferred_element_type=jnp.float32)
    if text_mask is not None:
        sim = jnp.where(text_mask[:, :, None] > 0, sim, _NEG)
    return jnp.max(sim, axis=1), jnp.argmax(sim, axis=1)


def patch_weights(
    boxes: jnp.ndarray,
    confidences: jnp.ndarray,
    similarities: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """area * confidence * similarity, normalized to sum 1 over valid patches.

    boxes: [B, P, 4] xyxy; confidences/similarities: [B, P];
    mask: [B, P] validity. Zero-total rows fall back to uniform over valid
    patches (reference :196-200).
    """
    x1, y1, x2, y2 = (boxes[..., i].astype(jnp.float32) for i in range(4))
    areas = (x2 - x1) * (y2 - y1)
    w = areas * confidences.astype(jnp.float32) * similarities.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        w = w * m
        count = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
        uniform = m / count
    else:
        count = jnp.full(w.shape[:-1] + (1,), w.shape[-1], jnp.float32)
        uniform = jnp.ones_like(w) / count
    total = jnp.sum(w, axis=-1, keepdims=True)
    # Reference (:196-200) special-cases ONLY total == 0; a negative total
    # (possible: similarities can be negative) still divides.
    nonzero = total != 0
    return jnp.where(nonzero, w / jnp.where(nonzero, total, 1.0), uniform)


def fuse_global(
    text_global: jnp.ndarray, image_global: jnp.ndarray, alpha: float = 0.5
) -> jnp.ndarray:
    """alpha * text + (1 - alpha) * image (reference :647, alpha=0.5)."""
    return alpha * text_global + (1.0 - alpha) * image_global

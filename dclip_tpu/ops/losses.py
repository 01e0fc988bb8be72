"""Contrastive + distillation losses, jitted and mesh-shardable.

Semantics match the reference bit-for-bit in float32:
- `info_nce`: symmetric InfoNCE, temperature 0.05, diagonal positives,
  mean of i2t and t2i cross-entropies
  (reference training/CLIP_image_distillation.py:532-562 and
  training/train_contrastive_teacher.py:251-261).
- `cosine_distillation`: mean(1 - cos(student, teacher))
  (reference training/CLIP_image_distillation.py:564-576).
- `distillation_loss`: img-distill + text-distill + w * InfoNCE
  (reference training/CLIP_image_distillation.py:628).

The `*_global` variants are the multi-chip versions the reference never had
(SURVEY.md §2.5): embeddings are all-gathered over the `data` mesh axis so
every chip computes the loss over the GLOBAL [B_g, B_g] similarity matrix.
Gradients flow through `jax.lax.all_gather(..., tiled=True)` (its transpose
is a psum-scatter over ICI), so calling this inside `shard_map` + `jax.grad`
is the TPU analogue of large-batch contrastive training.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics (clamps norm at eps).

    Gradient-safe at x == 0: the clamp goes INSIDE the sqrt, so the sqrt
    never differentiates at 0 (jnp.linalg.norm's grad there is NaN, and
    zero rows are routine here — they're the padded patch slots)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def _cross_entropy_with_diagonal(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy with labels = arange(B) (diagonal positives)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    diag = jnp.diagonal(logits)
    return jnp.mean(logz - diag)


def info_nce(
    image_embeddings: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    temperature: float = 0.05,
) -> jnp.ndarray:
    """Symmetric InfoNCE over one [B, D] image/text pair of batches."""
    img = l2_normalize(image_embeddings.astype(jnp.float32))
    txt = l2_normalize(text_embeddings.astype(jnp.float32))
    logits = (
        jnp.einsum("id,jd->ij", img, txt, preferred_element_type=jnp.float32)
        / temperature
    )
    loss_i2t = _cross_entropy_with_diagonal(logits)
    loss_t2i = _cross_entropy_with_diagonal(logits.T)
    return (loss_i2t + loss_t2i) / 2.0


def cosine_distillation(
    student_embeddings: jnp.ndarray, teacher_embeddings: jnp.ndarray
) -> jnp.ndarray:
    """mean(1 - cosine_similarity(student, teacher))."""
    s = l2_normalize(student_embeddings.astype(jnp.float32))
    t = l2_normalize(teacher_embeddings.astype(jnp.float32))
    return jnp.mean(1.0 - jnp.sum(s * t, axis=-1))


def distillation_loss(
    student_image: jnp.ndarray,
    student_text: jnp.ndarray,
    teacher_image: jnp.ndarray,
    teacher_text: jnp.ndarray,
    temperature: float = 0.05,
    contrastive_weight: float = 1.0,
):
    """Full student objective. Returns (total, dict of parts).

    total = cos_distill(img) + cos_distill(txt)
            + contrastive_weight * InfoNCE(student_img, student_txt)
    """
    img_d = cosine_distillation(student_image, teacher_image)
    txt_d = cosine_distillation(student_text, teacher_text)
    con = info_nce(student_image, student_text, temperature)
    total = img_d + txt_d + contrastive_weight * con
    return total, {
        "image_distill_loss": img_d,
        "text_distill_loss": txt_d,
        "contrastive_loss": con,
        "loss": total,
    }


# ---------------------------------------------------------------------------
# Multi-chip (global-batch) variants — call inside shard_map over `axis`.
# ---------------------------------------------------------------------------


def info_nce_global(
    image_embeddings: jnp.ndarray,
    text_embeddings: jnp.ndarray,
    axis: str,
    temperature: float = 0.05,
) -> jnp.ndarray:
    """InfoNCE over the global batch: all-gather both sides over `axis`.

    Each chip holds a [B_local, D] shard; the loss is computed over the
    [B_global, B_global] similarity matrix (identical value on every chip).
    The all-gather rides ICI; its VJP is a reduce-scatter, so gradient
    contributions from every chip's negatives flow back to the local shard.
    """
    img = jax.lax.all_gather(image_embeddings, axis, axis=0, tiled=True)
    txt = jax.lax.all_gather(text_embeddings, axis, axis=0, tiled=True)
    return info_nce(img, txt, temperature)


def distillation_loss_global(
    student_image: jnp.ndarray,
    student_text: jnp.ndarray,
    teacher_image: jnp.ndarray,
    teacher_text: jnp.ndarray,
    axis: str,
    temperature: float = 0.05,
    contrastive_weight: float = 1.0,
):
    """Global-batch distillation objective (shard_map body).

    Distillation terms are pointwise per-pair, so they need only a psum-mean;
    the contrastive term needs the all-gathered global similarity matrix.
    """
    n = jax.lax.psum(jnp.asarray(student_image.shape[0], jnp.float32), axis)
    bs = jnp.asarray(student_image.shape[0], jnp.float32)

    def pmean_of_mean(local_mean):
        return jax.lax.psum(local_mean * bs, axis) / n

    img_d = pmean_of_mean(cosine_distillation(student_image, teacher_image))
    txt_d = pmean_of_mean(cosine_distillation(student_text, teacher_text))
    con = info_nce_global(student_image, student_text, axis, temperature)
    total = img_d + txt_d + contrastive_weight * con
    return total, {
        "image_distill_loss": img_d,
        "text_distill_loss": txt_d,
        "contrastive_loss": con,
        "loss": total,
    }

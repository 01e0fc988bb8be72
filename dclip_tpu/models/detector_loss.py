"""Training objective for the native Flax detector.

Anchor-free detection loss in the YOLOv8 family: a center-inside-box
assigner (static shapes, no dynamic positives list), CIoU box regression,
distribution-focal loss (DFL) over the reg_max bins, and BCE classification
with IoU-aware targets. This makes `models.detector.FlaxYOLO` trainable
end-to-end on TPU — the piece ultralytics' torch stack provided for the
reference's frozen checkpoints.

Simplifications vs ultralytics' TAL (deliberate, documented): positives are
anchors whose cell center lies inside a GT box, scored by
cls_prob^0.5 * IoU^0.5 and kept top-k per GT; there is no dynamic
task-aligned soft label beyond the IoU-weighted cls target. The assigner is
fully vectorized over [B, A, G] with validity masks.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dclip_tpu.models.detector import DetectorConfig
from dclip_tpu.ops.nms import iou_matrix


def anchor_points(cfg: DetectorConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(centers [A, 2] xy in pixels, strides [A]) over the 3 scales."""
    pts, strides = [], []
    for stride in (8, 16, 32):
        g = cfg.image_size // stride
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) * stride
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        strides.append(jnp.full((g * g,), stride, jnp.float32))
    return jnp.concatenate(pts, 0), jnp.concatenate(strides, 0)


def flatten_predictions(
    cfg: DetectorConfig, outs: List[Tuple[jnp.ndarray, jnp.ndarray]]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-scale head outputs -> (box_logits [B, A, 4, reg_max],
    cls_logits [B, A, nc]) in anchor order matching `anchor_points`."""
    box_all, cls_all = [], []
    for box, cls in outs:
        b, h, w, _ = box.shape
        box_all.append(box.reshape(b, h * w, 4, cfg.reg_max))
        cls_all.append(cls.reshape(b, h * w, cfg.num_classes))
    return jnp.concatenate(box_all, 1), jnp.concatenate(cls_all, 1)


def decode_boxes(
    cfg: DetectorConfig, box_logits: jnp.ndarray, centers: jnp.ndarray,
    strides: jnp.ndarray,
) -> jnp.ndarray:
    """DFL expectation -> xyxy boxes [B, A, 4] in pixels."""
    bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
    dist = jnp.sum(jax.nn.softmax(box_logits, -1) * bins, -1)  # [B, A, 4] ltrb
    d = dist * strides[None, :, None]
    x1 = centers[None, :, 0] - d[..., 0]
    y1 = centers[None, :, 1] - d[..., 1]
    x2 = centers[None, :, 0] + d[..., 2]
    y2 = centers[None, :, 1] + d[..., 3]
    return jnp.stack([x1, y1, x2, y2], -1)


def ciou(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU of xyxy box pairs, elementwise over leading dims."""
    lt = jnp.maximum(pred[..., :2], gt[..., :2])
    rb = jnp.minimum(pred[..., 2:], gt[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0) * jnp.clip(
        pred[..., 3] - pred[..., 1], 0
    )
    area_g = jnp.clip(gt[..., 2] - gt[..., 0], 0) * jnp.clip(
        gt[..., 3] - gt[..., 1], 0
    )
    union = area_p + area_g - inter + eps
    iou = inter / union
    # Enclosing box diagonal + center distance.
    elt = jnp.minimum(pred[..., :2], gt[..., :2])
    erb = jnp.maximum(pred[..., 2:], gt[..., 2:])
    ewh = jnp.clip(erb - elt, 0.0)
    c2 = ewh[..., 0] ** 2 + ewh[..., 1] ** 2 + eps
    pc = (pred[..., :2] + pred[..., 2:]) / 2
    gc = (gt[..., :2] + gt[..., 2:]) / 2
    rho2 = jnp.sum((pc - gc) ** 2, -1)
    # Aspect-ratio consistency term.
    import math

    wp = jnp.clip(pred[..., 2] - pred[..., 0], eps)
    hp = jnp.clip(pred[..., 3] - pred[..., 1], eps)
    wg = jnp.clip(gt[..., 2] - gt[..., 0], eps)
    hg = jnp.clip(gt[..., 3] - gt[..., 1], eps)
    v = (4 / math.pi**2) * (jnp.arctan(wg / hg) - jnp.arctan(wp / hp)) ** 2
    alpha = v / (1 - iou + v + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def assign_targets(
    cfg: DetectorConfig,
    pred_boxes: jnp.ndarray,  # [B, A, 4]
    cls_logits: jnp.ndarray,  # [B, A, nc]
    centers: jnp.ndarray,  # [A, 2]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G] int32
    gt_mask: jnp.ndarray,  # [B, G]
    topk: int = 10,
):
    """Center-inside-box assignment with top-k alignment per GT.

    Returns (fg_mask [B, A], assigned_gt [B, A] int32, iou_target [B, A]).
    Ties (anchor inside two GTs) resolve to the higher alignment score.
    """
    b, a = pred_boxes.shape[:2]
    inside_x = (centers[None, None, :, 0] >= gt_boxes[..., None, 0]) & (
        centers[None, None, :, 0] < gt_boxes[..., None, 2]
    )
    inside_y = (centers[None, None, :, 1] >= gt_boxes[..., None, 1]) & (
        centers[None, None, :, 1] < gt_boxes[..., None, 3]
    )
    candidate = inside_x & inside_y & (gt_mask[..., None] > 0)  # [B, G, A]

    ious = jax.vmap(iou_matrix)(gt_boxes, pred_boxes)  # [B, G, A]
    probs = jax.nn.sigmoid(cls_logits)  # [B, A, nc]
    # Per-GT class probability at every anchor: [B, G, A].
    cls_for_gt = jax.vmap(lambda p, l: p[:, l].T)(
        probs, gt_labels.astype(jnp.int32)
    )
    align = jnp.sqrt(jnp.clip(cls_for_gt, 1e-9)) * jnp.sqrt(jnp.clip(ious, 1e-9))
    align = jnp.where(candidate, align, 0.0)

    # Keep top-k anchors per GT.
    k = min(topk, a)
    kth = jnp.sort(align, axis=-1)[..., -k][..., None]
    keep = candidate & (align >= jnp.maximum(kth, 1e-9))
    align = jnp.where(keep, align, 0.0)

    # Resolve anchor conflicts: each anchor belongs to its best-aligned GT.
    assigned_gt = jnp.argmax(align, axis=1)  # [B, A]
    best = jnp.max(align, axis=1)  # [B, A]
    fg = (best > 0).astype(jnp.float32)
    iou_t = jnp.take_along_axis(
        jnp.transpose(ious, (0, 2, 1)), assigned_gt[..., None], axis=-1
    )[..., 0]
    return fg, assigned_gt.astype(jnp.int32), iou_t


def detection_loss(
    cfg: DetectorConfig,
    outs: List[Tuple[jnp.ndarray, jnp.ndarray]],
    gt_boxes: jnp.ndarray,  # [B, G, 4] xyxy pixels
    gt_labels: jnp.ndarray,  # [B, G]
    gt_mask: jnp.ndarray,  # [B, G]
    box_weight: float = 7.5,
    cls_weight: float = 0.5,
    dfl_weight: float = 1.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """YOLOv8-style composite loss over the padded GT set."""
    centers, strides = anchor_points(cfg)
    box_logits, cls_logits = flatten_predictions(cfg, outs)
    pred_boxes = decode_boxes(cfg, box_logits, centers, strides)
    fg, assigned, iou_t = assign_targets(
        cfg, pred_boxes, cls_logits, centers, gt_boxes, gt_labels, gt_mask
    )
    b, a = fg.shape
    n_pos = jnp.maximum(jnp.sum(fg), 1.0)

    gather_gt = jax.vmap(lambda g, idx: g[idx])  # [B, A, ...]
    tgt_boxes = gather_gt(gt_boxes, assigned)  # [B, A, 4]
    tgt_labels = gather_gt(gt_labels.astype(jnp.int32), assigned)  # [B, A]

    # Classification: BCE, IoU-aware positive targets (soft label).
    onehot = jax.nn.one_hot(tgt_labels, cfg.num_classes)
    cls_target = onehot * (fg * jnp.clip(iou_t, 0.0, 1.0))[..., None]
    cls_loss = jnp.sum(
        optax_sigmoid_bce(cls_logits, cls_target)
    ) / n_pos

    # Box: CIoU at positives.
    box_loss = jnp.sum((1.0 - ciou(pred_boxes, tgt_boxes)) * fg) / n_pos

    # DFL: cross-entropy spread over the two bins around the target
    # distance (per side), at positives.
    lt = jnp.stack(
        [
            centers[None, :, 0] - tgt_boxes[..., 0],
            centers[None, :, 1] - tgt_boxes[..., 1],
            tgt_boxes[..., 2] - centers[None, :, 0],
            tgt_boxes[..., 3] - centers[None, :, 1],
        ],
        -1,
    ) / strides[None, :, None]  # [B, A, 4] in stride units
    lt = jnp.clip(lt, 0.0, cfg.reg_max - 1 - 1e-3)
    lo = jnp.floor(lt)
    hi = lo + 1
    w_hi = lt - lo
    w_lo = 1.0 - w_hi
    logp = jax.nn.log_softmax(box_logits, -1)  # [B, A, 4, reg_max]
    lp_lo = jnp.take_along_axis(logp, lo[..., None].astype(jnp.int32), -1)[..., 0]
    lp_hi = jnp.take_along_axis(logp, hi[..., None].astype(jnp.int32), -1)[..., 0]
    dfl = -(w_lo * lp_lo + w_hi * lp_hi)  # [B, A, 4]
    dfl_loss = jnp.sum(jnp.mean(dfl, -1) * fg) / n_pos

    total = box_weight * box_loss + cls_weight * cls_loss + dfl_weight * dfl_loss
    return total, {
        "loss": total,
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "num_pos": jnp.sum(fg),
    }


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable elementwise sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )

"""Detector training objective: assignment semantics, CIoU, and an
overfit proof (the tiny detector learns to localize synthetic boxes)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from dclip_tpu.models.detector import Detector, DetectorConfig
from dclip_tpu.models.detector_loss import (
    anchor_points,
    assign_targets,
    ciou,
    decode_boxes,
    detection_loss,
    flatten_predictions,
)


@pytest.fixture(scope="module")
def cfg():
    return DetectorConfig(num_classes=3, image_size=64, width=8, depth=1,
                          max_detections=4, pre_nms_topk=16,
                          score_threshold=0.1)


def test_anchor_points(cfg):
    centers, strides = anchor_points(cfg)
    # 64/8=8 -> 64 + 16 + 4 anchors.
    assert centers.shape == (84, 2) and strides.shape == (84,)
    np.testing.assert_allclose(np.asarray(centers[0]), [4.0, 4.0])
    assert float(strides[0]) == 8.0 and float(strides[-1]) == 32.0


def test_ciou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    np.testing.assert_allclose(np.asarray(ciou(a, a)), 1.0, atol=1e-5)
    b = jnp.asarray([[20.0, 20, 30, 30]])
    assert float(ciou(a, b)[0]) < 0.0  # disjoint boxes penalized below 0


def test_assignment_center_inside(cfg):
    centers, strides = anchor_points(cfg)
    a = centers.shape[0]
    pred = jnp.tile(
        jnp.concatenate([centers - 4.0, centers + 4.0], -1)[None], (1, 1, 1)
    )
    cls_logits = jnp.zeros((1, a, cfg.num_classes))
    gt = jnp.asarray([[[8.0, 8.0, 24.0, 24.0]]])
    labels = jnp.asarray([[1]])
    mask = jnp.ones((1, 1))
    fg, assigned, iou_t = assign_targets(
        cfg, pred, cls_logits, centers, gt, labels, mask
    )
    fg = np.asarray(fg)[0]
    inside = (
        (np.asarray(centers)[:, 0] >= 8) & (np.asarray(centers)[:, 0] < 24)
        & (np.asarray(centers)[:, 1] >= 8) & (np.asarray(centers)[:, 1] < 24)
    )
    assert fg.sum() > 0
    assert not fg[~inside].any()  # positives only inside the GT box
    # Masked-out GT -> no positives at all.
    fg0, _, _ = assign_targets(
        cfg, pred, cls_logits, centers, gt, labels, jnp.zeros((1, 1))
    )
    assert float(jnp.sum(fg0)) == 0.0


def test_detection_loss_overfit(cfg):
    """300 Adam steps on 2 fixed images with 1 box each: the detector must
    localize (mean IoU at positives > 0.5) and detect() must return a
    confident overlapping box."""
    import optax

    det = Detector.initialize(cfg, seed=0)
    model = det.model
    variables = det.variables
    params, batch_stats = variables["params"], variables.get("batch_stats")

    rng = np.random.RandomState(0)
    images = np.asarray(rng.rand(2, 64, 64, 3), np.float32) * 0.2
    gt = np.asarray([[[8, 8, 32, 32]], [[24, 24, 56, 56]]], np.float32)
    labels = np.asarray([[0], [2]], np.int32)
    images[0, 8:32, 8:32] = 0.9  # visible signal where the boxes are
    images[1, 24:56, 24:56] = 0.9
    gt_mask = np.ones((2, 1), np.float32)

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                jnp.asarray(images), train=True, mutable=["batch_stats"],
            )
            total, parts = detection_loss(
                cfg, outs, jnp.asarray(gt), jnp.asarray(labels),
                jnp.asarray(gt_mask),
            )
            return total, (parts, mut["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    first = None
    for i in range(600):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))

    # Localization check: decoded boxes at positive anchors overlap the GT.
    outs = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(images)
    )
    centers, strides = anchor_points(cfg)
    box_logits, cls_logits = flatten_predictions(cfg, outs)
    pred_boxes = decode_boxes(cfg, box_logits, centers, strides)
    fg, assigned, _ = assign_targets(
        cfg, pred_boxes, cls_logits, centers, jnp.asarray(gt),
        jnp.asarray(labels), jnp.asarray(gt_mask),
    )
    tgt = jax.vmap(lambda g, idx: g[idx])(jnp.asarray(gt), assigned)
    ious = ciou(pred_boxes, tgt)
    mean_iou = float(jnp.sum(ious * fg) / jnp.maximum(jnp.sum(fg), 1))
    assert mean_iou > 0.5, mean_iou

    # End-to-end: detect() finds a confident box overlapping each GT.
    from dclip_tpu.ops.nms import iou_matrix

    dets = Detector(cfg, {"params": params, "batch_stats": batch_stats}).detect(
        jnp.asarray(images)
    )
    for b in range(2):
        valid = np.asarray(dets.mask[b]) > 0
        assert valid.any()
        best = np.asarray(
            iou_matrix(jnp.asarray(dets.boxes[b][valid]), jnp.asarray(gt[b]))
        ).max()
        # 600 CPU steps on a width-8 model: localization is solid (IoU>0.4
        # end to end; >0.5 at the assigned anchors asserted above).
        assert best > 0.4, best

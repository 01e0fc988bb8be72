"""Device NMS vs a numpy greedy reference + native detector machinery."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from dclip_tpu.models.detector import (
    Detections,
    Detector,
    DetectorConfig,
    decode_predictions,
)
from dclip_tpu.ops.nms import batched_class_nms, iou_matrix, nms


def _numpy_nms(boxes, scores, iou_th, score_th):
    """Greedy reference (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= score_th:
            continue
        keep.append(i)
        ious = np.asarray(iou_matrix(jnp.asarray(boxes[i : i + 1]), jnp.asarray(boxes)))[0]
        suppressed |= ious > iou_th
    return keep


def test_iou_matrix():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    got = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)
    # Overlap 5x5=25, union 200-25=175.
    np.testing.assert_allclose(got[0, 1], 25 / 175, atol=1e-6)


def test_nms_matches_numpy_reference():
    rng = np.random.RandomState(0)
    centers = rng.rand(40, 2) * 100
    sizes = rng.rand(40, 2) * 20 + 5
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(
        np.float32
    )
    scores = rng.rand(40).astype(np.float32)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, 0.1, max_outputs=40)
    want = _numpy_nms(boxes, scores, 0.4, 0.1)
    got = [int(i) for i in np.asarray(res.indices) if i >= 0]
    assert got == want


def test_nms_fuzz_matches_numpy_reference():
    """20 random configurations incl. duplicate boxes (score ties resolved
    by order), degenerate zero-area boxes, and varying thresholds."""
    rng = np.random.RandomState(3)
    for case in range(20):
        n = int(rng.randint(1, 50))
        centers = rng.rand(n, 2) * 60
        sizes = rng.rand(n, 2) * 25
        boxes = np.concatenate(
            [centers - sizes / 2, centers + sizes / 2], 1
        ).astype(np.float32)
        if n > 3:
            boxes[1] = boxes[0]  # exact duplicate
            boxes[2, 2:] = boxes[2, :2]  # zero-area
        scores = rng.rand(n).astype(np.float32)
        iou_th = float(rng.choice([0.3, 0.5, 0.7]))
        score_th = float(rng.choice([0.0, 0.2, 0.5]))
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), iou_th, score_th,
                  max_outputs=n)
        want = _numpy_nms(boxes, scores, iou_th, score_th)
        got = [int(i) for i in np.asarray(res.indices) if i >= 0]
        assert got == want, (case, n, iou_th, score_th)


def test_nms_budget_and_padding():
    boxes = jnp.asarray([[0, 0, 10, 10]] * 3 + [[50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    res = nms(boxes, scores, iou_threshold=0.5, max_outputs=4)
    # Identical boxes suppress each other: 2 survivors, 2 padded slots.
    np.testing.assert_array_equal(np.asarray(res.mask), [1, 1, 0, 0])
    assert set(np.asarray(res.indices)[:2]) == {0, 3}


def test_class_aware_nms_keeps_cross_class_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    same = batched_class_nms(boxes, scores, jnp.asarray([0, 0]), 0.5, max_outputs=2)
    diff = batched_class_nms(boxes, scores, jnp.asarray([0, 1]), 0.5, max_outputs=2)
    assert float(same.mask.sum()) == 1.0
    assert float(diff.mask.sum()) == 2.0
    np.testing.assert_allclose(np.asarray(diff.boxes)[1], [1, 1, 11, 11])


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = DetectorConfig(
        num_classes=4, image_size=64, width=8, depth=1,
        max_detections=8, pre_nms_topk=32, score_threshold=0.0,
    )
    return Detector.initialize(cfg, seed=0)


def test_detector_shapes_and_decode(tiny_detector):
    det = tiny_detector
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    out: Detections = det.detect(images)
    assert out.boxes.shape == (2, 8, 4)
    assert out.scores.shape == (2, 8)
    assert out.classes.shape == (2, 8)
    assert np.isfinite(np.asarray(out.boxes)).all()
    # Anchor counts: 64/8=8 -> 64 + 16 + 4 anchors over the 3 scales.
    raw = det.model.apply(det.variables, images)
    boxes, scores = decode_predictions(det.cfg, raw)
    assert boxes.shape == (2, 64 + 16 + 4, 4)
    assert scores.shape == (2, 84, 4)
    # DFL distances are non-negative -> x2 >= x1, y2 >= y1 always.
    b = np.asarray(boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_detector_as_detect_fn_contract(tiny_detector):
    fn = tiny_detector.as_detect_fn()
    image = (np.random.RandomState(2).rand(48, 96, 3) * 255).astype(np.uint8)
    boxes, conf = fn(image)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert conf.shape == (boxes.shape[0],)
    # Boxes come back in source-image pixel coordinates.
    if len(boxes):
        assert boxes[:, 2].max() <= 96 * 2  # decode can overshoot; sanity only
    # Feeds the detection cache builder directly.
    from dclip_tpu.data.detection_cache import DetectionCache

    cache = DetectionCache()
    cache.put("img.png", boxes, conf)
    got_boxes, got_conf = cache.get("img.png")
    np.testing.assert_allclose(got_boxes, boxes, atol=1e-6)

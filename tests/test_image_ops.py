"""Device-side crop/resize/normalize vs PIL references."""
import numpy as np
import pytest

import jax.numpy as jnp

from dclip_tpu.ops.image_ops import (
    CLIP_MEAN,
    CLIP_STD,
    batch_crop_resize_normalize,
    crop_resize,
    normalize,
    resize_center_crop,
)


def test_normalize_constants():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    got = np.asarray(normalize(x))
    want = (0.5 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(got[0, 0, 0], want, rtol=1e-6)


def test_crop_resize_identity_on_aligned_grid():
    """Cropping the full image to its own size is (near) identity."""
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32)
    box = jnp.asarray([0.0, 0.0, 32.0, 32.0])
    out = np.asarray(crop_resize(jnp.asarray(img), box, out_size=32))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_resize_constant_region():
    """A constant-color box resizes to that constant."""
    img = np.zeros((64, 64, 3), np.float32)
    img[10:30, 20:50] = 0.7
    box = jnp.asarray([22.0, 12.0, 48.0, 28.0])  # strictly inside the block
    out = np.asarray(crop_resize(jnp.asarray(img), box, out_size=16))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_crop_resize_close_to_pil_bilinear():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    x1, y1, x2, y2 = 8, 4, 40, 36
    pil = PIL.fromarray(img).crop((x1, y1, x2, y2)).resize(
        (16, 16), PIL.BILINEAR
    )
    want = np.asarray(pil).astype(np.float32) / 255.0
    got = np.asarray(
        crop_resize(
            jnp.asarray(img.astype(np.float32) / 255.0),
            jnp.asarray([x1, y1, x2, y2], jnp.float32),
            out_size=16,
        )
    )
    # Antialiased triangle filter on both sides; residual is uint8
    # quantization plus PIL's integer edge handling.
    assert np.abs(got - want).mean() < 0.01


def test_batch_crop_shapes_and_masked_boxes_defined():
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, 32, 32, 3).astype(np.float32)
    boxes = np.zeros((2, 5, 4), np.float32)
    boxes[0, 0] = [4, 4, 20, 20]
    out = batch_crop_resize_normalize(jnp.asarray(imgs), jnp.asarray(boxes), 16)
    assert out.shape == (2, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_resize_center_crop_shape():
    rng = np.random.RandomState(3)
    img = rng.rand(60, 90, 3).astype(np.float32)
    out = resize_center_crop(jnp.asarray(img), size=32)
    assert out.shape == (32, 32, 3)

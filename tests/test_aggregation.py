"""Aggregation ops vs torch re-implementations of the reference semantics
(patch_text_aggregation.py:243-265 aggregation; :168-204 patch weights;
:126-165 best-text similarity; :647 fusion)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dclip_tpu.ops import (
    best_text_similarity,
    fuse_global,
    patch_weights,
    temperature_aggregate,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _torch_aggregation(x, temperature=2.0):
    x = torch.tensor(x)
    mean = torch.mean(x, dim=1, keepdim=True)
    sims = F.cosine_similarity(x, mean.expand(-1, x.shape[1], -1), dim=2)
    w = F.softmax(sims / temperature, dim=1).unsqueeze(-1)
    return torch.sum(x * w, dim=1).numpy()


def test_temperature_aggregate_unmasked_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7, 16).astype(np.float32)
    got = temperature_aggregate(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _torch_aggregation(x), atol=1e-5)


def test_temperature_aggregate_masked_ignores_padding():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 8).astype(np.float32)
    # Pad to 9 slots with garbage; masked result must equal unpadded result.
    pad = rng.randn(2, 4, 8).astype(np.float32) * 100
    xp = np.concatenate([x, pad], axis=1)
    mask = np.concatenate([np.ones((2, 5)), np.zeros((2, 4))], axis=1)
    got = temperature_aggregate(jnp.asarray(xp), mask=jnp.asarray(mask))
    want = temperature_aggregate(jnp.asarray(x), mask=jnp.ones((2, 5)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_patch_weights_matches_reference_loop():
    rng = np.random.RandomState(2)
    boxes = rng.rand(1, 6, 4).astype(np.float32) * 100
    boxes[..., 2:] += boxes[..., :2]  # ensure x2>x1, y2>y1
    conf = rng.rand(1, 6).astype(np.float32)
    sims = rng.rand(1, 6).astype(np.float32)
    # Reference: w = area*conf*sim normalized (patch_text_aggregation.py:185-200)
    areas = (boxes[0, :, 2] - boxes[0, :, 0]) * (boxes[0, :, 3] - boxes[0, :, 1])
    w = areas * conf[0] * sims[0]
    want = w / w.sum()
    got = patch_weights(jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(sims))
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-5)


def test_patch_weights_zero_total_uniform_fallback():
    boxes = np.zeros((1, 4, 4), np.float32)
    conf = np.zeros((1, 4), np.float32)
    sims = np.zeros((1, 4), np.float32)
    mask = np.array([[1, 1, 1, 0]], np.float32)
    got = np.asarray(patch_weights(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(sims), jnp.asarray(mask)
    ))
    np.testing.assert_allclose(got[0], [1 / 3, 1 / 3, 1 / 3, 0.0], atol=1e-6)


def test_best_text_similarity_matches_reference():
    rng = np.random.RandomState(3)
    text = rng.randn(2, 5, 16).astype(np.float32)
    patch = rng.randn(2, 3, 16).astype(np.float32)
    max_sim, best_idx = best_text_similarity(jnp.asarray(text), jnp.asarray(patch))
    # Reference (:144-156): normalize both, sim [T, P], max over texts.
    for b in range(2):
        t = text[b] / np.linalg.norm(text[b], axis=1, keepdims=True)
        p = patch[b] / np.linalg.norm(patch[b], axis=1, keepdims=True)
        sim = t @ p.T
        np.testing.assert_allclose(np.asarray(max_sim)[b], sim.max(0), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(best_idx)[b], sim.argmax(0))


def test_best_text_similarity_text_mask():
    rng = np.random.RandomState(4)
    text = rng.randn(1, 4, 8).astype(np.float32)
    patch = rng.randn(1, 2, 8).astype(np.float32)
    mask = np.array([[1, 1, 0, 0]], np.float32)
    max_sim, best_idx = best_text_similarity(
        jnp.asarray(text), jnp.asarray(patch), text_mask=jnp.asarray(mask)
    )
    max_ref, idx_ref = best_text_similarity(
        jnp.asarray(text[:, :2]), jnp.asarray(patch)
    )
    np.testing.assert_allclose(np.asarray(max_sim), np.asarray(max_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(best_idx), np.asarray(idx_ref))


def test_fuse_global():
    t = jnp.ones((2, 4))
    i = jnp.zeros((2, 4))
    np.testing.assert_allclose(np.asarray(fuse_global(t, i)), 0.5 * np.ones((2, 4)))
    np.testing.assert_allclose(
        np.asarray(fuse_global(t, i, alpha=0.25)), 0.25 * np.ones((2, 4))
    )

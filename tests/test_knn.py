"""HBM k-NN + gate vs a python-loop port of the reference FAISS path
(image_tokenizer.py:249-315, compute_faiss.py:79)."""
import numpy as np

import jax
import jax.numpy as jnp

from dclip_tpu.ops import (
    SOURCE_CLIP,
    SOURCE_KNN,
    SOURCE_PROJECTION,
    knn_or_projection,
    knn_search,
    knn_search_sharded,
)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_knn_search_matches_numpy_topk():
    rng = np.random.RandomState(0)
    q = _norm(rng.randn(5, 16).astype(np.float32))
    store = _norm(rng.randn(40, 16).astype(np.float32))
    scores, idx = knn_search(jnp.asarray(q), jnp.asarray(store), k=3)
    ref = q @ store.T
    for i in range(5):
        order = np.argsort(-ref[i])[:3]
        np.testing.assert_array_equal(np.asarray(idx)[i], order)
        np.testing.assert_allclose(np.asarray(scores)[i], ref[i][order], atol=1e-6)


def test_gate_knn_vs_projection_vs_clip():
    rng = np.random.RandomState(1)
    store = _norm(rng.randn(10, 8).astype(np.float32))
    values = _norm(rng.randn(10, 8).astype(np.float32))
    # Query 0: exact store row -> score 1.0 -> knn hit.
    # Query 1: orthogonal-ish random -> below threshold -> projection.
    q = np.stack([store[3], _norm(rng.randn(8).astype(np.float32))])

    def projection_fn(queries, positions):
        return queries + positions.sum(-1, keepdims=True)  # arbitrary, nonzero

    res = knn_or_projection(
        jnp.asarray(q),
        jnp.asarray(np.array([[0.1, 0.2, 0.3, 0.4]] * 2, np.float32)),
        jnp.asarray(store),
        jnp.asarray(values),
        projection_fn,
        similarity_threshold=0.999,
    )
    src = np.asarray(res.source)
    assert src[0] == SOURCE_KNN
    np.testing.assert_allclose(np.asarray(res.embeddings)[0], values[3], atol=1e-6)
    assert np.asarray(res.similarity)[0] > 0.999
    assert src[1] == SOURCE_PROJECTION
    assert np.asarray(res.similarity)[1] == 0.0  # reference returns 0.0 (:315)


def test_gate_no_projection_falls_back_to_clip():
    rng = np.random.RandomState(2)
    store = _norm(rng.randn(4, 8).astype(np.float32))
    q = _norm(rng.randn(2, 8).astype(np.float32))
    res = knn_or_projection(
        jnp.asarray(q), None, jnp.asarray(store), None, None,
        similarity_threshold=1.1,  # nothing can hit
    )
    assert (np.asarray(res.source) == SOURCE_CLIP).all()
    np.testing.assert_allclose(np.asarray(res.embeddings), _norm(q), atol=1e-6)


def test_gate_empty_store_defined_behavior():
    """The reference crashes on 0 FAISS hits (unbound adjusted_score,
    image_tokenizer.py:265-278); we define it: straight to fallback."""
    q = _norm(np.random.RandomState(3).randn(3, 8).astype(np.float32))
    res = knn_or_projection(jnp.asarray(q), None, None, None, None)
    assert (np.asarray(res.source) == SOURCE_CLIP).all()


def test_sharded_knn_matches_single_device(cpu_devices):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(4)
    q = _norm(rng.randn(6, 16).astype(np.float32))
    store = _norm(rng.randn(64, 16).astype(np.float32))
    mesh = Mesh(np.array(cpu_devices), ("data",))
    f = shard_map(
        lambda qq, ss: knn_search_sharded(qq, ss, axis="data", k=3),
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    scores, idx = f(jnp.asarray(q), jnp.asarray(store))
    ref_scores, ref_idx = knn_search(jnp.asarray(q), jnp.asarray(store), k=3)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-6)
    # Indices may differ on exact ties; scores must match. Check values too.
    got_rows = store[np.asarray(idx)]
    ref_rows = store[np.asarray(ref_idx)]
    np.testing.assert_allclose(got_rows, ref_rows, atol=1e-6)

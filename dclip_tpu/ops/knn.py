"""HBM-resident exact k-NN + the knn/projection/clip gate.

Replaces FAISS (`training/compute_faiss.py:26-27`, C++ `IndexFlatIP`) and
the per-query Python gate in `training/image_tokenizer.py:249-315`. At DCLIP
scale (<=~1e5 stored 512-d patch embeddings) exact inner-product search is a
single [Q, N] matmul on the MXU + `jax.lax.top_k` — no index structure, no
host round-trip, batched over every query at once.

Gate semantics (reference :260-315), vectorized with `jnp.where`:
  top-1 score >= threshold -> stored neighbor value   (source 0, "knn")
  else, projection available -> normalized projection (source 1, "projection")
  else -> the raw (already normalized) CLIP query     (source 2, "clip")
This also fixes the reference's latent unbound-`adjusted_score` bug when the
index returns no hits (`image_tokenizer.py:265-278`): an empty store is just
N=0 handled by the caller, never undefined behavior.

Multi-chip: for stores too big for one chip's HBM, `knn_search_sharded`
shards the store over the mesh `axis`; each chip scores its shard and the
global top-k is a psum-free `all_gather` of per-shard top-k followed by a
second local top-k (k << N so the gather is tiny and rides ICI).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dclip_tpu.ops.losses import l2_normalize

SOURCE_KNN = 0
SOURCE_PROJECTION = 1
SOURCE_CLIP = 2


class KNNResult(NamedTuple):
    embeddings: jnp.ndarray  # [Q, D] selected embedding per query
    source: jnp.ndarray  # [Q] int32 in {0: knn, 1: projection, 2: clip}
    similarity: jnp.ndarray  # [Q] top-1 score (0.0 for non-knn, ref :301,315)


def knn_search(
    queries: jnp.ndarray, store_keys: jnp.ndarray, k: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact inner-product top-k. queries [Q, D], store_keys [N, D].

    Returns (scores [Q, k], indices [Q, k]), descending — the contract of
    `faiss.IndexFlatIP.search` (reference compute_faiss.py:79).
    """
    scores = jnp.einsum(
        "qd,nd->qn",
        queries.astype(jnp.float32),
        store_keys.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return jax.lax.top_k(scores, min(k, store_keys.shape[0]))


def knn_search_sharded(
    queries: jnp.ndarray, store_shard: jnp.ndarray, axis: str, k: int = 3,
    n_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over a store sharded on mesh `axis` (shard_map body).

    store_shard: this chip's [N_local, D] rows; indices returned are GLOBAL
    row ids (shard offset added). Queries are replicated. `n_valid` (scalar,
    optional) masks pad rows — callers that pad N up to a multiple of the
    mesh axis pass the true row count and padded rows can never win
    (their scores become -inf before the local top-k).
    """
    n_local = store_shard.shape[0]
    my = jax.lax.axis_index(axis)
    if n_valid is not None:
        scores = jnp.einsum(
            "qd,nd->qn",
            queries.astype(jnp.float32),
            store_shard.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        gids = my * n_local + jnp.arange(n_local)
        scores = jnp.where(gids[None, :] < n_valid, scores, -jnp.inf)
        local_scores, local_idx = jax.lax.top_k(scores, min(k, n_local))
    else:
        local_scores, local_idx = knn_search(
            queries, store_shard, min(k, n_local)
        )
    local_idx = local_idx + my * n_local
    all_scores = jax.lax.all_gather(local_scores, axis, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(local_idx, axis, axis=1, tiled=True)
    # Tiny stores can gather fewer than k candidates in total.
    top_scores, pos = jax.lax.top_k(all_scores, min(k, all_scores.shape[1]))
    return top_scores, jnp.take_along_axis(all_idx, pos, axis=1)


def knn_or_projection(
    queries: jnp.ndarray,
    positions: Optional[jnp.ndarray],
    store_keys: Optional[jnp.ndarray],
    store_values: Optional[jnp.ndarray],
    projection_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]],
    similarity_threshold: float = 0.85,
    k: int = 3,
) -> KNNResult:
    """Batched hybrid patch embedder (reference get_patch_embedding :249-315).

    queries: [Q, D] L2-normalized CLIP embeddings; positions: [Q, 4]
    normalized box coords (zeros when absent, ref :306-308); store_keys /
    store_values: [N, D] index keys and the values returned on a hit (the
    reference keeps these as FAISS index + embedding_dict sidecar,
    compute_faiss.py:83-103); projection_fn(queries, positions) -> [Q, D].
    """
    q = l2_normalize(queries.astype(jnp.float32))
    qn, d = q.shape

    if projection_fn is not None:
        if positions is None:
            positions = jnp.zeros((qn, 4), jnp.float32)
        proj = l2_normalize(projection_fn(q, positions.astype(jnp.float32)))
        fallback, fb_source = proj, SOURCE_PROJECTION
    else:
        fallback, fb_source = q, SOURCE_CLIP

    if store_keys is None or store_keys.shape[0] == 0:
        return KNNResult(
            embeddings=fallback,
            source=jnp.full((qn,), fb_source, jnp.int32),
            similarity=jnp.zeros((qn,), jnp.float32),
        )

    if store_values is None:
        store_values = store_keys
    scores, idx = knn_search(q, store_keys, k)
    top1_score, top1_idx = scores[:, 0], idx[:, 0]
    hit = top1_score >= similarity_threshold
    retrieved = jnp.take(store_values, top1_idx, axis=0).astype(jnp.float32)
    return KNNResult(
        embeddings=jnp.where(hit[:, None], retrieved, fallback),
        source=jnp.where(hit, SOURCE_KNN, fb_source).astype(jnp.int32),
        similarity=jnp.where(hit, top1_score, 0.0),
    )

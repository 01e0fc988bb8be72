"""On-device retrieval ranking: the TPU replacement for the reference's
numpy `calculate_retrieval_metrics` (eval_scripts/flickr30k_eval.py:16-88).

Rank semantics exactly match `np.argsort(-similarities)` with numpy's
stable tie-breaking: rank(gt) = #{j : sim[j] > sim[gt]}
                              + #{j < gt : sim[j] == sim[gt]}.
R@k = fraction of ranks < k; "MAP" = mean(1 / (rank + 1)) (the reference
calls its mean-reciprocal-rank MAP; we keep the name for CLI parity).

Everything is matmul + vectorized comparisons/stable sorts — no host loop —
so a 5000x25000 COCO eval is a few MXU passes.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from dclip_tpu.ops.losses import l2_normalize

_INT_MAX = jnp.iinfo(jnp.int32).max


def similarity_matrix(
    caption_embeddings: jnp.ndarray,
    image_embeddings: jnp.ndarray,
    normalize: bool = True,
) -> jnp.ndarray:
    """[C, D] x [I, D] -> [C, I] cosine similarity (reference :252-266)."""
    c = caption_embeddings.astype(jnp.float32)
    im = image_embeddings.astype(jnp.float32)
    if normalize:
        c, im = l2_normalize(c), l2_normalize(im)
    return jnp.einsum("cd,id->ci", c, im, preferred_element_type=jnp.float32)


def _stable_rank_of(sims: jnp.ndarray, gt_idx: jnp.ndarray) -> jnp.ndarray:
    """Rank of gt_idx in a stable descending argsort of sims.

    sims: [..., N]; gt_idx: [...] int. Returns [...] int32 ranks. O(N) per
    row (two masked reductions), no sort.
    """
    n = sims.shape[-1]
    gt_sim = jnp.take_along_axis(sims, gt_idx[..., None], axis=-1)
    idx = jnp.arange(n)
    greater = jnp.sum((sims > gt_sim).astype(jnp.int32), axis=-1)
    tie_before = jnp.sum(
        ((sims == gt_sim) & (idx < gt_idx[..., None])).astype(jnp.int32), axis=-1
    )
    return greater + tie_before


def _stable_ranks_all(sims: jnp.ndarray) -> jnp.ndarray:
    """Rank of EVERY element of each row under stable descending argsort.

    [..., N] -> [..., N] int32. Double-argsort: numpy/jax argsort is stable,
    and argsort(-x) reproduces np.argsort(-similarities) tie-breaking.
    """
    order = jnp.argsort(-sims, axis=-1)  # stable
    return jnp.argsort(order, axis=-1).astype(jnp.int32)


def t2i_ranks(sim: jnp.ndarray, caption_to_image: jnp.ndarray) -> jnp.ndarray:
    """sim: [C, I]; caption_to_image: [C] index of each caption's gt image."""
    return _stable_rank_of(sim, caption_to_image)


def i2t_ranks(
    sim: jnp.ndarray, caption_to_image: jnp.ndarray, chunk: int = 512
) -> jnp.ndarray:
    """Best (minimum) rank over each image's ground-truth captions.

    sim: [C, I] -> [I] ranks. Reference :51-63: for image i, stable-rank all
    captions by sim[:, i] descending; take the min rank over gt captions.
    Scans over image chunks so peak memory is [chunk, C].
    """
    c, num_images = sim.shape
    pad = (-num_images) % chunk
    cols = jnp.pad(sim.T, ((0, pad), (0, 0)))  # [I_pad, C]
    img_ids = jnp.pad(jnp.arange(num_images), (0, pad), constant_values=-1)

    def body(_, args):
        rows, ids = args  # [chunk, C], [chunk]
        ranks_all = _stable_ranks_all(rows)
        is_gt = caption_to_image[None, :] == ids[:, None]
        return None, jnp.min(jnp.where(is_gt, ranks_all, _INT_MAX), axis=-1)

    _, out = jax.lax.scan(
        body, None, (cols.reshape(-1, chunk, c), img_ids.reshape(-1, chunk))
    )
    return out.reshape(-1)[:num_images]


def recall_at_k(
    ranks: jnp.ndarray, ks: Sequence[int] = (1, 5, 10)
) -> Dict[str, jnp.ndarray]:
    out = {}
    for k in ks:
        out[f"R@{k}"] = jnp.mean((ranks < k).astype(jnp.float32))
    out["MAP"] = jnp.mean(1.0 / (ranks.astype(jnp.float32) + 1.0))
    return out


def retrieval_metrics(
    caption_embeddings: jnp.ndarray,
    image_embeddings: jnp.ndarray,
    caption_to_image: jnp.ndarray,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Full reference metric dict: {"t2i": {R@1,R@5,R@10,MAP}, "i2t": ...}."""
    sim = similarity_matrix(caption_embeddings, image_embeddings)
    return {
        "t2i": recall_at_k(t2i_ranks(sim, caption_to_image)),
        "i2t": recall_at_k(i2t_ranks(sim, caption_to_image)),
    }


def _recall_masked(
    ranks: jnp.ndarray, valid: jnp.ndarray, ks: Sequence[int] = (1, 5, 10)
) -> Dict[str, jnp.ndarray]:
    """recall_at_k over the valid (non-padded) entries only."""
    v = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(v), 1.0)
    out = {}
    for k in ks:
        out[f"R@{k}"] = jnp.sum((ranks < k).astype(jnp.float32) * v) / denom
    out["MAP"] = jnp.sum(v / (ranks.astype(jnp.float32) + 1.0)) / denom
    return out


# Module-level jits (fresh per-call jax.jit wrappers would re-trace and,
# on a tunneled chip, re-compile on every invocation — same rationale as
# models/encoding._JIT_FORWARDS).


@jax.jit
def _t2i_sharded_metrics(cap_p, img_r, c2i_p, valid):
    ranks = t2i_ranks(similarity_matrix(cap_p, img_r), c2i_p)
    return _recall_masked(ranks, valid)


@jax.jit
def _i2t_chunk_ranks(img_chunk, cap_r, c2i_r, ids_chunk):
    """Min stable rank over each chunk image's gt captions: [R] ranks."""
    sim_t = similarity_matrix(img_chunk, cap_r)  # [R, C]
    ranks_all = _stable_ranks_all(sim_t)
    is_gt = c2i_r[None, :] == ids_chunk[:, None]
    return jnp.min(jnp.where(is_gt, ranks_all, _INT_MAX), axis=-1)


def retrieval_metrics_sharded(
    caption_embeddings: jnp.ndarray,
    image_embeddings: jnp.ndarray,
    caption_to_image: jnp.ndarray,
    mesh,
    data_axis: str = "data",
    i2t_chunk: int = 512,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """retrieval_metrics with the [C, I] similarity work sharded over the
    mesh data axis (the ICI-sharded eval from the north star).

    Two self-contained passes, each keeping the REDUCED axis whole on
    every device so ranks are exact with no cross-device rank math:
      t2i — caption rows sharded, image embeddings replicated;
      i2t — image rows sharded ([I, C] similarity), captions replicated,
            processed in chunks of `i2t_chunk` rows per device so peak
            memory stays [chunk, C] (mirroring i2t_ranks' scan).
    Padded rows are masked out of the metric means. Bit-parity with the
    single-device path is pinned in tests/test_retrieval.py.
    """
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec

    ndev = mesh.shape[data_axis]
    rows = NamedSharding(mesh, PartitionSpec(data_axis))
    rep = NamedSharding(mesh, PartitionSpec())
    cap = jnp.asarray(caption_embeddings, jnp.float32)
    img = jnp.asarray(image_embeddings, jnp.float32)
    c2i = jnp.asarray(caption_to_image, jnp.int32)
    n_cap, n_img = cap.shape[0], img.shape[0]
    pad_c = (-n_cap) % ndev

    # -- t2i: shard caption rows ------------------------------------------
    cap_p = jax.device_put(jnp.pad(cap, ((0, pad_c), (0, 0))), rows)
    c2i_p = jax.device_put(jnp.pad(c2i, (0, pad_c)), rows)
    cap_valid = jax.device_put(
        jnp.pad(jnp.ones((n_cap,), jnp.float32), (0, pad_c)), rows
    )
    img_r = jax.device_put(img, rep)
    c2i_r = jax.device_put(c2i, rep)
    t2i = _t2i_sharded_metrics(cap_p, img_r, c2i_p, cap_valid)

    # -- i2t: image rows sharded, host-chunked ------------------------------
    rows_per_step = i2t_chunk * ndev
    pad_i = (-n_img) % rows_per_step
    img_p = np.asarray(jnp.pad(img, ((0, pad_i), (0, 0))))
    ids_p = np.pad(
        np.arange(n_img, dtype=np.int32), (0, pad_i), constant_values=-1
    )
    cap_r = jax.device_put(cap, rep)
    ranks_chunks = []
    for start in range(0, img_p.shape[0], rows_per_step):
        chunk = jax.device_put(img_p[start : start + rows_per_step], rows)
        ids_chunk = jax.device_put(ids_p[start : start + rows_per_step], rows)
        ranks_chunks.append(
            np.asarray(_i2t_chunk_ranks(chunk, cap_r, c2i_r, ids_chunk))
        )
    ranks = jnp.asarray(np.concatenate(ranks_chunks)[:n_img])
    i2t = recall_at_k(ranks)
    return {"t2i": t2i, "i2t": i2t}

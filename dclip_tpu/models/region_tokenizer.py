"""RegionTokenizer: the `TokenizerWithKNN` facade, TPU-native.

Reference (training/image_tokenizer.py:331-529): detect -> sort detections
by confidence -> keep top-k (default 3) -> per patch, knn_or_projection with
normalized-position metadata; plus a threshold-sweep utility (:490-529).
Here the whole batch runs as fixed-shape device ops: one fused crop op, one
batched CLIP forward, one top-k matmul gate — no per-patch Python.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.data.embedding_store import EmbeddingStore
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.projections import ImageProjectionModule
from dclip_tpu.models.teacher import encode_patches
from dclip_tpu.ops.knn import KNNResult, knn_or_projection
from dclip_tpu.ops.losses import l2_normalize


class RegionTokens(NamedTuple):
    embeddings: jnp.ndarray  # [B, P, D]
    source: jnp.ndarray  # [B, P] int32 (0 knn / 1 projection / 2 clip)
    similarity: jnp.ndarray  # [B, P]
    positions: jnp.ndarray  # [B, P, 4] normalized xyxy
    mask: jnp.ndarray  # [B, P]


class RegionTokenizer:
    def __init__(
        self,
        clip_model: CLIPModule,
        clip_variables: Dict[str, Any],
        store: Optional[EmbeddingStore] = None,
        projection_params: Optional[Any] = None,
        projection_module: Optional[ImageProjectionModule] = None,
        similarity_threshold: float = 0.85,
        top_k: int = 3,
        patch_size: int = 224,
    ):
        self.clip_model = clip_model
        # Device-commit once (hf_import yields host numpy; jit re-transfers
        # numpy args on every batch_tokenize call).
        self.clip_variables = jax.device_put(clip_variables)
        self.similarity_threshold = similarity_threshold
        self.top_k = top_k
        self.patch_size = patch_size
        self._store_keys = (
            jnp.asarray(store.keys) if store is not None and len(store) else None
        )
        self._store_values = (
            jnp.asarray(store.values) if store is not None and len(store) else None
        )
        if projection_params is not None:
            module = projection_module or ImageProjectionModule()
            self._projection_fn = lambda q, pos: module.apply(
                {"params": projection_params}, q, pos
            )
        else:
            self._projection_fn = None

    def batch_tokenize(
        self,
        images: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
        boxes: jnp.ndarray,  # [B, P, 4] xyxy in image pixels
        mask: jnp.ndarray,  # [B, P]
        threshold: Optional[float] = None,
    ) -> RegionTokens:
        """All regions of a batch through crop-encode + the knn gate."""
        b, p = boxes.shape[:2]
        h, w = images.shape[1:3]
        raw = encode_patches(
            self.clip_model, self.clip_variables, images, boxes, mask,
            patch_size=self.patch_size,
        )  # [B, P, D]
        d = raw.shape[-1]
        positions = boxes / jnp.asarray([w, h, w, h], jnp.float32)
        queries = l2_normalize(raw.reshape(b * p, d))
        res: KNNResult = knn_or_projection(
            queries,
            positions.reshape(b * p, 4),
            self._store_keys,
            self._store_values,
            self._projection_fn,
            threshold if threshold is not None else self.similarity_threshold,
            k=self.top_k,
        )
        return RegionTokens(
            embeddings=res.embeddings.reshape(b, p, d) * mask[..., None],
            source=res.source.reshape(b, p),
            similarity=res.similarity.reshape(b, p) * mask,
            positions=positions,
            mask=mask,
        )

    def evaluate_threshold(
        self,
        images: jnp.ndarray,
        boxes: jnp.ndarray,
        mask: jnp.ndarray,
        thresholds: Sequence[float] = tuple(np.arange(0.60, 0.951, 0.05)),
    ) -> Dict[float, Dict[str, float]]:
        """Threshold sweep (reference :490-529): per threshold, the fraction
        of valid patches served by knn vs projection/clip and the mean hit
        similarity."""
        # One region encode; only the (cheap) knn gate depends on the
        # threshold — re-running the crop+ViT forward per threshold
        # multiplied the dominant cost 8x (review finding).
        b, p = boxes.shape[:2]
        h, w = images.shape[1:3]
        raw = encode_patches(
            self.clip_model, self.clip_variables, images, boxes, mask,
            patch_size=self.patch_size,
        )
        d = raw.shape[-1]
        queries = l2_normalize(raw.reshape(b * p, d))
        positions = (boxes / jnp.asarray([w, h, w, h], jnp.float32)).reshape(
            b * p, 4
        )
        out: Dict[float, Dict[str, float]] = {}
        for th in thresholds:
            res = knn_or_projection(
                queries, positions, self._store_keys, self._store_values,
                self._projection_fn, float(th), k=self.top_k,
            )
            valid = np.asarray(mask).reshape(-1) > 0
            src = np.asarray(res.source)[valid]
            sims = np.asarray(res.similarity)[valid]
            n = max(len(src), 1)
            knn_frac = float((src == 0).sum()) / n
            out[round(float(th), 2)] = {
                "knn_fraction": knn_frac,
                "fallback_fraction": 1.0 - knn_frac,
                "mean_similarity": float(sims[src == 0].mean()) if (src == 0).any() else 0.0,
            }
        return out

"""Patch-index builder: the reference's `compute_faiss.py` + `precache_knn`
as one offline pass writing an `EmbeddingStore`.

Reference behavior (training/compute_faiss.py): detect boxes on every image
(:30-35), crop each box (:37-40), CLIP-encode + L2-normalize (:41-48), add
to `IndexFlatIP(512)` with a `{patch_id: {embedding, position}}` JSON
sidecar (:79-103). Patch ids follow the same `<image-stem>_patch<i>` scheme
(:84). Here: crops run through ONE jitted batched CLIP forward per chunk
instead of one torch forward per patch, and the store replaces both the
.idx file and the JSON sidecar.

`precache_knn`'s md5-keyed result cache (train_pickle.py:61-176) is
intentionally not reproduced: its only purpose was to avoid recomputing
per-patch CLIP forwards across epochs, and the batched on-device encoder
makes recomputation cheaper than the pickle/dbm round-trip it replaced.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from dclip_tpu.data.detection_cache import DetectFn, DetectionCache
from dclip_tpu.data.embedding_store import EmbeddingStore
from dclip_tpu.data.pipeline import preprocess_image
from dclip_tpu.models.clip import CLIPModule


def build_patch_index(
    image_paths: Sequence[str],
    clip_model: CLIPModule,
    clip_variables,
    detection_cache: Optional[DetectionCache] = None,
    detect_fn: Optional[DetectFn] = None,
    image_size: int = 224,
    batch_size: int = 256,
    output_path: Optional[str] = None,
) -> EmbeddingStore:
    """Crop every detected box, batch-encode, store normalized embeddings."""
    from PIL import Image

    from dclip_tpu.models.encoding import make_image_encoder

    encoder = make_image_encoder(clip_model, clip_variables, batch_size)
    dim = None
    store: Optional[EmbeddingStore] = None

    pending_pixels: list = []
    pending_meta: list = []

    def flush():
        nonlocal store, dim
        if not pending_pixels:
            return
        emb = encoder(pending_pixels)
        if store is None:
            dim = emb.shape[-1]
            store = EmbeddingStore(dim=dim)
        for (pid, pos), e in zip(pending_meta, emb):
            store.add(pid, e, position=pos)
        pending_pixels.clear()
        pending_meta.clear()

    for path in dict.fromkeys(image_paths):
        if not os.path.exists(path):
            continue
        try:
            with Image.open(path) as im:
                im = im.convert("RGB")
                w, h = im.size
                if detection_cache is not None and path in detection_cache:
                    boxes, _ = detection_cache.get(path)
                elif detect_fn is not None:
                    boxes, _ = detect_fn(np.asarray(im))
                else:
                    boxes = np.asarray([[0, 0, w, h]], np.float32)
                stem = os.path.splitext(os.path.basename(path))[0]
                for i, box in enumerate(boxes):
                    x1, y1, x2, y2 = (float(v) for v in box)
                    if x2 <= x1 or y2 <= y1:
                        continue
                    patch = im.crop((x1, y1, x2, y2))
                    pending_pixels.append(preprocess_image(patch, image_size))
                    pending_meta.append(
                        (f"{stem}_patch{i}", [x1 / w, y1 / h, x2 / w, y2 / h])
                    )
                    if len(pending_pixels) >= batch_size:
                        flush()
        except Exception as e:
            print(f"Skipping {path}: {e}")
    flush()
    store = store or EmbeddingStore(dim=dim or 512)
    if output_path:
        store.save(output_path)
    return store

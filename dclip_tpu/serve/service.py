"""Bucket-padded CLIP encoding service.

Serving on TPU wants every forward to hit an already-compiled executable:
requests are padded up to a small set of batch buckets so jax.jit's
shape-keyed cache compiles once per bucket and every later request
replays. `warmup()` pre-pays all compiles at startup (first compile
through a tunneled chip can take minutes — never pay it on a request).

Text requests go raw string -> tokenizer -> [B, 77] ids; image requests
take decoded uint8 RGB arrays and run the HF-parity host preprocessing
(`data.pipeline.preprocess_image`, PIL bicubic) so served embeddings are
bit-comparable with the eval stack (reference eval scripts use
CLIPProcessor; eval_scripts/flickr30k_eval.py:149-161).

An optional in-memory retrieval index (`data.embedding_store.
EmbeddingStore` + `ops.knn.knn_search`) turns the service into a
text->image search endpoint — the served counterpart of the repo's
FAISS-replacing device k-NN.
"""
from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_BUCKETS = (1, 4, 16, 64)


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; callers chunk by max(buckets) first."""
    if n < 1:
        raise ValueError(f"batch must be >= 1, got {n}")
    for b in sorted(buckets):
        if n <= b:
            return b
    raise ValueError(f"batch {n} exceeds the largest bucket {max(buckets)}")


class ClipService:
    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        cfg,
        tokenizer=None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        normalize: bool = True,
        index_dim: Optional[int] = None,
        quantize: Optional[str] = None,
        mesh=None,
        index=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis. With >1
        device, encode batches shard over it (params replicated, outputs
        gathered) and index search runs the two-stage sharded top-k —
        serving scales over ICI the same way training does. Buckets must
        then divide evenly by the data-axis size."""
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.buckets = tuple(sorted(buckets))
        self.normalize = normalize
        self.quantize = quantize
        self.mesh = mesh
        self._ndev = 1 if mesh is None else int(mesh.devices.size)
        if self._ndev > 1:
            bad = [b for b in self.buckets if b % self._ndev]
            if bad:
                raise ValueError(
                    f"buckets {bad} do not divide the mesh data size "
                    f"{self._ndev}; pick multiples so every padded batch "
                    f"shards evenly"
                )
        self._lock = threading.Lock()  # jit cache + index mutations
        self._n_texts = 0
        self._n_images = 0

        if quantize is None:
            def _text_fn(variables, ids, mask):
                emb = model.apply(
                    variables, ids, mask, method=model.get_text_features
                )
                return self._maybe_normalize(emb)

            # Same auto-selection as models.encoding.make_image_encoder:
            # the fully fused encoder-block kernels win ~22% on the
            # cropless serving forward (21.3 vs 25.9 ms at B=64, B/16).
            # Pallas kernels have no GSPMD partitioning rule — on a >1
            # device mesh the batch-sharded XLA module path runs instead
            # (same policy as the trainers).
            fused = False
            if getattr(model, "dtype", None) == jnp.bfloat16 and self._ndev == 1:
                from dclip_tpu.core.platform import default_is_tpu

                if default_is_tpu():
                    from dclip_tpu.kernels import pallas_available

                    fused = pallas_available()
            if fused:
                from dclip_tpu.kernels.vit_block import fused_image_features

                def _image_fn(variables, pixels):
                    emb = fused_image_features(
                        cfg, variables, pixels, dtype=model.dtype
                    )
                    return self._maybe_normalize(emb)

            else:
                def _image_fn(variables, pixels):
                    emb = model.apply(
                        variables, pixels, method=model.get_image_features
                    )
                    return self._maybe_normalize(emb)

        elif quantize == "int8":
            from dclip_tpu.serve.quant import (
                quantize_clip,
                quantized_image_features,
                quantized_text_features,
            )

            # int8 weights replace the float params for serving
            self.variables = variables = quantize_clip(variables, cfg)

            def _text_fn(qparams, ids, mask):
                emb = quantized_text_features(cfg, qparams, ids, mask)
                return self._maybe_normalize(emb)

            def _image_fn(qparams, pixels):
                emb = quantized_image_features(cfg, qparams, pixels)
                return self._maybe_normalize(emb)

        else:
            raise ValueError(
                f"quantize must be None or 'int8', got {quantize!r}"
            )

        # Serving ships RAW uint8 pixels to the device and normalizes
        # there: host->device bytes drop 4x (the tunnel/PCIe transfer is
        # the serving image path's bottleneck, measured 817 ms p50 for a
        # float32 batch-64 chunk), and the rescale+normalize fuses into
        # the patch-embedding conv's input on-device.
        def _image_u8_fn(variables, pixels_u8):
            from dclip_tpu.ops.image_ops import normalize as _clip_norm

            px = _clip_norm(pixels_u8.astype(jnp.float32) / 255.0)
            return _image_fn(variables, px)

        if self._ndev > 1:
            from dclip_tpu.parallel.mesh import (
                batch_sharding,
                replicated,
                replicate_tree,
            )

            self.variables = variables = replicate_tree(variables, mesh)
            bs, rep = batch_sharding(mesh), replicated(mesh)
            self._text_jit = jax.jit(
                _text_fn, in_shardings=(rep, bs, bs), out_shardings=rep
            )
            self._image_jit = jax.jit(
                _image_u8_fn, in_shardings=(rep, bs), out_shardings=rep
            )
            self._search_jit = jax.jit(
                self._make_sharded_knn(mesh), static_argnums=(3,)
            )
        else:
            # Device-commit the weights ONCE: variables arrive as host
            # numpy (hf_import/safetensors, host_random_variables,
            # quantize_clip), and jit re-transfers numpy args on EVERY
            # call — a full-weight H2D per request batch otherwise.
            self.variables = variables = jax.device_put(variables)
            self._text_jit = jax.jit(_text_fn)
            self._image_jit = jax.jit(_image_u8_fn)
            self._search_jit = jax.jit(
                lambda q, keys, k: _knn(q, keys, k), static_argnums=(2,)
            )

        self._index = None
        if index is not None:
            # Preloaded store (e.g. a cli.build_index artifact via
            # EmbeddingStore.load) — serve an existing corpus index
            # instead of starting empty.
            if index_dim is not None and index.dim != index_dim:
                raise ValueError(
                    f"index dim {index.dim} != index_dim {index_dim}"
                )
            if index_dim is None and index.dim != cfg.projection_dim:
                # Fail at startup, not with an XLA shape error on the
                # first search: queries come from THIS model's encoders.
                raise ValueError(
                    f"preloaded index dim {index.dim} != model projection "
                    f"dim {cfg.projection_dim}; was it built with a "
                    f"different preset?"
                )
            self._index = index
        elif index_dim is not None:
            from dclip_tpu.data.embedding_store import EmbeddingStore

            self._index = EmbeddingStore(dim=index_dim)

    def _maybe_normalize(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = emb.astype(jnp.float32)
        if not self.normalize:
            return emb
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )

    # -- encoding ----------------------------------------------------------

    def encode_texts(self, texts: Sequence[str]) -> np.ndarray:
        """[N] strings -> [N, projection_dim] (L2-normalized by default)."""
        if self.tokenizer is None:
            raise RuntimeError("ClipService built without a tokenizer")
        if len(texts) == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        ids, mask = self.tokenizer.encode_batch(
            list(texts), max_length=self.cfg.text.max_length
        )
        return self._run_bucketed(
            len(texts),
            lambda lo, hi, b: self._text_jit(
                self.variables,
                _pad_rows(ids[lo:hi], b),
                _pad_rows(mask[lo:hi], b),
            ),
        )

    def encode_images(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """[N] uint8 RGB HWC arrays (any sizes) -> [N, projection_dim]."""
        if len(images) == 0:
            return np.zeros((0, self.cfg.projection_dim), np.float32)
        from dclip_tpu.data.pipeline import resize_crop_uint8

        size = self.cfg.vision.image_size

        def _prep(im):
            im = np.asarray(im, np.uint8)
            if im.shape == (size, size, 3):
                return im  # already target geometry — no PIL round-trip
            from PIL import Image

            return resize_crop_uint8(Image.fromarray(im), size)

        # uint8 end-to-end on the host; rescale + CLIP normalization run
        # on-device inside _image_jit (4x fewer H2D bytes).
        pixels = np.stack([_prep(im) for im in images])
        return self._run_bucketed(
            len(images),
            lambda lo, hi, b: self._image_jit(
                self.variables, _pad_rows(pixels[lo:hi], b)
            ),
        )

    def _run_bucketed(self, n: int, run_chunk) -> np.ndarray:
        """Chunk [0, n) by the largest bucket, pad each chunk up to its
        bucket, run, and strip the padding."""
        out = []
        step = max(self.buckets)
        with self._lock:
            for lo in range(0, n, step):
                hi = min(lo + step, n)
                b = pad_to_bucket(hi - lo, self.buckets)
                emb = np.asarray(run_chunk(lo, hi, b))
                out.append(emb[: hi - lo])
        if out and out[0].ndim == 1:  # single-row model outputs
            out = [o[None] for o in out]
        result = np.concatenate(out, axis=0)
        return result

    @staticmethod
    def _make_sharded_knn(mesh):
        """Two-stage exact top-k with the index rows sharded over the
        mesh's data axis: each device scores its shard, all_gather of the
        per-shard top-k, final top-k — the serving counterpart of
        ops.knn.knn_search_sharded's training role."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from dclip_tpu.ops.knn import knn_search_sharded

        def fn(q, keys, n_valid, k):
            body = lambda q_, ks_, nv_: knn_search_sharded(  # noqa: E731
                q_, ks_, "data", k, n_valid=nv_
            )
            return shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P("data", None), P()),
                out_specs=(P(), P()),
                # all_gather makes both outputs replicated; the static
                # checker cannot infer that through top_k/take_along_axis.
                check_vma=False,
            )(q, keys, n_valid)

        return fn

    def warmup(self) -> Dict[str, float]:
        """Compile every bucket for both modalities; returns seconds per
        (modality, bucket) so startup time is observable."""
        import time

        timings = {}
        size = self.cfg.vision.image_size
        for b in self.buckets:
            t0 = time.perf_counter()
            ids = np.full((b, self.cfg.text.max_length), 1, np.int32)
            mask = np.ones((b, self.cfg.text.max_length), np.int32)
            np.asarray(self._text_jit(self.variables, ids, mask))
            timings[f"text/{b}"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            px = np.zeros((b, size, size, 3), np.uint8)
            np.asarray(self._image_jit(self.variables, px))
            timings[f"image/{b}"] = round(time.perf_counter() - t0, 3)
        return timings

    # -- retrieval index ---------------------------------------------------

    @property
    def index_size(self) -> int:
        return 0 if self._index is None else len(self._index)

    def add_to_index(
        self, ids: Sequence[str], embeddings: np.ndarray
    ) -> None:
        if self._index is None:
            raise RuntimeError("ClipService built without index_dim")
        with self._lock:
            self._index.add_batch(list(ids), np.asarray(embeddings))

    def index_images(
        self, ids: Sequence[str], images: Sequence[np.ndarray]
    ) -> None:
        self.add_to_index(ids, self.encode_images(images))

    def search_texts(
        self, texts: Sequence[str], k: int = 5
    ) -> List[List[Tuple[str, float]]]:
        """Text queries -> top-k (id, score) over the image index."""
        return self.search(self.encode_texts(texts), k)

    def search(
        self, queries: np.ndarray, k: int = 5
    ) -> List[List[Tuple[str, float]]]:
        if self._index is None:
            raise RuntimeError("ClipService built without index_dim")
        # Snapshot under the lock: _pack() lazily (re)builds the packed
        # matrix, and racing it against a concurrent add_to_index can
        # publish a stale pack over the add's invalidation (lost update —
        # newly indexed entries would stay invisible). The packed arrays
        # themselves are immutable snapshots, so the device search below
        # runs outside the lock.
        with self._lock:
            if len(self._index) == 0:
                return [[] for _ in range(len(queries))]
            keys = self._index.keys
            ids = self._index.ids
        n = keys.shape[0]
        k_eff = min(k, n)
        if self._ndev > 1:
            # Pad rows up to the data-axis size; knn_search_sharded masks
            # the pad rows to -inf via n_valid so they can never win.
            pad = (-n) % self._ndev
            if pad:
                keys = np.concatenate(
                    [keys, np.zeros((pad, keys.shape[1]), keys.dtype)]
                )
            scores, idx = self._search_jit(
                jnp.asarray(queries, jnp.float32), jnp.asarray(keys),
                jnp.asarray(n, jnp.int32), k_eff,
            )
        else:
            scores, idx = self._search_jit(
                jnp.asarray(queries, jnp.float32), jnp.asarray(keys), k_eff
            )
        scores, idx = np.asarray(scores), np.asarray(idx)
        return [
            [(ids[j], float(s)) for j, s in zip(row_i, row_s)]
            for row_i, row_s in zip(idx, scores)
        ]

    def stats(self) -> dict:
        return {
            "buckets": list(self.buckets),
            "index_size": self.index_size,
            "projection_dim": self.cfg.projection_dim,
            "quantize": self.quantize,
        }


def _pad_rows(a: np.ndarray, b: int) -> np.ndarray:
    if a.shape[0] == b:
        return a
    pad = np.zeros((b - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def _knn(q, keys, k):
    from dclip_tpu.ops.knn import knn_search

    return knn_search(q, keys, k)

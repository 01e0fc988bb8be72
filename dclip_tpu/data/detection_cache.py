"""Detection cache: the offline detector artifact, fixed-shape at read time.

Replaces the reference's YOLO precache pickles
(training/train_pickle.py:14-59: `<stem>_precache.pkl` mapping
image_path -> [((x1,y1,x2,y2), conf), ...]) and the dbm mmap conversion for
big caches (CLIP_image_distillation.py:113-263). Storage is a single `.npz`
(flat packed arrays + offsets — O(1) load, no per-item pickle), written
atomically (tmp + rename, the one concurrency-safety pattern the reference
has, CLIP_image_distillation.py:64-73).

The detector itself is a plugin: any `detect_fn(image_rgb_uint8) ->
(boxes [N,4] xyxy, conf [N])`. The reference treats YOLO as a frozen,
cache-mediated black box (SURVEY.md §7 "YOLO on TPU"); `build_cache` runs
the plugin offline, once, exactly like `precache_yolo`. `GridProposalDetector`
is the built-in dependency-free stand-in (whole image + center + quadrants)
so the full pipeline runs without ultralytics.

Read side: `get_fixed` pads/truncates every image to `max_patches` slots
with a validity mask — the static shapes the jitted teacher consumes —
keeping the reference's confidence-descending top-k ordering
(image_tokenizer.py:377-380, top_k default 3 there, configurable here).
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

DetectFn = Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]


class GridProposalDetector:
    """Deterministic proposal generator: full image, center crop, quadrants.

    A stand-in for YOLOv8x when no detector checkpoint is available; the
    cache artifact it writes has the identical contract, so swapping in a
    real detector is a one-argument change to `build_cache`.
    """

    def __init__(self, include_quadrants: bool = True):
        self.include_quadrants = include_quadrants

    def __call__(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h, w = image.shape[:2]
        boxes = [[0, 0, w, h], [w * 0.25, h * 0.25, w * 0.75, h * 0.75]]
        confs = [0.9, 0.8]
        if self.include_quadrants:
            for qx, qy in ((0, 0), (0.5, 0), (0, 0.5), (0.5, 0.5)):
                boxes.append([w * qx, h * qy, w * (qx + 0.5), h * (qy + 0.5)])
                confs.append(0.5)
        return np.asarray(boxes, np.float32), np.asarray(confs, np.float32)


class DetectionCache:
    """image_path -> (boxes [N,4] xyxy pixel coords, conf [N])."""

    def __init__(self, entries: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None):
        self._entries: Dict[str, Tuple[np.ndarray, np.ndarray]] = entries or {}

    def __len__(self) -> int:
        return len(self._entries)

    def __contains__(self, path: str) -> bool:
        return path in self._entries

    def get(self, path: str) -> Tuple[np.ndarray, np.ndarray]:
        if path in self._entries:
            return self._entries[path]
        return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)

    def put(self, path: str, boxes: np.ndarray, conf: np.ndarray) -> None:
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        conf = np.asarray(conf, np.float32).reshape(-1)
        assert boxes.shape[0] == conf.shape[0]
        self._entries[path] = (boxes, conf)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Atomic write. `.dcs` paths use the native mmap KV store
        (dclip_tpu.native — the dbm replacement, O(1) reopen for huge
        caches); anything else writes one packed npz."""
        if path.endswith(".dcs"):
            from dclip_tpu import native

            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            with native.NativeKVStore(path, writable=True) as s:
                for k, (boxes, conf) in self._entries.items():
                    s.put_array(k, np.concatenate([boxes, conf[:, None]], 1))
            return
        self._save_npz(path)

    def _save_npz(self, path: str) -> None:
        """Packed arrays + offsets + key list, tmp+rename."""
        keys = sorted(self._entries)
        counts = np.asarray([self._entries[k][0].shape[0] for k in keys], np.int64)
        boxes = (
            np.concatenate([self._entries[k][0] for k in keys], 0)
            if keys and counts.sum()
            else np.zeros((0, 4), np.float32)
        )
        conf = (
            np.concatenate([self._entries[k][1] for k in keys], 0)
            if keys and counts.sum()
            else np.zeros((0,), np.float32)
        )
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)) or ".")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez_compressed(
                    f,
                    keys=json.dumps(keys),
                    counts=counts,
                    boxes=boxes,
                    conf=conf,
                )
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @classmethod
    def load(cls, path: str) -> "DetectionCache":
        if path.endswith(".dcs"):
            from dclip_tpu import native

            entries = {}
            store = native.NativeKVStore(path)
            try:
                for k in store.keys():
                    packed = store.get_array(k)
                    entries[k] = (packed[:, :4].copy(), packed[:, 4].copy())
            finally:
                store.close()
            return cls(entries)
        with np.load(path, allow_pickle=False) as z:
            keys = json.loads(str(z["keys"]))
            counts = z["counts"]
            boxes, conf = z["boxes"], z["conf"]
        entries = {}
        off = 0
        for k, n in zip(keys, counts):
            entries[k] = (boxes[off : off + n].copy(), conf[off : off + n].copy())
            off += int(n)
        return cls(entries)

    # -- fixed-shape read path -------------------------------------------------

    def get_fixed(
        self, paths: Sequence[str], max_patches: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch read -> (boxes [B,P,4], conf [B,P], mask [B,P]).

        Detections are sorted by confidence descending and truncated to
        max_patches (the reference's top-k-by-confidence at
        image_tokenizer.py:377-380); short rows are zero-padded with mask 0.
        """
        b = len(paths)
        out_boxes = np.zeros((b, max_patches, 4), np.float32)
        out_conf = np.zeros((b, max_patches), np.float32)
        out_mask = np.zeros((b, max_patches), np.float32)
        for i, p in enumerate(paths):
            boxes, conf = self.get(p)
            if boxes.shape[0] == 0:
                continue
            order = np.argsort(-conf, kind="stable")[:max_patches]
            n = len(order)
            out_boxes[i, :n] = boxes[order]
            out_conf[i, :n] = conf[order]
            out_mask[i, :n] = 1.0
        return out_boxes, out_conf, out_mask


def build_cache(
    image_paths: Sequence[str],
    detect_fn: DetectFn,
    output_path: Optional[str] = None,
    existing: Optional[DetectionCache] = None,
) -> DetectionCache:
    """Offline detection pass over unique image paths (train_pickle.py:14-59:
    dedupe, existence filter, batch detect, pickle dump — here npz)."""
    from PIL import Image

    cache = existing or DetectionCache()
    unique = [p for p in dict.fromkeys(image_paths) if p not in cache]
    for p in unique:
        if not os.path.exists(p):
            continue
        with Image.open(p) as im:
            arr = np.asarray(im.convert("RGB"))
        boxes, conf = detect_fn(arr)
        cache.put(p, boxes, conf)
    if output_path:
        cache.save(output_path)
    return cache


def cache_path_for(json_file: str, kind: str = "precache", cache_dir: str = "cache") -> str:
    """`<cache_dir>/<json-stem>_<kind>.npz` — the reference's naming scheme
    (train_pickle.py:54: `cache/<stem>_precache.pkl`), npz extension."""
    stem = os.path.splitext(os.path.basename(json_file))[0]
    return os.path.join(cache_dir, f"{stem}_{kind}.npz")


def boxes_from_corpus_item(item: dict) -> Tuple[np.ndarray, np.ndarray]:
    """VG-style corpus `boxes` dicts -> (xyxy [N,4], conf=1.0 [N])
    (corpus schema from big_teacher_data.py:143-148)."""
    boxes: List[List[float]] = []
    for bx in item.get("boxes", []):
        boxes.append(
            [bx["x"], bx["y"], bx["x"] + bx["width"], bx["y"] + bx["height"]]
        )
    arr = np.asarray(boxes, np.float32).reshape(-1, 4)
    return arr, np.ones((arr.shape[0],), np.float32)

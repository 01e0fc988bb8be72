"""Host input pipeline: corpus JSON -> fixed-shape numpy batches.

Replaces the reference's `MultiModalDataset` + DataLoader stack
(training/CLIP_image_distillation.py:78-434): per-item PIL decode with
3-retry zero-fallback (:319-409), random caption per epoch (:333), ragged
box lists in the collate (:411-434), and a SECOND decode of the same image
inside the teacher (patch_text_aggregation.py:300). Here every image is
decoded ONCE per step and feeds both consumers (SURVEY.md §7 "Host I/O
pipeline"):

- `pixel_values`  [B, S, S, 3]  student input — PIL-bicubic shortest-side
  resize + center crop + CLIP normalization (bit-parity with HF
  `CLIPProcessor`),
- `teacher_pixels` [B, R, R, 3] in [0,1] — squash-resized full frame whose
  region crops the jitted teacher takes on device
  (`dclip_tpu.models.teacher.encode_patches`), with `boxes` rescaled into
  that frame,
- `input_ids`/`attention_mask` [B, 77] — the epoch-seeded random caption
  (deterministic, unlike the reference's global `random.choice`),
- `boxes` [B, P, 4] / `conf` [B, P] / `box_mask` [B, P] — detection cache
  rows, confidence-descending, padded to max_patches.

Decode + preprocess runs in a thread pool with a bounded prefetch queue;
batches are plain numpy, ready for `jax.device_put` (the trainer overlaps
H2D with the previous step automatically via async dispatch). For hosts
where PIL decode saturates the GIL (one thread pool can't feed a ~300
img/s chip), `num_workers > 0` adds a spawned process pool — the
TPU-native analogue of the reference's `DataLoader(num_workers=4)` +
`mp.set_start_method('spawn')` (train_contrastive_teacher.py:211,
CLIP_image_distill_training.py:53) — with the same deterministic
per-(seed, epoch, index) item derivation, so worker count never changes
the data stream.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from dclip_tpu.data.detection_cache import DetectionCache
from dclip_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

_CLIP_MEAN_F32 = np.asarray(CLIP_MEAN, np.float32)
_CLIP_STD_F32 = np.asarray(CLIP_STD, np.float32)


@dataclass
class Batch:
    pixel_values: np.ndarray  # [B, S, S, 3] float32, CLIP-normalized
    input_ids: np.ndarray  # [B, T] int32
    attention_mask: np.ndarray  # [B, T] int32
    teacher_pixels: np.ndarray  # [B, R, R, 3] float32 in [0, 1]
    boxes: np.ndarray  # [B, P, 4] float32, xyxy in teacher_pixels frame
    conf: np.ndarray  # [B, P] float32
    box_mask: np.ndarray  # [B, P] float32
    index: np.ndarray  # [B] int64 corpus indices
    # Stable per-example identity (image-path digest): survives corpus
    # rebuilds/reshuffles, unlike `index` — the teacher-target cache keys
    # on it so a regenerated corpus never serves another image's targets.
    content_key: Optional[np.ndarray] = None  # [B] int64

    def as_dict(self) -> Dict[str, np.ndarray]:
        return self.__dict__.copy()


def content_key_for(image_path: str) -> np.int64:
    import hashlib

    digest = hashlib.md5(str(image_path).encode()).digest()[:8]
    return np.int64(int.from_bytes(digest, "little", signed=True))


def resize_crop_uint8(image, size: int = 224) -> np.ndarray:
    """HF CLIPProcessor resize/crop geometry WITHOUT normalization:
    bicubic shortest-side resize + center crop, uint8 [size, size, 3].

    The serving path ships this raw uint8 to the device and applies
    rescale 1/255 + CLIP mean/std there (ops.image_ops.normalize) —
    4x fewer host->device bytes than a float32 transfer."""
    from PIL import Image

    w, h = image.size
    # HF get_resize_output_image_size: shortest edge -> size, long side
    # truncated (int()), not rounded.
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    image = image.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    image = image.crop((left, top, left + size, top + size))
    return np.asarray(image, np.uint8)


def preprocess_image(
    image, size: int = 224
) -> np.ndarray:
    """HF CLIPProcessor-parity preprocessing: bicubic shortest-side resize,
    center crop, rescale 1/255, CLIP mean/std normalize. NHWC float32."""
    arr = resize_crop_uint8(image, size).astype(np.float32) / 255.0
    return (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)


def squash_resize(image, size: int) -> np.ndarray:
    """Full frame squash-resized to [size, size, 3] in [0,1] (bilinear)."""
    from PIL import Image

    arr = np.asarray(image.resize((size, size), Image.BILINEAR), np.float32)
    return arr / 255.0


class StarvationMonitor:
    """Detects the input pipeline starving the accelerator and prints ONE
    actionable line with a suggested --num_workers.

    Out of the box (`--num_workers 0`, GIL-bound thread decode ~55 img/s
    per core) a v5e chip running ~300 img/s is fed at <20% utilization and
    nothing used to say so. The consumer records how long each `q.get`
    blocked; the producer records its decode throughput. Past a warmup
    (compile-dominated batches are skipped), if the consumer spent more
    than `threshold` of its wall time waiting for data, warn once:
    demand = what the step loop could consume if never starved,
    supply = measured decode rate, suggestion = ceil(demand / per-worker
    rate) worker processes.
    """

    def __init__(
        self,
        num_workers: int = 0,
        warmup_batches: int = 4,
        threshold: float = 0.3,
        min_batches: int = 8,
        fast_decode: bool = False,
        decode_backend: str = "pil",
    ):
        self.num_workers = num_workers
        self.fast_decode = fast_decode
        self.decode_backend = decode_backend
        self.warmup_batches = warmup_batches
        self.threshold = threshold
        self.min_batches = min_batches
        self.batches = 0
        self.wait_s = 0.0
        self.wall_s = 0.0
        self.items = 0
        self.warned = False

    def record(self, wait_s: float, wall_s: float, n_items: int) -> None:
        self.batches += 1
        if self.batches <= self.warmup_batches:  # skip compile-heavy start
            return
        self.wait_s += wait_s
        self.wall_s += wall_s
        self.items += n_items

    def check(self, supply_items: int, supply_load_s: float) -> Optional[str]:
        """Returns the warning line (and latches) or None."""
        if (
            self.warned
            or self.batches - self.warmup_batches < self.min_batches
            or self.wall_s <= 0
            or self.items == 0
        ):
            return None
        wait_frac = self.wait_s / self.wall_s
        if wait_frac < self.threshold:
            return None
        busy = max(self.wall_s - self.wait_s, 1e-9)
        demand = self.items / busy  # img/s the step loop could consume
        supply = supply_items / max(supply_load_s, 1e-9)
        # Threads share the GIL for decode; a process pool scales ~linearly,
        # so per-worker rate ~= current supply / current parallelism.
        per_worker = supply / max(self.num_workers, 1)
        suggested = max(int(np.ceil(demand / max(per_worker, 1e-9))), 2)
        self.warned = True
        return (
            f"input pipeline is STARVING the accelerator: waited for data "
            f"{wait_frac * 100:.0f}% of step time (decode supply ~{supply:.0f} "
            f"img/s vs compute demand ~{demand:.0f} img/s). "
            f"Suggest --num_workers {suggested} (currently {self.num_workers})"
            f"{'' if self.fast_decode else ' and/or --fast_decode (scaled DCT decode, ~2-4x per core)'}"
            f"{'' if self.decode_backend == 'native' else ' and/or --decode_backend native (C++ decode, GIL-free threads)'}."
        )


_WORKER_PIPELINE: Optional["MultiModalPipeline"] = None


def _worker_init(pipeline: "MultiModalPipeline") -> None:
    # NOTE: workers deliberately keep default signal dispositions. A
    # process-GROUP SIGTERM (SLURM, `kill -- -PID`) kills them before the
    # parent's PreemptionGuard reaches a step boundary — that case is
    # handled upstream: BaseTrainer.fit reclassifies any pipeline failure
    # that follows a seen preemption signal as Preempted (graceful path).
    # Ignoring SIGTERM here instead would deadlock Pool.terminate(), whose
    # worker reaping IS a SIGTERM.
    global _WORKER_PIPELINE
    _WORKER_PIPELINE = pipeline


def _worker_load(args):
    idx, epoch = args
    return _WORKER_PIPELINE._load_item(idx, epoch)


class MultiModalPipeline:
    """Deterministic epoch iterator over corpus records."""

    def __init__(
        self,
        items: Sequence[dict],
        tokenizer,
        detection_cache: Optional[DetectionCache] = None,
        batch_size: int = 32,
        max_patches: int = 8,
        image_size: int = 224,
        teacher_image_size: int = 224,
        max_text_tokens: Optional[int] = None,
        seed: int = 42,
        drop_remainder: bool = True,
        num_threads: int = 8,
        prefetch: int = 4,
        shuffle: bool = True,
        num_workers: int = 0,
        monitor_starvation: bool = True,
        fast_decode: bool = False,
        decode_backend: str = "pil",
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.items = list(items)
        self.tokenizer = tokenizer
        self.cache = detection_cache or DetectionCache()
        self.batch_size = batch_size
        self.max_patches = max_patches
        self.image_size = image_size
        self.teacher_image_size = teacher_image_size
        self.max_text_tokens = max_text_tokens or getattr(tokenizer, "max_length", 77)
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.num_workers = num_workers
        # Scaled DCT decode (PIL draft): the JPEG decompressor emits a
        # 1/2 / 1/4 / 1/8-scale frame whose shortest side still covers the
        # largest consumer, then the normal bicubic resize runs from there.
        # Measured 1.7x decode throughput at 640x480 (growing with source
        # resolution), ~0.5% mean pixel delta vs the exact HF geometry —
        # opt-in, so eval/golden paths stay bit-comparable by default.
        self.fast_decode = fast_decode
        # "native": C++ libjpeg decode + fused resample/normalize
        # (native/jpeg_decode.cc) with per-item PIL fallback; GIL-released,
        # so `num_threads` scales over real cores without a process pool.
        # "pil" stays the default — eval/golden paths keep HF bit-parity.
        if decode_backend not in ("pil", "native"):
            raise ValueError(
                f"decode_backend must be 'pil' or 'native', got {decode_backend!r}"
            )
        self.decode_backend = decode_backend
        # Multi-host sharding: `batch_size` stays the GLOBAL batch size;
        # process p loads rows [p*local : (p+1)*local] of every global
        # batch, so the global array assembled by
        # parallel.multihost.put_sharded is the same concatenation a
        # single process would have produced (determinism pinned by the
        # 2-process test). The epoch order is seeded identically on every
        # process — no coordination needed.
        if shard_count > 1:
            if batch_size % shard_count:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"shard_count {shard_count}"
                )
            if not (0 <= shard_index < shard_count):
                raise ValueError(f"shard_index {shard_index} out of range")
            if not drop_remainder:
                raise ValueError(
                    "shard_count > 1 requires drop_remainder=True (a tail "
                    "batch cannot be split evenly across processes)"
                )
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._local_bs = batch_size // shard_count
        self._pool = None
        # One warning per pipeline lifetime (latched across epochs).
        self._starvation_monitor = (
            StarvationMonitor(
                num_workers, fast_decode=fast_decode,
                decode_backend=decode_backend,
            )
            if monitor_starvation else None
        )

    def _get_pool(self):
        """Spawned process pool, created lazily and reused across epochs.

        Spawn (not fork): the parent holds accelerator-client threads, and
        forking those is deadlock-prone — the same reason the reference
        sets 'spawn' (CLIP_image_distill_training.py:53). Workers receive
        a pickled copy of this pipeline (items, tokenizer, detection cache
        are all plain data) via the initializer, paying the pickle once
        per worker instead of once per item."""
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init, initargs=(self,)
            )
        return self._pool

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_pool"] = None  # pools are process-local
        return state

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # noqa: D105 - best-effort cleanup
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.items)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- per-item ----------------------------------------------------------

    def _decode_native(self, path: str):
        """One native call: JPEG bytes -> (student, teacher, (w, h)).

        Returns None whenever the native path can't serve the item (lib
        unavailable, non-JPEG file, corrupt bytes) — the caller falls back
        to the PIL route, so `decode_backend="native"` never changes WHICH
        items load, only how fast. The call releases the GIL, so the
        epoch's ThreadPoolExecutor gets real multi-core decode parallelism
        without the spawn process pool.

        Items the native path can never serve must not pay a full read
        before the PIL route re-reads the file: the library verdict is
        checked first (latched after one failed build, so a toolchain-less
        host doesn't double-read EVERY item of every epoch), and the
        2-byte JPEG SOI magic is sniffed before committing to the full
        read + decode (PNG/CMYK corpora mix cheaply)."""
        from dclip_tpu import native

        if not native.jpeg_available():
            return None
        try:
            with open(path, "rb") as f:
                head = f.read(2)
                if head != b"\xff\xd8":  # not a JPEG: PIL route directly
                    return None
                data = head + f.read()
        except OSError:
            return None
        return native.decode_preprocess(
            data, self.image_size, self.teacher_image_size,
            fast=self.fast_decode, mean=_CLIP_MEAN_F32, std=_CLIP_STD_F32,
        )

    def _load_item(self, idx: int, epoch: int) -> dict:
        from PIL import Image

        item = self.items[idx]
        rng = np.random.RandomState((self.seed * 1_000_003 + epoch * 9176 + idx) % (2**31))
        captions = item["captions"]
        caption = captions[rng.randint(len(captions))] if captions else ""
        decoded = (
            self._decode_native(item["image_path"])
            if self.decode_backend == "native" else None
        )
        if decoded is not None:
            pixel_values, teacher_pixels, (w, h) = decoded
        else:
            try:
                with Image.open(item["image_path"]) as im:
                    # Box rescale below needs the ORIGINAL frame size — read
                    # it from the header before draft shrinks the decode.
                    w, h = im.size
                    if self.fast_decode:
                        t = max(self.image_size, self.teacher_image_size)
                        im.draft("RGB", (t, t))  # no-op for non-JPEG
                    im = im.convert("RGB")
                    pixel_values = preprocess_image(im, self.image_size)
                    teacher_pixels = squash_resize(im, self.teacher_image_size)
            except Exception:
                # Reference behavior: zero tensors on unreadable images
                # (CLIP_image_distillation.py:400-409), but explicit.
                w = h = self.teacher_image_size
                pixel_values = np.zeros((self.image_size, self.image_size, 3), np.float32)
                teacher_pixels = np.zeros(
                    (self.teacher_image_size, self.teacher_image_size, 3), np.float32
                )
        boxes, conf, mask = self.cache.get_fixed([item["image_path"]], self.max_patches)
        boxes, conf, mask = boxes[0], conf[0], mask[0]
        # Rescale boxes from original pixel coords into the teacher frame.
        sx = self.teacher_image_size / max(w, 1)
        sy = self.teacher_image_size / max(h, 1)
        boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
        ids, amask = self.tokenizer.encode(caption, self.max_text_tokens)
        return {
            "pixel_values": pixel_values,
            "teacher_pixels": teacher_pixels,
            "boxes": boxes,
            "conf": conf,
            "box_mask": mask,
            "input_ids": ids,
            "attention_mask": amask,
            "index": np.int64(idx),
            "content_key": content_key_for(item["image_path"]),
        }

    # -- epoch iteration -----------------------------------------------------

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.items))
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        return order

    def epoch(self, epoch: int = 0) -> Iterator[Batch]:
        import time

        order = self._epoch_order(epoch)
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        supply = {"items": 0, "load_s": 0.0}  # producer-side decode stats

        def producer():
            # Exceptions are forwarded to the consumer and re-raised there:
            # a silently dying producer would truncate every epoch at the
            # failing item while training carried on oblivious.
            try:
                import contextlib

                with contextlib.ExitStack() as stack:
                    if self.num_workers > 0:
                        proc_pool = self._get_pool()
                        load = lambda idxs: proc_pool.map(  # noqa: E731
                            _worker_load, [(int(i), epoch) for i in idxs]
                        )
                    else:
                        pool = stack.enter_context(
                            ThreadPoolExecutor(self.num_threads)
                        )
                        load = lambda idxs: list(  # noqa: E731
                            pool.map(lambda i: self._load_item(int(i), epoch), idxs)
                        )
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        start = (b * self.batch_size
                                 + self.shard_index * self._local_bs)
                        idxs = order[start : start + self._local_bs]
                        t0 = time.perf_counter()
                        loaded = load(idxs)
                        supply["load_s"] += time.perf_counter() - t0
                        supply["items"] += len(loaded)
                        q.put(self._collate(loaded))
                q.put(None)
            except BaseException as e:  # noqa: BLE001 - forwarded, not swallowed
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        monitor = self._starvation_monitor
        try:
            prev = time.perf_counter()
            while True:
                t0 = time.perf_counter()
                batch = q.get()
                now = time.perf_counter()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                if monitor is not None:
                    monitor.record(now - t0, now - prev, batch.index.shape[0])
                    warning = monitor.check(supply["items"], supply["load_s"])
                    if warning is not None:
                        print(f"MultiModalPipeline: {warning}", flush=True)
                prev = now
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)

    @staticmethod
    def _collate(items: List[dict]) -> Batch:
        return Batch(
            pixel_values=np.stack([i["pixel_values"] for i in items]),
            input_ids=np.stack([i["input_ids"] for i in items]),
            attention_mask=np.stack([i["attention_mask"] for i in items]),
            teacher_pixels=np.stack([i["teacher_pixels"] for i in items]),
            boxes=np.stack([i["boxes"] for i in items]),
            conf=np.stack([i["conf"] for i in items]),
            box_mask=np.stack([i["box_mask"] for i in items]),
            index=np.stack([i["index"] for i in items]),
            content_key=np.stack([i["content_key"] for i in items]),
        )

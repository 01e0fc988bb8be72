"""Checkpoint manager: step-indexed save/restore with true resume.

The reference has per-epoch `torch.save` with val-loss-stamped filenames
plus a rolling best (train_contrastive_teacher.py:393-402), Lightning
`ModelCheckpoint(save_top_k=10, monitor=...)`
(CLIP_image_distill_training.py:27-34), interrupt/error checkpoints
(train_contrastive_teacher.py:404-420) — and NO resume logic anywhere
(SURVEY.md §5). This manager keeps all those artifact semantics and adds
what was missing: `latest()`/`restore()` so training restarts from the last
step (TPU preemption recovery).

Serialization is flax msgpack (`flax.serialization`) — a pure-pytree format
with no pickled code, stable across JAX versions, written atomically.
Filenames keep the reference's pattern: `<prefix>_epoch{n}_val{loss:.4f}`.
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Dict, List, Optional

import flax.serialization


def _atomic_write(path: str, data: bytes) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_state(path: str, state: Any) -> None:
    _atomic_write(path, flax.serialization.to_bytes(state))


def restore_state(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


class CheckpointManager:
    """save_top_k retention + best tracking + latest-step resume."""

    INDEX = "checkpoints.json"

    def __init__(
        self,
        directory: str,
        prefix: str = "ckpt",
        save_top_k: int = 10,
        monitor: str = "val_loss",
        mode: str = "min",
        async_writes: bool = False,
    ):
        self.directory = directory
        self.prefix = prefix
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        os.makedirs(directory, exist_ok=True)
        self._index: List[Dict] = []
        self._load_index()
        # Async mode: serialization happens synchronously (a host copy of
        # the state), the disk write overlaps the next training epoch.
        self.async_writes = async_writes
        self._executor = None
        self._pending: List = []
        if async_writes:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=1)

    # -- index -----------------------------------------------------------------

    def _index_path(self) -> str:
        return os.path.join(self.directory, self.INDEX)

    def _load_index(self) -> None:
        if os.path.exists(self._index_path()):
            with open(self._index_path()) as f:
                self._index = json.load(f)

    def _write_index(self) -> None:
        _atomic_write(
            self._index_path(), json.dumps(self._index, indent=2).encode()
        )

    # -- save ---------------------------------------------------------------------

    def save(
        self,
        state: Any,
        step: int,
        epoch: Optional[int] = None,
        metrics: Optional[Dict[str, float]] = None,
        tag: Optional[str] = None,
    ) -> str:
        """Write one checkpoint; retain top-k by monitored metric + latest."""
        metrics = dict(metrics or {})
        name = f"{self.prefix}"
        if epoch is not None:
            name += f"_epoch{epoch}"
        if self.monitor in metrics:
            name += f"_{self.monitor.replace('_loss','')}{metrics[self.monitor]:.4f}"
        if tag:
            name += f".{tag}"
        name += f".step{step}.msgpack"
        path = os.path.join(self.directory, name)
        entry = {
            "path": path,
            "step": int(step),
            "epoch": None if epoch is None else int(epoch),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "tag": tag,
            "time": time.time(),
        }

        def bookkeep():
            # Index entry recorded ONLY after the file exists on disk —
            # a preemption mid-write must never leave the index pointing
            # at a missing checkpoint. A rerun that reproduces an existing
            # filename (deterministic epoch/metric/step) REPLACES the old
            # entry: two entries sharing one path would let retention
            # unlink the file out from under the surviving entry.
            self._index = [e for e in self._index if e["path"] != path]
            self._index.append(entry)
            self._retain()
            self._write_index()

        if self._executor is not None:
            # At most one outstanding write: prior files must exist before
            # retention runs, and one epoch is ample time to land a write.
            self.wait()
            data = flax.serialization.to_bytes(state)

            def task():
                _atomic_write(path, data)
                bookkeep()

            self._pending.append(self._executor.submit(task))
        else:
            save_state(path, state)
            bookkeep()
        return path

    def save_interrupt(self, state: Any, step: int, kind: str = "interrupt") -> str:
        """`.interrupt` / `.error` checkpoints (reference :404-420).

        Only the most recent checkpoint per tag is retained — preemption-
        heavy runs would otherwise leak a full model per interruption."""
        keep, dropped = [], []
        for e in self._index:
            (dropped if e.get("tag") == kind else keep).append(e)
        for e in dropped:
            if os.path.exists(e["path"]):
                os.unlink(e["path"])
        self._index = keep
        return self.save(state, step, tag=kind)

    def _retain(self) -> None:
        if self.save_top_k <= 0:
            return
        scored = [
            e
            for e in self._index
            if self.monitor in e["metrics"] and not e.get("tag")
        ]
        sign = 1 if self.mode == "min" else -1
        scored.sort(key=lambda e: sign * e["metrics"][self.monitor])
        keep = set(id(e) for e in scored[: self.save_top_k])
        # Metric-less regular checkpoints retain top-k by recency: a caller
        # that never passes the monitored metric must not accumulate
        # checkpoints without bound.
        unscored = [
            e
            for e in self._index
            if not e.get("tag") and self.monitor not in e["metrics"]
        ]
        unscored.sort(key=lambda e: -e["step"])
        keep |= set(id(e) for e in unscored[: self.save_top_k])
        # Latest-protection applies to REGULAR checkpoints only: a tagged
        # interrupt entry with a higher step must not strip the newest
        # resume point of its protection.
        untagged = [e for e in self._index if not e.get("tag")]
        latest = max(untagged, key=lambda e: e["step"], default=None)
        new_index = []
        for e in self._index:
            if e.get("tag") or id(e) in keep or e is latest:
                new_index.append(e)
            elif os.path.exists(e["path"]):
                os.unlink(e["path"])
        self._index = new_index

    def wait(self) -> None:
        """Block until queued async writes land (call before reading files
        back or at shutdown)."""
        for fut in self._pending:
            fut.result()
        self._pending.clear()

    # -- query / restore ---------------------------------------------------------

    def latest(self) -> Optional[Dict]:
        self.wait()  # async bookkeeping must land before reads
        entries = [e for e in self._index if not e.get("tag")]
        return max(entries, key=lambda e: e["step"], default=None)

    def best(self) -> Optional[Dict]:
        self.wait()
        scored = [
            e
            for e in self._index
            if self.monitor in e["metrics"] and not e.get("tag")
        ]
        if not scored:
            return None
        sign = 1 if self.mode == "min" else -1
        return min(scored, key=lambda e: sign * e["metrics"][self.monitor])

    def restore(self, template: Any, entry: Optional[Dict] = None) -> Any:
        entry = entry or self.latest()
        if entry is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return restore_state(entry["path"], template)

    def restore_latest_or_none(self, template: Any):
        """Resume hook: (state, step) from the latest checkpoint, or None."""
        entry = self.latest()
        if entry is None:
            return None
        return restore_state(entry["path"], template), entry["step"]

"""HBM-resident level-0 cache for frozen teacher targets.

The host `TeacherTargetCache` (distill_trainer.py) round-trips every
cached row through the host: targets are computed ON DEVICE, exported to
numpy for the cache, then re-uploaded on every later hit — [B, 2, D]
full targets plus [B, P, D] patch embeddings per step of H2D that a
tunneled or PCIe link pays for again each epoch. This level fronts it
with a preallocated device buffer: hits gather rows on device (the only
upload is a [B] int32 index vector) and puts scatter the freshly
computed device values without ever leaving HBM.

This is the same north-star move as the FAISS replacement (SURVEY.md
§2.4: "HBM-resident embedding store"): keep hot embeddings resident in
HBM and address them with device gathers instead of host I/O.

Scope: single-device meshes (the buffer is unsharded; under dp>1 rows
would live on one device while the step wants them batch-sharded — the
host cache remains the multi-device path). Capacity is a byte budget;
once full, new rows are simply not inserted (the host levels still
serve them), so the cache never evicts and never grows past the budget.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def resolve_device_cache(mesh, requested: Optional[bool], host_cache) -> bool:
    """Shared trainer gate: device caching wants a single-device mesh (the
    buffer is unsharded; under dp>1 the step wants rows batch-sharded) and
    a host cache to front. `requested=None` means auto (on when eligible)."""
    if host_cache is None:
        return False
    single = mesh.devices.size == 1
    want = requested if requested is not None else single
    if want and not single:
        print("device_target_cache disabled: multi-device mesh "
              "(host cache serves dp>1)")
        return False
    return bool(want)


class DeviceTargetCache:
    """Key -> row mapping on the host; row storage in one device buffer.

    The buffer grows by doubling up to `capacity_rows` (a transient 2x
    copy per growth, amortized). `get` is all-or-nothing per batch, like
    the host cache's `get_batch`.
    """

    def __init__(
        self,
        row_shape: Sequence[int],
        dtype,
        capacity_bytes: int,
        device,
        min_rows: int = 1024,
    ):
        self.row_shape = tuple(int(s) for s in row_shape)
        self.dtype = jnp.dtype(dtype)
        row_bytes = int(np.prod(self.row_shape)) * self.dtype.itemsize
        self.capacity_rows = max(int(capacity_bytes // max(row_bytes, 1)), 0)
        self.device = device
        self._min_rows = min_rows
        self._rows: dict = {}
        self._next = 0
        self._buf: Optional[jnp.ndarray] = None
        self.hits = 0
        self.misses = 0
        self.skipped_puts = 0

    def __len__(self) -> int:
        return self._next

    def _ensure(self, n_new: int) -> bool:
        need = self._next + n_new
        if need > self.capacity_rows:
            return False
        cur = 0 if self._buf is None else self._buf.shape[0]
        if need <= cur:
            return True
        new = min(self.capacity_rows, max(need, cur * 2, self._min_rows))
        grown = jax.device_put(
            jnp.zeros((new, *self.row_shape), self.dtype), self.device
        )
        if self._buf is not None:
            grown = grown.at[:cur].set(self._buf)
        self._buf = grown
        return True

    def get(self, keys: Sequence) -> Optional[jnp.ndarray]:
        """Gathered [B, *row_shape] device array, or None on ANY miss."""
        idx = np.empty(len(keys), np.int32)
        for j, k in enumerate(keys):
            r = self._rows.get(k)
            if r is None:
                self.misses += 1
                return None
            idx[j] = r
        self.hits += 1
        return jnp.take(self._buf, jax.device_put(idx, self.device), axis=0)

    def put(self, keys: Sequence, values) -> None:
        """Insert [B, *row_shape] device values. Rows for keys already
        present are overwritten (idempotent); if the budget cannot hold
        the batch's new keys, nothing is inserted."""
        new = {k for k in keys if k not in self._rows}
        if not self._ensure(len(new)):
            self.skipped_puts += 1
            return
        idx = np.empty(len(keys), np.int32)
        for j, k in enumerate(keys):
            r = self._rows.get(k)
            if r is None:
                r = self._rows[k] = self._next
                self._next += 1
            idx[j] = r
        self._buf = self._buf.at[jax.device_put(idx, self.device)].set(
            values.astype(self.dtype)
        )

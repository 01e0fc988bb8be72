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

Sharding: constructed with the trainer's batch `NamedSharding`, the
buffer's ROW axis shards over the mesh data axis — per-device HBM holds
1/dp of the rows, and `capacity_bytes` is a PER-DEVICE budget (total
capacity scales with the mesh). Because an example can land on a
different batch shard each epoch (the pipeline reshuffles), rows are NOT
pinned to the device that first computed them: gathers/scatters run as
jitted global-index ops and GSPMD lowers them to the embedding-lookup
pattern (masked local gather + all-reduce over the data axis) — [B, row]
bytes over ICI per hit, vs the full [B, row] H2D over the host link the
cache exists to avoid. Multihost (process_count > 1) stays on the host
cache: cache keys are computed from process-local batch rows, while the
buffer here would be a global array (see `resolve_device_cache`).

Capacity is a byte budget. Past the budget the two key populations want
opposite policies, so eviction is a constructor flag:

- `evict=False` (default; the patch-embedding level): keys are stable
  per example and every epoch scans all of them in order. Fill-once is
  OPTIMAL here — the first `capacity` examples hit every epoch, while
  FIFO/LRU under a sequential scan larger than the cache evicts every
  row right before its reuse and hits ~never.
- `evict=True` (the full-target level): keys embed the sampled caption,
  so each epoch's drawn key only matches if some past epoch drew the
  same caption. Old draws lose value over time; FIFO reuse of the
  oldest rows keeps the buffer populated with recent draws instead of
  filling once with epoch-0 keys and serving ~zero hits forever.

Placement: pass the trainer's batch `NamedSharding` (not a bare device)
so gathered rows carry the SAME sharding as the miss/host-hit paths —
jit caches key on input shardings, and a `SingleDeviceSharding` hit
feeding a step first traced with `NamedSharding` inputs would silently
recompile the heaviest jit in the program a second time.

Puts run through a jitted scatter that DONATES the buffer, so the
update is in place in HBM — an eager `.at[].set()` would copy the
entire (up to budget-sized) buffer on every insert.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def resolve_device_cache(requested: Optional[bool], host_cache) -> bool:
    """Shared trainer gate: device caching needs a host cache to front and
    a single-process run (under multihost, cache keys come from each
    process's LOCAL batch rows while the device buffer would be a global
    array — the host cache serves that case). The mesh shape is
    deliberately NOT consulted: any single-process mesh qualifies, since
    under dp>1 the buffer rows shard over the data axis.
    `requested=None` means auto (on when eligible)."""
    if host_cache is None:
        return False
    single_process = jax.process_count() == 1
    want = requested if requested is not None else single_process
    if want and not single_process:
        print("device_target_cache disabled: multihost run "
              "(per-process keys; host cache serves)")
        return False
    return bool(want)


def _row_shards(sharding) -> int:
    """Number of shards the buffer's row axis splits into (1 for a bare
    device or a replicated spec)."""
    if isinstance(sharding, jax.sharding.NamedSharding):
        spec = sharding.spec
        if len(spec) > 0 and spec[0] is not None:
            names = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
            return int(np.prod([sharding.mesh.shape[n] for n in names]))
    return 1


class DeviceTargetCache:
    """Key -> row mapping on the host; row storage in one device buffer
    (row axis sharded over the batch sharding's data axis).

    The buffer grows by doubling up to `capacity_rows` (a transient 2x
    copy per growth, amortized); every size is a multiple of the shard
    count so placement stays even. `get` is all-or-nothing per batch,
    like the host cache's `get_batch`. `capacity_bytes` is PER DEVICE.

    Batch sizes passed to get/put must divide the data-axis size — the
    same contract the batch sharding itself imposes on every step's
    inputs (the pipeline pads batches to mesh multiples).
    """

    def __init__(
        self,
        row_shape: Sequence[int],
        dtype,
        capacity_bytes: int,
        device,
        min_rows: int = 1024,
        evict: bool = False,
    ):
        self.row_shape = tuple(int(s) for s in row_shape)
        self.dtype = jnp.dtype(dtype)
        row_bytes = int(np.prod(self.row_shape)) * self.dtype.itemsize
        if isinstance(device, jax.sharding.Sharding):
            self._sharding = device
        else:
            self._sharding = jax.sharding.SingleDeviceSharding(device)
        self.shards = _row_shards(self._sharding)
        # Per-device budget x shard count = total rows; keep it a multiple
        # of the shard count so every growth placement is even.
        per_dev = max(int(capacity_bytes // max(row_bytes, 1)), 0)
        self.capacity_rows = per_dev * self.shards
        self.evict = bool(evict)
        self._min_rows = -(-min_rows // self.shards) * self.shards
        self._rows: dict = {}  # key -> row index; insertion order = FIFO age
        self._free: list = []  # rows of evicted keys, reused before _next
        self._next = 0
        self._buf: Optional[jnp.ndarray] = None
        self.hits = 0
        self.misses = 0
        self.skipped_puts = 0
        self.evictions = 0
        # Buffer growth changes the buf shape, so these recompile
        # log2(capacity/min_rows) times over the cache's lifetime — cheap
        # gather/scatter compiles, not the training step. Under dp>1 the
        # buffer rows and the output batch share the SAME P(data) spec;
        # XLA lowers the global-index gather/scatter to a masked local op
        # + a collective over the data axis (verified in tests).
        self._gather = jax.jit(
            lambda buf, idx: jnp.take(buf, idx, axis=0),
            out_shardings=self._sharding,
        )
        self._scatter = jax.jit(
            lambda buf, idx, v: buf.at[idx].set(v.astype(buf.dtype)),
            out_shardings=self._sharding,
            donate_argnums=(0,),
        )

    def __len__(self) -> int:
        return len(self._rows)

    def _round_up(self, n: int) -> int:
        return -(-n // self.shards) * self.shards

    def _ensure(self, n_new: int) -> bool:
        need = self._next + max(n_new - len(self._free), 0)
        if need > self.capacity_rows:
            return False
        cur = 0 if self._buf is None else self._buf.shape[0]
        if need <= cur:
            return True
        new = min(
            self.capacity_rows,
            self._round_up(max(need, cur * 2, self._min_rows)),
        )
        # Allocate sharded (each device materializes only its 1/shards
        # slice); the old contents copy in via a donated jitted set so no
        # host round-trip or unsharded intermediate appears.
        grown = jax.jit(
            lambda: jnp.zeros((new, *self.row_shape), self.dtype),
            out_shardings=self._sharding,
        )()
        if self._buf is not None:
            grown = jax.jit(
                lambda g, b: g.at[: b.shape[0]].set(b),
                out_shardings=self._sharding,
                donate_argnums=(0,),
            )(grown, self._buf)
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
        return self._gather(self._buf, idx)

    def _make_room(self, keys, n_new: int) -> bool:
        """True if `n_new` fresh rows can be assigned, evicting FIFO
        victims (oldest keys not in this batch) when allowed."""
        spare = (self.capacity_rows - self._next) + len(self._free)
        if n_new <= spare:
            return self._ensure(n_new)
        if not self.evict:
            return False
        batch = set(keys)
        victims = []
        need = n_new - spare
        for k in self._rows:  # dict preserves insertion order: oldest first
            if k not in batch:
                victims.append(k)
                if len(victims) == need:
                    break
        if len(victims) < need:  # batch alone exceeds capacity
            return False
        for k in victims:
            self._free.append(self._rows.pop(k))
        self.evictions += len(victims)
        return self._ensure(n_new)

    def put(self, keys: Sequence, values) -> None:
        """Insert [B, *row_shape] device values. Rows for keys already
        present are overwritten (idempotent); if the budget cannot hold
        the batch's new keys (after eviction, when enabled), nothing is
        inserted."""
        new = len({k for k in keys if k not in self._rows})
        if not self._make_room(keys, new):
            self.skipped_puts += 1
            return
        idx = np.empty(len(keys), np.int32)
        for j, k in enumerate(keys):
            r = self._rows.get(k)
            if r is None:
                r = self._free.pop() if self._free else self._next
                if r == self._next:
                    self._next += 1
                self._rows[k] = r
            idx[j] = r
        # Donated in-place scatter: self._buf's old buffer is consumed.
        self._buf = self._scatter(self._buf, idx, values)

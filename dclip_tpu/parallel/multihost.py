"""Multi-host (multi-process) runtime support.

On a multi-host TPU pod each process addresses only its local chips:
`jax.device_put(host_array, sharding)` cannot place a global batch, and
every process must feed its own disjoint slice of the data. This module
is the thin seam the trainers and pipeline use so the SAME code runs
single-process (CPU tests, one tunneled chip) and multi-process (pods):

  * `put_sharded` — device_put under one process; global-array assembly
    from process-local rows (`jax.make_array_from_process_local_data`)
    under many. The global batch is the concatenation of per-process
    local batches in process order, which is exactly how
    `MultiModalPipeline(shard_index=p, shard_count=n)` slices each
    global batch.
  * `process_data_shard` — (index, count) for the pipeline's sharding,
    straight from the JAX distributed runtime.
  * `is_primary` — gate for host-side writes (checkpoints, metrics):
    every process computes identical replicated state, only one persists
    it.

Verified by an actual 2-process x 4-CPU-device run in
tests/test_multihost.py (jax.distributed over localhost, gloo backend):
the distill step's loss matches the single-process 8-device run on the
same corpus to float32 tolerance.

Reference counterpart: none — the reference is single-GPU
(CLIP_image_distill_training.py:39, devices=1); SURVEY.md §2.5 mandates
this as a new capability.
"""
from __future__ import annotations

import numpy as np

import jax


def process_data_shard() -> tuple:
    """(shard_index, shard_count) for this process's input pipeline."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that should perform host-side writes."""
    return jax.process_index() == 0


def local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, host-side.

    The inverse of `put_sharded` for host-side cache writes: under one
    process it is a plain device_get; under many, `np.asarray(arr)` would
    raise (the array spans non-addressable devices), so the process's
    addressable shards are concatenated in batch order — matching the row
    slice its pipeline shard loaded, so cache keys (computed from the
    local batch) zip against exactly these rows.
    """
    if jax.process_count() == 1:
        return np.asarray(arr)
    # Dedupe by row range: under model parallelism each row shard is
    # replicated across the model axis, so multiple addressable shards
    # cover the same rows.
    by_start = {}
    for s in arr.addressable_shards:
        start = s.index[0].start if s.index[0].start is not None else 0
        if start not in by_start:
            by_start[start] = s.data
    return np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0
    )


def put_sharded(value, sharding):
    """Place a host array under `sharding`, multi-process aware.

    Single process: plain `jax.device_put`. Multi-process: `value` holds
    this process's rows of the global batch (the pipeline's local batch)
    and the global array is assembled from all processes' chunks.
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(value)
    )

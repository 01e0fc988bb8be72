"""Shared trainer scaffolding: epoch loop, checkpoints, resume, transfers.

TeacherTrainer and DistillTrainer differ only in their loss/step functions;
the epoch/checkpoint/interrupt/resume machinery lives here once (it had
started drifting as duplicated code — review finding)."""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from dclip_tpu.core.metrics import MetricsLogger
from dclip_tpu.parallel.mesh import replicate_tree
from dclip_tpu.train.checkpoint import CheckpointManager


def apply_knn_gate(pe, positions, store_keys, store_values, projection_fn,
                   threshold: float, patch_mask):
    """Route patch embeddings through the knn/projection/clip gate
    (the reference's use_knn_projection teacher mode,
    patch_text_aggregation.py:78-99,308-486, vectorized via ops.knn).

    pe [B, P, D] raw patch embeddings -> gated [B, P, D] (masked slots stay
    zero)."""
    import jax.numpy as jnp

    from dclip_tpu.ops.knn import knn_or_projection

    b, p, d = pe.shape
    res = knn_or_projection(
        pe.reshape(b * p, d),
        None if positions is None else positions.reshape(b * p, 4),
        store_keys,
        store_values,
        projection_fn,
        threshold,
    )
    return res.embeddings.reshape(b, p, d) * patch_mask[..., None]


def fingerprint_objects(*objects) -> str:
    """md5 over a mixed list of strings and array pytrees (full bytes).

    The salt for persistent caches of frozen-forward outputs: everything
    that determines those outputs — configs (as strings) and every weight
    byte of every tree — goes in, so swapped weights/stores can never be
    served stale results."""
    import hashlib

    import numpy as np

    h = hashlib.md5()
    for obj in objects:
        if obj is None:
            h.update(b"none")
        elif isinstance(obj, str):
            h.update(obj.encode())
        else:
            for leaf in jax.tree_util.tree_leaves(jax.device_get(obj)):
                arr = np.ascontiguousarray(leaf)
                h.update(str(arr.shape).encode())
                h.update(arr.tobytes())
    return h.hexdigest()[:12]


def budgeted_patch_encode(
    clip_model,
    clip_config,
    clip_variables,
    raw_batch,
    device_batch,
    jit_cache: Dict[int, object],
    compact: bool,
    image_features_fn=None,
    image_features_base_fn=None,
    mesh=None,
    data_axis: str = "data",
):
    """Patch-encode with optional crop compaction (shared by both trainers).

    jit_cache maps budget -> compiled step (0 = dense); budgets come from a
    4-bucket set so at most a handful of variants compile. The cache is
    keyed by budget ONLY: callers must use one jit_cache per
    (model, image_features_fn) pair — trainers hold their own dict, so a
    different fn with a reused dict would silently serve stale closures.

    With `mesh` (dp-like execution) the WHOLE encode — crop, compaction
    gather, features — runs inside ONE shard_map over `data_axis`: each
    device compacts its own batch rows to a PER-SHARD budget (the max over
    shards' buckets, so one static shape serves every shard), no
    cross-shard reshuffle. `image_features_base_fn` is the unwrapped
    feature fn for that path (shard_map does not nest);
    `image_features_fn` (possibly already shard_map-wrapped) serves the
    meshless path. Under multihost the budget is agreed across processes
    via an allgathered max.
    """
    from dclip_tpu.models.teacher import (
        encode_patches,
        encode_patches_compact,
        patch_budget,
    )

    dp = mesh.shape.get(data_axis, 1) if mesh is not None else 1

    def get_step(budget: int):
        step = jit_cache.get(budget)
        if step is None:
            if mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def _inner(v, px, bx, bm, _budget=budget):
                    if _budget <= 0:
                        return encode_patches(
                            clip_model, v, px, bx, bm,
                            patch_size=clip_config.vision.image_size,
                            image_features_fn=image_features_base_fn,
                        )
                    return encode_patches_compact(
                        clip_model, v, px, bx, bm,
                        patch_size=clip_config.vision.image_size,
                        budget=_budget,
                        image_features_fn=image_features_base_fn,
                    )

                def _sharded(variables, batch):
                    return shard_map(
                        _inner,
                        mesh=mesh,
                        in_specs=(P(), P(data_axis), P(data_axis),
                                  P(data_axis)),
                        out_specs=P(data_axis),
                        check_vma=False,
                    )(
                        variables, batch["teacher_pixels"], batch["boxes"],
                        batch["box_mask"],
                    )

                step = jax.jit(_sharded)
            elif budget <= 0:
                def _dense(variables, batch):
                    return encode_patches(
                        clip_model, variables,
                        batch["teacher_pixels"], batch["boxes"],
                        batch["box_mask"],
                        patch_size=clip_config.vision.image_size,
                        image_features_fn=image_features_fn,
                    )

                step = jax.jit(_dense)
            else:
                def _compact(variables, batch, _budget=budget):
                    return encode_patches_compact(
                        clip_model, variables,
                        batch["teacher_pixels"], batch["boxes"],
                        batch["box_mask"],
                        patch_size=clip_config.vision.image_size,
                        budget=_budget,
                        image_features_fn=image_features_fn,
                    )

                step = jax.jit(_compact)
            jit_cache[budget] = step
        return step

    budget = 0
    if compact:
        import numpy as np

        d = raw_batch.as_dict() if hasattr(raw_batch, "as_dict") else raw_batch
        mask = d["box_mask"]
        # Budget selection is a HOST decision: only probe masks that are
        # already host-resident (the real pipeline yields numpy). Pulling a
        # device-resident mask would add a blocking D2H round-trip to every
        # step — on a tunneled TPU that costs more than compaction saves.
        if isinstance(mask, np.ndarray):
            if mesh is not None:
                # Per-SHARD budget: the shard_map body sees local rows, so
                # the bucket covers the fullest shard this process holds —
                # and, under multihost, the fullest shard anywhere (one
                # static shape globally).
                nproc = jax.process_count()
                local_shards = max(dp // nproc, 1)
                counts = mask.reshape(local_shards, -1).sum(axis=1)
                cmax = int(counts.max())
                if nproc > 1:
                    from jax.experimental import multihost_utils

                    cmax = int(np.max(np.asarray(
                        multihost_utils.process_allgather(
                            jnp.asarray(cmax, jnp.int32)
                        )
                    )))
                slots = mask.size // local_shards
                b = patch_budget(cmax, slots)
                if b < slots:
                    budget = b
            else:
                b = patch_budget(int(mask.sum()), mask.size)
                if b < mask.size:
                    budget = b
    return get_step(budget)(clip_variables, device_batch)


class BaseTrainer:
    """Subclasses set: self.mesh, self.state, self._batch_sharding, and
    implement train_step_on_batch(batch) -> metrics and
    eval_loss_on_batch(batch) -> scalar; optionally override _num_epochs
    and _on_epoch_start."""

    # Host-only (index, content_key) and jit-unconsumed (conf — kept in the
    # batch contract for parity with the reference's detection rows but no
    # compiled path reads it) fields never cross H2D.
    _HOST_ONLY_FIELDS = ("index", "content_key", "conf")

    def _device_batch(self, batch, fields=None) -> Dict[str, jnp.ndarray]:
        from dclip_tpu.parallel.multihost import put_sharded

        d = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
        return {
            k: put_sharded(v, self._batch_sharding)
            for k, v in d.items()
            if k not in self._HOST_ONLY_FIELDS
            and v is not None
            and (fields is None or k in fields)
        }

    # -- knn/projection gate (shared by both trainers) -----------------------

    def _init_knn_gate(self, knn_store, projection_params, embed_dim: int) -> None:
        """Optional knn/projection gate over raw patch embeddings (the
        reference's use_knn_projection teacher mode, EmbeddingStore-backed;
        patch_text_aggregation.py:78-99). With `projection_params`, below-
        threshold queries take the position-conditioned projection branch
        (reference image_tokenizer.py:278-315) instead of raw CLIP."""
        self._knn_keys = self._knn_values = None
        self._projection_fn = None
        self._projection_params = projection_params
        if knn_store is not None and len(knn_store) > 0:
            self._knn_keys = jnp.asarray(knn_store.keys)
            self._knn_values = jnp.asarray(knn_store.values)
        if projection_params is not None:
            from dclip_tpu.models.projections import (
                ImageProjectionModule,
                projection_apply_fn,
            )

            module = ImageProjectionModule(clip_dim=embed_dim)
            self._projection_fn = projection_apply_fn(module, projection_params)

    def _maybe_knn_gate(self, pe, batch, threshold: float):
        if self._knn_keys is None:
            return pe
        frame = batch["teacher_pixels"].shape[1]
        return apply_knn_gate(
            pe, batch["boxes"] / float(frame), self._knn_keys,
            self._knn_values, self._projection_fn, threshold,
            batch["box_mask"],
        )

    def _num_epochs(self) -> int:
        raise NotImplementedError

    def _on_epoch_start(self, epoch: int) -> None:
        pass

    def train_step_on_batch(self, batch):
        raise NotImplementedError

    def eval_loss_on_batch(self, batch) -> float:
        raise NotImplementedError

    def train_epoch(
        self, batches: Iterable, logger: Optional[MetricsLogger] = None,
        preemption=None,
    ) -> float:
        # Loss accumulates ON DEVICE; host sync happens only at log points,
        # so steps pipeline through JAX's async dispatch.
        total, n = None, 0
        for batch in batches:
            if preemption is not None and preemption.should_stop(n):
                from dclip_tpu.train.preemption import Preempted

                raise Preempted(
                    f"preemption signal honored at step boundary {n}"
                )
            metrics = self.train_step_on_batch(batch)
            total = metrics["loss"] if total is None else total + metrics["loss"]
            n += 1
            if logger and n % logger.print_every == 0:
                logger.log(
                    int(self.state.step),
                    {k: float(v) for k, v in metrics.items() if k != "loss"}
                    | {"train_loss": float(metrics["loss"])},
                )
        return float(total) / n if n else 0.0

    def validate(self, batches: Iterable) -> float:
        # Example-weighted mean: with partial tail batches kept, an
        # unweighted mean of batch means would overweight tail examples.
        # Zero batches -> NaN, NOT 0.0: a fake val_loss of 0.0 would win
        # best-checkpoint selection (mode=min) over every real score.
        total, n = 0.0, 0
        for batch in batches:
            d = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
            rows = len(next(iter(d.values())))
            total += self.eval_loss_on_batch(batch) * rows
            n += rows
        return total / n if n else float("nan")

    def fit(
        self,
        train_pipeline,
        val_pipeline=None,
        checkpoints: Optional[CheckpointManager] = None,
        logger: Optional[MetricsLogger] = None,
        start_epoch: int = 0,
        preemption=None,
    ) -> Dict[str, list]:
        """`preemption`: an installed train.preemption.PreemptionGuard.
        A SIGTERM (TPU-VM maintenance/spot reclaim) then stops training at
        the next step boundary, saves a tagged 'preempt' checkpoint, and
        re-raises `Preempted` for the caller to exit cleanly."""
        history: Dict[str, list] = {"train_loss": [], "val_loss": []}
        try:
            for epoch in range(start_epoch, self._num_epochs()):
                self._on_epoch_start(epoch)
                train_loss = self.train_epoch(
                    train_pipeline.epoch(epoch), logger, preemption=preemption
                )
                history["train_loss"].append(train_loss)
                val_loss = (
                    self.validate(val_pipeline.epoch(epoch))
                    if val_pipeline is not None
                    else train_loss
                )
                if val_loss != val_loss:  # NaN: empty val pipeline
                    print("validation yielded no batches; using train_loss")
                    val_loss = train_loss
                history["val_loss"].append(val_loss)
                print(
                    f"Epoch {epoch}: train_loss={train_loss:.4f} val_loss={val_loss:.4f}"
                )
                if checkpoints is not None:
                    checkpoints.save(
                        self.state,
                        step=int(self.state.step),
                        epoch=epoch,
                        metrics={"train_loss": train_loss, "val_loss": val_loss},
                    )
        except KeyboardInterrupt:
            if checkpoints is not None:
                checkpoints.save_interrupt(self.state, int(self.state.step), "interrupt")
            raise
        except Exception as e:
            from dclip_tpu.train.preemption import Preempted

            # A process-GROUP SIGTERM (SLURM, `kill -- -PID`, some TPU-VM
            # maintenance scripts) also kills spawned pipeline workers,
            # whose death surfaces as a pool/IO error BEFORE the guard's
            # step-boundary check runs. If the signal was seen, that
            # failure IS the preemption: take the graceful path (tagged
            # checkpoint + Preempted so CLIs exit 0), not a crash report.
            preempted = isinstance(e, Preempted) or (
                preemption is not None and preemption.requested
            )
            if checkpoints is not None:
                kind = "preempt" if preempted else "error"
                checkpoints.save_interrupt(self.state, int(self.state.step), kind)
            if preempted and not isinstance(e, Preempted):
                raise Preempted(
                    "preemption signal seen; pipeline failed before the "
                    f"next step boundary ({type(e).__name__}: {e})"
                ) from e
            raise
        return history

    def _prepare_resume(self, saved_epoch: int) -> None:
        """Hook: align mutable trainer structure (optimizer masks etc.) with
        the state at checkpoint-save time before restoring into it."""

    def _place_state(self, state):
        """Hook: device placement for a restored state. Default replicates;
        tensor-parallel trainers override to re-apply their shardings."""
        return replicate_tree(state, self.mesh)

    def resume(self, checkpoints: CheckpointManager) -> int:
        entry = checkpoints.latest()
        if entry is None:
            return 0
        saved_epoch = entry.get("epoch") or 0
        self._prepare_resume(saved_epoch)
        state, _ = checkpoints.restore_latest_or_none(jax.device_get(self.state))
        self.state = self._place_state(state)
        return saved_epoch + 1

"""Student distillation trainer (the main entry point's engine).

TPU-native replacement for training/CLIP_image_distillation.py:439-766 +
CLIP_image_distill_training.py: frozen meta-teacher distilled into a CLIP
student with cos-distill(img) + cos-distill(txt) + InfoNCE(temp 0.05)
(:580-634, :628), AdamW + linear warmup (:679-682), grad clip 0.5 /
accumulation 4 (CLIP_image_distill_training.py:41-42), default trainable
set reproducing the reference's effective behavior exactly (vision params
with 'proj' in the name + the whole text stack — see
dclip_tpu/train/optim.py docstring), ModelCheckpoint(save_top_k, monitor)
semantics via CheckpointManager.

The reference's progressive-unfreeze / full_resolution `on_epoch_end` hook
is dead code under modern Lightning (SURVEY.md §3.1); here the schedule is
explicit config (`unfreeze_schedule`), default empty = reference behavior.

Model-dimension note: the reference pairs a ViT-L/14 student (768-d) with a
512-d teacher, which cannot compute its cosine loss as written (SURVEY.md
§7 "model-id inconsistencies"); this build validates the pairing at
construction and defaults both sides to the same width.

One jitted step; teacher forwards run under stop_gradient (the functional
`torch.no_grad()`); params replicated, batch sharded over the data axis.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig, DistillConfig
from dclip_tpu.core.metrics import trace_span
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.teacher import (
    PatchTextAggregation,
    encode_patches,
    encode_tokens,
)
from dclip_tpu.ops.losses import distillation_loss
from dclip_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from dclip_tpu.parallel.multihost import local_rows, put_sharded
from dclip_tpu.train.base import BaseTrainer
from dclip_tpu.train.optim import (
    TrainState,
    count_trainable,
    make_optimizer,
    make_train_step,
    student_trainable_mask,
)
from dclip_tpu.train.teacher_trainer import masked_mean


class TeacherTargetCache:
    """Cross-epoch cache of frozen teacher targets.

    The modern analogue of the reference's per-patch knn pickle/dbm cache
    (train_pickle.py:61-176, CLIP_image_distillation.py:488-494): the
    teacher is frozen, so its (global_embedding, text_embedding) targets
    for a given (example, caption) pair never change — computing them is
    ~60% of the distillation step, and epochs >= 1 can skip it entirely.

    Keyed by md5(corpus index || caption token ids), so per-epoch random
    caption sampling still caches correctly. Backed by the native mmap KV
    store when a path is given (persists across runs, synced every
    `sync_every` puts like the reference's 100-batch dbm sync), else an
    in-process dict.
    """

    def __init__(self, path: Optional[str] = None, sync_every: int = 100,
                 salt: str = ""):
        self._mem: Dict[bytes, Any] = {}
        self._store = None
        self._puts = 0
        self.sync_every = sync_every
        # Fingerprint of the teacher (config + weights): a persistent cache
        # must never serve targets computed by a DIFFERENT teacher.
        self.salt = salt
        if path is not None:
            from dclip_tpu import native

            if native.available():
                self._store = native.NativeKVStore(path, writable=True)
            else:
                print("native store unavailable; teacher cache is in-memory only")

    @staticmethod
    def region_digests(batch: Dict[str, Any]):
        """Per-example md5 digest of the detection fields (boxes, box_mask).

        The teacher targets depend on the detections: re-running precache
        with a different detector/threshold changes the boxes, and a
        persistent cache keyed only on (item id, caption) would silently
        serve stale targets for the same images. Host-resident numpy only
        (the real pipeline's layout); returns None when absent so
        synthetic/test batches fall back to id-only keys.
        """
        import hashlib
        import numpy as np

        boxes = batch.get("boxes")
        mask = batch.get("box_mask")
        if not isinstance(boxes, np.ndarray) or not isinstance(mask, np.ndarray):
            return None
        return [
            hashlib.md5(b.tobytes() + m.tobytes()).digest()
            for b, m in zip(boxes, mask)
        ]

    def keys_for(self, batch: Dict[str, Any]) -> list:
        import hashlib
        import numpy as np

        item_ids = DistillTrainer._item_ids(batch)
        ids = np.asarray(batch["input_ids"])
        regions = self.region_digests(batch) or [b""] * len(ids)
        prefix = self.salt.encode()
        return [
            hashlib.md5(
                prefix
                + int(i).to_bytes(8, "little", signed=True)
                + row.tobytes()
                + reg
            ).hexdigest()
            for i, row, reg in zip(item_ids, ids, regions)
        ]

    def pe_keys_for(self, batch: Dict[str, Any]):
        """Caption-independent patch-embedding keys: (salt, item id,
        detection digest). Covers the boxes for the same staleness reason
        as keys_for. None when the batch has no host-resident item ids."""
        item_ids = DistillTrainer._item_ids(batch)
        if item_ids is None:
            return None
        regions = self.region_digests(batch) or [b""] * len(item_ids)
        return [
            f"pe:{self.salt}:{int(i)}:{reg.hex()}"
            for i, reg in zip(item_ids, regions)
        ]

    def get_batch(self, keys: list):
        """[B, 2, D] stacked (img, txt) targets, or None on any miss."""
        import numpy as np

        rows = []
        for k in keys:
            if self._store is not None:
                # The mmap store IS the cache; duplicating every row into
                # _mem would grow host RSS without bound at corpus scale.
                arr = self._store.get_array(k)
                if arr is None:
                    return None
                rows.append(arr)
            elif k in self._mem:
                rows.append(self._mem[k])
            else:
                return None
        return np.stack(rows)

    def put_batch(self, keys: list, targets) -> None:
        import numpy as np

        # float32: np.save round-trips ml_dtypes bfloat16 as raw void.
        targets = np.asarray(targets, np.float32)
        for k, row in zip(keys, targets):
            if self._store is not None:
                self._store.put_array(k, row)
                self._puts += 1
                if self._puts % self.sync_every == 0:
                    self._store.sync()
            else:
                self._mem[k] = row

    def close(self) -> None:
        if self._store is not None:
            self._store.sync()
            self._store.close()
            self._store = None


class DistillTrainer(BaseTrainer):
    def __init__(
        self,
        cfg: DistillConfig,
        student_variables: Dict[str, Any],
        teacher_clip_variables: Dict[str, Any],
        teacher_params: Any,
        student_config: Optional[CLIPConfig] = None,
        teacher_clip_config: Optional[CLIPConfig] = None,
        mesh=None,
        teacher_cache: Optional["TeacherTargetCache"] = None,
        knn_store=None,
        projection_params=None,
        dp_equivalent: bool = False,
    ):
        """`dp_equivalent=True` (bench mode): force every gate that keys on
        "is this a multi-device data-parallel mesh" — shard_map-wrapped
        kernels, per-shard packing/compaction, the XLA (all-gather) global
        loss instead of the fused single-device kernel — even on a
        1-device mesh. On one chip this runs the EXACT per-device step a
        dp>1 mesh runs (minus the ICI collectives), so the bench can
        report what the headline costs per chip on the north-star
        topology instead of implying the dp=1 number scales linearly."""
        self.cfg = cfg
        self.student_config = student_config or CLIPConfig.from_name(cfg.student_model)
        self.teacher_clip_config = teacher_clip_config or CLIPConfig.from_name(
            cfg.teacher_clip_model
        )
        if self.student_config.projection_dim != cfg.teacher.embed_dim:
            raise ValueError(
                f"student projection_dim {self.student_config.projection_dim} != "
                f"teacher embed_dim {cfg.teacher.embed_dim}: the distillation "
                "cosine loss requires matching widths (the reference's "
                "L/14-student-512-teacher pairing is unrunnable as written)"
            )
        if self.teacher_clip_config.projection_dim != cfg.teacher.embed_dim:
            raise ValueError(
                f"teacher CLIP projection_dim {self.teacher_clip_config.projection_dim}"
                f" != teacher embed_dim {cfg.teacher.embed_dim}"
            )
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        # Resolve auto fast-path fields (bf16 / Pallas / compaction default
        # ON for TPU meshes) against where this trainer actually executes.
        from dclip_tpu.core.config import resolve_fast_paths

        cfg = self.cfg = resolve_fast_paths(cfg, self.mesh.devices.flat[0].platform)
        dtype = jnp.dtype(cfg.compute_dtype)
        # Pallas kernels need interpret mode off-TPU; decide by where this
        # trainer's mesh actually executes (NOT jax.default_backend(): the
        # default platform can be a TPU while the mesh is CPU).
        from dclip_tpu.core.platform import is_tpu_platform

        self._pallas_interpret = not is_tpu_platform(
            self.mesh.devices.flat[0].platform
        )
        self._student_dtype = dtype
        self._unfrozen_extra: tuple = ()
        dp_size = self.mesh.shape.get(cfg.mesh.data_axis, 1)
        mp_size = self.mesh.shape.get(cfg.mesh.model_axis, 1)
        # dp-style execution: a real multi-device data axis, or bench mode
        # forcing the dp gates on one chip (see __init__ docstring).
        self._dp_equivalent = bool(dp_equivalent)
        self._dp_like = dp_size > 1 or self._dp_equivalent
        # Pallas kernels INSIDE the Flax modules (fused attention, fused
        # MLP pairs) have no GSPMD partitioning rule: under plain jit with
        # batch-sharded operands the partitioner would all-gather them and
        # compute the full global batch replicated per device. They are
        # batch-parallel, though, and shard_map composes with autodiff —
        # so under dp-only meshes every encoder apply (student fwd/bwd,
        # teacher-tail text encode) routes through shard_map over the data
        # axis and the kernels stay engaged (parity pinned in
        # tests/test_mesh_true_paths.py). Only mp>1 demotes to the XLA
        # twins: the CLIP weights are TP-sharded there and the kernels
        # assume whole weights VMEM-resident.
        self._module_pallas = bool(cfg.use_pallas) and mp_size == 1
        if cfg.use_pallas and not self._module_pallas:
            print("in-module Pallas kernels demoted to XLA twins: "
                  "tensor-parallel mesh (mp>1; weights are TP-sharded)")
        self.student = self._make_student(student_variables["params"])
        self.teacher_clip = CLIPModule(
            self.teacher_clip_config, dtype=dtype,
            fused_attention=self._module_pallas,
            pallas_interpret=self._pallas_interpret,
        )
        self.teacher = PatchTextAggregation(cfg.teacher, dtype=dtype)
        # Region-encode kernel choice (re-measured on v5e, 512 B/16 crops,
        # min over repetitions to exclude tunnel degradation windows):
        # the fully fused block kernels win fed by the crop too —
        # crop+blocks 121.8 ms vs crop+module(fused attention) 137.9 ms;
        # the crop's incremental cost over the cropless blocks (116.8 ms)
        # is ~5 ms, not the round-2 outlier that demoted this path.
        # Mesh-true under dp>1: GSPMD would silently REPLICATE a
        # pallas_call (all-gather + full-batch compute per device), so the
        # crops run through shard_map over the data axis instead — each
        # device encodes its own batch shard with the same kernels. Only
        # mp>1 demotes to the module path (the CLIP weights are TP-sharded
        # there; the kernels assume whole weights VMEM-resident).
        self._frozen_image_features = None
        self._frozen_image_features_base = None
        if cfg.use_pallas and mp_size == 1:
            from dclip_tpu.kernels.vit_block import fused_image_features

            _tccfg = self.teacher_clip_config
            _interp = self._pallas_interpret
            base = lambda v, px: fused_image_features(  # noqa: E731
                _tccfg, v, px, dtype=dtype, interpret=_interp
            )
            # The UNWRAPPED base also feeds the sharded compact encode
            # (base.budgeted_patch_encode wraps the whole gather+encode in
            # ONE shard_map; shard_map does not nest).
            self._frozen_image_features_base = base
            if self._dp_like:
                from dclip_tpu.parallel.mesh import shard_map_batchwise

                base = shard_map_batchwise(
                    base, self.mesh, cfg.mesh.data_axis
                )
            self._frozen_image_features = base
        # Frozen teacher-tail cross-attention: the fused kernel on ANY
        # mesh — the cross-modal weights are always replicated and the
        # kernel grids over the batch, so under multi-device it runs
        # through shard_map over the data axis (never differentiated:
        # the tail sits behind stop_gradient).
        self._fused_cross_attention = None
        if cfg.use_pallas:
            from dclip_tpu.kernels import cross_attention_fused

            _nh = cfg.teacher.num_heads
            _interp_x = self._pallas_interpret
            xattn = lambda p, te, pe, tm, pm: cross_attention_fused(  # noqa: E731
                p, te, pe, tm, pm, num_heads=_nh, interpret=_interp_x
            )
            if self.mesh.devices.size > 1 or self._dp_equivalent:
                from dclip_tpu.parallel.mesh import shard_map_batchwise

                xattn = shard_map_batchwise(
                    xattn, self.mesh, cfg.mesh.data_axis, n_args=4
                )
            self._fused_cross_attention = xattn

        # Differentiated encoder applies. Under dp-like meshes with the
        # in-module kernels engaged, each apply is shard_map-wrapped over
        # the data axis: every device runs the Pallas kernels on its own
        # batch shard (weights replicated — the transpose psums their
        # cotangents over the axis), and only the [B, D] embeddings are
        # gathered by the global loss. The lambdas read self.student at
        # TRACE time, so post-unfreeze module rebuilds are picked up on
        # the retrace.
        self._student_image = lambda p, px: self.student.apply(
            {"params": p}, px, method=self.student.get_image_features
        )
        self._student_text = lambda p, ids, am: self.student.apply(
            {"params": p}, ids, am, method=self.student.get_text_features
        )
        self._student_packed_text = lambda p, *packed: self.student.apply(
            {"params": p}, *packed,
            method=self.student.get_packed_text_features,
        )
        self._encode_tokens = lambda v, ids, am: encode_tokens(
            self.teacher_clip, v, ids, am,
            self.teacher_clip_config.text.eos_token_id,
        )
        # Packed eos rows are shard-LOCAL iff the packed forward gathers
        # inside shard_map (see _maybe_pack_text).
        self._packed_wrapped = False
        if self._module_pallas and self._dp_like:
            from dclip_tpu.parallel.mesh import shard_map_batchwise

            wrap = lambda fn, n: shard_map_batchwise(  # noqa: E731
                fn, self.mesh, cfg.mesh.data_axis, n_args=n
            )
            self._student_image = wrap(self._student_image, 1)
            self._student_text = wrap(self._student_text, 2)
            self._student_packed_text = wrap(self._student_packed_text, 5)
            self._encode_tokens = wrap(self._encode_tokens, 2)
            self._packed_wrapped = True

        self._build_optimizer(student_variables["params"])
        self.state = TrainState.create(student_variables["params"], self.tx)
        self.teacher_clip_variables = teacher_clip_variables
        self.teacher_params = teacher_params
        self._put_replicated()
        # The training step is split in two jits: teacher targets (frozen,
        # cacheable across epochs via `teacher_cache`) and the student
        # update. The student step DONATES its TrainState (measured on
        # v5e B/16 batch 256: 236.9 -> 221.9 ms cache-warm, +6.3%,
        # because without donation apply_updates materializes a fresh copy
        # of every frozen leaf each step). Donation invalidates the input
        # buffers, so any student leaf that IS a teacher leaf (student
        # initialized from the same tree) is copied once first.
        self.state = self.state.replace(
            params=self._decoupled_from_teacher(self.state.params)
        )
        self._patch_encode_compact_steps: Dict[int, Any] = {}
        self._teacher_tail_step = jax.jit(self._teacher_tail)
        self._train_step = make_train_step(
            self._student_loss, self.tx,
            trainable_mask=self._trainable_mask,
        )
        self._eval_loss = jax.jit(self._loss)
        self._batch_sharding = batch_sharding(self.mesh, cfg.mesh.data_axis)
        self.teacher_cache = teacher_cache
        # HBM-resident level-0 in front of the host cache: hits gather on
        # device (one [B] int32 upload) instead of re-crossing H2D each
        # epoch. Under dp>1 the buffer rows shard over the data axis
        # (capacity scales with the mesh; gathers ride ICI — see
        # train/device_cache.py); only multihost stays host-cache-only.
        self._dev_full = self._dev_pe = None
        from dclip_tpu.train.device_cache import (
            DeviceTargetCache,
            resolve_device_cache,
        )

        if resolve_device_cache(cfg.device_target_cache, teacher_cache):
            budget = cfg.device_cache_mb * (1 << 20)
            d = cfg.teacher.embed_dim
            # Patch embeddings dominate bytes (P x D vs 2 x D) and are
            # the every-epoch hit level (full keys change with caption
            # resampling) — give them 3/4 of the budget. Placement is the
            # batch sharding (NOT a bare device) so hit-path gathers carry
            # the same sharding as the miss path and never retrace the
            # student step; the full level evicts FIFO because its keys go
            # stale as captions resample (device_cache.py docstring).
            self._dev_full = DeviceTargetCache(
                (2, d), jnp.float32, budget // 4, self._batch_sharding,
                evict=True,
            )
            self._dev_pe = DeviceTargetCache(
                (cfg.teacher.max_patches, d), dtype, 3 * budget // 4,
                self._batch_sharding,
            )
        # Crop compaction runs PER DATA SHARD under dp-like meshes (each
        # device argsort-gathers its own batch rows inside one shard_map —
        # no cross-shard reshuffle; base.budgeted_patch_encode).
        self._compact = bool(cfg.compact_patches)
        # Caption packing packs PER DATA SHARD under dp-like meshes
        # (ops.packing.pack_captions_sharded: every shard gets the same
        # bucketed row count, so the packed arrays stay dp-even).
        self._packed_text = bool(cfg.packed_text)
        self._init_knn_gate(knn_store, projection_params, cfg.teacher.embed_dim)
        if teacher_cache is not None and not teacher_cache.salt:
            teacher_cache.salt = self._teacher_fingerprint()

    def _decoupled_from_teacher(self, params):
        """Fresh buffers for the whole student param tree.

        The donated student step frees its input buffers after every call.
        When the student is initialized from the teacher's tree (the
        common distill-from-pretrained setup), the two trees can share
        underlying PJRT buffers even across DISTINCT jax.Array objects —
        `device_put` of one source array twice returns two Arrays over one
        buffer — so an id()/is-based aliasing check is insufficient; the
        first donated step would leave the frozen teacher jits reading
        deleted arrays. A jitted `a + 0` is a real computation (never
        input-passthrough), so its outputs are guaranteed fresh buffers
        with shardings preserved. One-time cost at construction/restore."""
        fresh = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda a: a + jnp.zeros((), a.dtype), t
            )
        )
        return fresh(params)

    def _vision_mlp_frozen(self, params) -> bool:
        """True iff the CURRENT trainable mask excludes every vision
        `mlp/` and `layer_norm2` leaf — the validity condition for the
        frozen-weight fused MLP kernel (its VJP returns zero weight
        cotangents, see kernels/mlp_frozen.py)."""
        import flax

        mask = student_trainable_mask(
            params,
            self._unfrozen_extra,
            freeze_text=self.cfg.unfreeze_text_at_epoch is not None,
        )
        flat = flax.traverse_util.flatten_dict(mask)
        for path, trainable in flat.items():
            name = "/".join(str(k) for k in path)
            if name.startswith("vision_model/") and (
                "/mlp/" in name or "layer_norm2" in name
            ):
                if trainable:
                    return False
        return True

    def _make_student(self, params) -> CLIPModule:
        """Student module for the current unfreeze stage: the fused
        frozen-MLP vision path is enabled exactly while the mask keeps
        the vision LN2+MLP weights frozen and the weights-resident pair
        fits VMEM (B/16). ViT-L/14 overflows residency; its tiled
        weight-streaming pair is opt-in via --tiled_frozen_mlp because
        XLA measured faster there (see mlp_frozen_fit)."""
        fused_frozen = False
        fused_text = False
        fused_attn_block = False
        if self._module_pallas:
            from dclip_tpu.kernels.attn_block_trainable import attn_block_fit
            from dclip_tpu.kernels.mlp_frozen import mlp_frozen_fit
            from dclip_tpu.kernels.mlp_trainable import mlp_trainable_fit

            itemsize = jnp.dtype(self._student_dtype).itemsize
            v = self.student_config.vision
            fused_frozen = mlp_frozen_fit(
                v.num_patches + 1,
                v.hidden_size,
                v.mlp_dim,
                itemsize,
                allow_tiled=self.cfg.tiled_frozen_mlp,
            ) and self._vision_mlp_frozen(params)
            # The trainable fused kernel trio (kernels/mlp_trainable.py)
            # is MEASURED SLOWER than XLA for the text stack on v5e
            # (cache-warm 1010 -> 965 img/s): at S=77 the per-row kernel
            # GEMMs under-fill the MXU while XLA batches one [B*S, D]
            # GEMM, and the [B, S, 2048] HBM traffic it saves is ~0.2 ms
            # — text is compute-tiny, not bandwidth-bound. Opt-in only.
            t = self.student_config.text
            fused_text = self.cfg.fused_text_mlp and mlp_trainable_fit(
                t.max_length, t.hidden_size, t.mlp_dim, itemsize
            )
            # The fully fused trainable attention block (vision tower):
            # real weight cotangents, so no mask condition — only VMEM fit.
            fused_attn_block = self.cfg.fused_attn_block and attn_block_fit(
                v.num_patches + 1, v.hidden_size, v.num_heads, itemsize
            )
        return CLIPModule(
            self.student_config,
            dtype=self._student_dtype,
            remat=self.cfg.remat,
            fused_attention=self._module_pallas,
            pallas_interpret=self._pallas_interpret,
            fused_frozen_mlp=fused_frozen,
            fused_trainable_text_mlp=fused_text,
            fused_trainable_attn_block=fused_attn_block,
        )

    def _teacher_fingerprint(self) -> str:
        """Digest of everything that determines teacher targets: teacher
        config, CLIP preset, and the FULL weight bytes of every leaf.

        A persistent cache keyed on a partial digest (the old shape +
        leading-128-bytes scheme) would silently serve stale targets after
        an in-place fine-tune that leaves leading bytes unchanged; hashing
        all bytes is a one-time ~1s cost on a B/16 stack and removes the
        collision class entirely."""
        from dclip_tpu.train.base import fingerprint_objects

        # The knn gate and the projection head are part of the effective
        # teacher: hash their CONTENTS, not just their presence — swapping
        # the store or the projection weights must invalidate the cache.
        return fingerprint_objects(
            repr(self.cfg.teacher),
            self.cfg.teacher_clip_model,
            self.teacher_params,
            self.teacher_clip_variables,
            self._knn_keys,
            self._knn_values,
            self._projection_params,
        )

    def _place_params(self, params):
        """TP-shard encoder params when the model axis is active, else
        replicate (resume/unfreeze must not densify TP layouts)."""
        model_axis = self.cfg.mesh.model_axis
        if self.mesh.shape.get(model_axis, 1) > 1:
            from dclip_tpu.parallel.tp import shard_clip_params

            return shard_clip_params(jax.device_get(params), self.mesh, model_axis)
        return replicate_tree(params, self.mesh)

    def _build_optimizer(self, params) -> None:
        mask = student_trainable_mask(
            params,
            self._unfrozen_extra,
            # With the knob set, text starts frozen; _maybe_unfreeze adds
            # "text_model" to the extras at the configured epoch.
            freeze_text=self.cfg.unfreeze_text_at_epoch is not None,
        )
        n_train, n_total = count_trainable(mask)
        print(f"Student trainable leaves: {n_train}/{n_total}")
        self._trainable_mask = mask
        self.tx = make_optimizer(
            self.cfg.learning_rate,
            mask,
            kind="adamw",
            warmup_steps=self.cfg.warmup_steps,
            grad_clip=self.cfg.gradient_clip_val,
            accumulate_steps=self.cfg.accumulate_grad_batches,
        )

    def _put_replicated(self):
        model_axis = self.cfg.mesh.model_axis
        if self.mesh.shape.get(model_axis, 1) > 1:
            # Tensor parallelism: encoder weights sharded over the model
            # axis (dclip_tpu.parallel.tp); everything else replicated.
            from dclip_tpu.parallel.tp import head_divisibility_check, shard_clip_params

            head_divisibility_check(
                self.student_config.vision.num_heads, self.mesh, model_axis
            )
            params = shard_clip_params(
                jax.device_get(self.state.params), self.mesh, model_axis
            )
            self.state = TrainState.create(params, self.tx)
            self.teacher_clip_variables = {
                "params": shard_clip_params(
                    jax.device_get(self.teacher_clip_variables)["params"],
                    self.mesh,
                    model_axis,
                )
            }
        else:
            self.state = replicate_tree(self.state, self.mesh)
            self.teacher_clip_variables = replicate_tree(
                self.teacher_clip_variables, self.mesh
            )
        self.teacher_params = replicate_tree(self.teacher_params, self.mesh)

    # -- teacher forward (frozen) ------------------------------------------------

    def _encode_patches_only(self, teacher_clip_variables, batch):
        """Image side of the teacher: caption-INDEPENDENT, so cacheable per
        image even when per-epoch caption resampling changes the text."""
        return encode_patches(
            self.teacher_clip,
            teacher_clip_variables,
            batch["teacher_pixels"],
            batch["boxes"],
            batch["box_mask"],
            patch_size=self.teacher_clip_config.vision.image_size,
            image_features_fn=self._frozen_image_features,
        )

    def _teacher_tail(self, teacher_clip_variables, teacher_params, pe, batch):
        """Text encode + cross-attention + aggregation, given patch embeds."""
        te, tmask = self._encode_tokens(
            teacher_clip_variables,
            batch["input_ids"],
            batch["attention_mask"],
        )
        if self._fused_cross_attention is not None:
            from dclip_tpu.models.teacher import aggregate_attended

            use_masks = self.cfg.teacher.mask_padding
            at, ai = self._fused_cross_attention(
                teacher_params["cross_modal_attention"],
                te,
                pe,
                tmask if use_masks else None,
                batch["box_mask"] if use_masks else None,
            )
            out = aggregate_attended(
                self.cfg.teacher, at, ai, tmask, batch["box_mask"]
            )
        else:
            out = self.teacher.apply(
                {"params": teacher_params}, te, pe, tmask, batch["box_mask"]
            )
        # aggregate_text per caption (CLIP_image_distillation.py:605-608).
        teacher_text = masked_mean(te, tmask)
        return (
            jax.lax.stop_gradient(out.global_embedding),
            jax.lax.stop_gradient(teacher_text),
        )

    def _teacher_targets(self, teacher_clip_variables, teacher_params, batch):
        pe = self._encode_patches_only(teacher_clip_variables, batch)
        pe = self._maybe_knn_gate(pe, batch, self.cfg.teacher.similarity_threshold)
        return self._teacher_tail(teacher_clip_variables, teacher_params, pe, batch)

    def _encode_patches_budgeted(self, raw_batch, device_batch):
        """Patch encode with optional crop compaction (shared helper)."""
        from dclip_tpu.train.base import budgeted_patch_encode

        pe = budgeted_patch_encode(
            self.teacher_clip, self.teacher_clip_config,
            self.teacher_clip_variables, raw_batch, device_batch,
            self._patch_encode_compact_steps,
            compact=self._compact,
            image_features_fn=self._frozen_image_features,
            image_features_base_fn=self._frozen_image_features_base,
            mesh=self.mesh if self._dp_like else None,
            data_axis=self.cfg.mesh.data_axis,
        )
        pe = self._maybe_knn_gate(
            pe, device_batch, self.cfg.teacher.similarity_threshold
        )
        # Canonical pe sharding: the encode jit emits PartitionSpec() while
        # the cache-hit paths (host put_sharded / device gather) emit the
        # batch sharding — jit caches key on input shardings, so without
        # this the first pe-level cache hit would silently retrace the
        # teacher tail. On one device this device_put is free; under dp>1
        # batch-sharded is the layout the tail wants anyway.
        return jax.device_put(pe, self._batch_sharding)

    def _student_loss(self, params, teacher_img, teacher_txt, batch):
        student_img = self._student_image(params, batch["pixel_values"])
        if "packed_ids" in batch:
            # Caption-packed text encode: R << B dense rows, EOS-gathered
            # back to original order (ops/packing.py; parity-pinned).
            # Under dp-like meshes the rows are packed per data shard and
            # the EOS gather runs inside shard_map with shard-local rows.
            student_txt = self._student_packed_text(
                params,
                batch["packed_ids"], batch["packed_segments"],
                batch["packed_positions"],
                batch["packed_eos_rows"], batch["packed_eos_cols"],
            )
        else:
            student_txt = self._student_text(
                params, batch["input_ids"], batch["attention_mask"]
            )
        if (
            self.cfg.use_pallas
            # Single-device meshes only: the loss is GLOBAL over the batch
            # ([B, B] similarity), so under dp>1 the XLA path is the
            # mesh-true one — GSPMD all-gathers the [B, D] embeddings and
            # row-shards the similarity GEMMs, while the fused kernel
            # (no partitioning rule) would compute the whole matrix
            # replicated on every device. The same applies under mp>1:
            # the embeddings arrive TP-sharded and the kernel would force
            # a gather + fully replicated fwd/bwd, so the gate requires
            # the whole mesh trivial, not just the data axis.
            # dp_equivalent (bench mode) forces the XLA path too — it IS
            # what a dp mesh runs.
            and self.mesh.devices.size == 1
            and not self._dp_equivalent
            and student_img.shape[0] <= 1024  # fused-kernel VMEM bound
        ):
            from dclip_tpu.kernels import fused_distillation_loss

            total, parts = fused_distillation_loss(
                student_img,
                student_txt,
                teacher_img,
                teacher_txt,
                temperature=self.cfg.temperature,
                contrastive_weight=self.cfg.contrastive_weight,
                interpret=self._pallas_interpret,
            )
        else:
            total, parts = distillation_loss(
                student_img,
                student_txt,
                teacher_img,
                teacher_txt,
                temperature=self.cfg.temperature,
                contrastive_weight=self.cfg.contrastive_weight,
            )
        return total, parts

    def _loss(self, params, teacher_clip_variables, teacher_params, batch):
        """Fully fused loss (teacher + student in one trace) — the eval path
        and the single-jit surface dryrun_multichip compiles."""
        teacher_img, teacher_txt = self._teacher_targets(
            teacher_clip_variables, teacher_params, batch
        )
        return self._student_loss(params, teacher_img, teacher_txt, batch)

    # -- loops ---------------------------------------------------------------------------

    # Fields the student step consumes; teacher-only fields (teacher_pixels,
    # boxes, conf, box_mask) are skipped from H2D when the cache already
    # holds the teacher side — they are most of the batch bytes.
    _STUDENT_FIELDS = ("pixel_values", "input_ids", "attention_mask")

    @staticmethod
    def _item_ids(d):
        """Stable per-example identity for cache keys: the pipeline's
        content_key (image-path digest — survives corpus rebuilds and
        reshuffles) when present, else the corpus index (test/synthetic
        batches). None when the needed fields are not host-resident."""
        import numpy as np

        ck = d.get("content_key")
        if isinstance(ck, np.ndarray):
            return ck
        idx = d.get("index")
        if isinstance(idx, np.ndarray):
            return idx
        return None

    @classmethod
    def _cacheable(cls, d) -> bool:
        """Cache keys are a HOST computation over (item id, input_ids);
        only engage the cache when both are host-resident numpy (the real
        pipeline's layout). Hashing device arrays would add a blocking D2H
        round-trip per step — costlier than a cache hit saves on a
        tunneled chip."""
        import numpy as np

        return cls._item_ids(d) is not None and isinstance(
            d.get("input_ids"), np.ndarray
        )

    def _get_teacher_targets(self, raw_batch, device_batch, keys=None,
                             probe_full=True):
        """Teacher targets with a two-level cache.

        Level 1: full (img, txt) targets keyed by (index, caption ids).
        Level 2: patch embeddings keyed by index only — the image side is
        caption-independent, so per-epoch caption resampling still skips
        the 512-crop ViT forwards (the dominant step cost); only the cheap
        text+cross-attention tail reruns.
        """
        import numpy as np

        patch_keys = None
        if self.teacher_cache is not None:
            d = raw_batch.as_dict() if hasattr(raw_batch, "as_dict") else raw_batch
            if self._cacheable(d):
                if keys is None:
                    keys = self.teacher_cache.keys_for(d)
                if probe_full:
                    cached = self.teacher_cache.get_batch(keys)
                    if cached is not None:
                        t = put_sharded(
                            np.asarray(cached), self._batch_sharding
                        )
                        return t[:, 0], t[:, 1]
                patch_keys = self.teacher_cache.pe_keys_for(d)
        with trace_span("teacher_targets"):
            pe = None
            if patch_keys is not None and self._dev_pe is not None:
                # Level 0 (HBM): the every-epoch level — full keys change
                # with caption resampling, pe keys do not.
                pe = self._dev_pe.get(patch_keys)
            if pe is None and patch_keys is not None:
                cached_pe = self.teacher_cache.get_batch(patch_keys)
                if cached_pe is not None:
                    # Same dtype as the miss path (the cache stores f32):
                    # a dtype flip would retrace the teacher-tail jit and
                    # make cached-epoch targets numerically differ.
                    pe = put_sharded(
                        np.asarray(
                            cached_pe, dtype=jnp.dtype(self.cfg.compute_dtype)
                        ),
                        self._batch_sharding,
                    )
                    if self._dev_pe is not None:
                        self._dev_pe.put(patch_keys, pe)
            if pe is None:
                pe = self._encode_patches_budgeted(raw_batch, device_batch)
                if patch_keys is not None:
                    self.teacher_cache.put_batch(patch_keys, local_rows(pe))
                    if self._dev_pe is not None:
                        self._dev_pe.put(patch_keys, pe)
            teacher_img, teacher_txt = self._teacher_tail_step(
                self.teacher_clip_variables, self.teacher_params, pe, device_batch
            )
        if keys is not None:
            self.teacher_cache.put_batch(
                keys,
                np.stack(
                    [local_rows(teacher_img), local_rows(teacher_txt)], axis=1
                ),
            )
            if self._dev_full is not None:
                self._dev_full.put(
                    keys,
                    jnp.stack(
                        [teacher_img.astype(jnp.float32),
                         teacher_txt.astype(jnp.float32)], axis=1
                    ),
                )
        return teacher_img, teacher_txt

    def _maybe_pack_text(self, d, student_batch):
        """With cfg.packed_text, swap the student jit's text inputs for the
        packed layout (host packing over the pipeline's numpy ids; skipped
        when ids are device-resident — packing is a host computation, and
        pulling ids D2H would cost more than packing saves). The packed
        row count is bucketed (ops.packing.packed_rows_bucket) so at most
        a handful of student-step shapes ever compile.

        Under dp-like meshes captions pack PER DATA SHARD (every shard the
        same bucketed row count, so the global arrays shard evenly); eos
        rows stay shard-local when the packed forward gathers inside
        shard_map, else they are globalized for the XLA gather. Under
        multihost every process packs its own local rows and the row
        bucket is agreed via an allgathered max (the assembled global
        arrays must have one shape on every process)."""
        import numpy as np

        if not self._packed_text:
            return student_batch
        ids = d.get("input_ids")
        am = d.get("attention_mask")
        if not (isinstance(ids, np.ndarray) and isinstance(am, np.ndarray)):
            return student_batch
        from dclip_tpu.ops.packing import (
            globalize_eos_rows,
            min_rows_sharded,
            pack_captions_sharded,
            packed_rows_bucket,
        )

        eos = self.student_config.text.eos_token_id
        dp = self.mesh.shape.get(self.cfg.mesh.data_axis, 1)
        nproc = jax.process_count()
        local_shards = max(dp // nproc, 1)
        rows_forced = 0
        if nproc > 1:
            from jax.experimental import multihost_utils

            mine = min_rows_sharded(ids, am, eos, local_shards)
            rows_all = multihost_utils.process_allgather(
                jnp.asarray(mine, jnp.int32)
            )
            rows_forced = packed_rows_bucket(
                int(np.max(np.asarray(rows_all))), ids.shape[0] // local_shards
            )
        packed = pack_captions_sharded(
            ids, am, eos, n_shards=local_shards, rows_per_shard=rows_forced
        )
        if not self._packed_wrapped:
            packed = globalize_eos_rows(
                packed, local_shards,
                first_shard=jax.process_index() * local_shards,
            )
        packed.pop("rows_per_shard")
        out = {
            k: v for k, v in student_batch.items()
            if k not in ("input_ids", "attention_mask")
        }
        for k, v in packed.items():
            out[k] = put_sharded(v, self._batch_sharding)
        return out

    def train_step_on_batch(self, batch):
        """One full training step (teacher targets + student update).

        Host-side cache probing happens BEFORE device transfer so that on a
        full-target hit only the student fields cross H2D.
        """
        d = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
        cached = None
        keys = None
        dev_hit = None
        if self.teacher_cache is not None and self._cacheable(d):
            keys = self.teacher_cache.keys_for(d)
            # Level 0: HBM-resident — a hit costs one [B] int32 upload.
            if self._dev_full is not None:
                dev_hit = self._dev_full.get(keys)
            if dev_hit is None:
                cached = self.teacher_cache.get_batch(keys)
        if dev_hit is not None:
            device_batch = self._device_batch(batch, self._STUDENT_FIELDS)
            teacher_img, teacher_txt = dev_hit[:, 0], dev_hit[:, 1]
        elif cached is not None:
            device_batch = self._device_batch(batch, self._STUDENT_FIELDS)
            t = put_sharded(np.asarray(cached), self._batch_sharding)
            if self._dev_full is not None:  # promote: later epochs stay on device
                self._dev_full.put(keys, t)
            teacher_img, teacher_txt = t[:, 0], t[:, 1]
        else:
            device_batch = self._device_batch(batch)
            teacher_img, teacher_txt = self._get_teacher_targets(
                batch, device_batch, keys=keys, probe_full=False
            )
        # One pytree structure + dtype for the student jit regardless of the
        # cache path: fields filtered to the student's, targets in float32
        # (a structure/dtype flip at the first cache hit would retrace the
        # heaviest compile a second time).
        student_batch = {k: device_batch[k] for k in self._STUDENT_FIELDS}
        student_batch = self._maybe_pack_text(d, student_batch)
        with trace_span("distill_train_step"):
            self.state, metrics = self._train_step(
                self.state,
                teacher_img.astype(jnp.float32),
                teacher_txt.astype(jnp.float32),
                student_batch,
            )
        return metrics

    def _effective_unfreeze_schedule(self):
        """unfreeze_schedule plus the unfreeze_text_at_epoch sugar
        (reference's intended epoch-3 text unfreeze,
        CLIP_image_distillation.py:753-755)."""
        from dclip_tpu.core.config import UnfreezeStage

        schedule = tuple(self.cfg.unfreeze_schedule)
        if self.cfg.unfreeze_text_at_epoch is not None:
            schedule += (
                UnfreezeStage(
                    epoch=self.cfg.unfreeze_text_at_epoch,
                    patterns=("text_model",),
                ),
            )
        return schedule

    def _maybe_unfreeze(self, epoch: int) -> None:
        """Explicit progressive-unfreeze (reference intended :723-763)."""
        new = tuple(
            p
            for stage in self._effective_unfreeze_schedule()
            if epoch >= stage.epoch
            for p in stage.patterns
        )
        if set(new) != set(self._unfrozen_extra):
            self._unfrozen_extra = new
            placed = self._place_params(self.state.params)
            host_params = jax.device_get(self.state.params)
            self._build_optimizer(host_params)
            # The unfreeze may bring vision LN2/MLP weights into the
            # optimizer — the frozen-weight fused MLP kernel (zero weight
            # cotangents) would silently drop their grads. Rebuild the
            # student module against the NEW mask.
            self.student = self._make_student(host_params)
            self.state = TrainState(
                step=replicate_tree(jax.device_get(self.state.step), self.mesh),
                params=placed,
                opt_state=self.tx.init(placed),
            )
            self._train_step = make_train_step(
                self._student_loss, self.tx,
                trainable_mask=self._trainable_mask,
            )
            # _eval_loss closes over self.student at trace time; a stale
            # jit cache would keep evaluating the pre-unfreeze module.
            self._eval_loss = jax.jit(self._loss)

    # -- BaseTrainer hooks --------------------------------------------------------

    def _num_epochs(self) -> int:
        return self.cfg.phase1_epochs

    def _on_epoch_start(self, epoch: int) -> None:
        self._maybe_unfreeze(epoch)

    def eval_loss_on_batch(self, batch) -> float:
        loss, _ = self._eval_loss(
            self.state.params,
            self.teacher_clip_variables,
            self.teacher_params,
            self._device_batch(batch),
        )
        return float(loss)

    def _place_state(self, state):
        """Resume placement: params AND the param-shaped optimizer moments
        (adam mu/nu mirror the param tree inside the optax state) keep
        their TP shardings; everything else replicates. Matches the fresh
        tx.init placement, so per-device opt-state memory under mp>1 stays
        1/mp of replicated."""
        from dclip_tpu.train.optim import TrainState as _TS

        model_axis = self.cfg.mesh.model_axis
        if self.mesh.shape.get(model_axis, 1) > 1:
            from dclip_tpu.parallel.tp import shard_like_clip_params

            opt_state = shard_like_clip_params(
                state.opt_state, self.mesh, model_axis
            )
        else:
            opt_state = replicate_tree(state.opt_state, self.mesh)
        return _TS(
            step=replicate_tree(state.step, self.mesh),
            # Decouple defensively: restored params are fresh host arrays in
            # practice, but the donated step must never share a buffer with
            # the teacher trees.
            params=self._decoupled_from_teacher(self._place_params(state.params)),
            opt_state=opt_state,
        )

    def _prepare_resume(self, saved_epoch: int) -> None:
        # The checkpoint's opt_state structure reflects the unfreeze stage
        # active when it was SAVED; replay the schedule to that epoch so the
        # restore template's pytree matches (MaskedNode placement changes
        # with the mask).
        self._maybe_unfreeze(saved_epoch)

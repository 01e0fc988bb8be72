"""Meta-teacher contrastive trainer.

TPU-native replacement for training/train_contrastive_teacher.py: same
training semantics — seed 42 (:99), only cross-attention params train
(:125-134 name-pattern freeze), Adam lr=1e-5 (:245-248), symmetric InfoNCE
temp=0.05 between the teacher's fused global embedding and the mean-pooled
text embedding (:333-368 with text via aggregate_text,
text_tokenizer.py:220-234), per-epoch checkpoints stamped with val loss +
rolling best (:393-402), interrupt/error checkpoints (:404-420) — but the
whole step is ONE jitted function: batched region crops -> frozen CLIP
forwards -> cross-attention -> loss, no per-image Python, no KNN pickle
cache to sync (embeddings are recomputed on-device faster than the
reference can deserialize them; `--gradient_accumulation` actually works
here, unlike the reference where it parses and does nothing, :435).

Multi-chip: params replicated, batch sharded over the mesh data axis; the
global [B, B] contrastive matrix emerges from XLA's all-gather under jit.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.core.config import CLIPConfig, TeacherTrainConfig
from dclip_tpu.core.metrics import trace_span
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.teacher import PatchTextAggregation, encode_tokens
from dclip_tpu.ops.losses import info_nce
from dclip_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from dclip_tpu.parallel.multihost import local_rows, put_sharded
from dclip_tpu.train.base import BaseTrainer
from dclip_tpu.train.optim import (
    TrainState,
    count_trainable,
    make_optimizer,
    make_train_step,
    pattern_mask,
)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """aggregate_text: mean over content tokens (text_tokenizer.py:220-234)."""
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return jnp.sum(x * mask[..., None], axis=1) / denom


class TeacherTrainer(BaseTrainer):
    def __init__(
        self,
        cfg: TeacherTrainConfig,
        clip_variables: Dict[str, Any],
        clip_config: Optional[CLIPConfig] = None,
        mesh=None,
        teacher_params: Optional[Any] = None,
        knn_store=None,
        projection_params: Optional[Any] = None,
        pe_cache=None,
    ):
        """`pe_cache` (a train.TeacherTargetCache) stores the FROZEN region
        patch embeddings per image: only the cross-attention trains, so
        the dominant per-step cost — the region-crop CLIP forwards — never
        changes across epochs and is skipped from epoch 1 on (the teacher-
        training analogue of the distillation trainer's level-2 cache)."""
        self.clip_config = clip_config or CLIPConfig.from_name(cfg.clip_model)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        # Resolve auto fast-path fields (bf16 / Pallas / compaction default
        # ON for TPU meshes) against where this trainer actually executes.
        from dclip_tpu.core.config import resolve_fast_paths

        cfg = self.cfg = resolve_fast_paths(cfg, self.mesh.devices.flat[0].platform)
        dtype = jnp.dtype(cfg.compute_dtype)
        from dclip_tpu.core.platform import is_tpu_platform

        self._pallas_interpret = not is_tpu_platform(
            self.mesh.devices.flat[0].platform
        )
        # In-module / differentiated Pallas (fused text attention, the
        # trainable cross-attention pair) has no GSPMD partitioning rule —
        # but both are batch-parallel and shard_map composes with autodiff,
        # so under dp-only meshes they run through shard_map over the data
        # axis (same rule as DistillTrainer). Only mp>1 demotes to the XLA
        # twins (CLIP weights are TP-sharded there).
        dp_size = self.mesh.shape.get(cfg.mesh.data_axis, 1)
        mp_size = self.mesh.shape.get(cfg.mesh.model_axis, 1)
        self._module_pallas = bool(cfg.use_pallas) and mp_size == 1
        self._dp_like = dp_size > 1
        if cfg.use_pallas and not self._module_pallas:
            print("in-module Pallas kernels demoted to XLA twins: "
                  "tensor-parallel mesh (mp>1; weights are TP-sharded)")
        self.clip = CLIPModule(
            self.clip_config, dtype=dtype,
            fused_attention=self._module_pallas,
            pallas_interpret=self._pallas_interpret,
        )
        self.teacher = PatchTextAggregation(cfg.teacher, dtype=dtype)
        # Region encode uses the fused block kernels — re-measured faster
        # than the fused-attention module path even when fed by the
        # crop-resize (see distill_trainer for the numbers). Frozen, so
        # under dp>1 it runs through shard_map over the data axis; mp>1
        # demotes to the module path (CLIP weights are TP-sharded there).
        self._frozen_image_features = None
        self._frozen_image_features_base = None
        if cfg.use_pallas and mp_size == 1:
            from dclip_tpu.kernels.vit_block import fused_image_features

            _ccfg = self.clip_config
            _interp = self._pallas_interpret
            base = lambda v, px: fused_image_features(  # noqa: E731
                _ccfg, v, px, dtype=dtype, interpret=_interp
            )
            self._frozen_image_features_base = base
            if self._dp_like:
                from dclip_tpu.parallel.mesh import shard_map_batchwise

                base = shard_map_batchwise(base, self.mesh, cfg.mesh.data_axis)
            self._frozen_image_features = base

        # Differentiated/in-module applies, shard_map-wrapped under
        # dp-only meshes (batch-parallel; weight cotangents psum over the
        # axis in the transpose — parity in tests/test_mesh_true_paths.py).
        self._encode_tokens = lambda v, ids, am: encode_tokens(
            self.clip, v, ids, am, self.clip_config.text.eos_token_id
        )
        self._xattn_trainable = None
        if self._module_pallas:
            from dclip_tpu.kernels import cross_attention_trainable

            _nh = cfg.teacher.num_heads
            _interp_x = self._pallas_interpret
            self._xattn_trainable = (
                lambda p, te, pe, tm, pm: cross_attention_trainable(
                    p, te, pe, tm, pm, num_heads=_nh, interpret=_interp_x
                )
            )
            if self._dp_like:
                from dclip_tpu.parallel.mesh import shard_map_batchwise

                self._encode_tokens = shard_map_batchwise(
                    self._encode_tokens, self.mesh, cfg.mesh.data_axis,
                    n_args=2,
                )
                self._xattn_trainable = shard_map_batchwise(
                    self._xattn_trainable, self.mesh, cfg.mesh.data_axis,
                    n_args=4,
                )

        if teacher_params is None:
            d = cfg.teacher.embed_dim
            dummy_text = jnp.zeros((1, cfg.teacher.max_text_tokens, d))
            dummy_patch = jnp.zeros((1, cfg.teacher.max_patches, d))
            teacher_params = self.teacher.init(
                jax.random.PRNGKey(cfg.seed), dummy_text, dummy_patch
            )["params"]
        mask = pattern_mask(teacher_params, cfg.trainable_patterns)
        n_train, n_total = count_trainable(mask)
        print(f"Teacher trainable leaves: {n_train}/{n_total}")
        self.tx = make_optimizer(
            cfg.learning_rate,
            mask,
            kind="adam",
            accumulate_steps=cfg.gradient_accumulation,
        )
        self.state = TrainState.create(teacher_params, self.tx)
        self.clip_variables = clip_variables
        self._put_replicated()
        # Differentiate only the trainable (cross-attention) leaves: the
        # frozen remainder enters as closure constants so XLA DCEs their
        # weight-gradient GEMMs (see optim.make_train_step).
        self._train_step = make_train_step(self._loss, self.tx,
                                           trainable_mask=mask)
        self._eval_loss = jax.jit(self._loss)
        self._batch_sharding = batch_sharding(self.mesh, cfg.mesh.data_axis)
        self._patch_jits: Dict[int, Any] = {}
        # Crop compaction runs PER DATA SHARD under dp>1 (each device
        # argsort-gathers its own rows inside one shard_map — see
        # base.budgeted_patch_encode).
        self._compact = bool(cfg.compact_patches)
        self._init_knn_gate(knn_store, projection_params, cfg.teacher.embed_dim)
        self.pe_cache = pe_cache
        if pe_cache is not None and not pe_cache.salt:
            from dclip_tpu.train.base import fingerprint_objects

            # Everything determining the (gated) patch embeddings.
            pe_cache.salt = fingerprint_objects(
                repr(cfg.teacher), cfg.clip_model, self.clip_variables,
                self._knn_keys, self._knn_values, self._projection_params,
            )
        # HBM-resident level-0 in front of the host pe cache: epoch >= 1
        # hits gather on device (one [B] int32 upload) instead of
        # re-crossing H2D every epoch (see train/device_cache.py).
        self._dev_pe = None
        from dclip_tpu.train.device_cache import (
            DeviceTargetCache,
            resolve_device_cache,
        )

        if resolve_device_cache(cfg.device_target_cache, pe_cache):
            # Batch sharding (not a bare device): hit-path gathers must
            # carry the same sharding as the miss path or the loss jits
            # would retrace on the first hit (device_cache.py docstring).
            self._dev_pe = DeviceTargetCache(
                (cfg.teacher.max_patches, cfg.teacher.embed_dim),
                jnp.dtype(cfg.compute_dtype),
                cfg.device_cache_mb * (1 << 20),
                self._batch_sharding,
            )

    def _put_replicated(self):
        self.state = replicate_tree(self.state, self.mesh)
        model_axis = self.cfg.mesh.model_axis
        if self.mesh.shape.get(model_axis, 1) > 1:
            from dclip_tpu.parallel.tp import shard_clip_params

            self.clip_variables = {
                "params": shard_clip_params(
                    jax.device_get(self.clip_variables)["params"],
                    self.mesh,
                    model_axis,
                )
            }
        else:
            self.clip_variables = replicate_tree(self.clip_variables, self.mesh)

    # -- loss ------------------------------------------------------------------

    def _loss(self, params, clip_variables, pe, batch):
        """pe (frozen patch embeddings) is computed OUTSIDE this grad jit:
        no gradient flows into the region encode (only cross-attention
        params train), so it can be compacted/cached independently."""
        te, tmask = self._encode_tokens(
            clip_variables, batch["input_ids"], batch["attention_mask"]
        )
        if self._module_pallas:
            from dclip_tpu.models.teacher import aggregate_attended

            use_masks = self.cfg.teacher.mask_padding
            at, ai = self._xattn_trainable(
                params["cross_modal_attention"],
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
                {"params": params}, te, pe, tmask, batch["box_mask"]
            )
        text_embeddings = masked_mean(te, tmask)
        loss = info_nce(out.global_embedding, text_embeddings, self.cfg.temperature)
        return loss, {"loss": loss, "contrastive_loss": loss}

    # -- BaseTrainer hooks --------------------------------------------------------

    def _num_epochs(self) -> int:
        return self.cfg.epochs

    def _patch_embeddings(self, batch, device_batch):
        import numpy as np

        from dclip_tpu.train.base import budgeted_patch_encode

        keys = None
        if self.pe_cache is not None:
            d = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
            keys = self.pe_cache.pe_keys_for(d)
            if keys is not None:
                if self._dev_pe is not None:
                    # Level 0 (HBM): hit costs one [B] int32 upload.
                    hit = self._dev_pe.get(keys)
                    if hit is not None:
                        return hit
                cached = self.pe_cache.get_batch(keys)
                if cached is not None:
                    # f32 in the store; same dtype as the miss path so the
                    # loss jit never retraces on the first hit.
                    pe = put_sharded(
                        np.asarray(
                            cached, dtype=jnp.dtype(self.cfg.compute_dtype)
                        ),
                        self._batch_sharding,
                    )
                    if self._dev_pe is not None:
                        self._dev_pe.put(keys, pe)  # promote to HBM
                    return pe
        pe = budgeted_patch_encode(
            self.clip, self.clip_config, self.clip_variables,
            batch, device_batch, self._patch_jits,
            compact=self._compact,
            image_features_fn=self._frozen_image_features,
            image_features_base_fn=self._frozen_image_features_base,
            mesh=self.mesh if self._dp_like else None,
            data_axis=self.cfg.mesh.data_axis,
        )
        pe = self._maybe_knn_gate(
            pe, device_batch, self.cfg.teacher.similarity_threshold
        )
        # Canonical pe sharding — see distill_trainer._encode_patches_budgeted:
        # cache-hit paths emit the batch sharding; the encode jit emits
        # PartitionSpec(), which would retrace the loss jits on first hit.
        pe = jax.device_put(pe, self._batch_sharding)
        if keys is not None:
            self.pe_cache.put_batch(keys, local_rows(pe))
            if self._dev_pe is not None:
                self._dev_pe.put(keys, pe)
        return pe

    def train_step_on_batch(self, batch):
        device_batch = self._device_batch(batch)
        pe = self._patch_embeddings(batch, device_batch)
        with trace_span("teacher_train_step"):
            self.state, metrics = self._train_step(
                self.state, self.clip_variables, pe, device_batch
            )
        return metrics

    def eval_loss_on_batch(self, batch) -> float:
        device_batch = self._device_batch(batch)
        pe = self._patch_embeddings(batch, device_batch)
        loss, _ = self._eval_loss(
            self.state.params, self.clip_variables, pe, device_batch
        )
        return float(loss)


def teacher_config_summary(cfg: TeacherTrainConfig) -> str:
    """Debug dump like train_contrastive_teacher.py:110-123."""
    lines = ["=== Teacher training configuration ==="]
    for f in dataclasses.fields(cfg):
        lines.append(f"{f.name}: {getattr(cfg, f.name)}")
    return "\n".join(lines)

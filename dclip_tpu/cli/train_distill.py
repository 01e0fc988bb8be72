"""Student distillation CLI — the reference's
`CLIP_image_distill_training.py` entry point (CLI contract
CLIP_image_distillation.py:711-721 + CLIP_image_distill_training.py:47-52).

    python -m dclip_tpu.cli.train_distill --train_file corpus_train.json \
        --val_file corpus_val.json --train_batch_size 32 --eval_batch_size 32 \
        --learning_rate 2e-5 --warmup_steps 100 --total_steps 10000 \
        --phase1_epochs 2 --checkpoint_dir checkpoints \
        --teacher_checkpoint models/teacher_contrastive/...msgpack \
        [model/mesh flags]
"""
from __future__ import annotations

import argparse
import os

from dclip_tpu.cli.common import (
    add_mesh_args,
    add_model_args,
    load_clip,
    load_tokenizer,
    mesh_config,
)
from dclip_tpu.core.config import DistillConfig, TeacherConfig
from dclip_tpu.core.metrics import MetricsLogger
from dclip_tpu.data.corpus import load_corpus
from dclip_tpu.data.detection_cache import DetectionCache
from dclip_tpu.data.pipeline import MultiModalPipeline
from dclip_tpu.parallel.mesh import make_mesh
from dclip_tpu.train.checkpoint import CheckpointManager
from dclip_tpu.train.distill_trainer import DistillTrainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Distill the meta-teacher into a CLIP student")
    p.add_argument("--train_file", required=True)
    p.add_argument("--val_file", default=None)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--phase1_epochs", type=int, default=2)
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--accumulate_grad_batches", type=int, default=4)
    p.add_argument("--gradient_clip_val", type=float, default=0.5)
    p.add_argument("--teacher_checkpoint", default=None,
                   help="teacher cross-attention params (msgpack from "
                        "cli.train_teacher, or a torch .pth state_dict)")
    p.add_argument("--student_preset", default=None,
                   help="student CLIP preset (default: same as --model_preset)")
    p.add_argument("--student_weights", default=None,
                   help="student weights source (default: same as --clip_weights)")
    p.add_argument("--detection_cache", default=None)
    p.add_argument("--teacher_cache", default=None,
                   help="path for the cross-epoch teacher-target cache "
                        "(native KV store); 'memory' for in-process only")
    p.add_argument("--num_workers", type=int, default=0,
                   help="decode worker processes (0 = threads only); the "
                        "reference's DataLoader(num_workers=...)")
    p.add_argument("--fast_decode", action="store_true",
                   help="scaled DCT JPEG decode (PIL draft): ~2-4x decode "
                        "throughput per core, ~0.5%% mean pixel delta vs "
                        "the exact HF resize geometry (training-only knob; "
                        "eval paths always decode exact)")
    p.add_argument("--decode_backend", choices=("pil", "native"),
                   default="pil",
                   help="'native' = C++ libjpeg decode + fused resample/"
                        "normalize (GIL-released, so decode threads scale "
                        "over real cores; per-item PIL fallback for "
                        "non-JPEG/corrupt files). 'pil' keeps HF bit-parity")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pod): the "
                        "input pipeline shards per process, checkpoints/"
                        "metrics write on process 0 only")
    p.add_argument("--max_patches", type=int, default=8)
    p.add_argument("--teacher_image_size", type=int, default=224)
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="auto = bfloat16 on TPU, float32 elsewhere")
    p.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas kernels on the hot path")
    p.add_argument("--compact_patches",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="teacher region-encode runs only over valid patch "
                        "slots (bucketed crop compaction)")
    p.add_argument("--fused_text_mlp", action="store_true",
                   help="opt-in trainable fused MLP kernels for the text "
                        "stack (measured slower than XLA on v5e at CLIP "
                        "text shapes; see kernels/mlp_trainable.py)")
    p.add_argument("--packed_text",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="caption sequence packing for the student text "
                        "tower: several captions' content tokens share "
                        "one 77-token row (ops/packing.py; parity-pinned "
                        "numerics; single-data-shard meshes only). "
                        "Default auto: on for TPU meshes")
    p.add_argument("--device_target_cache",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="HBM-resident level-0 teacher-target cache: cached "
                        "rows gather on device instead of re-crossing "
                        "host->device each epoch; rows shard over the "
                        "data axis under dp>1 (default: auto — on for "
                        "single-process runs)")
    p.add_argument("--device_cache_mb", type=int, default=512,
                   help="HBM byte budget for --device_target_cache")
    p.add_argument("--tiled_frozen_mlp", action="store_true",
                   help="opt-in tiled weight-streaming frozen-MLP pair for "
                        "VMEM-overflowing shapes like ViT-L/14 (measured "
                        "slower than XLA there on v5e; see "
                        "kernels/mlp_frozen.py)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint encoder layers (memory for FLOPs)")
    p.add_argument("--unfreeze_text_at_epoch", type=int, default=None,
                   help="freeze the student text encoder until this epoch "
                        "(the reference's intended epoch-3 text unfreeze; "
                        "default: text trainable throughout, the "
                        "reference's effective behavior)")
    p.add_argument("--projection_weights", default=None,
                   help="ImageProjectionModule params (flax msgpack): enables "
                        "the projection branch of the knn gate")
    p.add_argument("--knn_store", default=None,
                   help="EmbeddingStore (.npz/.dcs from cli.precache "
                        "--build_index) enabling the knn/projection gate "
                        "over patch embeddings")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--metrics_csv", default=None)
    add_model_args(p)  # teacher CLIP stack
    add_mesh_args(p)
    return p


def load_teacher_params(path, teacher_cfg, clip_cfg, seed):
    """Teacher cross-attention params from msgpack/torch, or fresh init."""
    import jax
    import jax.numpy as jnp

    from dclip_tpu.models.teacher import PatchTextAggregation

    teacher = PatchTextAggregation(teacher_cfg)
    d = teacher_cfg.embed_dim
    template = teacher.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, teacher_cfg.max_text_tokens, d)),
        jnp.zeros((1, teacher_cfg.max_patches, d)),
    )["params"]
    if not path:
        print("Warning: no teacher checkpoint given, using fresh teacher init")
        return template
    if path.endswith((".pth", ".pt", ".bin")):
        import torch

        from dclip_tpu.models.teacher import import_torch_teacher

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return import_torch_teacher(sd)
    from dclip_tpu.cli.common import restore_student_params

    return restore_student_params(path, template)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.multihost:
        from dclip_tpu.cli.common import init_multihost

        init_multihost()
    teacher_clip_cfg, _, teacher_clip_vars = load_clip(
        args.model_preset, args.clip_weights, args.seed
    )
    student_preset = args.student_preset or args.model_preset
    student_weights = args.student_weights or args.clip_weights
    if (student_preset, student_weights) == (args.model_preset, args.clip_weights):
        # Same preset+weights: reuse the already-loaded teacher CLIP instead
        # of parsing a multi-GB snapshot from disk twice.
        student_cfg, student_vars = teacher_clip_cfg, teacher_clip_vars
    else:
        student_cfg, _, student_vars = load_clip(
            student_preset, student_weights, args.seed
        )
    tokenizer = load_tokenizer(args.tokenizer_dir, student_cfg.text.max_length)

    if student_cfg.projection_dim != teacher_clip_cfg.projection_dim:
        raise SystemExit(
            f"student preset '{student_preset}' (projection_dim "
            f"{student_cfg.projection_dim}) is width-incompatible with the "
            f"teacher CLIP '{args.model_preset}' (projection_dim "
            f"{teacher_clip_cfg.projection_dim}); the cosine distillation "
            "loss requires matching widths — pick matching presets"
        )
    teacher_cfg = TeacherConfig(
        embed_dim=teacher_clip_cfg.projection_dim,
        max_patches=args.max_patches,
        max_text_tokens=teacher_clip_cfg.text.max_length,
    )
    cfg = DistillConfig(
        train_file=args.train_file,
        val_file=args.val_file,
        train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        phase1_epochs=args.phase1_epochs,
        checkpoint_dir=args.checkpoint_dir,
        gradient_clip_val=args.gradient_clip_val,
        accumulate_grad_batches=args.accumulate_grad_batches,
        seed=args.seed,
        student_model=student_preset,
        teacher_clip_model=args.model_preset,
        teacher=teacher_cfg,
        mesh=mesh_config(args),
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        remat=args.remat,
        compact_patches=args.compact_patches,
        fused_text_mlp=args.fused_text_mlp,
        packed_text=args.packed_text,
        tiled_frozen_mlp=args.tiled_frozen_mlp,
        device_target_cache=args.device_target_cache,
        device_cache_mb=args.device_cache_mb,
        unfreeze_text_at_epoch=args.unfreeze_text_at_epoch,
    )

    teacher_params = load_teacher_params(
        args.teacher_checkpoint, teacher_cfg, teacher_clip_cfg, args.seed
    )

    cache = (
        DetectionCache.load(args.detection_cache)
        if args.detection_cache and os.path.exists(args.detection_cache)
        else None
    )

    mesh = make_mesh(cfg.mesh)
    dp = mesh.shape.get(cfg.mesh.data_axis, 1)

    from dclip_tpu.parallel.multihost import is_primary, process_data_shard

    shard_index, shard_count = process_data_shard()

    def pipeline_for(path, batch_size, drop_remainder=True):
        # Validation keeps partial batches: a val set smaller than the
        # batch would otherwise silently evaluate nothing.
        # A tail batch cannot be split across processes.
        drop_remainder = drop_remainder or shard_count > 1
        return MultiModalPipeline(
            load_corpus(path),
            tokenizer,
            cache,
            batch_size=batch_size,
            drop_remainder=drop_remainder,
            max_patches=cfg.teacher.max_patches,
            image_size=student_cfg.vision.image_size,
            teacher_image_size=args.teacher_image_size,
            max_text_tokens=student_cfg.text.max_length,
            seed=cfg.seed,
            num_workers=args.num_workers,
            fast_decode=args.fast_decode,
            decode_backend=args.decode_backend,
            shard_index=shard_index,
            shard_count=shard_count,
        )

    train_pipe = pipeline_for(cfg.train_file, cfg.train_batch_size)
    # Partial tail batches are only placeable on a single data shard;
    # under dp>1 the tail must stay divisible, so it is dropped.
    val_pipe = (
        pipeline_for(cfg.val_file, cfg.eval_batch_size,
                     drop_remainder=(dp > 1))
        if cfg.val_file and os.path.exists(cfg.val_file)
        else None
    )

    teacher_cache = None
    if args.teacher_cache:
        from dclip_tpu.train.distill_trainer import TeacherTargetCache

        teacher_cache = TeacherTargetCache(
            None if args.teacher_cache == "memory" else args.teacher_cache
        )
    knn_store = None
    if args.knn_store and os.path.exists(args.knn_store):
        from dclip_tpu.data.embedding_store import EmbeddingStore

        knn_store = EmbeddingStore.load(args.knn_store)
        print(f"KNN gate enabled: {len(knn_store)} stored embeddings")
    projection_params = None
    if args.projection_weights and os.path.exists(args.projection_weights):
        from dclip_tpu.models.projections import load_image_projection

        _, projection_params = load_image_projection(
            args.projection_weights, cfg.teacher.embed_dim
        )
        print("Projection branch enabled for the knn gate")
    trainer = DistillTrainer(
        cfg, student_vars, teacher_clip_vars, teacher_params,
        student_cfg, teacher_clip_cfg, mesh=mesh, teacher_cache=teacher_cache,
        knn_store=knn_store, projection_params=projection_params,
    )
    ckpts = CheckpointManager(
        cfg.checkpoint_dir,
        prefix="distill",
        save_top_k=cfg.save_top_k,
        monitor="train_loss",  # ModelCheckpoint(monitor="train_loss") (:27-34)
    )
    start_epoch = trainer.resume(ckpts) if args.resume else 0
    logger = MetricsLogger(args.metrics_csv, print_every=cfg.log_every)
    if not is_primary():
        # Every process holds identical replicated state; exactly one
        # persists it (and the metrics CSV).
        ckpts, logger = None, None
    from dclip_tpu.cli.common import fit_with_preemption

    fit_with_preemption(trainer, train_pipe, val_pipe, ckpts, logger,
                        start_epoch)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

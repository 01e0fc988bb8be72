"""Teacher training CLI — the reference's `train_contrastive_teacher.py`
entry point (CLI contract :430-440), TPU-native.

    python -m dclip_tpu.cli.train_teacher --train_file corpus_train.json \
        --epochs 5 --batch_size 32 --learning_rate 1e-5 \
        --output_path models/teacher_contrastive [--val_file ...] \
        [--detection_cache cache/corpus_precache.npz] [model/mesh flags]

Val file defaults to train_file with "_train" -> "_val"
(reference :218). Checkpoints: per-epoch val-loss-stamped + best + resume.
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
from dclip_tpu.core.config import TeacherConfig, TeacherTrainConfig
from dclip_tpu.core.metrics import MetricsLogger
from dclip_tpu.data.corpus import load_corpus
from dclip_tpu.data.detection_cache import DetectionCache
from dclip_tpu.data.pipeline import MultiModalPipeline
from dclip_tpu.parallel.mesh import make_mesh
from dclip_tpu.train.checkpoint import CheckpointManager
from dclip_tpu.train.teacher_trainer import TeacherTrainer, teacher_config_summary


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the cross-modal meta-teacher")
    p.add_argument("--train_file", required=True)
    p.add_argument("--val_file", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--gradient_accumulation", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--output_path", default="models/teacher_contrastive")
    p.add_argument("--detection_cache", default=None,
                   help="npz detection cache (see cli.precache)")
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
                   help="region-encode only valid patch slots")
    p.add_argument("--projection_weights", default=None,
                   help="ImageProjectionModule params (flax msgpack): enables "
                        "the projection branch of the knn gate")
    p.add_argument("--pe_cache", default=None,
                   help="cross-epoch cache for the frozen region patch "
                        "embeddings (native KV store path; 'memory' for "
                        "in-process) — epochs >= 1 skip the region encode")
    p.add_argument("--knn_store", default=None,
                   help="EmbeddingStore (.npz/.dcs from cli.precache "
                        "--build_index) enabling the knn/projection gate "
                        "over patch embeddings")
    p.add_argument("--device_target_cache",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="HBM-resident level-0 over --pe_cache: cached "
                        "region embeddings gather on device instead of "
                        "re-crossing host->device each epoch; rows shard "
                        "over the data axis under dp>1 (default: auto — "
                        "on for single-process runs)")
    p.add_argument("--device_cache_mb", type=int, default=384,
                   help="HBM byte budget for --device_target_cache")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--metrics_csv", default=None)
    add_model_args(p)
    add_mesh_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.multihost:
        from dclip_tpu.cli.common import init_multihost

        init_multihost()
    clip_cfg, _, clip_vars = load_clip(args.model_preset, args.clip_weights, args.seed)
    tokenizer = load_tokenizer(args.tokenizer_dir, clip_cfg.text.max_length)

    # Reference derives val from train via "_train" -> "_val" (:218); only
    # apply the substitution to the basename, and never let it silently
    # alias the training set.
    val_file = args.val_file
    if val_file is None:
        d, base = os.path.split(args.train_file)
        if "_train" in base:
            val_file = os.path.join(d, base.replace("_train", "_val"))
        else:
            print("No --val_file and train_file lacks '_train'; validation disabled")
            val_file = ""
    cfg = TeacherTrainConfig(
        train_file=args.train_file,
        val_file=val_file,
        epochs=args.epochs,
        batch_size=args.batch_size,
        gradient_accumulation=args.gradient_accumulation,
        learning_rate=args.learning_rate,
        output_path=args.output_path,
        seed=args.seed,
        teacher=TeacherConfig(
            embed_dim=clip_cfg.projection_dim,
            max_patches=args.max_patches,
            max_text_tokens=clip_cfg.text.max_length,
        ),
        clip_model=args.model_preset,
        mesh=mesh_config(args),
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        compact_patches=args.compact_patches,
        device_target_cache=args.device_target_cache,
        device_cache_mb=args.device_cache_mb,
    )
    print(teacher_config_summary(cfg))

    cache = (
        DetectionCache.load(args.detection_cache)
        if args.detection_cache and os.path.exists(args.detection_cache)
        else None
    )
    if cache is None:
        print("No detection cache: box slots will be empty (masked out)")

    mesh = make_mesh(cfg.mesh)
    dp = mesh.shape.get(cfg.mesh.data_axis, 1)

    from dclip_tpu.parallel.multihost import is_primary, process_data_shard

    shard_index, shard_count = process_data_shard()

    def pipeline_for(path, drop_remainder=True):
        # Validation keeps partial batches: a val set smaller than the
        # batch would otherwise silently evaluate nothing.
        # A tail batch cannot be split across processes.
        drop_remainder = drop_remainder or shard_count > 1
        return MultiModalPipeline(
            load_corpus(path),
            tokenizer,
            cache,
            batch_size=cfg.batch_size,
            drop_remainder=drop_remainder,
            max_patches=cfg.teacher.max_patches,
            image_size=clip_cfg.vision.image_size,
            teacher_image_size=args.teacher_image_size,
            max_text_tokens=clip_cfg.text.max_length,
            seed=cfg.seed,
            num_workers=args.num_workers,
            fast_decode=args.fast_decode,
            decode_backend=args.decode_backend,
            shard_index=shard_index,
            shard_count=shard_count,
        )

    train_pipe = pipeline_for(cfg.train_file)
    # Partial tail batches are only placeable on a single data shard;
    # under dp>1 the tail must stay divisible, so it is dropped.
    val_pipe = (
        pipeline_for(cfg.val_file, drop_remainder=(dp > 1))
        if cfg.val_file and os.path.exists(cfg.val_file)
        else None
    )
    print(f"Training set size: {len(train_pipe.items)} samples")
    if val_pipe is not None:  # `if val_pipe:` is len()-falsy for tiny sets
        print(f"Validation set size: {len(val_pipe.items)} samples")
        if len(val_pipe) == 0:
            print("WARNING: validation set smaller than one divisible "
                  "batch under dp>1; no val batches will run")

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
    pe_cache = None
    if args.pe_cache:
        from dclip_tpu.train.distill_trainer import TeacherTargetCache

        pe_cache = TeacherTargetCache(
            None if args.pe_cache == "memory" else args.pe_cache
        )
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh,
                             knn_store=knn_store,
                             projection_params=projection_params,
                             pe_cache=pe_cache)
    ckpts = CheckpointManager(
        os.path.dirname(cfg.output_path) or ".",
        prefix=os.path.basename(cfg.output_path),
        save_top_k=0,  # teacher keeps every epoch (reference :393-402)
    )
    start_epoch = trainer.resume(ckpts) if args.resume else 0
    logger = MetricsLogger(args.metrics_csv, print_every=cfg.log_every)
    if not is_primary():
        # Every process holds identical replicated state; exactly one
        # persists it (and the metrics CSV).
        ckpts, logger = None, None
    from dclip_tpu.cli.common import fit_with_preemption

    if fit_with_preemption(trainer, train_pipe, val_pipe, ckpts, logger,
                           start_epoch):
        return 0
    best = ckpts.best() if ckpts is not None else None
    if best:
        print(f"Best model: {best['path']} (val_loss={best['metrics']['val_loss']:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Worker for tests/test_multihost.py: one process of a 2-process run.

Each process owns 4 virtual CPU devices (8 global), shards the input
pipeline by its process index, and runs ONE distillation train step over
the global 8-device mesh. Prints a JSON line with the loss and a param
checksum; the parent asserts both processes agree with each other and
with a single-process 8-device run on the same corpus.
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--global_batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--teacher_cache", action="store_true",
                    help="in-memory TeacherTargetCache: step 0 misses and "
                         "writes this process's rows (multihost.local_rows), "
                         "step 1 hits and reassembles via put_sharded")
    ap.add_argument("--mesh_model", type=int, default=1)
    ap.add_argument("--use_pallas", action="store_true",
                    help="force the Pallas kernels (interpret on CPU): the "
                         "shard_mapped fused paths under process_count > 1")
    ap.add_argument("--packed_text", action="store_true",
                    help="per-shard caption packing; the row bucket is "
                         "agreed across processes via allgather")
    args = ap.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    import numpy as np

    import jax.numpy as jnp

    from dclip_tpu.core.config import (
        CLIPConfig,
        DistillConfig,
        MeshConfig,
        TeacherConfig,
    )
    from dclip_tpu.data import (
        GridProposalDetector,
        HashTokenizer,
        MultiModalPipeline,
        build_cache,
        load_corpus,
    )
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.parallel.multihost import process_data_shard
    from dclip_tpu.train.distill_trainer import DistillTrainer

    assert jax.process_count() == args.nprocs
    assert jax.device_count() == 8, jax.device_count()

    clip_cfg = CLIPConfig.tiny_test()
    teacher_cfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim,
        num_heads=4,
        max_patches=2,
        max_text_tokens=clip_cfg.text.max_length,
    )
    model = CLIPModule(clip_cfg)
    rng = jax.random.PRNGKey(0)
    clip_vars = model.init(
        rng,
        jnp.ones((1, clip_cfg.text.max_length), jnp.int32),
        jnp.zeros(
            (1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3)
        ),
    )
    teacher = PatchTextAggregation(teacher_cfg)
    tparams = teacher.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, teacher_cfg.max_text_tokens, clip_cfg.projection_dim)),
        jnp.zeros((1, teacher_cfg.max_patches, clip_cfg.projection_dim)),
    )["params"]

    items = load_corpus(args.corpus)
    cache = build_cache(
        [i["image_path"] for i in items], GridProposalDetector()
    )
    shard_index, shard_count = process_data_shard()
    pipe = MultiModalPipeline(
        items,
        HashTokenizer(max_length=clip_cfg.text.max_length),
        cache,
        batch_size=args.global_batch,
        max_patches=teacher_cfg.max_patches,
        image_size=clip_cfg.vision.image_size,
        teacher_image_size=clip_cfg.vision.image_size,
        seed=7,
        shuffle=True,
        num_threads=1,
        shard_index=shard_index,
        shard_count=shard_count,
    )

    cfg = DistillConfig(
        train_batch_size=args.global_batch,
        learning_rate=1e-3,
        warmup_steps=1,
        accumulate_grad_batches=1,
        teacher=teacher_cfg,
        student_model="tiny",
        teacher_clip_model="tiny",
        use_pallas=True if args.use_pallas else None,
        packed_text=True if args.packed_text else None,
    )
    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    mesh = make_mesh(MeshConfig(model_parallel=args.mesh_model))
    cache = (
        TeacherTargetCache(salt="mh-test") if args.teacher_cache else None
    )
    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh,
        teacher_cache=cache,
    )
    batch = next(iter(pipe.epoch(0)))
    assert batch.pixel_values.shape[0] == args.global_batch // shard_count
    for _ in range(args.steps):
        metrics = trainer.train_step_on_batch(batch)
    loss = float(metrics["loss"])
    if cache is not None:
        # Step 0 must have populated the per-process rows.
        assert len(cache._mem) >= args.global_batch // shard_count
    # Replicated param checksum: identical across processes iff the update
    # was computed from the same global batch everywhere.
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    checksum = float(sum(np.abs(leaf).sum() for leaf in leaves))
    print(json.dumps({"pid": args.pid, "loss": loss, "checksum": checksum}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

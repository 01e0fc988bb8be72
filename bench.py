"""Distillation throughput benchmark on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full distillation training step (teacher region crops +
frozen teacher CLIP forwards + student forward/backward + optimizer) at
reference-comparable scale: ViT-B/16 teacher stack and student, 224x224
pixels, 8 region patches per image. Baseline: the reference trains
~67K pairs in <2h/epoch on an RTX 2070 Super (README.md:9-10) ->
67000 / 7200s = 9.3 images/sec. vs_baseline = ours / 9.3.
"""
from __future__ import annotations

import json
import time

BASELINE_IMAGES_PER_SEC = 67000 / 7200.0


def main() -> None:
    import contextlib
    import sys

    with contextlib.redirect_stdout(sys.stderr):
        result = _run()
    print(json.dumps(result))  # stdout carries EXACTLY one JSON line


def _run() -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from dclip_tpu.core.config import CLIPConfig, DistillConfig, MeshConfig, TeacherConfig
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train.distill_trainer import DistillTrainer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    batch = 64 if on_tpu else 8
    clip_cfg = CLIPConfig.vit_b_16() if on_tpu else CLIPConfig.tiny_test()
    teacher_cfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim,
        num_heads=8 if on_tpu else 4,
        max_patches=8,
        max_text_tokens=clip_cfg.text.max_length,
    )

    clip = CLIPModule(clip_cfg)
    rng = jax.random.PRNGKey(0)
    variables = clip.init(
        rng,
        jnp.zeros((1, clip_cfg.text.max_length), jnp.int32),
        jnp.zeros((1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3)),
    )
    teacher = PatchTextAggregation(teacher_cfg)
    tparams = teacher.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, teacher_cfg.max_text_tokens, clip_cfg.projection_dim)),
        jnp.zeros((1, teacher_cfg.max_patches, clip_cfg.projection_dim)),
    )["params"]

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                     devices=jax.devices()[:1])
    cfg = DistillConfig(
        train_batch_size=batch,
        accumulate_grad_batches=1,
        teacher=teacher_cfg,
        student_model="vit-b-16" if on_tpu else "tiny",
        teacher_clip_model="vit-b-16" if on_tpu else "tiny",
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    trainer = DistillTrainer(
        cfg, variables, variables, tparams, clip_cfg, clip_cfg, mesh=mesh
    )
    # device_put once: the tunneled H2D link is slow and a real input
    # pipeline overlaps transfers; bench measures compute throughput.
    data = trainer._device_batch(_synthetic_batch(clip_cfg, teacher_cfg, batch))

    # Warmup (compile) + 2 steps, fully synced.
    for _ in range(3):
        metrics = trainer.train_step_on_batch(data)
        float(metrics["loss"])

    # Per-step host sync: the tunneled backend reports bogus times when
    # only the final array of a long async chain is blocked on.
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        metrics = trainer.train_step_on_batch(data)
        float(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = n_steps * batch / dt
    return {
        "metric": "distill_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        # Off-TPU the model is a toy config; comparing to the reference's
        # ViT-B/16 GPU figure would be meaningless.
        "vs_baseline": (
            round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2) if on_tpu else None
        ),
        "backend": jax.default_backend(),
    }


if __name__ == "__main__":
    main()

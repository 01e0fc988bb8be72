"""On-chip distillation step profiler: per-phase decomposition + MFU.

The reference has no profiling subsystem at all (SURVEY.md §5 "Tracing /
profiling: absent" — its closest artifacts are tqdm bars,
train_contrastive_teacher.py:340). This CLI is the reusable form of the
step-decomposition analysis that previously lived only in STATUS notes:
one command that reports where a distillation step's time goes, on
synthetic data with random weights (throughput does not depend on weight
values — only shapes/dtypes reach the compiler):

  full uncached step     teacher region encode + tail + student step
                         (epoch-0 cost; what bench.py's headline measures)
    teacher patch encode the B x P region crop-resize + frozen ViT forwards
    teacher tail         token-level text encode + cross-attention +
                         aggregation (the caption-dependent part)
  cache-warm step        student fwd/bwd + optimizer only (epochs >= 1,
                         teacher served from the target cache)

Each phase is timed with the chained-dispatch convention bench.py uses
(one final block, so the tunnel's D2H latency is not charged per step),
plus analytic MFU for the two end-to-end paths — both the 2x-forward
convention and the honest model-FLOPs denominator (core.flops).

--trace_dir additionally captures a jax.profiler (perfetto) trace of the
timed full-step window for op-level drill-down.

Usage:
  python -m dclip_tpu.cli.profile --model_preset vit-b-16 --batch 256
  python -m dclip_tpu.cli.profile --json            # one machine-readable line
  python -m dclip_tpu.cli.profile --trace_dir /tmp/dclip_trace
"""
from __future__ import annotations

import argparse
import json as _json
import time
from typing import Callable, Optional

__all__ = ["main"]


def _time_phase(fn: Callable, block: Callable, steps: int,
                warmup: int = 2) -> float:
    """Seconds per step: `warmup` untimed calls (compile), then `steps`
    chained calls with ONE final block (bench.py's convention — a
    per-step host sync would charge the tunnel's D2H latency to every
    step, which a production loop never pays)."""
    for _ in range(warmup):
        block(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = fn()
    block(out)
    return (time.perf_counter() - t0) / steps


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(
        description="Profile one distillation training step phase by phase"
    )
    p.add_argument("--model_preset", default="vit-b-16",
                   help="CLIP preset: vit-b-32|vit-b-16|vit-l-14|tiny")
    p.add_argument("--batch", type=int, default=None,
                   help="per-chip batch (default: 256 on TPU, 8 elsewhere)")
    p.add_argument("--steps", type=int, default=10,
                   help="timed steps per phase")
    p.add_argument("--max_patches", type=int, default=8,
                   help="teacher region slots per image")
    p.add_argument("--trace_dir", default=None,
                   help="also write a jax.profiler trace of the timed "
                        "full-step window here (perfetto)")
    p.add_argument("--json", action="store_true", dest="as_json",
                   help="print one JSON line instead of the table")
    p.add_argument("--per_op", action="store_true",
                   help="per-op speed-of-light decomposition of the "
                        "cache-warm student step (cli/profile_ops.py) "
                        "instead of the phase table")
    args = p.parse_args(argv)
    if args.steps < 1:
        p.error(f"--steps must be >= 1 (got {args.steps})")

    if args.per_op:
        from dclip_tpu.core.cache import (
            enable_persistent_compilation_cache as _epc,
        )

        _epc()
        from dclip_tpu.cli.profile_ops import run_per_op

        batch = args.batch if args.batch is not None else 256
        return run_per_op(batch, args.steps, args.as_json)

    import jax
    import numpy as np

    from dclip_tpu.cli.common import (
        host_random_variables,
        synthetic_distill_batch,
    )
    from dclip_tpu.core.cache import enable_persistent_compilation_cache
    from dclip_tpu.core.config import (
        CLIPConfig,
        DistillConfig,
        MeshConfig,
        TeacherConfig,
    )
    from dclip_tpu.core.flops import distill_step_flops, mfu
    from dclip_tpu.core.metrics import start_trace, stop_trace
    from dclip_tpu.core.platform import is_tpu_platform
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train.distill_trainer import (
        DistillTrainer,
        TeacherTargetCache,
    )

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    on_tpu = is_tpu_platform(jax.default_backend())
    batch = args.batch if args.batch is not None else (256 if on_tpu else 8)
    clip_cfg = CLIPConfig.from_name(args.model_preset)
    teacher_cfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim,
        num_heads=8 if clip_cfg.projection_dim % 64 == 0 else 4,
        max_patches=args.max_patches,
        max_text_tokens=clip_cfg.text.max_length,
    )
    clip = CLIPModule(clip_cfg)
    teacher = PatchTextAggregation(teacher_cfg)
    # Host-side random init (eager flax init costs ~96s through the
    # tunnel; see cli.common.host_random_variables). Random weights are
    # fine: step time depends on shapes/dtypes, not values.
    variables = host_random_variables(
        clip,
        lambda: clip.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, clip_cfg.text.max_length), jnp.int32),
            jnp.zeros(
                (1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3)
            ),
        ),
    )
    tparams = host_random_variables(
        teacher,
        lambda: teacher.init(
            jax.random.PRNGKey(1),
            jnp.zeros(
                (1, teacher_cfg.max_text_tokens, clip_cfg.projection_dim)
            ),
            jnp.zeros((1, teacher_cfg.max_patches, clip_cfg.projection_dim)),
        ),
    )["params"]
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    tparams = jax.device_put(tparams, dev)

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                     devices=jax.devices()[:1])
    cfg = DistillConfig(
        train_batch_size=batch,
        accumulate_grad_batches=1,
        teacher=teacher_cfg,
        student_model=args.model_preset,
        teacher_clip_model=args.model_preset,
    )
    cache = TeacherTargetCache(salt="profile-ephemeral")
    trainer = DistillTrainer(
        cfg, variables, variables, tparams, clip_cfg, clip_cfg, mesh=mesh,
        teacher_cache=cache,
    )

    host_batch = synthetic_distill_batch(clip_cfg, teacher_cfg, batch)
    host_batch["index"] = np.arange(batch, dtype=np.int64)
    data_dev = trainer._device_batch(host_batch)
    data_hybrid = dict(host_batch)
    for k in ("pixel_values", "teacher_pixels"):
        data_hybrid[k] = data_dev[k]
    # With packing on, the uncached step keeps text ids host-side so the
    # host packing engages exactly like a real pipeline epoch-0 run (an
    # all-device batch would silently time the UNPACKED text path while
    # the warm row times the packed one — bench.py has the same layout).
    data_uncached = dict(data_dev)
    text_frac = 1.0
    if trainer._packed_text:
        from dclip_tpu.ops.packing import pack_captions

        for k in ("input_ids", "attention_mask"):
            data_uncached[k] = host_batch[k]
        text_frac = pack_captions(
            host_batch["input_ids"], host_batch["attention_mask"],
            clip_cfg.text.eos_token_id,
        )["packed_ids"].shape[0] / batch

    block_metrics = lambda m: float(m["loss"])  # noqa: E731
    steps = args.steps

    # -- full uncached step (epoch-0 path; no cache bookkeeping) ----------
    trainer.teacher_cache = None
    dt_full = _time_phase(
        lambda: trainer.train_step_on_batch(data_uncached), block_metrics,
        steps,
    )
    if args.trace_dir:
        # Trace a SEPARATE short window after the untimed measurement:
        # an active jax.profiler capture perturbs step time, so tracing
        # the timed window would make dt_full (and both uncached MFU
        # figures) incomparable to the untraced phase rows.
        start_trace(args.trace_dir)
        for _ in range(min(3, steps)):
            block_metrics(trainer.train_step_on_batch(data_uncached))
        stop_trace()

    # -- teacher phases, isolated ----------------------------------------
    dt_pe = _time_phase(
        lambda: trainer._encode_patches_budgeted(host_batch, data_dev),
        jax.block_until_ready, steps,
    )
    pe = trainer._encode_patches_budgeted(host_batch, data_dev)
    jax.block_until_ready(pe)
    dt_tail = _time_phase(
        lambda: trainer._teacher_tail_step(
            trainer.teacher_clip_variables, trainer.teacher_params, pe,
            data_dev,
        ),
        jax.block_until_ready, steps,
    )

    # -- cache-warm step (epochs >= 1: student fwd/bwd + optimizer) -------
    trainer.teacher_cache = cache
    dt_warm = _time_phase(
        lambda: trainer.train_step_on_batch(data_hybrid), block_metrics,
        steps, warmup=3,  # first warm call populates the cache + compiles
    )

    platform = mesh.devices.flat[0].platform
    dtype = trainer.cfg.compute_dtype
    scfg, tccfg = trainer.student_config, trainer.teacher_clip_config

    def _mfu(dt, cached, honest):
        f = distill_step_flops(scfg, tccfg, teacher_cfg, batch,
                               teacher_cached=cached, reference_mask=honest,
                               text_rows_fraction=text_frac)
        return mfu(f / dt, platform, dtype)

    rows = [
        ("full uncached step", dt_full, batch / dt_full),
        ("  teacher patch encode", dt_pe, None),
        ("  teacher tail (text+xattn)", dt_tail, None),
        ("  student step (cache-warm)", dt_warm, batch / dt_warm),
        ("  residual (dispatch/overlap)",
         dt_full - dt_pe - dt_tail - dt_warm, None),
    ]
    result = {
        "preset": args.model_preset,
        "batch": batch,
        "backend": jax.default_backend(),
        "compute_dtype": dtype,
        "use_pallas": bool(trainer.cfg.use_pallas),
        "packed_text": bool(trainer._packed_text),
        "phases_ms": {
            name.strip(): round(dt * 1e3, 2) for name, dt, _ in rows
        },
        "images_per_sec_uncached": round(batch / dt_full, 2),
        "images_per_sec_cache_warm": round(batch / dt_warm, 2),
        "mfu_uncached": _mfu(dt_full, False, False),
        "mfu_uncached_masked_true": _mfu(dt_full, False, True),
        "mfu_cache_warm": _mfu(dt_warm, True, False),
        "mfu_cache_warm_masked_true": _mfu(dt_warm, True, True),
        "trace_dir": args.trace_dir,
    }
    for k in list(result):
        if k.startswith("mfu_") and result[k] is not None:
            result[k] = round(result[k], 4)

    if args.as_json:
        print(_json.dumps(result))
        return 0

    print(f"== dclip_tpu step profile: {args.model_preset} batch={batch} "
          f"backend={result['backend']} dtype={dtype} "
          f"pallas={result['use_pallas']} ==")
    print(f"{'phase':<32}{'ms/step':>10}{'img/s':>10}{'share':>9}")
    for name, dt, ips in rows:
        share = 100.0 * dt / dt_full
        print(f"{name:<32}{dt * 1e3:>10.2f}"
              f"{(f'{ips:.1f}' if ips else '-'):>10}{share:>8.1f}%")
    print("note: the student row is timed via the cacheable hybrid batch, so"
          " it also pays host cache-key hashing + the cache gather that the"
          " all-device full-step rows do not — its share is slightly"
          " overstated and the residual can go negative.")
    fmt = lambda v: "n/a" if v is None else f"{v:.4f}"  # noqa: E731
    print(f"MFU uncached {fmt(result['mfu_uncached'])} "
          f"(true {fmt(result['mfu_uncached_masked_true'])})   "
          f"cache-warm {fmt(result['mfu_cache_warm'])} "
          f"(true {fmt(result['mfu_cache_warm_masked_true'])})")
    if args.trace_dir:
        print(f"perfetto trace written to {args.trace_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Distillation throughput benchmark on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Measures the full distillation training step (teacher region crops +
frozen teacher CLIP forwards + student forward/backward + optimizer) at
reference-comparable scale: ViT-B/16 teacher stack and student, 224x224
pixels, 8 region patches per image — in the architecture's default TPU
configuration (bf16 compute + fused Pallas kernels, auto-resolved by the
trainer). Baseline: the reference trains ~67K pairs in <2h/epoch on an
RTX 2070 Super (README.md:9-10) -> 67000 / 7200s = 9.3 images/sec.
vs_baseline = ours / 9.3.

Extras reported alongside:
  mfu                       achieved matmul FLOP/s over v5e peak (analytic
                            FLOPs, dclip_tpu.core.flops; student backward
                            counted at the conventional 2x forward)
  mfu_masked_true           same measurement, honest "model FLOPs" (PaLM
                            MFU convention) denominator: excludes backward
                            GEMMs the default trainable mask provably
                            skips (frozen vision MLP dW, dead patch-embed
                            gradients) — core.flops.student_step_flops_masked
  cache_warm_images_per_sec throughput with the cross-epoch teacher-target
                            cache hot (epochs >= 1: student fwd/bwd only)
  cache_warm_mfu            MFU of the cache-warm step (2x-forward conv.)
  cache_warm_mfu_masked_true  cache-warm MFU, model-FLOPs denominator
  dp_equivalent_images_per_sec  the SAME uncached step in the exact
                            configuration a dp>1 mesh runs per device
                            (shard_map-wrapped kernels, XLA all-gather
                            loss, per-shard packing/compaction) on this
                            one chip — what the headline costs per chip
                            on the north-star multi-chip topology, minus
                            ICI collective time (unmeasurable on 1 chip).
                            DCLIP_BENCH_DP_EQUIV=0 skips it.
  dp_equivalent_mfu_true    its model-FLOPs MFU
  dp_equivalent_cache_warm_images_per_sec / _mfu_true  cache-warm twin
  flops_per_image           analytic FLOPs of the uncached step / image
  note                      H2D excluded (one device_put; a real input
                            pipeline overlaps transfers)

Cache-warm true-MFU ceiling (round 5, measured — the per-op speed-of-light
decomposition, reproducible via `python -m dclip_tpu.cli.profile --per_op`):
every op of the warm step was timed in isolation on the real chip at the
exact step shapes (in-jit differenced cycles, B=256) and compared to its
analytic floor, max(GEMM FLOPs / 197 TF/s, bytes / 819 GB/s):

  op (per vision layer)      measured    floor    x/floor
  ln fwd+bwd                  0.46 ms    0.47       1.0   HBM-bound, done
  qkv proj fwd+dx (6 GEMMs)   1.88       1.81       1.04  at the MXU roof
  out proj fwd+dx             0.61       0.60       1.01  at the MXU roof
  attn dW (4 GEMMs)           1.17       1.21       0.97  at the MXU roof
  attn fwd kernel (Pallas)    0.73       0.38       1.9   VPU softmax
  attn bwd kernel (Pallas)    1.3-1.7    0.76       ~2    VPU softmax
  ln2+mlp fwd+dx (pair)       5.62       4.83       1.16  near the roof
  text stack (packed, R=64)  10.7       5.8        1.84  small-shape GEMMs
  one REAL layer composite   15.5       10.1       1.54  (vs 12.2 parts)

Reading: the XLA GEMMs already run at 97-104% of the bf16 MXU roof —
there is nothing left to win in them. The remaining distance to 1.0 is
(a) the attention kernels' [S, S] f32 softmax chains, ALU-bound on the
VPU (~1.5 ms/layer over their floors; phase-split ordering, log2-domain
exp2, GEMM-ridden row sums and post-normalization are already applied —
further [S, S] pass removal measured noise-bound on the tunnel),
(b) the packed text stack's small-shape GEMMs (~50% MFU at S=77/d=512,
intrinsic — B=512 OOMs, fused text MLP measured slower, packing already
removed the padding work), and (c) ~3 ms/layer of composition cost the
isolated rows don't see (scheduling/residency between ops in the big
fused graph; the real step recovers part of it by overlapping text with
vision). Summing floors with the Pallas kernels at their MEASURED cost
puts the achievable ceiling at ~0.78-0.80 true MFU; the measured step
sits at 0.65-0.67 with the residual in (c), which no per-op kernel can
remove — only a full-backward megakernel could, and the fused trainable
block attempt measured SLOWER (kernels/attn_block_trainable.py docstring:
per-program [S, D] projection GEMMs under-fill the MXU that XLA's
batched GEMM saturates). 0.65-0.70 true MFU is therefore the honest
plateau for this architecture at B/16 shapes on v5e, and the headline
conventional MFU (0.79-0.83) reflects the same step counted by the
2x-forward convention.
"""
from __future__ import annotations

import json
import time

BASELINE_IMAGES_PER_SEC = 67000 / 7200.0


def main() -> None:
    """Run the measurement in a CHILD process with a deadline.

    The tunneled Pallas compile service can hang outright (observed:
    trainer construction wedged >9 min); a hung bench would leave the
    round with NO artifact. The child does the real work; on timeout or
    crash the parent retries once with DCLIP_DISABLE_PALLAS=1 (the XLA
    paths — slower but dependable). Exactly one JSON line either way."""
    import os
    import subprocess
    import sys

    if os.environ.get("_DCLIP_BENCH_CHILD"):
        import contextlib

        with contextlib.redirect_stdout(sys.stderr):
            result = _run()
        print(json.dumps(result))
        return

    def attempt(extra_env, deadline):
        env = dict(os.environ, _DCLIP_BENCH_CHILD="1", **extra_env)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=deadline, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired as e:
            tail = (e.stderr or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            print(f"bench child timed out after {deadline:.0f}s; stderr tail:\n"
                  + "\n".join(tail.splitlines()[-10:]), file=sys.stderr)
            return None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except ValueError:
                continue
        print("bench child produced no JSON; stderr tail:\n"
              + "\n".join(proc.stderr.splitlines()[-15:]), file=sys.stderr)
        return None

    # Force Pallas in the first attempt: the availability probe's 120s
    # watchdog false-negatives under TPU-client lock contention, and a
    # stale failure memo would silently bench the fallback path (round-2
    # artifact regression). The parent deadline + XLA retry below IS the
    # safety net the probe exists to provide.
    # 1000s: warm-cache child measured ~250-300s; +dp-equivalent trainer
    # adds its own compiles (~100s cold, cached thereafter); the deadline
    # also absorbs one degraded-tunnel window (observed 367s execution
    # stall) without giving up the Pallas path. The XLA retry below still
    # bounds the total.
    first = float(os.environ.get("DCLIP_BENCH_CHILD_TIMEOUT", "1000"))
    result = attempt({"DCLIP_FORCE_PALLAS": "1"}, first)
    if result is None:
        # Degradation windows come and go on the order of minutes; a
        # second Pallas attempt often lands in a healthy window (and the
        # executable cache is warm from the first attempt's progress).
        print("bench child failed/hung; second Pallas attempt",
              file=sys.stderr)
        result = attempt({"DCLIP_FORCE_PALLAS": "1"}, 560)
    if result is None:
        print("bench child failed/hung twice; retrying with Pallas disabled",
              file=sys.stderr)
        result = attempt({"DCLIP_DISABLE_PALLAS": "1"}, 360)
    if result is None:
        result = {
            "metric": "distill_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": None,
            "error": "bench child failed twice (see stderr)",
        }
    print(json.dumps(result))  # stdout carries EXACTLY one JSON line


def _time_steps(step_fn, n_steps: int) -> float:
    """Chained steps with ONE final sync.

    Steps are data-dependent through trainer.state, so blocking on the
    last step's loss forces the entire chain to execute — verified against
    per-step syncing (same per-step time + exactly one tunnel round-trip).
    A per-step host sync would charge the tunnel's ~26 ms D2H latency to
    every step, which a production loop (async dispatch, rare log-point
    syncs) never pays."""
    metrics = step_fn()
    float(metrics["loss"])  # drain any queued work before the clock starts
    t0 = time.perf_counter()
    for _ in range(n_steps):
        metrics = step_fn()
    float(metrics["loss"])
    return time.perf_counter() - t0


def _run() -> dict:
    import os
    import time as _time

    import numpy as np

    _t0 = _time.time()

    def stage(name):
        # Stage timestamps surface in the parent's stderr tail on timeout,
        # so a deadline kill is diagnosable after the fact.
        import sys as _sys

        print(f"[bench +{_time.time()-_t0:6.1f}s] {name}", file=_sys.stderr,
              flush=True)

    import jax
    import jax.numpy as jnp

    from dclip_tpu.core.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from __graft_entry__ import _synthetic_batch
    from dclip_tpu.core.config import (
        CLIPConfig,
        DistillConfig,
        MeshConfig,
        TeacherConfig,
    )
    from dclip_tpu.core.flops import distill_step_flops, mfu
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train.distill_trainer import DistillTrainer, TeacherTargetCache

    from dclip_tpu.core.platform import is_tpu_platform

    on_tpu = is_tpu_platform(jax.default_backend())
    # DCLIP_BENCH_BATCH overrides for batch-size sweeps. 256 is the
    # measured sweet spot (sweep on the real chip: 64 -> 345.8 img/s
    # MFU 0.720, 128 -> 349.5 / 0.728, 256 -> 363.5 / 0.757,
    # 384 -> 356.9 / 0.744 with cache-warm 1071 vs 1137 at 256;
    # 512 OOMs the 16 GB HBM).
    batch = int(os.environ.get("DCLIP_BENCH_BATCH", "256" if on_tpu else "8"))
    # DCLIP_BENCH_REMAT=1: jax.checkpoint each encoder layer (trades
    # recompute FLOPs for HBM) — the knob for the B=512 sweep, which OOMs
    # the 16 GB HBM without remat. MEASURED (remat + B=512, packed):
    # uncached 331.0 img/s / cache-warm 1039.5 vs 362.3 / 1353.6 at B=256
    # unremat — the recompute tax (one extra vision forward per backward)
    # exceeds the larger-batch gain; 256 without remat stays optimal.
    remat = bool(int(os.environ.get("DCLIP_BENCH_REMAT", "0")))
    # DCLIP_BENCH_PACKED=0/1 overrides caption sequence packing for the
    # student text tower (ops/packing.py) — several captions' content
    # tokens share one 77-token row. Default auto (None): on for TPU,
    # resolved by the trainer like the other fast paths. Measured v5e
    # cache-warm: 1344 img/s packed vs 1137 unpacked at batch 256. MFU
    # denominators shrink with the executed text rows
    # (core.flops text_rows_fraction). NOTE: uncached sweep figures
    # recorded above/in the remat note predate packing on the uncached
    # path (it timed an all-device batch, which packing skips — host
    # computation); uncached now uses host text ids so epoch 0 packs
    # exactly like a real pipeline run.
    packed_env = os.environ.get("DCLIP_BENCH_PACKED")
    packed = None if packed_env is None else bool(int(packed_env))
    clip_cfg = CLIPConfig.vit_b_16() if on_tpu else CLIPConfig.tiny_test()
    teacher_cfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim,
        num_heads=8 if on_tpu else 4,
        max_patches=8,
        max_text_tokens=clip_cfg.text.max_length,
    )

    # Weights built host-side from eval_shape + numpy, one transfer (see
    # cli.common.host_random_variables: eager flax init costs ~96s of the
    # child budget through the tunnel). Bench measures throughput, not
    # convergence — the value distribution only needs a finite loss.
    from dclip_tpu.cli.common import host_random_variables

    clip = CLIPModule(clip_cfg)
    teacher = PatchTextAggregation(teacher_cfg)
    rng = jax.random.PRNGKey(0)

    variables = host_random_variables(
        clip,
        lambda: clip.init(
            rng,
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
            jnp.zeros((1, teacher_cfg.max_text_tokens, clip_cfg.projection_dim)),
            jnp.zeros((1, teacher_cfg.max_patches, clip_cfg.projection_dim)),
        ),
    )["params"]
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    tparams = jax.device_put(tparams, dev)

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                     devices=jax.devices()[:1])
    # Fast-path fields left at "auto": the trainer resolves bf16 + Pallas +
    # compaction on TPU — bench measures the architecture's real defaults.
    cfg = DistillConfig(
        train_batch_size=batch,
        accumulate_grad_batches=1,
        teacher=teacher_cfg,
        student_model="vit-b-16" if on_tpu else "tiny",
        teacher_clip_model="vit-b-16" if on_tpu else "tiny",
        remat=remat,
        packed_text=packed,
    )
    # In-memory, bench-scoped: pass an explicit salt so the trainer skips
    # the full-weight fingerprint (a device_get of both B/16 trees through
    # the tunnel costs minutes; an ephemeral cache needs no collision
    # safety across runs).
    cache = TeacherTargetCache(salt="bench-ephemeral")
    stage("init done, constructing trainer")
    trainer = DistillTrainer(
        cfg, variables, variables, tparams, clip_cfg, clip_cfg, mesh=mesh,
        teacher_cache=cache,
    )
    dtype = trainer.cfg.compute_dtype
    platform = mesh.devices.flat[0].platform

    # Two batch layouts, device_put ONCE (the tunneled H2D link is slow; a
    # real input pipeline overlaps transfers — bench measures compute):
    #   data_uncached big tensors on device; with packing on, text ids stay
    #               host numpy (caption packing is a host computation that
    #               only engages on the pipeline's numpy layout — an
    #               all-device batch would silently time the UNPACKED
    #               student text path while reporting packed_text=true).
    #   data_hybrid big pixel tensors on device, small fields host numpy —
    #               the real pipeline's layout, so cache keying stays a
    #               pure host computation (cache-warm timing).
    stage("trainer constructed")
    host_batch = _synthetic_batch(clip_cfg, teacher_cfg, batch)
    host_batch["index"] = np.arange(batch, dtype=np.int64)
    data_dev = trainer._device_batch(host_batch)
    data_hybrid = dict(host_batch)
    for k in ("pixel_values", "teacher_pixels"):
        data_hybrid[k] = data_dev[k]
    data_uncached = dict(data_dev)
    if trainer._packed_text:
        for k in ("input_ids", "attention_mask"):
            data_uncached[k] = host_batch[k]

    # Packed text executes R < B text rows — both steps' MFU denominators
    # count only the GEMM work actually run (core.flops docstring).
    text_frac = 1.0
    if trainer._packed_text:
        from dclip_tpu.ops.packing import pack_captions

        text_frac = pack_captions(
            host_batch["input_ids"], host_batch["attention_mask"],
            clip_cfg.text.eos_token_id,
        )["packed_ids"].shape[0] / batch
        stage(f"packed text rows fraction: {text_frac:.3f}")

    # --- uncached step (epoch 0 compute): teacher targets on device, no
    # cache bookkeeping (cache writes are host I/O a real run overlaps).
    trainer.teacher_cache = None
    stage("batch on device; warmup/compile starting")
    for i in range(3):  # warmup: compile both jits
        m = trainer.train_step_on_batch(data_uncached)
        float(m["loss"])
        stage(f"warmup step {i} done")
    n_steps = 10
    dt_uncached = _time_steps(
        lambda: trainer.train_step_on_batch(data_uncached), n_steps
    )
    images_per_sec = n_steps * batch / dt_uncached
    stage(f"uncached measured: {images_per_sec:.1f} img/s")
    trainer.teacher_cache = cache

    flops_uncached = distill_step_flops(
        trainer.student_config, trainer.teacher_clip_config, teacher_cfg,
        batch, text_rows_fraction=text_frac,
    )
    mfu_uncached = mfu(flops_uncached * n_steps / dt_uncached, platform, dtype)
    # Honest "model FLOPs" MFU (PaLM convention): the denominator excludes
    # backward GEMMs the default trainable mask provably never runs
    # (frozen vision MLP dW etc.) — see core.flops.student_step_flops_masked.
    mfu_uncached_true = mfu(
        distill_step_flops(
            trainer.student_config, trainer.teacher_clip_config, teacher_cfg,
            batch, reference_mask=True, text_rows_fraction=text_frac,
        ) * n_steps / dt_uncached,
        platform, dtype,
    )

    # --- cache-warm step (epochs >= 1): teacher side served from cache.
    def warm_step():
        return trainer.train_step_on_batch(data_hybrid)

    for _ in range(3):  # first call populates the cache + compiles
        m = warm_step()
        float(m["loss"])
    dt_warm = _time_steps(warm_step, n_steps)
    warm_images_per_sec = n_steps * batch / dt_warm
    stage(f"cache-warm measured: {warm_images_per_sec:.1f} img/s")

    # --- dp-equivalent step: the exact per-device configuration a dp>1
    # mesh runs (shard_map-wrapped kernels, XLA all-gather loss, per-shard
    # packing/compaction), measured on this one chip so the multi-chip
    # perf story matches the benched one. Same weights, same batches.
    dp_eq: dict = {}
    if os.environ.get("DCLIP_BENCH_DP_EQUIV", "1") != "0":
        stage("constructing dp-equivalent trainer")
        trainer_eq = DistillTrainer(
            cfg, variables, variables, tparams, clip_cfg, clip_cfg,
            mesh=mesh, teacher_cache=None, dp_equivalent=True,
        )
        for i in range(3):
            m = trainer_eq.train_step_on_batch(data_uncached)
            float(m["loss"])
            stage(f"dp-equivalent warmup step {i} done")
        dt_eq = _time_steps(
            lambda: trainer_eq.train_step_on_batch(data_uncached), n_steps
        )
        eq_ips = n_steps * batch / dt_eq
        stage(f"dp-equivalent uncached measured: {eq_ips:.1f} img/s")
        # Same analytic FLOPs as the headline step (packing with one
        # shard packs identically; dp_equivalent changes scheduling, not
        # math), so MFU reuses the headline denominators.
        eq_mfu_true = mfu(
            distill_step_flops(
                trainer_eq.student_config, trainer_eq.teacher_clip_config,
                teacher_cfg, batch, reference_mask=True,
                text_rows_fraction=text_frac,
            ) * n_steps / dt_eq,
            platform, dtype,
        )
        # Cache-warm twin (student fwd/bwd only): feed the teacher targets
        # from the headline trainer's cache via the hybrid batch.
        trainer_eq.teacher_cache = cache
        for _ in range(3):
            m = trainer_eq.train_step_on_batch(data_hybrid)
            float(m["loss"])
        dt_eq_warm = _time_steps(
            lambda: trainer_eq.train_step_on_batch(data_hybrid), n_steps
        )
        eq_warm_ips = n_steps * batch / dt_eq_warm
        stage(f"dp-equivalent cache-warm measured: {eq_warm_ips:.1f} img/s")
        eq_warm_mfu_true = mfu(
            distill_step_flops(
                trainer_eq.student_config, trainer_eq.teacher_clip_config,
                teacher_cfg, batch, teacher_cached=True, reference_mask=True,
                text_rows_fraction=text_frac,
            ) * n_steps / dt_eq_warm,
            platform, dtype,
        )
        dp_eq = {
            "dp_equivalent_images_per_sec": round(eq_ips, 2),
            "dp_equivalent_mfu_true": round(eq_mfu_true, 4)
            if eq_mfu_true is not None else None,
            "dp_equivalent_cache_warm_images_per_sec": round(eq_warm_ips, 2),
            "dp_equivalent_cache_warm_mfu_true": round(eq_warm_mfu_true, 4)
            if eq_warm_mfu_true is not None else None,
        }
    flops_warm = distill_step_flops(
        trainer.student_config, trainer.teacher_clip_config, teacher_cfg,
        batch, teacher_cached=True, text_rows_fraction=text_frac,
    )
    mfu_warm = mfu(flops_warm * n_steps / dt_warm, platform, dtype)
    mfu_warm_true = mfu(
        distill_step_flops(
            trainer.student_config, trainer.teacher_clip_config, teacher_cfg,
            batch, teacher_cached=True, reference_mask=True,
            text_rows_fraction=text_frac,
        ) * n_steps / dt_warm,
        platform, dtype,
    )

    rnd = lambda x, n=2: None if x is None else round(x, n)  # noqa: E731
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
        "compute_dtype": dtype,
        "use_pallas": bool(trainer.cfg.use_pallas),
        "mfu": rnd(mfu_uncached, 4),
        "mfu_masked_true": rnd(mfu_uncached_true, 4),
        "flops_per_image": rnd(flops_uncached / batch, 0),
        "cache_warm_images_per_sec": round(warm_images_per_sec, 2),
        "cache_warm_mfu": rnd(mfu_warm, 4),
        "cache_warm_mfu_masked_true": rnd(mfu_warm_true, 4),
        "packed_text": bool(trainer._packed_text),
        **dp_eq,
        "note": "H2D excluded (single device_put; input pipeline overlaps); "
                "dp_equivalent_* = per-chip cost of the dp>1 step config "
                "(shard_map kernels + XLA global loss), excl. ICI",
    }


if __name__ == "__main__":
    main()

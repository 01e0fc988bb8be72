"""Auto fast-path resolution (bf16 / Pallas / compaction TPU defaults).

The north star (BASELINE.json) wants the fused-kernel bf16 architecture to
BE the measured configuration on TPU; off-TPU the conservative XLA float32
paths stay the default. These tests pin the resolution rules and that the
flags compose on a real trainer."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import (
    CLIPConfig,
    DistillConfig,
    MeshConfig,
    TeacherConfig,
    TeacherTrainConfig,
    resolve_fast_paths,
)
from dclip_tpu import kernels as kernels_pkg


def test_resolve_cpu_defaults():
    cfg = resolve_fast_paths(DistillConfig(), "cpu")
    assert cfg.compute_dtype == "float32"
    assert cfg.use_pallas is False
    assert cfg.compact_patches is False
    assert cfg.packed_text is False


def test_resolve_tpu_defaults(monkeypatch):
    monkeypatch.setitem(kernels_pkg._PALLAS_OK, "ok", True)
    cfg = resolve_fast_paths(DistillConfig(), "tpu")
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.use_pallas is True
    assert cfg.compact_patches is True
    assert cfg.packed_text is True


def test_resolve_tpu_pallas_unavailable_falls_back(monkeypatch):
    monkeypatch.setitem(kernels_pkg._PALLAS_OK, "ok", False)
    cfg = resolve_fast_paths(TeacherTrainConfig(), "tpu")
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.use_pallas is False  # XLA twin, not a crash


def test_explicit_settings_win(monkeypatch):
    monkeypatch.setitem(kernels_pkg._PALLAS_OK, "ok", True)
    cfg = DistillConfig(
        compute_dtype="float32", use_pallas=False, compact_patches=False
    )
    out = resolve_fast_paths(cfg, "tpu")
    assert out.compute_dtype == "float32"
    assert out.use_pallas is False
    assert out.compact_patches is False


def test_disable_env(monkeypatch):
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)
    monkeypatch.setenv("DCLIP_DISABLE_PALLAS", "1")
    assert kernels_pkg.pallas_available() is False
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)


def test_flags_compose_on_trainer(cpu_devices):
    """bf16 + use_pallas (interpret on CPU) + compact_patches together on a
    real DistillTrainer step -> finite loss, resolved concrete config."""
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train import DistillTrainer

    clip_cfg = CLIPConfig.tiny_test()
    B, P, T = 4, 3, clip_cfg.text.max_length
    img = clip_cfg.vision.image_size
    tcfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim, num_heads=4,
        max_patches=P, max_text_tokens=T,
    )
    clip = CLIPModule(clip_cfg)
    variables = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T), jnp.int32),
        jnp.zeros((1, img, img, 3)),
    )
    teacher = PatchTextAggregation(tcfg)
    d = clip_cfg.projection_dim
    tparams = teacher.init(
        jax.random.PRNGKey(1), jnp.zeros((1, T, d)), jnp.zeros((1, P, d))
    )["params"]
    cfg = DistillConfig(
        train_batch_size=B, accumulate_grad_batches=1, teacher=tcfg,
        student_model="tiny", teacher_clip_model="tiny",
        compute_dtype="bfloat16", use_pallas=True, compact_patches=True,
        mesh=MeshConfig(data_parallel=1),
    )
    mesh = make_mesh(cfg.mesh, devices=cpu_devices[:1])
    trainer = DistillTrainer(
        cfg, variables, variables, tparams, clip_cfg, clip_cfg, mesh=mesh
    )
    assert trainer.cfg.use_pallas is True and trainer.cfg.compact_patches is True
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 900, size=(B, T)).astype(np.int32)
    ids[:, 5] = clip_cfg.text.eos_token_id
    ids[:, 6:] = 0
    mask = np.zeros((B, T), np.int32)
    mask[:, :6] = 1
    boxes = rng.rand(B, P, 4).astype(np.float32) * 10
    boxes[..., 2:] += boxes[..., :2] + 4
    box_mask = np.zeros((B, P), np.float32)
    box_mask[:, 0] = 1.0  # sparse: forces the compacted bucket
    batch = {
        "pixel_values": rng.randn(B, img, img, 3).astype(np.float32) * 0.1,
        "input_ids": ids,
        "attention_mask": mask,
        "teacher_pixels": rng.rand(B, img, img, 3).astype(np.float32),
        "boxes": boxes,
        "conf": rng.rand(B, P).astype(np.float32),
        "box_mask": box_mask,
    }
    metrics = trainer.train_step_on_batch(batch)
    assert np.isfinite(float(metrics["loss"]))


def test_auto_resolves_concrete_on_cpu_trainer(cpu_devices):
    """Default (auto) config on a CPU mesh resolves to the conservative
    paths without touching the TPU backend."""
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train import TeacherTrainer

    clip_cfg = CLIPConfig.tiny_test()
    clip = CLIPModule(clip_cfg)
    variables = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, clip_cfg.text.max_length), jnp.int32),
        jnp.zeros((1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3)),
    )
    tcfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim, num_heads=4,
        max_patches=3, max_text_tokens=clip_cfg.text.max_length,
    )
    cfg = TeacherTrainConfig(teacher=tcfg, clip_model="tiny")
    assert cfg.compute_dtype == "auto" and cfg.use_pallas is None
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    trainer = TeacherTrainer(cfg, variables, clip_cfg, mesh=mesh)
    assert trainer.cfg.compute_dtype == "float32"
    assert trainer.cfg.use_pallas is False
    assert trainer.cfg.compact_patches is False


def test_pallas_probe_watchdog(monkeypatch, tmp_path):
    """A hung remote Pallas compile must not wedge trainer construction:
    the probe runs under a deadline and falls back to the XLA paths."""
    import time

    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)
    monkeypatch.setenv("DCLIP_COMPILE_CACHE", str(tmp_path))  # fresh memo
    monkeypatch.setenv("DCLIP_PALLAS_PROBE_TIMEOUT", "0.2")
    monkeypatch.setattr(
        kernels_pkg, "_pallas_probe_once", lambda: time.sleep(30) or True
    )
    t0 = time.perf_counter()
    assert kernels_pkg.pallas_available() is False
    assert time.perf_counter() - t0 < 5.0
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)


def test_pallas_probe_clean_failure_retries(monkeypatch, tmp_path):
    monkeypatch.setenv("DCLIP_COMPILE_CACHE", str(tmp_path))  # fresh memo
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("HTTP 500")
        return True

    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)
    monkeypatch.setattr(kernels_pkg, "_pallas_probe_once", flaky)
    assert kernels_pkg.pallas_available() is True
    assert len(calls) == 2
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)


def test_analytic_flops_accounting():
    """Pin the MFU arithmetic (core.flops) against hand calculations."""
    from dclip_tpu.core.flops import (
        distill_step_flops,
        mfu,
        text_forward_flops,
        vision_forward_flops,
    )

    cfg = CLIPConfig.vit_b_16()
    # ViT-B/16: S=197, D=768, mlp=3072, 12 layers -> ~35 GFLOPs/image.
    v = vision_forward_flops(cfg)
    s, d, m = 197, 768, 3072
    per_layer = 8 * s * d * d + 4 * s * s * d + 4 * s * d * m
    expected = 2 * 196 * (3 * 16 * 16) * d + 12 * per_layer + 2 * d * 512
    assert v == expected
    assert 30e9 < v < 40e9
    t = text_forward_flops(cfg)
    assert 4e9 < t < 8e9  # 77-token 512-wide stack
    tc = TeacherConfig(embed_dim=512, num_heads=8, max_patches=8)
    step = distill_step_flops(cfg, cfg, tc, batch=64)
    # 8 crop forwards + text + cross-attn + 3x student fwd per image.
    per_image = step / 64
    assert 8 * v < per_image < 8 * v + 4 * (v + t)
    assert mfu(197e12, "tpu", "bfloat16") == pytest.approx(1.0)
    assert mfu(1.0, "gpu", "float32") is None

    # Mask-aware "model FLOPs": vision fwd + dX (minus dead patch-embed)
    # + attention-projection dW only; text at the standard 3x.
    from dclip_tpu.core.flops import student_step_flops_masked

    masked = student_step_flops_masked(cfg)
    patch_embed = 2 * 196 * (3 * 16 * 16) * d
    attn_dw = 12 * 8 * s * d * d + 2 * d * 512
    assert masked == pytest.approx(2 * v - patch_embed + attn_dw + 3 * t)
    # Strictly below the conventional 3x-everything count, but still the
    # majority of it (the frozen part is the vision MLP dW + embeddings).
    assert 0.7 * 3 * (v + t) < masked < 3 * (v + t)
    step_true = distill_step_flops(cfg, cfg, tc, batch=64, reference_mask=True)
    assert step_true < step
    assert step_true / 64 == pytest.approx(step / 64 - 3 * (v + t) + masked)


def test_pallas_probe_memoized_across_processes(monkeypatch, tmp_path):
    """The probe verdict persists on disk with a TTL, so fresh processes
    skip the deadline wait while the compile service is known-wedged."""
    monkeypatch.setenv("DCLIP_COMPILE_CACHE", str(tmp_path))
    calls = []
    monkeypatch.setattr(
        kernels_pkg, "_pallas_probe_once", lambda: calls.append(1) or True
    )
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)
    assert kernels_pkg.pallas_available() is True
    assert len(calls) == 1
    # Simulate a new process: in-memory memo cleared, disk memo serves.
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)
    assert kernels_pkg.pallas_available() is True
    assert len(calls) == 1  # no second probe
    monkeypatch.delitem(kernels_pkg._PALLAS_OK, "ok", raising=False)


def test_persistent_cache_skips_cpu_backends(monkeypatch, tmp_path):
    """The executable cache must engage per COMPILE backend: jax memoizes
    enablement process-globally, so a TPU-default process would otherwise
    cache/replay CPU executables — which abort on replay in this jax build
    (core/cache.py docstring). The guard no-ops get/put for non-TPU
    backends."""
    import glob

    import jax
    import jax.numpy as jnp

    from dclip_tpu.core import cache as cache_mod

    monkeypatch.setattr(cache_mod, "_ENABLED", {})
    monkeypatch.setenv("DCLIP_COMPILE_CACHE", str(tmp_path))
    monkeypatch.delenv("DCLIP_NO_COMPILE_CACHE", raising=False)
    # Force the enable path regardless of the host's default device.
    from dclip_tpu.core import platform as plat

    monkeypatch.setattr(plat, "default_is_tpu", lambda: True)
    assert cache_mod.enable_persistent_compilation_cache() == str(tmp_path)

    from jax._src import compilation_cache as cc

    assert getattr(cc, "_dclip_tpu_only", False)

    class FakeCpuBackend:
        platform = "cpu"

    # Direct-level check (no real TPU here): puts/gets for a CPU backend
    # never reach the disk cache.
    assert cc.get_executable_and_time("k", None, FakeCpuBackend(), None) == (
        None, None,
    )
    assert cc.put_executable_and_time("k", "m", None, FakeCpuBackend(), 10) is None
    assert glob.glob(str(tmp_path) + "/*") == []

    # And a real CPU jit in this (cache-enabled) process leaves no entry.
    with jax.default_device(jax.devices("cpu")[0]):
        jax.jit(lambda a: (a @ a).sum())(jnp.ones((32, 32))).block_until_ready()
    assert glob.glob(str(tmp_path) + "/*") == []

"""Analytic FLOPs accounting for MFU reporting.

The north star (BASELINE.json) is distillation images/sec/chip at MXU
speed-of-light on v5e; MFU = achieved matmul FLOP/s over the chip's peak.
Counts matmul FLOPs only (2*M*N*K per GEMM) — elementwise/softmax work is
bandwidth- not FLOP-bound on TPU and XLA fuses it into the GEMMs' epilogues.
"""
from __future__ import annotations

from dclip_tpu.core.config import CLIPConfig, TeacherConfig

# Peak dense matmul throughput per chip, FLOP/s.
PEAK_FLOPS = {
    # TPU v5e (v5 lite): 197 TFLOP/s bf16, 99 TFLOP/s fp32 (public spec).
    ("tpu", "bfloat16"): 197e12,
    ("tpu", "float32"): 99e12,
}


def vision_forward_flops(cfg: CLIPConfig, image_size: int | None = None) -> float:
    """One ViT image-encoder forward, per image."""
    v = cfg.vision
    size = image_size or v.image_size
    s = (size // v.patch_size) ** 2 + 1  # patches + CLS
    d, mlp = v.hidden_size, v.mlp_dim
    patch_embed = 2 * (s - 1) * (3 * v.patch_size**2) * d
    per_layer = (
        4 * 2 * s * d * d  # QKV + output projections
        + 2 * 2 * s * s * d  # QK^T and PV
        + 2 * 2 * s * d * mlp  # MLP in + out
    )
    proj = 2 * d * cfg.projection_dim
    return patch_embed + v.num_layers * per_layer + proj


def text_forward_flops(cfg: CLIPConfig) -> float:
    """One text-encoder forward, per caption."""
    t = cfg.text
    s = t.max_length
    d, mlp = t.hidden_size, t.mlp_dim
    per_layer = 4 * 2 * s * d * d + 2 * 2 * s * s * d + 2 * 2 * s * d * mlp
    proj = 2 * d * cfg.projection_dim
    return t.num_layers * per_layer + proj


def cross_attention_flops(tcfg: TeacherConfig) -> float:
    """Bidirectional cross-attention, per example (kernels/cross_attention)."""
    d, t, p = tcfg.embed_dim, tcfg.max_text_tokens, tcfg.max_patches
    return 2 * (4 * 2 * (t + p) * d * d / 2 + 2 * 2 * t * p * d)


def distill_step_flops(
    student_cfg: CLIPConfig,
    teacher_cfg: CLIPConfig,
    tcfg: TeacherConfig,
    batch: int,
    n_crops: int | None = None,
    teacher_image_size: int | None = None,
    teacher_cached: bool = False,
) -> float:
    """One distillation training step (batch total).

    Teacher side (frozen, forward only): n_crops region ViT forwards +
    one token-level text forward + cross-attention, per image — skipped
    entirely when `teacher_cached` (the cross-epoch target cache).
    Student side: image+text forward plus backward at 2x forward.
    """
    crops = tcfg.max_patches if n_crops is None else n_crops
    teacher = 0.0
    if not teacher_cached:
        teacher = (
            crops * vision_forward_flops(teacher_cfg, teacher_image_size)
            + text_forward_flops(teacher_cfg)
            + cross_attention_flops(tcfg)
        )
    student_fwd = vision_forward_flops(student_cfg) + text_forward_flops(student_cfg)
    return batch * (teacher + 3.0 * student_fwd)


def mfu(flops_per_sec: float, platform: str, dtype: str) -> float | None:
    from dclip_tpu.core.platform import is_tpu_platform

    if is_tpu_platform(platform):
        platform = "tpu"
    peak = PEAK_FLOPS.get((platform, dtype))
    return None if peak is None else flops_per_sec / peak

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


def student_step_flops_masked(cfg: CLIPConfig, text_scale: float = 1.0) -> float:
    """Per-image student fwd+bwd under the DEFAULT trainable mask — the
    "model FLOPs" (PaLM-style MFU) convention: only GEMMs the algorithm
    actually requires.

    The default mask (optim.student_trainable_mask, the reference's
    effective :504-506 behavior) trains the vision ATTENTION projections +
    visual_projection and the whole text tower; vision MLP / embeddings /
    LayerNorms are frozen. Consequences counted here:
      - vision: forward + full dX chain (gradients must reach layer-0
        attention), but dW only for the 4 attention projections per layer
        and the final projection; the frozen-MLP Pallas pair emits zero
        weight cotangents by construction, and patch-embed dX/dW are dead
        (no trainable leaf below them).
      - text: trainable end to end -> the standard 3x forward (the dW of
        the attention-score matmuls doesn't exist; the ~2% it overcounts
        is noise against the vision tower).
    """
    v = cfg.vision
    s = (v.image_size // v.patch_size) ** 2 + 1
    d = v.hidden_size
    patch_embed = 2 * (s - 1) * (3 * v.patch_size**2) * d
    vision_fwd = vision_forward_flops(cfg)
    attn_dw = v.num_layers * 4 * 2 * s * d * d + 2 * d * cfg.projection_dim
    vision = vision_fwd + (vision_fwd - patch_embed) + attn_dw
    # text_scale < 1: caption sequence packing (ops/packing.py) encodes
    # R < B rows of max_length — per-image text GEMM work shrinks to R/B.
    return vision + 3.0 * text_forward_flops(cfg) * text_scale


def distill_step_flops(
    student_cfg: CLIPConfig,
    teacher_cfg: CLIPConfig,
    tcfg: TeacherConfig,
    batch: int,
    n_crops: int | None = None,
    teacher_image_size: int | None = None,
    teacher_cached: bool = False,
    reference_mask: bool = False,
    text_rows_fraction: float = 1.0,
) -> float:
    """One distillation training step (batch total).

    Teacher side (frozen, forward only): n_crops region ViT forwards +
    one token-level text forward + cross-attention, per image — skipped
    entirely when `teacher_cached` (the cross-epoch target cache).
    Student side: image+text forward plus backward at 2x forward; with
    `reference_mask=True`, the backward counts only the GEMMs the default
    trainable mask requires (student_step_flops_masked) — the honest
    "model FLOPs" MFU denominator for the default configuration.
    `text_rows_fraction` = packed rows / batch when caption packing is on
    (ops/packing.py): the student text tower genuinely executes that
    fraction of its padded GEMM work, so the MFU denominator must shrink
    with it (otherwise packing would inflate MFU by counting padding
    FLOPs it no longer runs).
    """
    crops = tcfg.max_patches if n_crops is None else n_crops
    teacher = 0.0
    if not teacher_cached:
        teacher = (
            crops * vision_forward_flops(teacher_cfg, teacher_image_size)
            + text_forward_flops(teacher_cfg)
            + cross_attention_flops(tcfg)
        )
    if reference_mask:
        student = student_step_flops_masked(
            student_cfg, text_scale=text_rows_fraction
        )
    else:
        student = 3.0 * (
            vision_forward_flops(student_cfg)
            + text_forward_flops(student_cfg) * text_rows_fraction
        )
    return batch * (teacher + student)


def mfu(flops_per_sec: float, platform: str, dtype: str) -> float | None:
    from dclip_tpu.core.platform import is_tpu_platform

    if is_tpu_platform(platform):
        platform = "tpu"
    peak = PEAK_FLOPS.get((platform, dtype))
    return None if peak is None else flops_per_sec / peak

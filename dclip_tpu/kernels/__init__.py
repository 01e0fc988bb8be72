"""Pallas TPU kernels for the hot paths (north-star items in BASELINE.json).

Each kernel has an XLA reference twin in `dclip_tpu.ops` / `dclip_tpu.models`
and is parity-tested against it (interpret mode on CPU, compiled on TPU).
"""
from dclip_tpu.kernels.cross_attention import (
    cross_attention_fused,
    cross_attention_trainable,
)
from dclip_tpu.kernels.topk import topk_streamed
from dclip_tpu.kernels.distill_loss import (
    MAX_FUSED_BATCH,
    fused_distillation_loss,
    make_fused_distillation_loss,
)

__all__ = [
    "cross_attention_fused",
    "cross_attention_trainable",
    "fused_distillation_loss",
    "make_fused_distillation_loss",
    "MAX_FUSED_BATCH",
    "topk_streamed",
]

"""Flax model zoo: CLIP dual encoders, cross-modal teacher, projection MLPs."""
from dclip_tpu.models.clip import (
    CLIPModule,
    CLIPTextEncoder,
    CLIPVisionEncoder,
)
from dclip_tpu.models.cross_modal import (
    CrossModalAttention,
    MultiheadCrossAttention,
    import_torch_cross_modal,
)
from dclip_tpu.models.hf_import import convert_state_dict, load_pretrained
from dclip_tpu.models.projections import ImageProjectionModule, TextProjectionModule
from dclip_tpu.models.teacher import (
    PatchTextAggregation,
    TeacherOutput,
    encode_patches,
    encode_tokens,
    import_torch_teacher,
)

__all__ = [
    "CLIPModule",
    "CLIPTextEncoder",
    "CLIPVisionEncoder",
    "CrossModalAttention",
    "MultiheadCrossAttention",
    "import_torch_cross_modal",
    "convert_state_dict",
    "load_pretrained",
    "ImageProjectionModule",
    "TextProjectionModule",
    "PatchTextAggregation",
    "TeacherOutput",
    "encode_patches",
    "encode_tokens",
    "import_torch_teacher",
]

"""The meta-teacher: PatchTextAggregation, TPU-native.

Reference: `PatchTextAggregation` (training/patch_text_aggregation.py:49-656).
The reference's `compute_global_embedding_batch` (:268-656) is a per-image,
per-box Python loop that crops patches with PIL, embeds them one at a time
(with a pickle/dbm cache and a FAISS k-NN gate), pads to the batch max, and
only then does math. Here the whole forward is three fixed-shape stages:

  1. `encode_patches` — all B*P region crops -> one fused device
     crop-resize-normalize (`dclip_tpu.ops.image_ops`) -> ONE batched CLIP
     vision forward (replaces image_tokenizer.py:86-124 and the per-patch
     loop at patch_text_aggregation.py:308-486). Optionally routed through
     the k-NN/projection gate (`dclip_tpu.ops.knn`).
  2. `encode_tokens` — token-level CLIP text features: `text_projection`
     applied to every last-hidden-state token, skipping BOS/EOS/pad
     (replaces text_tokenizer.py:171-216).
  3. `PatchTextAggregation.__call__` — bidirectional cross-attention,
     temperature-softmax aggregation of both streams, 0.5/0.5 fusion
     (patch_text_aggregation.py:632-647).

Everything jits once; padded slots are inert via masks (`mask_padding=True`,
the TPU-correct behavior) or participate like the reference's zero-padding
(`mask_padding=False`, for bit-parity testing).

Dormant-by-parity: `ops.aggregation.best_text_similarity` / `patch_weights`
are implemented and tested but NOT on any compiled path here, mirroring the
reference, whose `compute_patch_text_similarity` / `compute_image_patch_weight`
(patch_text_aggregation.py:126-204) are likewise never reached from
`compute_global_embedding_batch` — the fused global uses only the
temperature aggregation + 0.5/0.5 fusion above.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dclip_tpu.core.config import TeacherConfig
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.cross_modal import CrossModalAttention, import_torch_cross_modal
from dclip_tpu.ops.aggregation import fuse_global, temperature_aggregate
from dclip_tpu.ops.image_ops import batch_crop_resize_normalize


class TeacherOutput(NamedTuple):
    global_embedding: jnp.ndarray  # [B, D] fused teacher target
    text_global: jnp.ndarray  # [B, D]
    image_global: jnp.ndarray  # [B, D]
    attended_text: jnp.ndarray  # [B, T, D]
    attended_image: jnp.ndarray  # [B, P, D]


class PatchTextAggregation(nn.Module):
    """Cross-attention fusion head over patch + token embeddings."""

    cfg: TeacherConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_embeddings: jnp.ndarray,  # [B, T, D]
        patch_embeddings: jnp.ndarray,  # [B, P, D]
        text_mask: Optional[jnp.ndarray] = None,  # [B, T], 1 = valid
        patch_mask: Optional[jnp.ndarray] = None,  # [B, P], 1 = valid
    ) -> TeacherOutput:
        c = self.cfg
        use_masks = c.mask_padding
        tm = text_mask if use_masks else None
        pm = patch_mask if use_masks else None
        attended_text, attended_image = CrossModalAttention(
            c.embed_dim, c.num_heads, self.dtype, name="cross_modal_attention"
        )(text_embeddings, patch_embeddings, text_mask=tm, image_mask=pm)
        return aggregate_attended(
            c, attended_text, attended_image, text_mask, patch_mask
        )


def aggregate_attended(
    cfg: TeacherConfig,
    attended_text: jnp.ndarray,
    attended_image: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    patch_mask: Optional[jnp.ndarray],
) -> TeacherOutput:
    """Aggregation + fusion stage of the teacher, shared by the Flax module
    and the Pallas-kernel path (kernels.cross_attention_fused computes the
    attended streams; this completes patch_text_aggregation.py:640-647)."""
    tm = text_mask if cfg.mask_padding else None
    pm = patch_mask if cfg.mask_padding else None
    text_global = temperature_aggregate(
        attended_text, cfg.aggregation_temperature, mask=tm
    )
    image_global = temperature_aggregate(
        attended_image, cfg.aggregation_temperature, mask=pm
    )
    return TeacherOutput(
        global_embedding=fuse_global(text_global, image_global, cfg.fusion_alpha),
        text_global=text_global,
        image_global=image_global,
        attended_text=attended_text,
        attended_image=attended_image,
    )


def encode_patches(
    clip_model: CLIPModule,
    clip_variables: Dict[str, Any],
    images: jnp.ndarray,  # [B, H, W, 3] in [0, 1], NHWC
    boxes: jnp.ndarray,  # [B, P, 4] xyxy pixel coords
    patch_mask: jnp.ndarray,  # [B, P], 1 = valid box
    patch_size: int = 224,
    image_features_fn=None,
) -> jnp.ndarray:
    """All region crops -> CLIP patch embeddings in one batched forward.

    Returns [B, P, projection_dim]; invalid slots are zeroed (the reference's
    zero-tensor fallback, patch_text_aggregation.py:506, made explicit).

    `image_features_fn(variables, pixels) -> [N, D]` overrides the module
    forward (e.g. the fused-block frozen path,
    kernels.vit_block.fused_image_features).
    """
    b, p = boxes.shape[:2]
    patches = batch_crop_resize_normalize(images, boxes, patch_size)
    flat = patches.reshape(b * p, patch_size, patch_size, 3)
    if image_features_fn is not None:
        emb = image_features_fn(clip_variables, flat).reshape(b, p, -1)
    else:
        emb = clip_model.apply(
            clip_variables, flat, method=clip_model.get_image_features
        ).reshape(b, p, -1)
    return emb * patch_mask[..., None]


def encode_patches_with_context(
    clip_model: CLIPModule,
    clip_variables: Dict[str, Any],
    images: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    boxes: jnp.ndarray,  # [B, P, 4]
    patch_mask: jnp.ndarray,  # [B, P]
    patch_size: int = 224,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(patch_embeddings, context_embeddings), both [B, P, D].

    The context view is the full frame with the box region blacked out
    (reference encode_bounding_boxes_with_context,
    image_tokenizer.py:126-164), squash-resized and encoded in the same
    batched forward style as the patch view.
    """
    import jax.image

    from dclip_tpu.ops.image_ops import black_out_boxes, normalize

    b, p = boxes.shape[:2]
    patch_emb = encode_patches(
        clip_model, clip_variables, images, boxes, patch_mask, patch_size
    )
    context = black_out_boxes(images, boxes)  # [B, P, H, W, 3]
    flat = context.reshape((b * p,) + context.shape[2:])
    flat = jax.image.resize(
        flat, (b * p, patch_size, patch_size, 3), "bilinear"
    )
    ctx_emb = clip_model.apply(
        clip_variables, normalize(flat), method=clip_model.get_image_features
    ).reshape(b, p, -1)
    return patch_emb, ctx_emb * patch_mask[..., None]


def encode_patches_compact(
    clip_model: CLIPModule,
    clip_variables: Dict[str, Any],
    images: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    boxes: jnp.ndarray,  # [B, P, 4]
    patch_mask: jnp.ndarray,  # [B, P]
    patch_size: int = 224,
    budget: int = 0,
    image_features_fn=None,
) -> jnp.ndarray:
    """`encode_patches` that runs the ViT over only `budget` patch slots.

    Real batches rarely fill every [B, P] slot (detections average well
    below max_patches); the dense version burns a full ViT forward per
    padded slot. Here valid slots are gathered to the front (stable
    argsort on the mask), exactly `budget` crops are encoded, and results
    scatter back into the zero-padded [B, P, D] layout. Bitwise-equal to
    `encode_patches` whenever budget >= valid count (tests pin this).

    `budget` must be static (callers pick from a small bucket set so at
    most a handful of variants compile).
    """
    from dclip_tpu.ops.image_ops import crop_resize, normalize

    b, p = boxes.shape[:2]
    if budget <= 0 or budget >= b * p:
        return encode_patches(
            clip_model, clip_variables, images, boxes, patch_mask, patch_size,
            image_features_fn,
        )
    flat_mask = patch_mask.reshape(-1)
    order = jnp.argsort(-flat_mask)  # valid slots first, stable
    sel = order[:budget]
    img_idx = sel // p
    sel_boxes = boxes.reshape(-1, 4)[sel]
    crops = jax.vmap(crop_resize, in_axes=(0, 0, None))(
        images[img_idx], sel_boxes, patch_size
    )
    if image_features_fn is not None:
        emb = image_features_fn(clip_variables, normalize(crops))
    else:
        emb = clip_model.apply(
            clip_variables, normalize(crops), method=clip_model.get_image_features
        )
    d = emb.shape[-1]
    emb = emb * flat_mask[sel][:, None]
    out = jnp.zeros((b * p, d), emb.dtype).at[sel].set(emb)
    return out.reshape(b, p, d)


def patch_budget(valid_count: int, total_slots: int, n_buckets: int = 4) -> int:
    """Smallest bucket (multiples of total/n_buckets) covering valid_count.

    Bounded bucket set -> bounded recompiles; returns total_slots when the
    batch is full (dense path)."""
    step = max(total_slots // n_buckets, 1)
    bucket = ((max(valid_count, 1) + step - 1) // step) * step
    return min(bucket, total_slots)


def encode_tokens(
    clip_model: CLIPModule,
    clip_variables: Dict[str, Any],
    input_ids: jnp.ndarray,  # [B, 77]
    attention_mask: jnp.ndarray,  # [B, 77]
    eos_token_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token-level text features + the content-token mask.

    Reference text_tokenizer.py:195-213: project every last-hidden-state
    token with `text_projection`, keeping only content tokens (not BOS, not
    EOS, not padding). Returns (token_features [B, 77, D], token_mask [B, 77]).
    """
    token_feats, _ = clip_model.apply(
        clip_variables,
        input_ids,
        attention_mask,
        method=clip_model.get_token_features,
    )
    t = input_ids.shape[1]
    is_bos = jnp.arange(t)[None, :] == 0
    is_eos = input_ids == eos_token_id
    token_mask = (attention_mask > 0) & ~is_bos & ~is_eos
    token_mask = token_mask.astype(jnp.float32)
    return token_feats * token_mask[..., None], token_mask


def import_torch_teacher(sd, prefix: str = "cross_modal_attention") -> dict:
    """Convert a reference teacher checkpoint state_dict to Flax params.

    The reference teacher trains only `cross_modal_attention.*`
    (train_contrastive_teacher.py:125-134); its checkpoints are full
    state_dicts (`torch.save(teacher.state_dict())`, :393-402) whose only
    learnable keys live under this prefix.
    """
    sub = {
        k[len(prefix) + 1 :]: v for k, v in sd.items() if k.startswith(prefix + ".")
    }
    return {"cross_modal_attention": import_torch_cross_modal(sub)}

"""Device-side image ops: fused crop-resize-normalize for region patches.

TPU-native replacement for the reference's per-box PIL crop + torchvision
transform loop (training/image_tokenizer.py:99-109: `image.crop(box)` then
squash-resize to 224x224 and CLIP-normalize, one Python iteration per box).
Here all B*P crops are one fixed-shape bilinear gather, jitted, feeding the
batched ViT forward directly — no host round-trip per box.

Also carries the CLIP preprocessing constants used everywhere in the
reference (e.g. eval_scripts/test_zero_shot_ImageNet.py:68-70).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# OpenAI CLIP normalization constants (reference test_zero_shot_ImageNet.py:68-70).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] in [0, 1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, images.dtype)
    std = jnp.asarray(CLIP_STD, images.dtype)
    return (images - mean) / std


def crop_resize(
    image: jnp.ndarray, box: jnp.ndarray, out_size: int = 224
) -> jnp.ndarray:
    """Crop box (xyxy, pixel coords) from [H, W, C] and squash-resize.

    Matches the reference's `image.crop(box)` + `Resize((224, 224))`
    (aspect-squashing, not aspect-preserving — image_tokenizer.py:104-107).
    Uses an antialiased triangle (bilinear) filter like PIL/torchvision, via
    `jax.image.scale_and_translate` — crop+resize fuse into a single
    resampling of the source image, so the box coords can be traced values.
    """
    x1, y1, x2, y2 = (box[i].astype(jnp.float32) for i in range(4))
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    sy = out_size / bh
    sx = out_size / bw
    # Output coord y maps to input coord (y + 0.5 - t) / s; choosing
    # t = -x1 * s puts output pixel centers at x1 + (j + 0.5) * bw / out.
    return jax.image.scale_and_translate(
        image.astype(jnp.float32),
        (out_size, out_size, image.shape[2]),
        spatial_dims=(0, 1),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack([-y1 * sy, -x1 * sx]),
        method="linear",
        antialias=True,
    )


def batch_crop_resize_normalize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 224,
) -> jnp.ndarray:
    """All crops in one shot: images [B, H, W, 3] in [0,1], boxes [B, P, 4]
    -> CLIP-normalized patches [B, P, out, out, 3].

    Invalid (masked) boxes may be all-zero; they produce a defined (top-left
    pixel) patch — callers mask downstream, mirroring the reference's
    zero-tensor fallbacks but with explicit validity masks.
    """
    per_image = jax.vmap(crop_resize, in_axes=(None, 0, None))
    patches = jax.vmap(per_image, in_axes=(0, 0, None))(images, boxes, out_size)
    return normalize(patches)


def black_out_boxes(
    images: jnp.ndarray, boxes: jnp.ndarray
) -> jnp.ndarray:
    """Zero the box region of each image: the "context" view.

    images [B, H, W, C], boxes [B, P, 4] xyxy -> [B, P, H, W, C] where
    view (b, p) is image b with box p blacked out (reference
    `encode_bounding_boxes_with_context`, image_tokenizer.py:126-164:
    context = image with the cropped region removed).
    """
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, None, :]  # [1, 1, H]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = (boxes[..., i][..., None] for i in range(4))  # [B, P, 1]
    in_y = (ys >= y1) & (ys < y2)  # [B, P, H]
    in_x = (xs >= x1) & (xs < x2)  # [B, P, W]
    inside = in_y[:, :, :, None] & in_x[:, :, None, :]  # [B, P, H, W]
    return jnp.where(inside[..., None], 0.0, images[:, None])


def resize_center_crop(image: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """CLIPProcessor-style eval preprocessing on device: resize shortest
    side to `size` (bilinear) then center-crop `size`x`size`.

    The host pipeline uses PIL bicubic for bit-parity with HF preprocessing;
    this device path is the high-throughput variant for training/benching.
    """
    h, w = image.shape[0], image.shape[1]
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(image, (nh, nw, image.shape[2]), "bilinear")
    top = (nh - size) // 2
    left = (nw - size) // 2
    return jax.lax.dynamic_slice(resized, (top, left, 0), (size, size, image.shape[2]))

"""Native Flax detector: the pure-TPU YOLO path (SURVEY.md §7 "stretch").

The reference depends on ultralytics YOLOv8x/YOLOv5s torch checkpoints as a
frozen region-proposal source (image_tokenizer.py:23, compute_faiss.py:18),
mediated by an offline cache. `dclip_tpu.data.detection_cache` already
replaces the cache contract with a pluggable `detect_fn`; this module makes
the detector itself TPU-native so the whole pipeline can run without torch:

- anchor-free YOLOv8-class architecture: CSP backbone (C2f blocks + SPPF),
  PAN neck, decoupled heads at strides 8/16/32 with DFL box regression;
- fully static shapes: decode + class-aware NMS (dclip_tpu.ops.nms) run on
  device inside one jit, returning a padded [K] detection set per image;
- `as_detect_fn()` adapts a trained/imported checkpoint to the
  DetectionCache builder contract ((xyxy, conf) in source-image pixels).

Weights: train from scratch (`models.detector_loss`) or import real
ultralytics YOLOv8 checkpoints via `models.detector_import`
(name mapping + OIHW->HWIO transposes + BN statistics routing; presets
`DetectorConfig.v8n()..v8x()` match the ultralytics scale table including
the max-channels P5 cap and the Detect-head hidden widths). The weights
themselves are not bundled (zero-egress).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.ops.nms import batched_class_nms


@dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = 80
    image_size: int = 640  # must be divisible by 32
    width: int = 16  # base channel count (v8n=16, v8s=32, v8x=80)
    depth: int = 1  # C2f bottleneck count multiplier
    reg_max: int = 16  # DFL bins
    max_detections: int = 32
    iou_threshold: float = 0.45
    score_threshold: float = 0.25
    pre_nms_topk: int = 256
    # P5-stage channels. Ultralytics caps wide variants (`max_channels` in
    # the v8 scale table): n/s keep 16*width; m=576, l=512, x=640. None ->
    # 16*width.
    p5_ch: int | None = None

    @property
    def p5(self) -> int:
        return self.p5_ch if self.p5_ch is not None else 16 * self.width

    # Detect-head hidden widths, ultralytics formulas (modules/head.py
    # Detect.__init__): shared across scales, derived from the FIRST
    # scale's channels ch[0] = 4*width.
    @property
    def head_box_ch(self) -> int:
        return max(16, (4 * self.width) // 4, 4 * self.reg_max)

    @property
    def head_cls_ch(self) -> int:
        return max(4 * self.width, min(self.num_classes, 100))

    @staticmethod
    def v8n() -> "DetectorConfig":
        return DetectorConfig(width=16, depth=1)

    @staticmethod
    def v8s() -> "DetectorConfig":
        return DetectorConfig(width=32, depth=1)

    @staticmethod
    def v8m() -> "DetectorConfig":
        return DetectorConfig(width=48, depth=2, p5_ch=576)

    @staticmethod
    def v8l() -> "DetectorConfig":
        return DetectorConfig(width=64, depth=3, p5_ch=512)

    @staticmethod
    def v8x() -> "DetectorConfig":
        """YOLOv8x — the reference's proposal source (image_tokenizer.py:23)."""
        return DetectorConfig(width=80, depth=3, p5_ch=640)


class ConvBNAct(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Explicit symmetric k//2 padding (ultralytics Conv autopad): XLA's
        # "SAME" puts the extra pad at the END for stride 2, torch pads both
        # sides — checkpoint import needs bit-identical window placement.
        pad = self.kernel // 2
        x = nn.Conv(
            self.ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            name="conv",
        )(x)
        # eps/momentum follow ultralytics' BatchNorm2d(eps=1e-3,
        # momentum=0.03) (torch momentum 0.03 == flax momentum 0.97).
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=1e-3,
            momentum=0.97,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.ch, 3, name="cv1")(x, train)
        y = ConvBNAct(self.ch, 3, name="cv2")(y, train)
        return x + y if self.shortcut else y


class C2f(nn.Module):
    """CSP bottleneck with two convs and n inner bottlenecks (YOLOv8)."""

    ch: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.ch // 2
        y = ConvBNAct(self.ch, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for i in range(self.n):
            b = Bottleneck(hidden, self.shortcut, name=f"m{i}")(b, train)
            outs.append(b)
        return ConvBNAct(self.ch, 1, name="cv2")(
            jnp.concatenate(outs, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 stacked 5x5 max-pools."""

    ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(self.ch // 2, 1, name="cv1")(x, train)
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(pools[-1], (5, 5), strides=(1, 1), padding="SAME")
            )
        return ConvBNAct(self.ch, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class FlaxYOLO(nn.Module):
    """Anchor-free detector returning raw per-scale predictions."""

    cfg: DetectorConfig

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """images [B, S, S, 3] in [0,1] -> per-scale (box_logits, cls_logits)
        with box_logits [B, Hs, Ws, 4*reg_max], cls_logits [B, Hs, Ws, nc]."""
        c = self.cfg
        w, d, p5c = c.width, c.depth, c.p5
        x = ConvBNAct(w, 3, 2, name="stem")(images, train)  # /2
        x = ConvBNAct(2 * w, 3, 2, name="down1")(x, train)  # /4
        x = C2f(2 * w, d, name="c2f1")(x, train)
        x = ConvBNAct(4 * w, 3, 2, name="down2")(x, train)  # /8
        p3 = C2f(4 * w, 2 * d, name="c2f2")(x, train)
        x = ConvBNAct(8 * w, 3, 2, name="down3")(p3, train)  # /16
        p4 = C2f(8 * w, 2 * d, name="c2f3")(x, train)
        x = ConvBNAct(p5c, 3, 2, name="down4")(p4, train)  # /32
        x = C2f(p5c, d, name="c2f4")(x, train)
        p5 = SPPF(p5c, name="sppf")(x, train)

        # PAN neck.
        x = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(8 * w, d, shortcut=False, name="neck1")(x, train)
        x = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(4 * w, d, shortcut=False, name="neck2")(x, train)
        x = ConvBNAct(4 * w, 3, 2, name="neck_down1")(n3, train)
        n4 = C2f(8 * w, d, shortcut=False, name="neck3")(
            jnp.concatenate([x, n4], axis=-1), train
        )
        x = ConvBNAct(8 * w, 3, 2, name="neck_down2")(n4, train)
        n5 = C2f(p5c, d, shortcut=False, name="neck4")(
            jnp.concatenate([x, p5], axis=-1), train
        )

        # Decoupled heads, hidden widths shared across scales (ultralytics
        # Detect.__init__ formulas — required for checkpoint import).
        box_ch, cls_ch = c.head_box_ch, c.head_cls_ch
        outs = []
        for i, feat in enumerate((n3, n4, n5)):
            box = ConvBNAct(box_ch, 3, name=f"head_box_a{i}")(feat, train)
            box = ConvBNAct(box_ch, 3, name=f"head_box_b{i}")(box, train)
            box = nn.Conv(4 * c.reg_max, (1, 1), name=f"head_box_out{i}")(box)
            cls = ConvBNAct(cls_ch, 3, name=f"head_cls_a{i}")(feat, train)
            cls = ConvBNAct(cls_ch, 3, name=f"head_cls_b{i}")(cls, train)
            cls = nn.Conv(c.num_classes, (1, 1), name=f"head_cls_out{i}")(cls)
            outs.append((box, cls))
        return outs


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [B, K, 4] xyxy in input pixels
    scores: jnp.ndarray  # [B, K]
    classes: jnp.ndarray  # [B, K] int32
    mask: jnp.ndarray  # [B, K]


def decode_predictions(
    cfg: DetectorConfig,
    outs: List[Tuple[jnp.ndarray, jnp.ndarray]],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-scale logits -> (boxes [B, A, 4] xyxy pixels, scores [B, A, nc]).

    DFL decode: softmax over reg_max bins -> expected l/t/r/b distance in
    stride units from each anchor (grid-cell center), ultralytics semantics.
    """
    all_boxes, all_scores = [], []
    strides = (8, 16, 32)
    for (box_logits, cls_logits), stride in zip(outs, strides):
        b, h, w, _ = box_logits.shape
        bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
        dist = box_logits.reshape(b, h, w, 4, cfg.reg_max)
        dist = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # [B,H,W,4]
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(b, h * w, 4)
        scores = jax.nn.sigmoid(cls_logits).reshape(b, h * w, cfg.num_classes)
        all_boxes.append(boxes)
        all_scores.append(scores)
    return jnp.concatenate(all_boxes, 1), jnp.concatenate(all_scores, 1)


def postprocess(
    cfg: DetectorConfig, boxes: jnp.ndarray, scores: jnp.ndarray
) -> Detections:
    """Top-k candidate filter + class-aware NMS, per image, all on device."""
    cls_score = jnp.max(scores, axis=-1)  # [B, A]
    cls_idx = jnp.argmax(scores, axis=-1)
    k = min(cfg.pre_nms_topk, boxes.shape[1])
    top_scores, top = jax.lax.top_k(cls_score, k)

    def one(boxes_i, top_i, top_scores_i, cls_i):
        # Clip to the frame (ultralytics clip_boxes contract): DFL decode
        # can place edges up to reg_max*stride outside the image.
        cand_boxes = jnp.clip(boxes_i[top_i], 0.0, float(cfg.image_size))
        cand_cls = cls_i[top_i]
        res = batched_class_nms(
            cand_boxes,
            top_scores_i,
            cand_cls,
            cfg.iou_threshold,
            cfg.score_threshold,
            cfg.max_detections,
            # Offset must exceed any clipped coordinate or classes collide.
            class_offset=float(cfg.image_size) + 512.0,
        )
        safe = jnp.maximum(res.indices, 0)
        return res.boxes, res.scores, cand_cls[safe] * res.mask.astype(
            cand_cls.dtype
        ), res.mask

    b_boxes, b_scores, b_cls, b_mask = jax.vmap(one)(
        boxes, top, top_scores, cls_idx
    )
    return Detections(b_boxes, b_scores, b_cls.astype(jnp.int32), b_mask)


class Detector:
    """Jitted end-to-end detector + the DetectionCache `detect_fn` adapter."""

    def __init__(self, cfg: DetectorConfig, variables: Dict[str, Any]):
        self.cfg = cfg
        self.model = FlaxYOLO(cfg)
        # Device-commit once: importer variables are host numpy, and jit
        # re-transfers numpy args on every detect() call.
        self.variables = jax.device_put(variables)

        @jax.jit
        def _detect(variables, images):
            outs = self.model.apply(variables, images)
            boxes, scores = decode_predictions(cfg, outs)
            return postprocess(cfg, boxes, scores)

        self._detect = _detect

    @classmethod
    def initialize(cls, cfg: DetectorConfig, seed: int = 0) -> "Detector":
        model = FlaxYOLO(cfg)
        variables = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )
        return cls(cfg, variables)

    def detect(self, images: jnp.ndarray) -> Detections:
        """images [B, S, S, 3] in [0, 1], S = cfg.image_size."""
        return self._detect(self.variables, images)

    def as_detect_fn(self):
        """(image_rgb_uint8 [H, W, 3]) -> (xyxy [N,4] source pixels, conf [N])
        — the dclip_tpu.data.detection_cache plugin contract."""
        s = self.cfg.image_size

        def detect_fn(image: np.ndarray):
            h, w = image.shape[:2]
            from PIL import Image

            resized = np.asarray(
                Image.fromarray(image).resize((s, s), Image.BILINEAR),
                np.float32,
            ) / 255.0
            det = self.detect(jnp.asarray(resized[None]))
            mask = np.asarray(det.mask[0]) > 0
            boxes = np.asarray(det.boxes[0])[mask]
            conf = np.asarray(det.scores[0])[mask]
            # Back to source-image pixels.
            boxes = boxes * np.asarray([w / s, h / s, w / s, h / s], np.float32)
            return boxes.astype(np.float32), conf.astype(np.float32)

        return detect_fn

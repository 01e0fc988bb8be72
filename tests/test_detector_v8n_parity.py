"""Full-model YOLOv8n-geometry parity (VERDICT r3 item 7).

tests/test_detector_import.py pins the import converter block-by-block at
tiny geometry; real `yolov8x.pt` weights are zero-egress-blocked. This
module closes the remaining gap WITHOUT weights: a line-for-line torch
replica of the ultralytics DetectionModel (Conv/C2f/SPPF/Upsample/Concat
routing + decoupled Detect heads, ultralytics module NAMES so the same
state dict loads into both stacks) is compared against the imported
FlaxYOLO at the REAL v8n geometry and the REAL 640 px input — every
stride-2 padding placement, channel split, neck concat order, and head
width that a real checkpoint will exercise.

Architecture source: ultralytics yolov8.yaml + modules/{conv,block,head}.py
as documented in models/detector.py; the reference consumes it at
training/image_tokenizer.py:23.
"""
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.deadline(900)]

import jax.numpy as jnp  # noqa: E402

from dclip_tpu.models.detector import Detector, DetectorConfig, FlaxYOLO  # noqa: E402
from dclip_tpu.models.detector_import import (  # noqa: E402
    convert_ultralytics_state_dict,
    expected_manifest,
    infer_config,
)


def _synthetic_sd(cfg, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for key, shape in expected_manifest(cfg).items():
        if key.endswith("running_var"):
            sd[key] = rng.rand(*shape).astype(np.float32) + 0.5
        else:
            sd[key] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


def _torch_yolo(cfg):
    """Ultralytics DetectionModel replica with matching parameter names
    (model.<idx>.<...>) so the manifest state dict load_state_dict()s in
    with strict=True (minus the frozen DFL arange conv, which FlaxYOLO
    computes in decode_predictions instead)."""
    import torch
    import torch.nn as tnn

    class Conv(tnn.Module):
        def __init__(self, ci, co, k=3, s=1):
            super().__init__()
            self.conv = tnn.Conv2d(ci, co, k, s, k // 2, bias=False)
            self.bn = tnn.BatchNorm2d(co, eps=1e-3, momentum=0.03)

        def forward(self, x):
            y = self.bn(self.conv(x))
            return y * torch.sigmoid(y)

    class Bottleneck(tnn.Module):
        def __init__(self, c, shortcut=True):
            super().__init__()
            self.cv1 = Conv(c, c, 3)
            self.cv2 = Conv(c, c, 3)
            self.add = shortcut

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class C2f(tnn.Module):
        def __init__(self, ci, co, n=1, shortcut=True):
            super().__init__()
            c = co // 2
            self.cv1 = Conv(ci, 2 * c, 1)
            self.cv2 = Conv((2 + n) * c, co, 1)
            self.m = tnn.ModuleList(Bottleneck(c, shortcut) for _ in range(n))

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            for m in self.m:
                y.append(m(y[-1]))
            return self.cv2(torch.cat(y, 1))

    class SPPF(tnn.Module):
        def __init__(self, ci, co):
            super().__init__()
            c = ci // 2
            self.cv1 = Conv(ci, c, 1)
            self.cv2 = Conv(4 * c, co, 1)
            self.m = tnn.MaxPool2d(5, 1, 2)

        def forward(self, x):
            y = [self.cv1(x)]
            for _ in range(3):
                y.append(self.m(y[-1]))
            return self.cv2(torch.cat(y, 1))

    class Detect(tnn.Module):
        def __init__(self, nc, reg_max, box_ch, cls_ch, chs):
            super().__init__()
            self.cv2 = tnn.ModuleList(
                tnn.Sequential(
                    Conv(c, box_ch, 3), Conv(box_ch, box_ch, 3),
                    tnn.Conv2d(box_ch, 4 * reg_max, 1),
                )
                for c in chs
            )
            self.cv3 = tnn.ModuleList(
                tnn.Sequential(
                    Conv(c, cls_ch, 3), Conv(cls_ch, cls_ch, 3),
                    tnn.Conv2d(cls_ch, nc, 1),
                )
                for c in chs
            )

        def forward(self, feats):
            return [
                (self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)
            ]

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            w, d, p5 = cfg.width, cfg.depth, cfg.p5
            self.model = tnn.ModuleList([
                Conv(3, w, 3, 2),            # 0 stem      /2
                Conv(w, 2 * w, 3, 2),        # 1 down1     /4
                C2f(2 * w, 2 * w, d),        # 2
                Conv(2 * w, 4 * w, 3, 2),    # 3 down2     /8
                C2f(4 * w, 4 * w, 2 * d),    # 4 -> P3
                Conv(4 * w, 8 * w, 3, 2),    # 5 down3     /16
                C2f(8 * w, 8 * w, 2 * d),    # 6 -> P4
                Conv(8 * w, p5, 3, 2),       # 7 down4     /32
                C2f(p5, p5, d),              # 8
                SPPF(p5, p5),                # 9 -> P5
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 10
                tnn.Identity(),              # 11 Concat (no params)
                C2f(p5 + 8 * w, 8 * w, d, shortcut=False),     # 12 neck1
                tnn.Upsample(scale_factor=2, mode="nearest"),  # 13
                tnn.Identity(),              # 14 Concat
                C2f(8 * w + 4 * w, 4 * w, d, shortcut=False),  # 15 neck2
                Conv(4 * w, 4 * w, 3, 2),    # 16 neck_down1
                tnn.Identity(),              # 17 Concat
                C2f(4 * w + 8 * w, 8 * w, d, shortcut=False),  # 18 neck3
                Conv(8 * w, 8 * w, 3, 2),    # 19 neck_down2
                tnn.Identity(),              # 20 Concat
                C2f(8 * w + p5, p5, d, shortcut=False),        # 21 neck4
                Detect(cfg.num_classes, cfg.reg_max, cfg.head_box_ch,
                       cfg.head_cls_ch, (4 * w, 8 * w, p5)),   # 22
            ])

        def forward(self, x):
            m = self.model
            x = m[1](m[0](x))
            x = m[2](x)
            p3 = m[4](m[3](x))
            p4 = m[6](m[5](p3))
            p5 = m[9](m[8](m[7](p4)))
            n4 = m[12](torch.cat([m[10](p5), p4], 1))
            n3 = m[15](torch.cat([m[13](n4), p3], 1))
            n4 = m[18](torch.cat([m[16](n3), n4], 1))
            n5 = m[21](torch.cat([m[19](n4), p5], 1))
            return m[22]([n3, n4, n5])

    return Model()


def test_v8n_full_model_parity_at_640():
    """The same synthetic yolov8n state dict, loaded (a) into the torch
    ultralytics replica via load_state_dict with ultralytics names and
    (b) into FlaxYOLO via the import converter, produces the same raw
    per-scale head outputs on a real 640 px input."""
    import torch

    cfg = DetectorConfig.v8n()
    assert (cfg.width, cfg.depth, cfg.p5) == (16, 1, 256)
    sd = _synthetic_sd(cfg, seed=7)

    tmodel = _torch_yolo(cfg)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    # Everything in the manifest must land; torch-side extras must be the
    # BN bookkeeping counters only (num_batches_tracked has no effect in
    # eval mode and is absent from safetensors-style dumps).
    assert unexpected == []
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    tmodel.eval()

    x = np.random.RandomState(1).rand(1, 640, 640, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    variables = convert_ultralytics_state_dict(cfg, sd)
    got = FlaxYOLO(cfg).apply(variables, jnp.asarray(x))

    assert len(got) == 3
    for scale, ((g_box, g_cls), (r_box, r_cls)) in enumerate(zip(got, ref)):
        stride = 8 * 2**scale
        assert g_box.shape == (1, 640 // stride, 640 // stride,
                               4 * cfg.reg_max)
        for ours, theirs, what in ((g_box, r_box, "box"),
                                   (g_cls, r_cls, "cls")):
            t = theirs.numpy().transpose(0, 2, 3, 1)
            o = np.asarray(ours)
            scale_mag = np.abs(t).max() + 1e-9
            assert np.abs(o - t).max() / scale_mag < 3e-4, (
                f"scale {scale} {what}: max rel err "
                f"{np.abs(o - t).max() / scale_mag:.2e}"
            )


def test_v8n_detect_fn_contract_at_real_size():
    """Imported v8n-geometry checkpoint through decode + fixed-shape NMS on
    a non-square source image: the DetectionCache (xyxy, conf) contract in
    source pixels — the exact path cli.precache --detector ultralytics
    runs with a real yolov8n dump."""
    cfg = DetectorConfig(
        width=16, depth=1, score_threshold=0.0, max_detections=16
    )
    sd = _synthetic_sd(cfg, seed=9)
    inferred = infer_config(sd)
    assert inferred.width == 16 and inferred.num_classes == cfg.num_classes
    variables = convert_ultralytics_state_dict(cfg, sd)
    det = Detector(cfg, variables)
    image = (np.random.RandomState(2).rand(700, 500, 3) * 255).astype(
        np.uint8
    )
    boxes, conf = det.as_detect_fn()(image)
    assert boxes.ndim == 2 and boxes.shape[1] == 4 and len(boxes) > 0
    assert len(boxes) == len(conf)
    assert np.all(conf >= 0.0) and np.all(conf <= 1.0)
    assert np.all(boxes[:, 0] <= boxes[:, 2])
    assert np.all(boxes[:, 1] <= boxes[:, 3])
    assert np.all(boxes[:, [0, 2]] <= 500 + 1e-3)
    assert np.all(boxes[:, [1, 3]] <= 700 + 1e-3)

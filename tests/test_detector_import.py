"""Ultralytics YOLOv8 -> FlaxYOLO checkpoint import.

Zero-egress: no real yolov8x.pt here, so correctness is pinned two ways:
(a) a shape-manifest round-trip — a synthetic state dict with the exact
ultralytics key/shape set converts into a tree that matches `model.init`
leaf-for-leaf and runs; (b) numeric parity of the building blocks against
a line-for-line torch replica of ultralytics' Conv/Bottleneck/C2f modules
(padding placement, BN eps, OIHW->HWIO transposes are exactly what a wrong
import would silently corrupt)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from dclip_tpu.models.detector import (
    C2f,
    ConvBNAct,
    Detector,
    DetectorConfig,
    FlaxYOLO,
)
from dclip_tpu.models.detector_import import (
    convert_ultralytics_state_dict,
    expected_manifest,
    infer_config,
    load_ultralytics_checkpoint,
)

TINY = DetectorConfig(width=8, depth=1, num_classes=4, image_size=64,
                      score_threshold=0.0)


def _synthetic_sd(cfg, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for key, shape in expected_manifest(cfg).items():
        if key.endswith("running_var"):
            sd[key] = rng.rand(*shape).astype(np.float32) + 0.5
        else:
            sd[key] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


def test_manifest_roundtrip_and_forward():
    sd = _synthetic_sd(TINY)
    variables = convert_ultralytics_state_dict(TINY, sd)
    model = FlaxYOLO(TINY)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, TINY.image_size, TINY.image_size, 3)),
        )
    )
    # Leaf-for-leaf structural + shape match with a fresh init.
    t_leaves = jax.tree_util.tree_leaves_with_path(template)
    v_leaves = jax.tree_util.tree_leaves_with_path(variables)
    assert len(t_leaves) == len(v_leaves)
    for (tp, tl), (vp, vl) in zip(t_leaves, v_leaves):
        assert tp == vp
        assert tuple(tl.shape) == tuple(vl.shape), tp
    outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    for box, cls in outs:
        assert np.all(np.isfinite(np.asarray(box)))
        assert np.all(np.isfinite(np.asarray(cls)))


def test_missing_and_mismatched_keys_raise():
    sd = _synthetic_sd(TINY)
    k = "model.0.conv.weight"
    bad = dict(sd)
    del bad[k]
    with pytest.raises(ValueError, match="missing"):
        convert_ultralytics_state_dict(TINY, bad)
    bad = dict(sd)
    bad[k] = np.zeros((1, 2, 3, 4), np.float32)
    with pytest.raises(ValueError, match="mismatch"):
        convert_ultralytics_state_dict(TINY, bad)


def test_infer_config_from_shapes():
    cfg = DetectorConfig(width=16, depth=2, num_classes=7, p5_ch=192,
                         image_size=64)
    sd = _synthetic_sd(cfg)
    got = infer_config(sd, image_size=64)
    assert got.width == 16 and got.depth == 2
    assert got.num_classes == 7 and got.p5 == 192 and got.reg_max == 16


def test_v8_presets_match_ultralytics_scale_table():
    # (width, depth, P5 channels) from the yolov8 yaml scales incl. the
    # max-channels cap; head widths from Detect.__init__.
    assert (DetectorConfig.v8n().width, DetectorConfig.v8n().p5) == (16, 256)
    assert (DetectorConfig.v8s().width, DetectorConfig.v8s().p5) == (32, 512)
    assert (DetectorConfig.v8m().width, DetectorConfig.v8m().p5) == (48, 576)
    assert (DetectorConfig.v8l().width, DetectorConfig.v8l().p5) == (64, 512)
    x = DetectorConfig.v8x()
    assert (x.width, x.depth, x.p5) == (80, 3, 640)
    assert x.head_box_ch == max(16, 320 // 4, 64) == 80
    assert x.head_cls_ch == max(320, 80) == 320


def test_pt_and_npz_loading(tmp_path):
    sd = _synthetic_sd(TINY)
    import torch

    pt = tmp_path / "sd.pt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(pt))
    cfg, variables = load_ultralytics_checkpoint(
        str(pt), image_size=64, score_threshold=0.0
    )
    assert cfg.width == TINY.width and cfg.num_classes == TINY.num_classes
    npz = tmp_path / "sd.npz"
    np.savez(str(npz), **sd)
    cfg2, variables2 = load_ultralytics_checkpoint(str(npz), cfg=TINY)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(variables2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _torch_conv_bn_silu(np_x, w, bn_w, bn_b, bn_m, bn_v, stride):
    """Ultralytics Conv (conv + BN(eps=1e-3) + SiLU) in torch, NCHW."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np_x.transpose(0, 3, 1, 2))
    k = w.shape[-1]
    y = F.conv2d(x, torch.from_numpy(w), stride=stride, padding=k // 2)
    y = F.batch_norm(
        y, torch.from_numpy(bn_m), torch.from_numpy(bn_v),
        torch.from_numpy(bn_w), torch.from_numpy(bn_b), eps=1e-3,
    )
    y = y * torch.sigmoid(y)
    return y.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("stride,kernel", [(1, 3), (2, 3), (1, 1)])
def test_convbnact_parity_with_torch(stride, kernel):
    """Padding placement (stride 2!), BN eps, and OIHW->HWIO transpose all
    match torch exactly — the failure modes of a silent bad import."""
    rng = np.random.RandomState(0)
    cin, cout = 6, 8
    w = rng.randn(cout, cin, kernel, kernel).astype(np.float32) * 0.2
    bn_w = rng.rand(cout).astype(np.float32) + 0.5
    bn_b = rng.randn(cout).astype(np.float32) * 0.1
    bn_m = rng.randn(cout).astype(np.float32) * 0.1
    bn_v = rng.rand(cout).astype(np.float32) + 0.5
    x = rng.randn(2, 16, 16, cin).astype(np.float32)

    ref = _torch_conv_bn_silu(x, w, bn_w, bn_b, bn_m, bn_v, stride)

    variables = {
        "params": {
            "conv": {"kernel": w.transpose(2, 3, 1, 0)},
            "bn": {"scale": bn_w, "bias": bn_b},
        },
        "batch_stats": {"bn": {"mean": bn_m, "var": bn_v}},
    }
    mod = ConvBNAct(cout, kernel, stride)
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_c2f_parity_with_torch():
    """Full C2f block (split/bottleneck-chain/concat wiring) vs a torch
    replica of ultralytics' C2f, weights imported through the converter's
    layout rules."""
    import torch

    torch.manual_seed(0)
    c1 = c2 = 8
    n = 2

    class TConv(torch.nn.Module):
        def __init__(self, ci, co, k, s=1):
            super().__init__()
            self.conv = torch.nn.Conv2d(ci, co, k, s, k // 2, bias=False)
            self.bn = torch.nn.BatchNorm2d(co, eps=1e-3, momentum=0.03)

        def forward(self, x):
            y = self.bn(self.conv(x))
            return y * torch.sigmoid(y)

    class TBottleneck(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.cv1 = TConv(c, c, 3)
            self.cv2 = TConv(c, c, 3)

        def forward(self, x):
            return x + self.cv2(self.cv1(x))

    class TC2f(torch.nn.Module):
        def __init__(self):
            super().__init__()
            c = c2 // 2
            self.cv1 = TConv(c1, 2 * c, 1)
            self.cv2 = TConv((2 + n) * c, c2, 1)
            self.m = torch.nn.ModuleList(TBottleneck(c) for _ in range(n))

        def forward(self, x):
            y = list(self.cv1(x).chunk(2, 1))
            for m in self.m:
                y.append(m(y[-1]))
            return self.cv2(torch.cat(y, 1))

    tmod = TC2f().eval()
    x = np.random.RandomState(1).randn(1, 16, 16, c1).astype(np.float32)
    with torch.no_grad():
        ref = (
            tmod(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    def conv_vars(t):
        return (
            {"conv": {"kernel": t.conv.weight.detach().numpy().transpose(2, 3, 1, 0)},
             "bn": {"scale": t.bn.weight.detach().numpy(),
                    "bias": t.bn.bias.detach().numpy()}},
            {"bn": {"mean": t.bn.running_mean.numpy(),
                    "var": t.bn.running_var.numpy()}},
        )

    params, stats = {}, {}
    for name, sub in [("cv1", tmod.cv1), ("cv2", tmod.cv2)]:
        params[name], stats[name] = conv_vars(sub)
    for j, b in enumerate(tmod.m):
        p1, s1 = conv_vars(b.cv1)
        p2, s2 = conv_vars(b.cv2)
        params[f"m{j}"] = {"cv1": p1, "cv2": p2}
        stats[f"m{j}"] = {"cv1": s1, "cv2": s2}

    mod = C2f(c2, n=n, shortcut=True)
    got = np.asarray(
        mod.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_imported_detector_produces_boxes():
    """End-to-end: imported (synthetic) checkpoint -> Detector.as_detect_fn
    yields the DetectionCache (xyxy, conf) contract in source pixels."""
    sd = _synthetic_sd(TINY, seed=3)
    variables = convert_ultralytics_state_dict(TINY, sd)
    det = Detector(TINY, variables)
    image = (np.random.RandomState(0).rand(120, 90, 3) * 255).astype(np.uint8)
    boxes, conf = det.as_detect_fn()(image)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert len(boxes) == len(conf) and len(boxes) > 0
    assert np.all(boxes[:, 0] <= boxes[:, 2]) and np.all(boxes[:, 1] <= boxes[:, 3])
    assert np.all(boxes[:, [0, 2]] <= 90 + 1e-3) and np.all(boxes[:, [1, 3]] <= 120 + 1e-3)


def test_precache_cli_with_ultralytics_checkpoint(tmp_path, monkeypatch):
    """cli.precache --detector ultralytics: imported checkpoint drives the
    detection-cache build end to end (the reference's precache_yolo role
    with real YOLOv8 weights, torch-free at inference)."""
    import json

    import torch
    from PIL import Image

    from dclip_tpu.cli import precache
    from dclip_tpu.data.detection_cache import DetectionCache

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)
    items = []
    for i in range(3):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray((rng.rand(50, 60, 3) * 255).astype("uint8")).save(p)
        items.append({"image_path": p, "captions": [f"c{i}"],
                      "dataset": "s", "boxes": []})
    (tmp_path / "corpus.json").write_text(json.dumps(items))
    sd = _synthetic_sd(TINY, seed=5)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, "yolo_sd.pt")

    assert precache.main([
        "--json_file", "corpus.json", "--cache_dir", "cache",
        "--detector", "ultralytics", "--detector_checkpoint", "yolo_sd.pt",
        "--detector_image_size", "64", "--model_preset", "tiny",
    ]) == 0
    cache = DetectionCache.load("cache/corpus_precache.npz")
    assert len(cache) == 3

"""Offline cache builder CLI — the reference's `training/train_pickle.py`
(__main__ at :178-199 runs precache_yolo + precache_knn over one corpus
JSON; here both artifacts in one pass, flags instead of a hardcoded path).

    python -m dclip_tpu.cli.precache --json_file data/teacher_train.json \
        --cache_dir cache [--build_index] [model flags]

Artifacts:
- <cache_dir>/<stem>_precache.npz   detection cache (replaces *_precache.pkl)
- <cache_dir>/<stem>_patch_index.npz  embedding store (replaces
  *_knn_cache.pkl + faiss .idx + embeddings JSON) when --build_index is set
"""
from __future__ import annotations

import argparse
import os

from dclip_tpu.cli.common import add_model_args, load_clip
from dclip_tpu.data.corpus import load_corpus
from dclip_tpu.data.detection_cache import (
    DetectionCache,
    GridProposalDetector,
    build_cache,
    cache_path_for,
)
from dclip_tpu.data.index import build_patch_index


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Build detection + patch-index caches")
    p.add_argument("--json_file", required=True)
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--detector", choices=["grid", "flax", "ultralytics"],
                   default="grid",
                   help="'grid': dependency-free proposals; 'flax': the "
                        "native TPU detector (models.detector; random-init "
                        "unless --detector_checkpoint); 'ultralytics': "
                        "import real YOLOv8 weights (models.detector_import) "
                        "from --detector_checkpoint (.pt state dict / .npz / "
                        ".safetensors, architecture inferred from shapes) — "
                        "the reference's yolov8x proposal source, torch-free "
                        "at inference. Offline YOLO runs can also plug in by "
                        "writing the same npz cache artifact.")
    p.add_argument("--detector_checkpoint", default=None,
                   help="flax: msgpack variables; ultralytics: exported "
                        "state-dict file")
    p.add_argument("--detector_image_size", type=int, default=640)
    p.add_argument("--build_index", action="store_true",
                   help="also build the patch EmbeddingStore (compute_faiss role)")
    p.add_argument("--batch_size", type=int, default=256)
    add_model_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    items = load_corpus(args.json_file)
    paths = [it["image_path"] for it in items]
    print(f"{len(items)} corpus items, {len(dict.fromkeys(paths))} unique images")

    if args.detector == "ultralytics":
        from dclip_tpu.models.detector import Detector
        from dclip_tpu.models.detector_import import load_ultralytics_checkpoint

        if not args.detector_checkpoint:
            raise SystemExit("--detector ultralytics requires --detector_checkpoint")
        det_cfg, variables = load_ultralytics_checkpoint(
            args.detector_checkpoint, image_size=args.detector_image_size
        )
        print(f"Imported YOLOv8 checkpoint: width={det_cfg.width} "
              f"depth={det_cfg.depth} nc={det_cfg.num_classes}")
        detect_fn = Detector(det_cfg, variables).as_detect_fn()
    elif args.detector == "flax":
        from dclip_tpu.models.detector import Detector, DetectorConfig

        det = Detector.initialize(
            DetectorConfig(image_size=args.detector_image_size), seed=args.seed
        )
        if args.detector_checkpoint:
            import flax.serialization

            import jax

            with open(args.detector_checkpoint, "rb") as f:
                det.variables = jax.device_put(
                    flax.serialization.from_bytes(det.variables, f.read())
                )
        detect_fn = det.as_detect_fn()
    else:
        detect_fn = GridProposalDetector()

    det_path = cache_path_for(args.json_file, "precache", args.cache_dir)
    existing = DetectionCache.load(det_path) if os.path.exists(det_path) else None
    cache = build_cache(paths, detect_fn, det_path, existing)
    print(f"Detection cache: {det_path} ({len(cache)} images)")

    if args.build_index:
        cfg, model, variables = load_clip(
            args.model_preset, args.clip_weights, args.seed
        )
        idx_path = cache_path_for(args.json_file, "patch_index", args.cache_dir)
        store = build_patch_index(
            paths, model, variables,
            detection_cache=cache,
            image_size=cfg.vision.image_size,
            batch_size=args.batch_size,
            output_path=idx_path,
        )
        print(f"Patch index: {idx_path} ({len(store)} embeddings)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

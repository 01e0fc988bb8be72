"""Threshold-sweep tuning CLI for the knn/projection gate.

The reference exposes `TokenizerWithKNN.evaluate_threshold` as a tuning
utility (training/image_tokenizer.py:490-529: per threshold, which source —
knn / projection / clip — serves a probe patch). Here the sweep runs over a
CORPUS SAMPLE as one batched device computation per threshold (the region
encode runs once; only the cheap gate re-runs), printing the fraction of
valid patches served by knn vs the fallback, and the mean knn similarity:

    python -m dclip_tpu.cli.tune_gate --json_file data/teacher_train.json \
        --detection_cache cache/teacher_train_precache.npz \
        --knn_store cache/teacher_train_patch_index.npz \
        [--projection_weights proj.msgpack] [--sample 64] [model flags]

Pick the threshold where the knn fraction starts dropping steeply — above
it, most patches fall back and the stored index is wasted; below it,
dissimilar neighbors pollute the teacher's patch embeddings.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from dclip_tpu.cli.common import add_model_args, load_clip
from dclip_tpu.data.corpus import load_corpus
from dclip_tpu.data.detection_cache import DetectionCache, GridProposalDetector, build_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Sweep the knn-gate similarity threshold")
    p.add_argument("--json_file", required=True)
    p.add_argument("--detection_cache", default=None,
                   help="npz/native detection cache (cli.precache output); "
                        "built on the fly with grid proposals when absent")
    p.add_argument("--knn_store", required=True,
                   help="EmbeddingStore (cli.precache --build_index output)")
    p.add_argument("--projection_weights", default=None,
                   help="ImageProjectionModule params enabling the "
                        "projection branch below the threshold")
    p.add_argument("--sample", type=int, default=64,
                   help="corpus items to probe (first N after load)")
    p.add_argument("--max_patches", type=int, default=8)
    p.add_argument("--image_size", type=int, default=224,
                   help="probe frame resolution (teacher_image_size)")
    p.add_argument("--thresholds", type=float, nargs="*", default=None,
                   help="default: 0.60..0.95 step 0.05 (reference :490)")
    add_model_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from PIL import Image

    from dclip_tpu.data.embedding_store import EmbeddingStore
    from dclip_tpu.data.pipeline import squash_resize
    from dclip_tpu.models.region_tokenizer import RegionTokenizer

    items = load_corpus(args.json_file)[: args.sample]
    paths = [it["image_path"] for it in items]
    if args.detection_cache and os.path.exists(args.detection_cache):
        cache = DetectionCache.load(args.detection_cache)
    else:
        print("no --detection_cache: building grid proposals for the sample")
        cache = build_cache(paths, GridProposalDetector())

    cfg, model, variables = load_clip(args.model_preset, args.clip_weights, args.seed)
    store = EmbeddingStore.load(args.knn_store)
    print(f"knn store: {len(store)} embeddings")
    projection_params = None
    if args.projection_weights and os.path.exists(args.projection_weights):
        from dclip_tpu.models.projections import load_image_projection

        _, projection_params = load_image_projection(
            args.projection_weights, cfg.projection_dim
        )
        print("projection branch enabled")

    # Decode the sample into one fixed-shape probe batch (the pipeline's
    # teacher frame: squash resize + boxes rescaled into it).
    size = args.image_size
    images, all_boxes, all_mask = [], [], []
    for path in paths:
        try:
            with Image.open(path) as im:
                im = im.convert("RGB")
                w, h = im.size
                images.append(squash_resize(im, size))
        except Exception:
            w = h = size
            images.append(np.zeros((size, size, 3), np.float32))
        boxes, _, mask = cache.get_fixed([path], args.max_patches)
        scale = np.asarray(
            [size / max(w, 1), size / max(h, 1)] * 2, np.float32
        )
        all_boxes.append(boxes[0] * scale)
        all_mask.append(mask[0])

    tokenizer = RegionTokenizer(
        model, variables, store=store, projection_params=projection_params,
        patch_size=cfg.vision.image_size,  # crops resized to the ViT input
    )
    thresholds = (
        args.thresholds
        if args.thresholds
        else tuple(np.arange(0.60, 0.951, 0.05))
    )
    results = tokenizer.evaluate_threshold(
        np.stack(images), np.stack(all_boxes), np.stack(all_mask),
        thresholds=thresholds,
    )

    n_valid = int(np.stack(all_mask).sum())
    print(f"\nGate sweep over {len(items)} items / {n_valid} valid patches")
    print(f"{'threshold':<11} {'knn%':<8} {'fallback%':<11} {'mean knn sim':<12}")
    print("-" * 44)
    for th, row in sorted(results.items()):
        print(
            f"{th:<11.2f} {row['knn_fraction'] * 100:<8.1f} "
            f"{row['fallback_fraction'] * 100:<11.1f} "
            f"{row['mean_similarity']:<12.4f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

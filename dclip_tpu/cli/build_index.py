"""Patch-index CLI over an image directory — the reference's
`training/compute_faiss.py` (script body: YOLO over every image in a dir,
CLIP-encode each crop, write .idx + embeddings JSON; :30-103).

    python -m dclip_tpu.cli.build_index --image_dir /data/images \
        --output trained_models/patch_index.npz [model flags]
"""
from __future__ import annotations

import argparse
import os

from dclip_tpu.cli.common import add_model_args, load_clip
from dclip_tpu.data.detection_cache import GridProposalDetector
from dclip_tpu.data.index import build_patch_index

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Build the patch retrieval index")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--output", default="patch_index.npz")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--max_images", type=int, default=None)
    add_model_args(p, default_preset="vit-b-32")  # compute_faiss used B/32 (:21)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    paths = sorted(
        os.path.join(args.image_dir, f)
        for f in os.listdir(args.image_dir)
        if f.lower().endswith(IMAGE_EXTS)
    )
    if args.max_images:
        paths = paths[: args.max_images]
    print(f"Indexing {len(paths)} images from {args.image_dir}")
    cfg, model, variables = load_clip(args.model_preset, args.clip_weights, args.seed)
    store = build_patch_index(
        paths, model, variables,
        detect_fn=GridProposalDetector(),
        image_size=cfg.vision.image_size,
        batch_size=args.batch_size,
        output_path=args.output,
    )
    print(f"Wrote {len(store)} patch embeddings to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

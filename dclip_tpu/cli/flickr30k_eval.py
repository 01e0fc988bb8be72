"""Retrieval eval CLI — the reference's `eval_scripts/flickr30k_eval.py`
(CLI contract :286-298: --max_images, --model {base,custom,both},
--checkpoint), plus the explicit --dataset_json the reference hardcodes.

    python -m dclip_tpu.cli.flickr30k_eval --dataset_json flickr_test.json \
        --max_images 1000 --model both --checkpoint checkpoints/...msgpack \
        [model flags]
"""
from __future__ import annotations

import argparse

from dclip_tpu.cli.common import add_model_args, load_clip, load_tokenizer, restore_student_params
from dclip_tpu.eval.retrieval import (
    evaluate_retrieval,
    load_eval_items,
    print_retrieval_table,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Karpathy-split retrieval evaluation")
    p.add_argument("--dataset_json", required=True)
    p.add_argument("--max_images", type=int, default=1000)
    p.add_argument("--model", choices=["base", "custom", "both"], default="both")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["auto", "float32", "bfloat16"],
                   help="bfloat16 enables the fused-block TPU eval path; "
                        "float32 (default) matches the reference numerics")
    p.add_argument("--mesh_data", type=int, default=1,
                   help=">1: shard the embedding forwards and the rank "
                        "computation over a data-parallel device mesh of "
                        "this size (-1: all devices); metrics are exact")
    p.add_argument("--packed_captions", action="store_true",
                   help="caption sequence packing for the text encode "
                        "(ops/packing.py): each batch embeds as R << B "
                        "dense 77-token rows; numerics parity-pinned. "
                        "Single-device only (ignored under --mesh_data)")
    add_model_args(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg, model, variables = load_clip(args.model_preset, args.clip_weights,
                                  args.seed, args.compute_dtype)
    tokenizer = load_tokenizer(args.tokenizer_dir, cfg.text.max_length)
    items = load_eval_items(args.dataset_json, args.max_images)
    print(f"Evaluating on {len(items)} images")
    mesh = None
    if args.mesh_data != 1:
        from dclip_tpu.core.config import MeshConfig
        from dclip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=args.mesh_data))
        if args.batch_size % mesh.shape["data"]:
            raise SystemExit(
                f"--batch_size {args.batch_size} must divide by the mesh "
                f"data size {mesh.shape['data']}"
            )

    results = {}
    if args.model in ("base", "both"):
        results["base"] = evaluate_retrieval(
            model, variables, tokenizer, items, args.batch_size,
            cfg.vision.image_size, mesh=mesh,
            packed_captions=args.packed_captions,
        )
    if args.model in ("custom", "both"):
        if not args.checkpoint:
            raise SystemExit("--checkpoint is required for --model custom/both")
        params = restore_student_params(args.checkpoint, variables["params"])
        results["custom"] = evaluate_retrieval(
            model, {"params": params}, tokenizer, items, args.batch_size,
            cfg.vision.image_size, mesh=mesh,
            packed_captions=args.packed_captions,
        )
    print_retrieval_table(results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

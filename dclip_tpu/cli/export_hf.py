"""Export a trained student checkpoint as a HuggingFace CLIP snapshot.

    python -m dclip_tpu.cli.export_hf --model_preset vit-b-16 \
        --checkpoint checkpoints/distill_....msgpack --out exported_clip/ \
        [--tokenizer_dir <dir with vocab.json+merges.txt>]

The output directory loads directly with
`transformers.CLIPModel.from_pretrained(out)` (and `CLIPProcessor` when
--tokenizer_dir is given) — the deployment-portability counterpart of the
reference's torch `.pth` checkpoints (eval_scripts/flickr30k_eval.py:126-132),
in the standard HF format instead of a framework-private one.

Without --checkpoint, the weights named by --clip_weights are re-exported
(an import->export identity pass; useful to materialize a snapshot from a
bare .bin/.safetensors file).
"""
from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export student weights as an HF CLIP snapshot")
    p.add_argument("--checkpoint", default=None,
                   help="CheckpointManager msgpack (raw params or TrainState)")
    p.add_argument("--out", required=True, help="output snapshot directory")
    p.add_argument("--export_tokenizer_dir", default=None,
                   help="copy vocab.json+merges.txt from this dir into the snapshot")
    from dclip_tpu.cli.common import add_model_args

    add_model_args(p)
    return p


def template_params(cfg):
    """Host-side zero tree with the CLIPModule param structure (no device
    transfer, no eager init: eval_shape only)."""
    import jax
    import jax.numpy as jnp

    from dclip_tpu.models.clip import CLIPModule

    model = CLIPModule(cfg)

    def _init():
        return model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.text.max_length), jnp.int32),
            jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        )

    shapes = jax.eval_shape(_init)
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes
    )["params"]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.hf_export import save_pretrained

    cfg = CLIPConfig.from_name(args.model_preset)
    if args.checkpoint:
        from dclip_tpu.cli.common import restore_student_params

        params = restore_student_params(args.checkpoint, template_params(cfg))
    elif args.clip_weights != "random":
        from dclip_tpu.models.hf_import import load_pretrained

        params = load_pretrained(args.clip_weights, cfg)
    else:
        raise SystemExit("need --checkpoint or --clip_weights to export")
    save_pretrained(params, cfg, args.out,
                    tokenizer_dir=args.export_tokenizer_dir)
    print(f"Exported HF CLIP snapshot to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

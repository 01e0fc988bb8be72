"""Karpathy retrieval evaluation (flickr30k_eval / COCO protocol).

Reference parity (eval_scripts/flickr30k_eval.py):
- eval JSON of `{"image_path", "image_id", "captions"}` records, empty
  captions filtered, truncated to `max_images` (:95-104, default 1000),
- all image + caption embeddings, L2-normalized, cosine similarity matrix
  (:243-266 — the chunked 1000x1000 matmul is just one XLA matmul here),
- t2i/i2t R@1/5/10 + MAP with argsort-stable rank semantics
  (dclip_tpu.ops.retrieval, pinned to :16-88 in tests),
- base-vs-custom comparison table with relative R@1 gains (:314-333).

The reference embeds images in torch batches of 4 and custom-model images
ONE AT A TIME (:157,187-189); here both sides run as large jitted batches.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.data.corpus import load_corpus
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.ops.retrieval import retrieval_metrics


def load_eval_items(dataset_json: str, max_images: int = 1000) -> List[dict]:
    items = load_corpus(dataset_json)  # drops empty-caption rows (:97-100)
    return items[:max_images]


def embed_images(
    model: CLIPModule,
    variables,
    image_paths: Sequence[str],
    batch_size: int = 256,
    image_size: int = 224,
    mesh=None,
) -> np.ndarray:
    """Decode+preprocess on host, embed in jitted batches. Pads the tail
    batch to keep one compiled shape. With a mesh, batches shard over its
    data axis (params replicated)."""
    from PIL import Image

    from dclip_tpu.data.pipeline import preprocess_image
    from dclip_tpu.models.encoding import make_image_encoder

    pixels = []
    for path in image_paths:
        try:
            with Image.open(path) as im:
                pixels.append(preprocess_image(im.convert("RGB"), image_size))
        except Exception:
            pixels.append(np.zeros((image_size, image_size, 3), np.float32))
    return make_image_encoder(model, variables, batch_size, mesh=mesh)(pixels)


def embed_captions(
    model: CLIPModule,
    variables,
    tokenizer,
    captions: Sequence[str],
    batch_size: int = 256,
    mesh=None,
    packed: bool = False,
) -> np.ndarray:
    """`packed=True`: caption sequence packing (ops/packing.py) — each
    `batch_size`-caption chunk encodes as R << B dense 77-token rows (real
    captions run ~10-30 tokens, so the unpacked encode spends most FLOPs
    on padding). Output order and numerics match the unpacked path (parity
    pinned in tests); row counts are bucketed so at most a handful of
    shapes compile. Under a `mesh`, captions pack PER DATA SHARD (same
    bucketed row count per shard, so the packed arrays stay dp-even) with
    eos rows globalized for the GSPMD gather."""
    from dclip_tpu.models.encoding import packed_text_forward, text_forward

    in_sharding = None
    n_shards = 1
    if mesh is not None:
        from dclip_tpu.parallel.mesh import batch_sharding, replicate_tree

        variables = replicate_tree(variables, mesh)
        in_sharding = batch_sharding(mesh)
        n_shards = mesh.shape["data"]
        if batch_size % n_shards != 0:
            raise ValueError(
                f"the data-axis size ({n_shards}) must divide batch_size "
                f"{batch_size}"
            )
    else:
        variables = jax.device_put(variables)  # once, not per jit call
    fwd = text_forward(model)  # memoized: repeat calls compile nothing
    pfwd = packed_text_forward(model) if packed else None
    put = (
        (lambda a: jax.device_put(jnp.asarray(a), in_sharding))
        if in_sharding is not None
        else jnp.asarray
    )
    out = []
    for start in range(0, len(captions), batch_size):
        chunk = list(captions[start : start + batch_size])
        n = len(chunk)
        if n < batch_size:
            chunk += [""] * (batch_size - n)
        ids, mask = tokenizer.encode_batch(chunk)
        if packed:
            from dclip_tpu.ops.packing import (
                globalize_eos_rows,
                pack_captions,
                pack_captions_sharded,
            )

            if n_shards > 1:
                p = globalize_eos_rows(
                    pack_captions_sharded(
                        np.asarray(ids), np.asarray(mask),
                        model.cfg.text.eos_token_id, n_shards,
                    ),
                    n_shards,
                )
                p.pop("rows_per_shard")
            else:
                p = pack_captions(
                    np.asarray(ids), np.asarray(mask),
                    model.cfg.text.eos_token_id,
                )
            emb = pfwd(
                variables,
                put(p["packed_ids"]), put(p["packed_segments"]),
                put(p["packed_positions"]),
                put(p["packed_eos_rows"]), put(p["packed_eos_cols"]),
            )
            out.append(np.asarray(emb)[:n])
            continue
        if in_sharding is not None:
            ids = jax.device_put(np.asarray(ids), in_sharding)
            mask = jax.device_put(np.asarray(mask), in_sharding)
        else:
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        out.append(np.asarray(fwd(variables, ids, mask))[:n])
    return np.concatenate(out, 0)


def evaluate_retrieval(
    model: CLIPModule,
    variables,
    tokenizer,
    items: Sequence[dict],
    batch_size: int = 256,
    image_size: int = 224,
    mesh=None,
    packed_captions: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Full protocol on one model -> {"t2i": {...}, "i2t": {...}}.

    With a `mesh`, both the embedding forwards AND the rank computation
    shard over its data axis (ops.retrieval.retrieval_metrics_sharded) —
    the COCO-scale [25000, 5000] similarity work splits across chips."""
    image_paths = [it["image_path"] for it in items]
    captions: List[str] = []
    caption_to_image: List[int] = []
    for idx, it in enumerate(items):
        for cap in it["captions"]:
            captions.append(cap)
            caption_to_image.append(idx)
    # Commit the weight tree ONCE here: embed_images and embed_captions
    # each device_put/replicate their `variables`, which is a no-op on an
    # already-committed tree but a second full H2D on a host-numpy one.
    if mesh is None:
        variables = jax.device_put(variables)
    else:
        from dclip_tpu.parallel.mesh import replicate_tree

        variables = replicate_tree(variables, mesh)
    img = embed_images(
        model, variables, image_paths, batch_size, image_size, mesh=mesh
    )
    cap = embed_captions(
        model, variables, tokenizer, captions, batch_size, mesh=mesh,
        packed=packed_captions,
    )
    if mesh is not None:
        from dclip_tpu.ops.retrieval import retrieval_metrics_sharded

        metrics = retrieval_metrics_sharded(
            jnp.asarray(cap), jnp.asarray(img), jnp.asarray(caption_to_image),
            mesh,
        )
    else:
        metrics = retrieval_metrics(
            jnp.asarray(cap), jnp.asarray(img), jnp.asarray(caption_to_image)
        )
    return {
        d: {k: float(v) for k, v in dd.items()} for d, dd in metrics.items()
    }


def print_retrieval_table(
    results: Dict[str, Dict[str, Dict[str, float]]]
) -> None:
    """Base-vs-custom comparison with relative R@1 gains (reference :314-333)."""
    for direction, label in (("t2i", "Text -> Image"), ("i2t", "Image -> Text")):
        print(f"\n{label} Retrieval")
        print("=" * 60)
        print(f"{'Model':<12} {'R@1':<10} {'R@5':<10} {'R@10':<10} {'MAP':<10}")
        print("-" * 60)
        for model_name, res in results.items():
            m = res[direction]
            print(
                f"{model_name:<12} {m['R@1']:<10.4f} {m['R@5']:<10.4f} "
                f"{m['R@10']:<10.4f} {m['MAP']:<10.4f}"
            )
        if "base" in results and "custom" in results:
            b, c = results["base"][direction], results["custom"][direction]
            if b["R@1"] > 0:
                print(
                    f"Relative R@1 gain: {(c['R@1'] - b['R@1']) / b['R@1'] * 100:+.2f}%"
                )

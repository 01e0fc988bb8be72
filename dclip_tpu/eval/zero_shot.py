"""Zero-shot classification eval: ImageNet-1k + CIFAR-10/100 protocols.

Reference parity (eval_scripts/test_zero_shot_ImageNet.py,
eval_scripts/CIFAR_zeroshot.py):
- prompts `"a photo of a {name}"` (ImageNet, :42) /
  `"a photo of a {name}, a type of object"` (CIFAR, :53-56),
- logits = 100 * normalized_image @ normalized_text.T (:82),
- top-1 / top-5 accumulators (:85-107),
- the comparison-table printout and results-file text formats
  (`imagenet_zero_shot_results.txt` :198-203,
  `cifar_zero_shot_results.txt` :203-214).

TPU deltas: the whole class-prompt bank is embedded in one jitted text
forward; image batches stream through a jitted vision forward + one [B, C]
matmul on the MXU (the reference runs ImageNet at batch_size=1, :156-157).
Zero-egress: CIFAR loads from the standard python-pickle batch files
already on disk (the reference auto-downloads, :22-46); ImageNet from an
extracted `ImageFolder`-layout directory.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.ops.losses import l2_normalize

CIFAR10_CLASSES = [
    "airplane", "automobile", "bird", "cat", "deer",
    "dog", "frog", "horse", "ship", "truck",
]

IMAGENET_PROMPT = "a photo of a {}"
CIFAR_PROMPT = "a photo of a {}, a type of object"


def embed_classnames(
    model: CLIPModule,
    variables,
    tokenizer,
    classnames: Sequence[str],
    prompt_template: str,
) -> jnp.ndarray:
    """One batched text forward over all class prompts -> [C, D] normalized."""
    from dclip_tpu.models.encoding import text_forward

    prompts = [prompt_template.format(name) for name in classnames]
    ids, mask = tokenizer.encode_batch(prompts)
    # Memoized jit: a second call (other dataset / prompt set) re-traces
    # nothing for the same model instance.
    feats = text_forward(model)(variables, jnp.asarray(ids), jnp.asarray(mask))
    return l2_normalize(feats.astype(jnp.float32))


def evaluate_zero_shot(
    model: CLIPModule,
    variables,
    text_features: jnp.ndarray,
    image_batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    log_every: int = 50,
    mesh=None,
) -> Dict[str, float]:
    """Stream (pixels [B,H,W,3] CLIP-normalized, labels [B]) batches.

    Returns {"top1": acc, "top5": acc} like the reference (:117-125).
    With a `mesh`, image batches shard over its data axis (params and
    text features replicated) — accuracy is exact, only the forward
    splits across chips. Batches must then divide the data-axis size.
    """

    from dclip_tpu.models.encoding import zero_shot_logits_forward

    # text_features is a jit ARGUMENT (not a closure): one compile serves
    # CIFAR-10/100/ImageNet back-to-back for the same model.
    logits_fn = zero_shot_logits_forward(model)
    in_sharding = None
    if mesh is not None:
        from dclip_tpu.parallel.mesh import batch_sharding, replicate_tree

        variables = replicate_tree(variables, mesh)
        text_features = replicate_tree(text_features, mesh)
        in_sharding = batch_sharding(mesh)
    else:
        variables = jax.device_put(variables)  # once, not per jit call
        text_features = jax.device_put(text_features)

    # Pad to the DATA-axis size: batch_sharding only splits over "data",
    # so padding to the total device count would add wasted rows (and an
    # extra compiled shape) on data x model meshes.
    ndev = 1 if mesh is None else int(mesh.shape.get("data", mesh.devices.size))
    correct1 = correct5 = total = 0
    for step, (pixels, labels) in enumerate(image_batches):
        n = len(labels)
        if in_sharding is not None:
            pixels = np.asarray(pixels)
            pad = (-pixels.shape[0]) % ndev  # ragged tail batches
            if pad:
                pixels = np.concatenate(
                    [pixels, np.zeros((pad,) + pixels.shape[1:], pixels.dtype)]
                )
            pixels = jax.device_put(pixels, in_sharding)
        else:
            pixels = jnp.asarray(pixels)
        logits = logits_fn(variables, pixels, text_features)[:n]
        _, top5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))
        top5 = np.asarray(top5)
        labels = np.asarray(labels)
        correct1 += int((top5[:, 0] == labels).sum())
        correct5 += int((top5 == labels[:, None]).any(axis=1).sum())
        total += len(labels)
        if log_every and step % log_every == 0:
            print(
                f"Processed {total} images - "
                f"Top-1: {correct1 / max(total,1):.4f}, "
                f"Top-5: {correct5 / max(total,1):.4f}"
            )
    return {
        "top1": correct1 / max(total, 1),
        "top5": correct5 / max(total, 1),
        "total": total,
    }


# -- data loading (zero-egress) -------------------------------------------------


def load_cifar_batches(
    data_dir: str, dataset: str = "cifar10"
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Read the standard CIFAR python pickle batches from disk.

    cifar10: <dir>/cifar-10-batches-py/test_batch;
    cifar100: <dir>/cifar-100-python/test. Returns (uint8 NHWC images,
    labels, classnames).
    """
    if dataset == "cifar10":
        path = os.path.join(data_dir, "cifar-10-batches-py", "test_batch")
        meta = os.path.join(data_dir, "cifar-10-batches-py", "batches.meta")
        label_key, name_key = b"labels", b"label_names"
    elif dataset == "cifar100":
        path = os.path.join(data_dir, "cifar-100-python", "test")
        meta = os.path.join(data_dir, "cifar-100-python", "meta")
        label_key, name_key = b"fine_labels", b"fine_label_names"
    else:
        raise ValueError(dataset)
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    images = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.asarray(d[label_key], np.int64)
    with open(meta, "rb") as f:
        names = [n.decode() for n in pickle.load(f, encoding="bytes")[name_key]]
    return images, labels, names


def iterate_preprocessed(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int = 64,
    image_size: int = 224,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """uint8 NHWC -> CLIP-preprocessed batches (PIL bicubic, HF parity)."""
    from PIL import Image

    from dclip_tpu.data.pipeline import preprocess_image

    for start in range(0, len(images), batch_size):
        chunk = images[start : start + batch_size]
        pixels = np.stack(
            [preprocess_image(Image.fromarray(im), image_size) for im in chunk]
        )
        yield pixels, labels[start : start + batch_size]


def ensure_extracted(data_dir: str) -> str:
    """Accept a .zip of an ImageFolder tree and extract it once
    (reference test_zero_shot_ImageNet.py:29-35). Returns the directory."""
    if not data_dir.endswith(".zip"):
        return data_dir
    import zipfile

    target = data_dir[: -len(".zip")] + "_extracted"
    if not os.path.isdir(target):
        # Extract to a temp dir + rename so an interrupted extraction is
        # never mistaken for a complete dataset on the next run.
        tmp = target + ".partial"
        print(f"Extracting {data_dir} -> {target}")
        import shutil

        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        with zipfile.ZipFile(data_dir) as z:
            z.extractall(tmp)
        os.rename(tmp, target)
    # If the zip wraps everything in a single top-level dir, descend into it.
    entries = [e for e in os.listdir(target) if not e.startswith(".")]
    if len(entries) == 1 and os.path.isdir(os.path.join(target, entries[0])):
        return os.path.join(target, entries[0])
    return target


def iterate_image_folder(
    root: str,
    batch_size: int = 64,
    image_size: int = 224,
) -> Tuple[List[str], Iterator[Tuple[np.ndarray, np.ndarray]]]:
    """torchvision-ImageFolder-layout directory -> (classnames, batches).

    Classes are subdirectory names sorted (torchvision's class_to_idx rule,
    reference test_zero_shot_ImageNet.py:141-148).
    """
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    samples: List[Tuple[str, int]] = []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp")):
                samples.append((os.path.join(cdir, fname), idx))

    def gen():
        from PIL import Image

        from dclip_tpu.data.pipeline import preprocess_image

        for start in range(0, len(samples), batch_size):
            chunk = samples[start : start + batch_size]
            pixels, labels = [], []
            for path, label in chunk:
                with Image.open(path) as im:
                    pixels.append(preprocess_image(im.convert("RGB"), image_size))
                labels.append(label)
            yield np.stack(pixels), np.asarray(labels, np.int64)

    return classes, gen()


# -- reference-format reporting ---------------------------------------------------


def format_cifar_results(
    base10: Dict, custom10: Dict, base100: Dict, custom100: Dict
) -> str:
    """cifar_zero_shot_results.txt body (reference CIFAR_zeroshot.py:203-214)."""

    def rel(c, b):
        return (c["top1"] - b["top1"]) / b["top1"] * 100 if b["top1"] > 0 else 0.0

    lines = [
        "Zero-Shot CIFAR Results",
        "=" * 70,
        "CIFAR-10:",
        f"Base CLIP Top-1: {base10['top1']:.4f}, Top-5: {base10['top5']:.4f}",
        f"Custom Model Top-1: {custom10['top1']:.4f}, Top-5: {custom10['top5']:.4f}",
        f"Relative Change: {rel(custom10, base10):+.2f}%",
        "",
        "CIFAR-100:",
        f"Base CLIP Top-1: {base100['top1']:.4f}, Top-5: {base100['top5']:.4f}",
        f"Custom Model Top-1: {custom100['top1']:.4f}, Top-5: {custom100['top5']:.4f}",
        f"Relative Change: {rel(custom100, base100):+.2f}%",
    ]
    return "\n".join(lines) + "\n"


def format_imagenet_results(
    custom: Dict, base: Optional[Dict] = None
) -> str:
    """imagenet_zero_shot_results.txt body (reference :198-203)."""
    lines = ["Zero-Shot ImageNet Results"]
    if base is not None:
        lines.append(f"Base CLIP Top-1: {base['top1']:.4f}")
        lines.append(f"Base CLIP Top-5: {base['top5']:.4f}")
        lines.append("")
    lines.append(f"Custom Model Top-1: {custom['top1']:.4f}")
    lines.append(f"Custom Model Top-5: {custom['top5']:.4f}")
    return "\n".join(lines) + "\n\n"


def print_comparison_table(results: Dict[str, Dict[str, Dict]]) -> None:
    """Console table (reference CIFAR_zeroshot.py:192-200)."""
    print("\nZero-Shot Results")
    print("=" * 70)
    print(f"{'Model':<15} {'Dataset':<10} {'Top-1 Acc':<15} {'Top-5 Acc':<15} {'Rel. Change':<15}")
    print("-" * 70)
    for dataset, models in results.items():
        base = models.get("base")
        for model_name, res in models.items():
            if base is not None and model_name != "base" and base["top1"] > 0:
                rel = f"{(res['top1'] - base['top1']) / base['top1'] * 100:+.2f}%"
            else:
                rel = "-"
            print(
                f"{model_name:<15} {dataset:<10} {res['top1']:<15.4f} "
                f"{res['top5']:<15.4f} {rel:<15}"
            )

"""Shared CLI plumbing: model/tokenizer/mesh flags used by every entry point.

The reference hardcodes model ids, absolute Windows paths, and PATH/TO
placeholders in-source (SURVEY.md §5 "Config / flag system"); here every
entry point takes the same explicit flags:
  --model_preset   vit-b-32 | vit-b-16 | vit-l-14 | tiny
  --clip_weights   local HF snapshot dir / .bin / .safetensors ('random'
                   initializes randomly — useful for smoke tests; there is
                   no network download path, zero-egress by design)
  --tokenizer_dir  dir containing vocab.json + merges.txt ('hash' selects
                   the test tokenizer)
  --mesh_data/--mesh_model  device mesh shape (-1 = all remaining chips)
"""
from __future__ import annotations

import argparse
from typing import Any, Dict, Tuple

import jax

from dclip_tpu.core.config import CLIPConfig, MeshConfig
from dclip_tpu.models.clip import CLIPModule


def add_model_args(p: argparse.ArgumentParser, default_preset: str = "vit-b-16") -> None:
    p.add_argument("--model_preset", default=default_preset,
                   help="CLIP preset: vit-b-32|vit-b-16|vit-l-14|tiny or HF id alias")
    p.add_argument("--clip_weights", default="random",
                   help="local HF snapshot dir / weight file, or 'random'")
    p.add_argument("--tokenizer_dir", default="hash",
                   help="dir with vocab.json+merges.txt, or 'hash' (test tokenizer)")
    p.add_argument("--seed", type=int, default=42)


def synthetic_distill_batch(clip_cfg, teacher_cfg, batch: int, rng=None):
    """Host-numpy distillation batch with the pipeline's exact field set
    and shapes (fixed-shape contract, SURVEY.md §7 step 4) — used by the
    driver entry points, bench.py, and cli.profile so every synthetic
    consumer exercises the one real batch layout."""
    import numpy as np

    rng = rng or np.random.RandomState(0)
    t = clip_cfg.text.max_length
    s = clip_cfg.vision.image_size
    p = teacher_cfg.max_patches
    ids = rng.randint(
        1, clip_cfg.text.vocab_size - 2, size=(batch, t)
    ).astype(np.int32)
    mask = np.zeros((batch, t), np.int32)
    # Realistic caption lengths (BOS..EOS spans of 8-24 tokens — COCO/CC
    # captions tokenize to ~10-20 BPE tokens, nowhere near the 77-token
    # pad): the unpacked path is insensitive to mask content, while the
    # packed-text path (ops/packing.py) sees the density a real corpus
    # would. Tiny test configs (t < 26) keep a fixed 6-token span.
    if t >= 26:
        lengths = rng.randint(8, 25, size=batch)
    else:
        lengths = np.full(batch, 6)
    for b in range(batch):
        n = int(lengths[b])
        ids[b, n - 1] = clip_cfg.text.eos_token_id
        ids[b, n:] = 0
        mask[b, :n] = 1
    boxes = rng.rand(batch, p, 4).astype(np.float32) * (s / 2)
    boxes[..., 2:] += boxes[..., :2] + 2
    return {
        "pixel_values": rng.randn(batch, s, s, 3).astype(np.float32) * 0.1,
        "input_ids": ids,
        "attention_mask": mask,
        "teacher_pixels": rng.rand(batch, s, s, 3).astype(np.float32),
        "boxes": boxes,
        "conf": rng.rand(batch, p).astype(np.float32),
        "box_mask": np.ones((batch, p), np.float32),
    }


def add_mesh_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mesh_data", type=int, default=-1,
                   help="data-parallel mesh size (-1: all remaining devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-parallel mesh size")


def mesh_config(args) -> MeshConfig:
    return MeshConfig(
        data_parallel=getattr(args, "mesh_data", -1),
        model_parallel=getattr(args, "mesh_model", 1),
    )


def host_random_variables(model, init_fn, seed: int = 0) -> Dict[str, Any]:
    """Random variables built host-side from eval_shape + numpy.

    Eager flax ``model.init`` issues hundreds of tiny ops — each a
    ~0.35s compile round-trip through a tunneled TPU client (measured:
    ~96s for ViT-B/16) and minutes of real jax CPU init on a small host.
    For smoke tests / serving benches the value distribution only needs
    to be sane, so build numpy arrays from the shape tree and transfer
    once: layernorm-style scales -> 1, biases -> 0, kernels -> N(0, 0.02).
    """
    import numpy as np

    shapes = jax.eval_shape(init_fn)
    host_rng = np.random.RandomState(seed)

    def _fill(path, s):
        name = str(path[-1].key) if path else ""
        if not np.issubdtype(s.dtype, np.floating):
            return np.zeros(s.shape, s.dtype)
        if name == "scale":
            return np.ones(s.shape, s.dtype)
        if name == "bias":
            return np.zeros(s.shape, s.dtype)
        return np.asarray(
            host_rng.standard_normal(s.shape) * 0.02, dtype=s.dtype
        )

    variables = jax.tree_util.tree_map_with_path(_fill, shapes)
    return jax.device_put(variables, jax.devices()[0])


def load_clip(
    preset: str, weights: str, seed: int = 0, compute_dtype: str = "float32",
    fast_init: bool = False,
) -> Tuple[CLIPConfig, CLIPModule, Dict[str, Any]]:
    """Build a CLIPModule + variables from a preset and a weights source.

    compute_dtype: "auto" = bfloat16 on TPU else float32. Params are always
    stored float32; bf16 affects activation compute only (and lets eval
    image embedding pick the fused encoder-block kernels)."""
    import jax.numpy as jnp

    from dclip_tpu.core.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    cfg = CLIPConfig.from_name(preset)
    if compute_dtype == "auto":
        from dclip_tpu.core.platform import default_is_tpu

        compute_dtype = "bfloat16" if default_is_tpu() else "float32"
    model = CLIPModule(cfg, dtype=jnp.dtype(compute_dtype))
    if weights == "random":
        def _init():
            return model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, cfg.text.max_length), jnp.int32),
                jnp.zeros(
                    (1, cfg.vision.image_size, cfg.vision.image_size, 3)
                ),
            )

        variables = host_random_variables(model, _init, seed) if fast_init \
            else _init()
    else:
        from dclip_tpu.models.hf_import import load_pretrained

        variables = {"params": load_pretrained(weights, cfg)}
    return cfg, model, variables


def load_tokenizer(tokenizer_dir: str, max_length: int = 77):
    if tokenizer_dir == "hash":
        from dclip_tpu.data.tokenizer import HashTokenizer

        return HashTokenizer(vocab_size=1000, max_length=max_length)
    from dclip_tpu.data.tokenizer import CLIPTokenizer

    return CLIPTokenizer.from_pretrained_dir(tokenizer_dir, max_length=max_length)


def restore_student_params(checkpoint: str, template_params):
    """Load student params from a CheckpointManager msgpack file: accepts a
    raw params file or a full TrainState file (reference evals load with
    strict=False from Lightning checkpoints, flickr30k_eval.py:126-132)."""
    import flax.serialization

    with open(checkpoint, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "params" in raw:  # full TrainState file
        raw = raw["params"]
    return flax.serialization.from_state_dict(template_params, raw)


def init_multihost() -> None:
    """jax.distributed init for `--multihost` runs.

    Must run before the first backend touch (load_clip compiles). On TPU
    pods the argless form auto-discovers the topology; off-pod (tests,
    custom clusters) the DCLIP_COORDINATOR / DCLIP_NUM_PROCESSES /
    DCLIP_PROCESS_ID env triple spells it out — and must be set together
    (a partial triple gets an explicit error, not a KeyError)."""
    import os

    coord = os.environ.get("DCLIP_COORDINATOR")
    if coord:
        missing = [k for k in ("DCLIP_NUM_PROCESSES", "DCLIP_PROCESS_ID")
                   if not os.environ.get(k)]
        if missing:
            raise SystemExit(
                "DCLIP_COORDINATOR is set but " + ", ".join(missing)
                + " is not — the multihost env triple (DCLIP_COORDINATOR, "
                "DCLIP_NUM_PROCESSES, DCLIP_PROCESS_ID) must be set together"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["DCLIP_NUM_PROCESSES"]),
            process_id=int(os.environ["DCLIP_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()


def fit_with_preemption(
    trainer, train_pipe, val_pipe, checkpoints, logger, start_epoch: int = 0
) -> bool:
    """Run trainer.fit under a PreemptionGuard; True if preempted.

    A SIGTERM (TPU-VM maintenance/spot reclaim) stops training at the next
    step boundary, saves a tagged 'preempt' checkpoint, and returns True
    so CLIs exit 0 — supervisors treat it as a graceful shutdown and a
    later `--resume` restarts from the last epoch checkpoint."""
    from dclip_tpu.train.preemption import Preempted, PreemptionGuard

    try:
        with PreemptionGuard() as guard:
            trainer.fit(train_pipe, val_pipe, checkpoints=checkpoints,
                        logger=logger, start_epoch=start_epoch,
                        preemption=guard)
    except Preempted as e:
        print(f"Preempted (SIGTERM): {e}; state saved, exiting cleanly")
        return True
    return False

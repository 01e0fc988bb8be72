"""Device mesh + sharding helpers.

The reference has no multi-device support of any kind (`devices=1`,
CLIP_image_distill_training.py:39; SURVEY.md §2.5) — this module is the
new capability: a (data, model) mesh over whatever chips exist, with
NamedShardings for batch-sharded data parallelism and replicated params.
Communication is XLA collectives over ICI inserted by the compiler from
these annotations (psum for grad reduction, all-gather for the global
contrastive matrix) — no process groups, no NCCL analogue.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dclip_tpu.core.config import MeshConfig


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a 2-D (data, model) mesh. data=-1 consumes remaining devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(cfg.model_parallel, 1)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp < 1 or dp * mp > n:
        raise ValueError(
            f"mesh {dp}x{mp} needs {max(dp, 1) * mp} devices, have {n}"
        )
    if cfg.data_parallel <= 0 and dp * mp < n:
        print(f"make_mesh: using {dp * mp} of {n} devices ({dp}x{mp})")
    use = devices[: dp * mp]
    # Let mesh_utils pick an ICI-adjacent assignment on real TPU
    # topologies (a naive list reshape can pair model-parallel partners
    # across multiple hops, taxing every TP collective); a flat reshape
    # is fine for CPU test meshes and single-axis layouts.
    from dclip_tpu.core.platform import is_tpu_platform

    grid = None
    if mp > 1 and is_tpu_platform(use[0].platform):
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh((dp, mp), devices=use)
        except Exception:
            grid = None
    if grid is None:
        grid = np.asarray(use).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def make_multislice_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence] = None,
    slice_index_fn=None,
) -> Mesh:
    """Multi-slice mesh: model parallelism inside a slice (ICI), data
    parallelism within AND across slices, with the cross-slice factor
    placed on DCN by mesh_utils' hybrid mesh so collectives route on the
    right fabric.

    Falls back to the flat `make_mesh` only when the devices expose no
    slice topology (single slice / CPU test meshes). Misconfigurations
    (model_parallel not dividing chips-per-slice, data_parallel
    incompatible with the topology, ragged slices) raise instead of
    silently degrading.

    `slice_index_fn(device) -> int` overrides the device's `slice_index`
    attribute — the seam that lets tests and the driver dryrun exercise
    this path on virtual CPU devices (which expose no slice topology).
    With an injected fn the hybrid grid is built directly (slice-major
    data axis, TP inside a slice — the same layout
    `mesh_utils.create_hybrid_device_mesh` produces) because mesh_utils
    reads real device attributes.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    slice_of = slice_index_fn or (lambda d: getattr(d, "slice_index", 0))
    slice_ids = sorted({slice_of(d) for d in devices})
    if len(slice_ids) <= 1:
        return make_mesh(cfg, devices)

    num_slices = len(slice_ids)
    groups = {s: [] for s in slice_ids}
    for d in devices:
        groups[slice_of(d)].append(d)
    sizes = {s: len(g) for s, g in groups.items()}
    if len(set(sizes.values())) != 1:
        raise ValueError(
            f"ragged slices (chips per slice: {sizes}) — a hybrid mesh "
            "needs equal-size slices"
        )
    chips_per_slice = len(devices) // num_slices
    mp = max(cfg.model_parallel, 1)
    if chips_per_slice % mp != 0:
        raise ValueError(
            f"model_parallel={mp} must divide chips-per-slice {chips_per_slice}"
            " (TP collectives must stay on ICI, never cross DCN)"
        )
    intra_dp = chips_per_slice // mp
    dp = num_slices * intra_dp
    if cfg.data_parallel > 0 and cfg.data_parallel != dp:
        raise ValueError(
            f"data_parallel={cfg.data_parallel} incompatible with topology: "
            f"{num_slices} slices x {chips_per_slice} chips / mp={mp} -> dp={dp}"
        )
    if slice_index_fn is not None:
        grid = np.stack(
            [
                np.asarray(groups[s], dtype=object).reshape(intra_dp, mp)
                for s in slice_ids
            ],
            axis=0,
        ).reshape(dp, mp)
    else:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(intra_dp, mp),  # within a slice (ICI)
            dcn_mesh_shape=(num_slices, 1),  # across slices (DCN)
            devices=devices,
        )
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def shard_map_batchwise(fn, mesh: Mesh, data_axis: str = "data",
                        n_args: int = 1):
    """shard_map a batch-parallel `fn(weights_tree, *arrays)` over `data_axis`.

    GSPMD has no partitioning rule for a `pallas_call`: under jit with
    batch-sharded operands it silently ALL-GATHERS them and computes the
    full global batch replicated on every device — zero scaling for
    exactly the kernels the fast paths exist for. shard_map is the
    explicit batch-parallel contract instead: each device runs the kernel
    on its own batch shard, the leading (weight-pytree) argument stays
    replicated, and outputs come back batch-sharded.

    Only valid for fns that are independent per batch row (every fused
    frozen-path kernel here grids over the batch). `n_args` trailing
    array arguments are batch-sharded; None arguments (optional masks)
    pass through as empty pytrees. check_vma off: the static checker
    cannot see through pallas_call.
    """
    from jax import shard_map

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(),) + (P(data_axis),) * n_args,
        out_specs=P(data_axis),
        check_vma=False,
    )


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """device_put every array in a (dataclass or dict) batch, batch-sharded."""
    sh = batch_sharding(mesh, data_axis)
    d = batch.as_dict() if hasattr(batch, "as_dict") else dict(batch)
    return {k: jax.device_put(v, sh) for k, v in d.items()}


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the whole mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def pad_batch_to(batch_dict: dict, multiple: int) -> tuple:
    """Pad leading dim to a multiple of the mesh data size.

    Returns (padded dict, valid_count). Pads by repeating row 0 (masked out
    by callers using valid_count); keeps shapes static across final partial
    batches so jit never recompiles.
    """
    import numpy as np_

    n = next(iter(batch_dict.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch_dict, n
    out = {}
    for k, v in batch_dict.items():
        out[k] = np_.concatenate([v, np_.repeat(v[:1], pad, axis=0)], axis=0)
    return out, n

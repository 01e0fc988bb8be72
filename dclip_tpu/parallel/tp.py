"""Tensor parallelism for the CLIP encoders (GSPMD style).

New capability with no reference counterpart (the reference is strictly
`devices=1`; SURVEY.md §2.5 / §7 step 8 "optional TP for ViT-L/14").

Approach: annotate the parameter tree with PartitionSpecs over the mesh
`model` axis and let XLA's SPMD partitioner insert the ICI collectives —
no manual psums, no code changes in the modules:

- attention q/k/v kernels  [D, D]      -> shard OUTPUT dim (head-parallel)
- attention out_proj       [D, D]      -> shard INPUT dim (+ all-reduce)
- MLP fc1                  [D, 4D]     -> shard OUTPUT dim
- MLP fc2                  [4D, D]     -> shard INPUT dim (+ all-reduce)
- embeddings / LayerNorms / projections -> replicated

The biases of row-sharded layers (out_proj, fc2) stay replicated — XLA adds
them after the partial-sum all-reduce.

Composes with data parallelism: a (data, model) mesh shards the batch on
`data` and these params on `model`; gradients reduce over `data`
automatically because params are replicated along it.
"""
from __future__ import annotations

from typing import Any

import flax
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Path-substring -> spec for a 2-D kernel. First match wins.
_KERNEL_RULES = [
    ("self_attn/q_proj/kernel", lambda ax: P(None, ax)),
    ("self_attn/k_proj/kernel", lambda ax: P(None, ax)),
    ("self_attn/v_proj/kernel", lambda ax: P(None, ax)),
    ("self_attn/out_proj/kernel", lambda ax: P(ax, None)),
    ("mlp/fc1/kernel", lambda ax: P(None, ax)),
    ("mlp/fc2/kernel", lambda ax: P(ax, None)),
    # Column-sharded biases follow their kernel's output sharding.
    ("self_attn/q_proj/bias", lambda ax: P(ax)),
    ("self_attn/k_proj/bias", lambda ax: P(ax)),
    ("self_attn/v_proj/bias", lambda ax: P(ax)),
    ("mlp/fc1/bias", lambda ax: P(ax)),
]


def clip_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for CLIPModule params (TP over `model_axis`)."""
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        name = "/".join(str(k) for k in path)
        spec = P()
        for pat, fn in _KERNEL_RULES:
            if name.endswith(pat):
                spec = fn(model_axis)
                break
        out[path] = spec
        del leaf
    return flax.traverse_util.unflatten_dict(out)


def shard_clip_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put the param tree with TP shardings over the mesh."""
    specs = clip_param_specs(params, model_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def shard_like_clip_params(tree: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """device_put an ARBITRARY pytree (e.g. optax moments, whose mu/nu
    subtrees mirror the param dict) with the TP specs matched on trailing
    param paths; unmatched leaves replicate.

    This is what keeps resumed optimizer state TP-sharded: adam moments
    are param-shaped, so replicating them on restore doubles per-device
    optimizer memory exactly when TP was chosen FOR memory. Fresh inits
    inherit the params' shardings from tx.init; this gives restores the
    same placement."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = []
    for path, leaf in leaves:
        name = "/".join(_key_str(k) for k in path)
        spec = P()
        for pat, fn in _KERNEL_RULES:
            if name.endswith(pat):
                spec = fn(model_axis)
                break
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def head_divisibility_check(num_heads: int, mesh: Mesh, model_axis: str = "model"):
    """TP shards attention by output dim; heads must divide the axis size so
    each shard holds whole heads."""
    size = mesh.shape[model_axis]
    if num_heads % size != 0:
        raise ValueError(
            f"num_heads={num_heads} not divisible by model-parallel size {size}"
        )

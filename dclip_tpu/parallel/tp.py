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


def head_divisibility_check(num_heads: int, mesh: Mesh, model_axis: str = "model"):
    """TP shards attention by output dim; heads must divide the axis size so
    each shard holds whole heads."""
    size = mesh.shape[model_axis]
    if num_heads % size != 0:
        raise ValueError(
            f"num_heads={num_heads} not divisible by model-parallel size {size}"
        )

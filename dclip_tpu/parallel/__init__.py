"""Mesh/sharding layer: the reference has none (SURVEY.md §2.5); here DP/TP
are first-class via jax.sharding + XLA collectives over ICI."""
from dclip_tpu.parallel.mesh import (
    make_multislice_mesh,
    batch_sharding,
    make_mesh,
    pad_batch_to,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_multislice_mesh",
    "pad_batch_to",
    "replicate_tree",
    "replicated",
    "shard_batch",
]

"""Projection MLPs, Flax equivalents of the reference's torch modules.

- `TextProjectionModule`: BERT 768 -> 1024 -> ReLU -> CLIP 512
  (reference training/text_projection_module.py:4-31).
- `ImageProjectionModule`: concat(CLIP 512, 4 bbox coords) -> 1024 -> ReLU
  -> 1024 -> ReLU -> 512; position-conditioned patch refinement
  (reference training/image_projection_module.py:5-36).
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp


class TextProjectionModule(nn.Module):
    clip_dim: int = 512
    hidden_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bert_embedding: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(bert_embedding)
        x = nn.relu(x)
        return nn.Dense(self.clip_dim, dtype=self.dtype, name="fc2")(x)


class ImageProjectionModule(nn.Module):
    clip_dim: int = 512
    hidden_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, context_features: jnp.ndarray, positions: jnp.ndarray
    ) -> jnp.ndarray:
        """context_features [..., clip_dim], positions [..., 4] -> [..., clip_dim]."""
        x = jnp.concatenate([context_features, positions], axis=-1)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        return nn.Dense(self.clip_dim, dtype=self.dtype, name="fc3")(x)


def init_image_projection(rng, clip_dim: int = 512) -> Tuple[ImageProjectionModule, Any]:
    """(module, params) for a fresh position-conditioned projection head."""
    module = ImageProjectionModule(clip_dim=clip_dim)
    params = module.init(
        rng, jnp.zeros((1, clip_dim)), jnp.zeros((1, 4))
    )["params"]
    return module, params


def save_image_projection(path: str, params: Any) -> None:
    from dclip_tpu.train.checkpoint import save_state

    save_state(path, params)


def load_image_projection(path: str, clip_dim: int = 512) -> Tuple[ImageProjectionModule, Any]:
    """Load projection params (flax msgpack) for the knn gate's middle branch
    (reference image_tokenizer.py:278-315 'projection' source)."""
    import jax

    from dclip_tpu.train.checkpoint import restore_state

    module, template = init_image_projection(jax.random.PRNGKey(0), clip_dim)
    return module, restore_state(path, template)


def projection_apply_fn(module: ImageProjectionModule, params: Any) -> Callable:
    """(queries [Q, D], positions [Q, 4]) -> [Q, D], the `projection_fn`
    contract of ops.knn.knn_or_projection / train.base.apply_knn_gate."""
    return lambda q, pos: module.apply({"params": params}, q, pos)

"""Projection MLPs, Flax equivalents of the reference's torch modules.

- `TextProjectionModule`: BERT 768 -> 1024 -> ReLU -> CLIP 512
  (reference training/text_projection_module.py:4-31).
- `ImageProjectionModule`: concat(CLIP 512, 4 bbox coords) -> 1024 -> ReLU
  -> 1024 -> ReLU -> 512; position-conditioned patch refinement
  (reference training/image_projection_module.py:5-36).
"""
from __future__ import annotations

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

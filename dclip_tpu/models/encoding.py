"""Shared batched-encode helper: one jitted forward, pad-to-batch tails.

Used by the retrieval eval (eval/retrieval.py) and the patch-index builder
(data/index.py) so the pad/stack/slice idiom exists once.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dclip_tpu.models.clip import CLIPModule


def make_image_encoder(
    model: CLIPModule, variables: Dict[str, Any], batch_size: int = 256
) -> Callable[[Sequence[np.ndarray]], np.ndarray]:
    """Returns encode(pixels) mapping a list/array of preprocessed NHWC
    images -> [N, D] features, in fixed-size jitted batches (the tail batch
    is zero-padded so one compiled shape serves every call)."""
    fwd = jax.jit(lambda v, p: model.apply(v, p, method=model.get_image_features))

    def encode(pixels: Sequence[np.ndarray]) -> np.ndarray:
        out = []
        for start in range(0, len(pixels), batch_size):
            chunk = np.stack(pixels[start : start + batch_size])
            n = chunk.shape[0]
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n,) + chunk.shape[1:], chunk.dtype)]
                )
            out.append(np.asarray(fwd(variables, jnp.asarray(chunk)))[:n])
        return (
            np.concatenate(out, 0)
            if out
            else np.zeros((0,), np.float32)
        )

    return encode

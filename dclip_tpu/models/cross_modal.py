"""Bidirectional cross-modal attention (the meta-teacher's core block).

Flax equivalent of the reference's `CrossModalAttention`
(training/patch_text_aggregation.py:13-46): two multi-head attention blocks
with torch `nn.MultiheadAttention` parameterization (packed-equivalent
q/k/v/out projections, all biased), each followed by residual + LayerNorm:

    attended_text  = LN(text  + MHA(q=text,  kv=image))
    attended_image = LN(image + MHA(q=image, kv=text))

TPU deltas: optional key-padding masks make padded patch/token slots inert
(the reference attends over zero-padding — see SURVEY.md §7 "Raggedness").
With masks omitted the numerics match torch exactly (tests/test_cross_modal.py).

The sequences here are tiny (<=77 text tokens x <=32 patches,
SURVEY.md §5 "long-context"), so the whole bidirectional block fuses into a
couple of MXU matmuls under jit; `dclip_tpu.kernels.cross_attention` provides
the single-kernel Pallas version for the training hot loop.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG = jnp.finfo(jnp.float32).min


class MultiheadCrossAttention(nn.Module):
    """Single-direction MHA, torch nn.MultiheadAttention numerics."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, D]
        key_value: jnp.ndarray,  # [B, K, D]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, K], 1 = valid
    ) -> jnp.ndarray:
        head_dim = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(key_value)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(key_value)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q * (head_dim**-0.5),
            k,
            preferred_element_type=jnp.float32,
        )
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :] > 0, logits, _NEG
            )
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class CrossModalAttention(nn.Module):
    """Bidirectional text<->image cross-attention with residual + LayerNorm."""

    embed_dim: int = 512
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        text_embedding: jnp.ndarray,  # [B, T, D]
        image_embedding: jnp.ndarray,  # [B, P, D]
        text_mask: Optional[jnp.ndarray] = None,  # [B, T], 1 = valid
        image_mask: Optional[jnp.ndarray] = None,  # [B, P], 1 = valid
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # epsilon=1e-5: torch nn.LayerNorm's default (flax defaults to 1e-6;
        # this block's numerics are pinned to the torch reference).
        t2i = MultiheadCrossAttention(
            self.embed_dim, self.num_heads, self.dtype, name="text_to_image"
        )(text_embedding, image_embedding, key_padding_mask=image_mask)
        attended_text = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="norm_text"
        )(text_embedding + t2i)
        i2t = MultiheadCrossAttention(
            self.embed_dim, self.num_heads, self.dtype, name="image_to_text"
        )(image_embedding, text_embedding, key_padding_mask=text_mask)
        attended_image = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="norm_image"
        )(image_embedding + i2t)
        return attended_text, attended_image


def import_torch_cross_modal(sd) -> dict:
    """Convert a torch `CrossModalAttention` state_dict (reference teacher
    checkpoints, train_contrastive_teacher.py:393-402) to Flax params.

    torch nn.MultiheadAttention packs q/k/v as in_proj_weight [3D, D]; we
    split it into our q/k/v Dense kernels (transposed to [in, out]).
    """
    import numpy as np

    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    def mha(prefix):
        w = _np(sd[f"{prefix}.in_proj_weight"])
        b = _np(sd[f"{prefix}.in_proj_bias"])
        d = w.shape[1]
        return {
            "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
            "k_proj": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
            "v_proj": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
            "out_proj": {
                "kernel": _np(sd[f"{prefix}.out_proj.weight"]).T,
                "bias": _np(sd[f"{prefix}.out_proj.bias"]),
            },
        }

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    return {
        "text_to_image": mha("text_to_image"),
        "image_to_text": mha("image_to_text"),
        "norm_text": ln("norm_text"),
        "norm_image": ln("norm_image"),
    }

"""Flax CLIP dual encoder, numerically matching HF `CLIPModel`.

This is the TPU-native replacement for every `CLIPModel.from_pretrained(...)`
forward in the reference (training/image_tokenizer.py:25,
training/text_tokenizer.py:22, eval_scripts/flickr30k_eval.py:109, ...).
All sequence lengths are static (77 text tokens, fixed patch grid), so the
whole forward jits once and runs on the MXU in large batches.

Numerics verified against torch `transformers.CLIPModel` in
tests/test_clip_parity.py (random weights, CPU): quick-GELU, LayerNorm
eps=1e-5, causal text attention, EOS-token pooling, CLS pooling +
post-layernorm for vision, bias-free patch conv.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig, CLIPTextConfig, CLIPVisionConfig


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class MLP(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Attention(nn.Module):
    """Multi-head self-attention with HF CLIP parameterization.

    `fused=True` routes attention through the Pallas fused kernel
    (`kernels.vit_attention`) — the [B, h, S, S] logits/probs never touch
    HBM. Both encoders run fused: the kernel applies the causal mask
    in-kernel (iota) and takes the [B, S] key-padding mask, so the text
    path is covered too.
    """

    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    interpret: bool = False
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        padding_mask: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
    ):
        # x: [B, S, D]; padding_mask: [B, S], 1 = valid key position.
        # attn_bias: additive [B, 1, S, S] f32 replacing the internally
        # built causal/padding mask — an XLA-path-only escape hatch.
        # segment_ids: [B, S] int (packed captions, ops/packing.py): the
        # fused kernel applies within-segment causality IN-KERNEL (no
        # [B, 1, S, S] bias tensor is ever built), so the packed text
        # tower stays on the Pallas path; the XLA path masks with it too.
        head_dim = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(x)

        if self.fused and attn_bias is None:
            from dclip_tpu.kernels.vit_attention import self_attention_trainable

            out = self_attention_trainable(
                q, k, v, num_heads=self.heads, padding_mask=padding_mask,
                causal=self.causal, segment_ids=segment_ids,
                interpret=self.interpret,
            )
            return nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(out)

        b, s, _ = x.shape
        neg = jnp.finfo(jnp.float32).min
        if attn_bias is not None:
            mask = attn_bias
        else:
            mask = None
            if self.causal:
                mask = jnp.triu(jnp.full((s, s), neg, dtype=jnp.float32), k=1)[
                    None, None, :, :
                ]
            if padding_mask is not None:
                pad = jnp.where(padding_mask[:, None, None, :] > 0, 0.0, neg)
                mask = pad if mask is None else mask + pad
            if segment_ids is not None:
                same = (
                    segment_ids[:, None, :, None]
                    == segment_ids[:, None, None, :]
                )
                seg = jnp.where(same, 0.0, neg)
                mask = seg if mask is None else mask + seg

        def split(t):
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = head_dim**-0.5
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(out)


class _LNParams(nn.Module):
    """Declares LayerNorm params (same names/init as nn.LayerNorm) without
    running the normalization — feeds the fused frozen-MLP kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params without the matmul."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(), (self.din, self.dout)
            ),
            self.param("bias", nn.initializers.zeros, (self.dout,)),
        )


class _MLPParams(nn.Module):
    din: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.din, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.din, name="fc2")()
        return w1, b1, w2, b2


class _AttnParams(nn.Module):
    """Declares the Attention submodule's params (same names/shapes as
    `Attention`'s q/k/v/out Dense layers) without running the math —
    feeds the fused trainable attention-block kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, self.dim, name="q_proj")(),
            _DenseParams(self.dim, self.dim, name="k_proj")(),
            _DenseParams(self.dim, self.dim, name="v_proj")(),
            _DenseParams(self.dim, self.dim, name="out_proj")(),
        )


class EncoderLayer(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    eps: float
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    interpret: bool = False
    causal: bool = False
    # Route LN2+MLP through the frozen-weight fused kernel pair
    # (kernels/mlp_frozen.py). ONLY valid while the layer's LN2/MLP params
    # are excluded from the optimizer: the kernel's VJP returns zero
    # weight cotangents by construction. Param tree is unchanged.
    fused_frozen_mlp: bool = False
    # Route LN2+MLP through the TRAINABLE fused kernel trio
    # (kernels/mlp_trainable.py): real cotangents for all six weights,
    # valid under any optimizer mask. Param tree is unchanged.
    fused_trainable_mlp: bool = False
    # Route LN1+QKV+attention+out_proj+residual through the fully fused
    # TRAINABLE block kernel (kernels/attn_block_trainable.py): real
    # cotangents for all ten weights, valid under any mask. Maskless only
    # (the vision tower); falls back to the per-op path when the call
    # carries causal/padding/packed masks. Param tree is unchanged.
    fused_trainable_attn_block: bool = False

    @nn.compact
    def __call__(self, x, padding_mask=None, attn_bias=None,
                 segment_ids=None):
        if (
            self.fused_trainable_attn_block
            and not self.causal
            and padding_mask is None
            and attn_bias is None
            and segment_ids is None
        ):
            from dclip_tpu.kernels.attn_block_trainable import (
                attention_block_trainable,
            )

            ln_s, ln_b = _LNParams(self.hidden, name="layer_norm1")()
            (wq, bq), (wk, bk), (wv, bv), (wo, bo) = _AttnParams(
                self.hidden, name="self_attn"
            )()
            x = attention_block_trainable(
                x, ln_s, ln_b, wq, bq, wk, bk, wv, bv, wo, bo,
                num_heads=self.heads, eps=self.eps, interpret=self.interpret,
            )
        else:
            h = nn.LayerNorm(
                epsilon=self.eps, dtype=self.dtype, name="layer_norm1"
            )(x)
            x = x + Attention(
                self.hidden, self.heads, self.dtype, self.fused,
                self.interpret, self.causal, name="self_attn",
            )(h, padding_mask, attn_bias, segment_ids)
        if self.fused_frozen_mlp or self.fused_trainable_mlp:
            if self.fused_trainable_mlp:
                from dclip_tpu.kernels.mlp_trainable import (
                    mlp_block_trainable as mlp_block,
                )
            else:
                from dclip_tpu.kernels.mlp_frozen import (
                    mlp_block_frozen as mlp_block,
                )

            ln_s, ln_b = _LNParams(self.hidden, name="layer_norm2")()
            w1, b1, w2, b2 = _MLPParams(self.hidden, self.mlp_dim, name="mlp")()
            return mlp_block(
                x, ln_s, ln_b, w1, b1, w2, b2,
                eps=self.eps, interpret=self.interpret,
            )
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        x = x + MLP(self.mlp_dim, self.hidden, self.dtype, name="mlp")(h)
        return x


class Encoder(nn.Module):
    num_layers: int
    hidden: int
    heads: int
    mlp_dim: int
    eps: float
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused: bool = False
    interpret: bool = False
    causal: bool = False
    fused_frozen_mlp: bool = False
    fused_trainable_mlp: bool = False
    fused_trainable_attn_block: bool = False

    @nn.compact
    def __call__(self, x, padding_mask=None, attn_bias=None,
                 segment_ids=None):
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=())
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden,
                self.heads,
                self.mlp_dim,
                self.eps,
                self.dtype,
                self.fused,
                self.interpret,
                self.causal,
                self.fused_frozen_mlp,
                self.fused_trainable_mlp,
                self.fused_trainable_attn_block,
                name=f"layers_{i}",
            )(x, padding_mask, attn_bias, segment_ids)
        return x


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused_attention: bool = False
    pallas_interpret: bool = False
    # Fused TRAINABLE MLP blocks (kernels/mlp_trainable.py): the text
    # stack is trainable under the default distillation mask, so it needs
    # the real-weight-cotangent kernel, not the frozen one.
    fused_trainable_mlp: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
    ):
        """Standard mode: [B, 77] one caption per row, causal + padding
        masks, EOS-pooled.

        Packed mode (`segment_ids` + `positions` given, ops/packing.py):
        several captions share a row; attention is within-segment causal
        via an additive bias, position embeddings index per-caption
        positions, and POOLING IS THE CALLER'S JOB (a row holds several
        EOS tokens) — the returned `pooled` is a placeholder (row head).
        """
        c = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.max_length, c.hidden_size),
        ).astype(self.dtype)
        attn_bias = None
        encoder_segments = None
        if segment_ids is not None:
            x = tok + jnp.take(pos, positions, axis=0)
            attention_mask = None
            if self.fused_attention:
                # The fused kernel applies within-segment causality
                # in-kernel — no [R, 1, S, S] bias tensor, and the packed
                # text tower keeps the Pallas fast path.
                encoder_segments = segment_ids
            else:
                from dclip_tpu.ops.packing import packed_attention_bias

                attn_bias = packed_attention_bias(segment_ids)
        else:
            x = tok + pos[None, :s, :]

        # HF CLIP text attention is causal; key padding comes from
        # attention_mask. Both are applied inside Attention (additive mask
        # on the XLA path, in-kernel iota/row masks on the fused path).
        # Packed mode replaces both with within-segment causality: an
        # additive bias tensor on the XLA path, in-kernel segment ids on
        # the fused path (no [R, 1, S, S] bias is ever materialized).
        x = Encoder(
            c.num_layers,
            c.hidden_size,
            c.num_heads,
            c.mlp_dim,
            c.layer_norm_eps,
            self.dtype,
            self.remat,
            self.fused_attention,
            self.pallas_interpret,
            causal=True,
            fused_trainable_mlp=self.fused_trainable_mlp,
            name="encoder",
        )(x, attention_mask, attn_bias, encoder_segments)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)

        if segment_ids is not None:
            return x, x[:, 0]  # placeholder pooled; caller gathers EOS

        # Pool at the EOS token (HF: first position where id == eos_token_id).
        is_eos = (input_ids == c.eos_token_id).astype(jnp.int32)
        eos_idx = jnp.argmax(is_eos, axis=-1)
        # If no EOS present fall back to last position.
        eos_idx = jnp.where(is_eos.sum(-1) > 0, eos_idx, s - 1)
        pooled = x[jnp.arange(b), eos_idx]
        return x, pooled


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused_attention: bool = False
    pallas_interpret: bool = False
    fused_frozen_mlp: bool = False
    fused_trainable_attn_block: bool = False

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: [B, H, W, 3] (NHWC — TPU-native layout)."""
        c = self.cfg
        b = pixel_values.shape[0]
        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        x = x.reshape(b, -1, c.hidden_size)  # [B, P, D]
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.tile(cls[None, None, :], (b, 1, 1)), x], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.num_patches + 1, c.hidden_size),
        ).astype(self.dtype)
        x = x + pos[None]
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="pre_layernorm"
        )(x)
        x = Encoder(
            c.num_layers,
            c.hidden_size,
            c.num_heads,
            c.mlp_dim,
            c.layer_norm_eps,
            self.dtype,
            self.remat,
            self.fused_attention,
            self.pallas_interpret,
            fused_frozen_mlp=self.fused_frozen_mlp,
            fused_trainable_attn_block=self.fused_trainable_attn_block,
            name="encoder",
        )(x)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(pooled)
        return x, pooled


class CLIPModule(nn.Module):
    """Dual-encoder CLIP with projection heads and learnable logit scale.

    `fused_attention=True` uses the Pallas fused self-attention in BOTH
    encoders (the kernel handles the text path's causal + padding masks
    in-kernel) — parameter trees and numerics are unchanged, only the
    schedule is.
    """

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused_attention: bool = False
    pallas_interpret: bool = False
    # Fused frozen-weight MLP blocks in the VISION encoder only (the text
    # stack is trainable by default — its MLP weights need real grads).
    # See kernels/mlp_frozen.py for the zero-weight-cotangent contract.
    fused_frozen_mlp: bool = False
    # Fused TRAINABLE MLP blocks in the TEXT encoder (real weight
    # cotangents; kernels/mlp_trainable.py) — valid under any mask.
    fused_trainable_text_mlp: bool = False
    # Fully fused TRAINABLE attention block in the VISION encoder
    # (LN1+QKV+attention+out_proj+residual, real weight cotangents;
    # kernels/attn_block_trainable.py). The text path keeps the fused
    # per-op attention — its causal/padding masks live there.
    fused_trainable_attn_block: bool = False

    def setup(self):
        self.text_model = CLIPTextEncoder(
            self.cfg.text, self.dtype, self.remat,
            self.fused_attention, self.pallas_interpret,
            fused_trainable_mlp=self.fused_trainable_text_mlp,
        )
        self.vision_model = CLIPVisionEncoder(
            self.cfg.vision, self.dtype, self.remat,
            self.fused_attention, self.pallas_interpret,
            fused_frozen_mlp=self.fused_frozen_mlp,
            fused_trainable_attn_block=self.fused_trainable_attn_block,
        )
        self.text_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype
        )
        self.visual_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _: jnp.asarray(self.cfg.logit_scale_init, jnp.float32),
        )

    def get_text_features(self, input_ids, attention_mask=None):
        _, pooled = self.text_model(input_ids, attention_mask)
        return self.text_projection(pooled)

    def get_packed_text_features(
        self, packed_ids, packed_segments, packed_positions,
        packed_eos_rows, packed_eos_cols,
    ):
        """get_text_features over a PACKED batch (ops.packing.pack_captions):
        encodes R << B dense rows, then gathers each original caption's EOS
        state — output order and numerics match per-caption encoding (the
        segment bias reproduces the causal+padding mask a caption sees
        alone; parity pinned in tests/test_packing.py)."""
        hidden, _ = self.text_model(
            packed_ids, None, segment_ids=packed_segments,
            positions=packed_positions,
        )
        pooled = hidden[packed_eos_rows, packed_eos_cols]
        return self.text_projection(pooled)

    def get_token_features(self, input_ids, attention_mask=None):
        """Token-level text features: text_projection applied to every
        last-hidden-state token (reference text_tokenizer.py:195-213)."""
        hidden, pooled = self.text_model(input_ids, attention_mask)
        return self.text_projection(hidden), self.text_projection(pooled)

    def get_image_features(self, pixel_values):
        _, pooled = self.vision_model(pixel_values)
        return self.visual_projection(pooled)

    def get_patch_features(self, pixel_values):
        """Projected per-patch features (for region encoders)."""
        hidden, pooled = self.vision_model(pixel_values)
        return self.visual_projection(hidden), self.visual_projection(pooled)

    def __call__(self, input_ids, pixel_values, attention_mask=None):
        txt = self.get_text_features(input_ids, attention_mask)
        img = self.get_image_features(pixel_values)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_text = scale * txt @ img.T
        return logits_per_text.T, logits_per_text  # (per_image, per_text)

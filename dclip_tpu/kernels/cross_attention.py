"""Fused bidirectional cross-attention Pallas kernel.

The meta-teacher's core block (reference CrossModalAttention,
training/patch_text_aggregation.py:13-46; Flax twin in
dclip_tpu.models.cross_modal) as ONE TPU kernel per batch tile:

    attended_text  = LN(text  + MHA(q=text,  kv=image))
    attended_image = LN(image + MHA(q=image, kv=text))

Sequences are tiny (<=77 text tokens x <=32 patches, SURVEY.md §5), so both
directions — 8 projections, 2 softmax attentions, residuals, LayerNorms —
fit one VMEM-resident fusion with zero HBM round-trips between ops. The
grid runs over the batch; every program loads the shared weights (VMEM-
replicated via constant index maps) and one batch row of activations.

Used on the no-grad teacher path (distillation targets run under
stop_gradient) and in eval; the Flax module remains the differentiable
reference implementation, and the kernel is parity-tested against it
(tests/test_kernels.py, interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _mha(q_in, kv_in, wq, bq, wk, bk, wv, bv, wo, bo, kv_mask, num_heads):
    """One attention direction on [S_q, D] x [S_k, D] blocks (f32).

    Heads run as a static Python loop over 2-D slices: Mosaic cannot
    shape-cast the lane dim ([S, D] -> [S, H, hd] needs hd % 128 == 0),
    and with S <= 77 per-head [S_q, S_k] tiles are tiny anyway.
    """
    d = q_in.shape[-1]
    head_dim = d // num_heads
    q = jnp.dot(q_in, wq, preferred_element_type=jnp.float32) + bq
    k = jnp.dot(kv_in, wk, preferred_element_type=jnp.float32) + bk
    v = jnp.dot(kv_in, wv, preferred_element_type=jnp.float32) + bv
    scale = head_dim**-0.5
    outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        logits = jax.lax.dot_general(
            qh * scale,
            kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_q, S_k]
        if kv_mask is not None:
            logits = jnp.where(kv_mask[None, :] > 0, logits, _NEG)
        probs = jax.nn.softmax(logits, axis=-1)
        outs.append(
            jnp.dot(probs, vh, preferred_element_type=jnp.float32)
        )  # [S_q, hd]
    out = jnp.concatenate(outs, axis=-1)
    return jnp.dot(out, wo, preferred_element_type=jnp.float32) + bo


from dclip_tpu.kernels.vit_block import _layer_norm as _ln_impl


def _layer_norm(x, scale, bias, eps=1e-5):
    return _ln_impl(x, scale, bias, eps)


def _kernel(
    num_heads: int,
    use_masks: bool,
    # refs (order matters; masks only present when use_masks):
    *refs,
):
    if use_masks:
        (text_ref, image_ref, tmask_ref, imask_ref, *w_refs) = refs[:-2]
    else:
        (text_ref, image_ref, *w_refs) = refs[:-2]
        tmask_ref = imask_ref = None
    out_text_ref, out_image_ref = refs[-2], refs[-1]
    (
        wq_t, bq_t, wk_t, bk_t, wv_t, bv_t, wo_t, bo_t,
        wq_i, bq_i, wk_i, bk_i, wv_i, bv_i, wo_i, bo_i,
        lnt_s, lnt_b, lni_s, lni_b,
    ) = (r[:] for r in w_refs)

    txt = text_ref[0].astype(jnp.float32)  # [T, D]
    img = image_ref[0].astype(jnp.float32)  # [P, D]
    # Masks arrive as FULL [B, S] blocks (a [1, S] block would violate the
    # lane-dim tiling rule); select this program's row.
    b_idx = pl.program_id(0)
    tmask = tmask_ref[b_idx, :] if tmask_ref is not None else None
    imask = imask_ref[b_idx, :] if imask_ref is not None else None

    t2i = _mha(txt, img, wq_t, bq_t, wk_t, bk_t, wv_t, bv_t, wo_t, bo_t,
               imask, num_heads)
    out_text_ref[0] = _layer_norm(txt + t2i, lnt_s, lnt_b).astype(
        out_text_ref.dtype
    )
    i2t = _mha(img, txt, wq_i, bq_i, wk_i, bk_i, wv_i, bv_i, wo_i, bo_i,
               tmask, num_heads)
    out_image_ref[0] = _layer_norm(img + i2t, lni_s, lni_b).astype(
        out_image_ref.dtype
    )


def _flatten_params(params: Dict[str, Any]):
    def mha_mats(p):
        return [
            p["q_proj"]["kernel"], p["q_proj"]["bias"],
            p["k_proj"]["kernel"], p["k_proj"]["bias"],
            p["v_proj"]["kernel"], p["v_proj"]["bias"],
            p["out_proj"]["kernel"], p["out_proj"]["bias"],
        ]

    return (
        mha_mats(params["text_to_image"])
        + mha_mats(params["image_to_text"])
        + [
            params["norm_text"]["scale"], params["norm_text"]["bias"],
            params["norm_image"]["scale"], params["norm_image"]["bias"],
        ]
    )


def _xla_reference(params, text, image, text_mask, image_mask, num_heads):
    """The Flax CrossModalAttention module itself — THE differentiable
    reference (dclip_tpu.models.cross_modal) — used for the recompute
    backward of `cross_attention_trainable`. One implementation to keep in
    sync with the kernel, not two."""
    from dclip_tpu.models.cross_modal import CrossModalAttention

    module = CrossModalAttention(embed_dim=text.shape[-1], num_heads=num_heads)
    return module.apply(
        {"params": params},
        text.astype(jnp.float32),
        image.astype(jnp.float32),
        text_mask=text_mask,
        image_mask=image_mask,
    )


def cross_attention_trainable(
    params: Dict[str, Any],
    text: jnp.ndarray,
    image: jnp.ndarray,
    text_mask: Optional[jnp.ndarray] = None,
    image_mask: Optional[jnp.ndarray] = None,
    num_heads: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused cross-attention: Pallas forward + rematerialized
    XLA backward.

    The forward runs the fused kernel; the VJP recomputes the forward in XLA
    and differentiates it (flash-attention-style recompute: no attention
    residuals are stored). Gradients flow into params AND both input
    streams, so the teacher trainer can use the kernel on its hot path.
    """
    # Normalize single-sided masks to a pair: the fused kernel takes both
    # or neither, and a silently dropped mask would make the forward and
    # the recompute backward disagree.
    if text_mask is None and image_mask is None:
        masks = None
    else:
        if text_mask is None:
            text_mask = jnp.ones(text.shape[:2], jnp.float32)
        if image_mask is None:
            image_mask = jnp.ones(image.shape[:2], jnp.float32)
        masks = (text_mask, image_mask)

    @jax.custom_vjp
    def fwd_fn(params, text, image, masks):
        tm, im = masks if masks is not None else (None, None)
        return cross_attention_fused(
            params, text, image, tm, im, num_heads=num_heads, interpret=interpret
        )

    def fwd(params, text, image, masks):
        return fwd_fn(params, text, image, masks), (params, text, image, masks)

    def bwd(res, g):
        params, text, image, masks = res
        tm, im = masks if masks is not None else (None, None)
        _, vjp = jax.vjp(
            lambda p, t, i: _xla_reference(p, t, i, tm, im, num_heads),
            params, text, image,
        )
        dp, dt, di = vjp(g)
        return dp, dt.astype(text.dtype), di.astype(image.dtype), None

    fwd_fn.defvjp(fwd, bwd)
    return fwd_fn(params, text, image, masks)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def cross_attention_fused(
    params: Dict[str, Any],
    text: jnp.ndarray,  # [B, T, D]
    image: jnp.ndarray,  # [B, P, D]
    text_mask: Optional[jnp.ndarray] = None,  # [B, T]
    image_mask: Optional[jnp.ndarray] = None,  # [B, P]
    num_heads: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward. params = CrossModalAttention flax param dict."""
    b, t, d = text.shape
    p = image.shape[1]
    use_masks = text_mask is not None or image_mask is not None
    if use_masks:
        # Normalize single-sided masks so neither is silently dropped.
        if text_mask is None:
            text_mask = jnp.ones((b, t), jnp.float32)
        if image_mask is None:
            image_mask = jnp.ones((b, p), jnp.float32)
    weights = _flatten_params(params)

    row = lambda i: (i, 0, 0)  # noqa: E731
    rep2 = lambda i: (0, 0)  # noqa: E731
    rep1 = lambda i: (0,)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, d), row, memory_space=pltpu.VMEM),
    ]
    inputs = [text, image]
    if use_masks:
        in_specs += [
            pl.BlockSpec((b, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [text_mask.astype(jnp.float32), image_mask.astype(jnp.float32)]
    for w in weights:
        spec = rep2 if w.ndim == 2 else rep1
        in_specs.append(
            pl.BlockSpec(w.shape, spec, memory_space=pltpu.VMEM)
        )
        inputs.append(w.astype(jnp.float32))

    out_shape = (
        jax.ShapeDtypeStruct((b, t, d), text.dtype),
        jax.ShapeDtypeStruct((b, p, d), image.dtype),
    )
    out_specs = (
        pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, d), row, memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, num_heads, use_masks)
    flops_mha = 2 * d * d * (t + p) * 4 + 2 * t * p * d * 2
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * flops_mha, bytes_accessed=4 * b * (t + p) * d * 2,
            transcendentals=b * (t * p) * 2,
        ),
    )(*inputs)

"""Fused self-attention Pallas kernel for the CLIP ViT encoders.

The ViT forward is the framework's FLOP budget (8 region crops + the
student image per distillation step), and its XLA attention materializes
the [B, heads, S, S] logits/probs tensors in HBM every layer — at the
bench shape (512 crops, 12 heads, S=197) that is ~1 GB of traffic per
layer, which is what caps the measured MFU well below the MXU roof. This
kernel keeps the whole softmax(QK^T)V for one batch row VMEM-resident:
per program it loads q/k/v [S, D] once, loops heads as static [S, hd]
slices (Mosaic cannot lane-split D in the BlockSpec, so the split happens
in-kernel — same pattern as kernels.cross_attention), and writes only the
[S, D] output. HBM traffic per layer drops from O(B*h*S^2) to O(B*S*D).

The QKV/output projections stay in XLA: they are plain GEMMs the MXU
already runs at speed-of-light, and XLA fuses the bias adds.

`self_attention_trainable` wraps the kernel in a custom VJP whose backward
is a second Pallas kernel recomputing P in VMEM and emitting dq/dk/dv
(flash-style: nothing but q/k/v is saved, no [B, h, S, S] tensor reaches
HBM in either direction).

Masking: `causal=True` applies the autoregressive mask in-kernel (iota
comparison — the CLIP text encoder is causal, models/clip.py) and
`padding_mask` [B, S] masks key positions, so BOTH encoders run fused.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_NEG = -1e30


def _mask_logits(logits, causal: bool, pad_row):
    """Apply causal / key-padding masks to one [S, S] logits tile."""
    s = logits.shape[0]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where(col <= row, logits, _NEG)
    if pad_row is not None:
        logits = jnp.where(pad_row[None, :] > 0, logits, _NEG)
    return logits


def _kernel(num_heads: int, scale: float, causal: bool, use_pad: bool, *refs):
    if use_pad:
        q_ref, k_ref, v_ref, pad_ref, o_ref = refs
        pad_row = pad_ref[pl.program_id(0), :]
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        pad_row = None
    # Matmul inputs stay in the input dtype (bf16 on TPU — f32 inputs run
    # the MXU at half rate); accumulation and softmax are f32. The scale
    # is applied to the f32 logits, not the bf16 operand (better rounding
    # AND no extra VPU pass over q).
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    head_dim = d // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        logits = scale * jax.lax.dot_general(
            q[:, sl],
            k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] f32
        probs = jax.nn.softmax(_mask_logits(logits, causal, pad_row), axis=-1)
        outs.append(
            jnp.dot(
                probs.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def self_attention_fused(
    q: jnp.ndarray,  # [B, S, D] (post q_proj)
    k: jnp.ndarray,  # [B, S, D]
    v: jnp.ndarray,  # [B, S, D]
    num_heads: int,
    padding_mask: Optional[jnp.ndarray] = None,  # [B, S], 1 = valid key
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(mask(q k^T / sqrt(hd))) v per head, fused per batch row."""
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    row = lambda i: (i, 0, 0)  # noqa: E731
    spec = pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    inputs = [q, k, v]
    use_pad = padding_mask is not None
    if use_pad:
        # Full [B, S] block (a [1, S] block would break lane tiling);
        # the kernel selects its program row.
        in_specs.append(
            pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(padding_mask.astype(jnp.float32))
    flops = 2 * 2 * s * s * d  # QK^T + PV
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, scale, causal, use_pad),
        grid=(b,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=4 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(*inputs)


def _xla_attention(q, k, v, num_heads, padding_mask=None, causal=False):
    """XLA twin (the parity reference)."""
    b, s, d = q.shape
    head_dim = d // num_heads

    def split(t):
        return t.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q.astype(jnp.float32)), split(k.astype(jnp.float32)), split(
        v.astype(jnp.float32)
    )
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * head_dim**-0.5, kh,
        preferred_element_type=jnp.float32,
    )
    if causal:
        cm = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(cm[None, None], logits, _NEG)
    if padding_mask is not None:
        logits = jnp.where(
            padding_mask[:, None, None, :] > 0, logits, _NEG
        )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d).astype(q.dtype)


def _bwd_kernel(num_heads: int, scale: float, causal: bool, use_pad: bool,
                *refs):
    """Flash-style recompute backward, one batch row per program.

    Per head: recompute P = softmax(mask(scale·q k^T)); then
      dV = P^T g;  dP = g v^T;  dS = P ∘ (dP − rowsum(dP ∘ P));
      dQ = scale·dS k;  dK = scale·dS^T q.
    Masked positions have P = 0, so dS vanishes there — no explicit mask
    is needed in the backward formulas. Everything ([S, S] included) stays
    VMEM-resident — the XLA backward materialized probs/dS per
    (batch, head) in HBM."""
    if use_pad:
        q_ref, k_ref, v_ref, g_ref, pad_ref, dq_ref, dk_ref, dv_ref = refs
        pad_row = pad_ref[pl.program_id(0), :]
    else:
        q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref = refs
        pad_row = None
    # Same dtype discipline as the forward: bf16 matmul operands, f32
    # accumulation/softmax (f32 operands would halve the MXU rate).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    d = q.shape[-1]
    head_dim = d // num_heads
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], g[:, sl]
        logits = scale * jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(
            _mask_logits(logits, causal, pad_row), axis=-1
        )  # [S, S] f32
        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(  # P^T g -> [S, hd]
            pb, gh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # g v^T -> [S, S]
            gh, vh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq = scale * jnp.dot(dsb, kh, preferred_element_type=jnp.float32)
        dk = scale * jax.lax.dot_general(  # dS^T q -> [S, hd]
            dsb, qh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def self_attention_bwd_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    g: jnp.ndarray,
    num_heads: int,
    padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    interpret: bool = False,
):
    """(dq, dk, dv) for softmax(mask(scale·qk^T))v, fused per batch row."""
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    row = lambda i: (i, 0, 0)  # noqa: E731
    spec = pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec, spec]
    inputs = [q, k, v, g]
    use_pad = padding_mask is not None
    if use_pad:
        in_specs.append(
            pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(padding_mask.astype(jnp.float32))
    shapes = tuple(jax.ShapeDtypeStruct((b, s, d), t.dtype) for t in (q, k, v))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, scale, causal, use_pad),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        out_shape=shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * s * s * d,
            bytes_accessed=7 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(*inputs)


def self_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention: Pallas forward + Pallas flash-style
    recompute backward (nothing but q/k/v saved; no [B, h, S, S] tensor
    ever reaches HBM in either direction). The padding mask is a
    non-differentiable input."""

    @jax.custom_vjp
    def fwd_fn(q, k, v, padding_mask):
        return self_attention_fused(
            q, k, v, num_heads=num_heads, padding_mask=padding_mask,
            causal=causal, interpret=interpret,
        )

    def fwd(q, k, v, padding_mask):
        return fwd_fn(q, k, v, padding_mask), (q, k, v, padding_mask)

    def bwd(res, g):
        q, k, v, padding_mask = res
        dq, dk, dv = self_attention_bwd_fused(
            q, k, v, g.astype(q.dtype), num_heads=num_heads,
            padding_mask=padding_mask, causal=causal, interpret=interpret,
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None

    fwd_fn.defvjp(fwd, bwd)
    return fwd_fn(q, k, v, padding_mask)

"""Fused self-attention Pallas kernels for the CLIP ViT encoders.

The ViT forward is the framework's FLOP budget (8 region crops + the
student image per distillation step), and its XLA attention materializes
the [B, heads, S, S] logits/probs tensors in HBM every layer — at the
bench shape (512 crops, 12 heads, S=197) that is ~1 GB of traffic per
layer, which is what caps the measured MFU well below the MXU roof. These
kernels keep the whole softmax(QK^T)V for one batch row VMEM-resident:
per program they load q/k/v [S, D] once, process heads as static [S, hd]
slices (Mosaic cannot lane-split D in the BlockSpec, so the split happens
in-kernel — same pattern as kernels.cross_attention), and write only the
[S, D] output. HBM traffic per layer drops from O(B*h*S^2) to O(B*S*D).

Scheduling: the per-head work is PHASE-SPLIT — all QK^T GEMMs are issued
first, then all softmaxes, then all PV GEMMs — instead of interleaving
GEMM -> softmax -> GEMM per head. The interleaved order serializes the
MXU behind each head's VPU softmax; with phases, head h+1's GEMM drains
while head h's softmax runs. Measured on v5e at the student shape
(B=256, S=197, D=768, H=12, bf16): forward 1.45 -> 1.35 ms, backward
3.36 -> 2.07 ms (-38%, together with the residual-stats reuse below).
At these shapes the kernels are VPU-bound on the [S, S] f32 softmax —
row-block batching, a division-free softmax, and NB>1 grids all measured
flat or slower, so this ordering is the lever, not tiling.

The QKV/output projections stay in XLA: they are plain GEMMs the MXU
already runs at speed-of-light, and XLA fuses the bias adds.

`self_attention_trainable` wraps the kernels in a custom VJP. The forward
additionally emits the per-(row, head) softmax statistics (max m and
reciprocal denominator rinv, [B, S, H] f32 — 4.8 MB at the bench shape);
the backward recomputes p = exp(mask(logits) - m) * rinv without the
max/sum reduction passes, and uses the flash-attention identity
rowsum(dP ∘ P) = rowsum(g ∘ o) so the [S, S] dP∘P product never needs
materializing (o is the saved forward output; the identity
sum_j p_ij dp_ij = g_i · (sum_j p_ij v_j) holds under any mask because
o = P v exactly). No [B, h, S, S] tensor reaches HBM in either direction.

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


def _head_slices(d: int, num_heads: int):
    hd = d // num_heads
    return [slice(h * hd, (h + 1) * hd) for h in range(num_heads)]


def _qk_logits(q, k, sls, scale, causal, pad_row):
    """Phase 1: every head's masked QK^T logits tile ([S, S] f32 each).

    Matmul inputs stay in the input dtype (bf16 on TPU — f32 inputs run
    the MXU at half rate); accumulation and softmax are f32. The scale is
    applied to the f32 logits, not the bf16 operand (better rounding AND
    no extra VPU pass over q)."""
    logits = [
        scale * jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for sl in sls
    ]
    if causal or pad_row is not None:
        logits = [_mask_logits(l, causal, pad_row) for l in logits]
    return logits


def _kernel(num_heads: int, scale: float, causal: bool, use_pad: bool, *refs):
    if use_pad:
        q_ref, k_ref, v_ref, pad_ref, o_ref = refs
        pad_row = pad_ref[pl.program_id(0), :]
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        pad_row = None
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    sls = _head_slices(q.shape[-1], num_heads)
    logits = _qk_logits(q, k, sls, scale, causal, pad_row)
    probs = [jax.nn.softmax(l, axis=-1).astype(v.dtype) for l in logits]
    outs = [
        jnp.dot(p, v[:, sl], preferred_element_type=jnp.float32)
        for p, sl in zip(probs, sls)
    ]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _row_specs(b: int, s: int, d: int):
    row = lambda i: (i, 0, 0)  # noqa: E731
    return pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)


def _pad_spec(b: int, s: int):
    # Full [B, S] block (a [1, S] block would break lane tiling); the
    # kernel selects its program row.
    return pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)


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
    spec = _row_specs(b, s, d)
    in_specs = [spec, spec, spec]
    inputs = [q, k, v]
    use_pad = padding_mask is not None
    if use_pad:
        in_specs.append(_pad_spec(b, s))
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


def _fwd_stats_kernel(num_heads: int, scale: float, causal: bool,
                      use_pad: bool, *refs):
    """Forward emitting (o, m, rinv); o is bit-identical to `_kernel`'s
    (p = exp(l - m) / sum — the same ops jax.nn.softmax performs)."""
    if use_pad:
        q_ref, k_ref, v_ref, pad_ref, o_ref, m_ref, r_ref = refs
        pad_row = pad_ref[pl.program_id(0), :]
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, r_ref = refs
        pad_row = None
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sls = _head_slices(q.shape[-1], num_heads)
    logits = _qk_logits(q, k, sls, scale, causal, pad_row)
    ms = [jnp.max(l, axis=-1, keepdims=True) for l in logits]
    es = [jnp.exp(l - m) for l, m in zip(logits, ms)]
    ss = [jnp.sum(e, axis=-1, keepdims=True) for e in es]
    probs = [(e / s).astype(v.dtype) for e, s in zip(es, ss)]
    outs = [
        jnp.dot(p, v[:, sl], preferred_element_type=jnp.float32)
        for p, sl in zip(probs, sls)
    ]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    m_ref[0] = jnp.concatenate(ms, axis=-1)  # [S, H] f32
    r_ref[0] = jnp.concatenate([1.0 / s for s in ss], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _self_attention_fwd_stats(
    q, k, v, num_heads: int, padding_mask=None, causal: bool = False,
    interpret: bool = False,
):
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    spec = _row_specs(b, s, d)
    sspec = pl.BlockSpec((1, s, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    inputs = [q, k, v]
    use_pad = padding_mask is not None
    if use_pad:
        in_specs.append(_pad_spec(b, s))
        inputs.append(padding_mask.astype(jnp.float32))
    stat = jax.ShapeDtypeStruct((b, s, num_heads), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_stats_kernel, num_heads, scale, causal, use_pad),
        grid=(b,),
        in_specs=in_specs,
        out_specs=(spec, sspec, sspec),
        out_shape=(jax.ShapeDtypeStruct((b, s, d), q.dtype), stat, stat),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(*inputs)


def _bwd_kernel(num_heads: int, scale: float, causal: bool, use_pad: bool,
                *refs):
    """Phase-split backward reusing the forward's softmax statistics.

    Per head: p = exp(mask(scale·q k^T) - m) · rinv (no reduction passes);
      dV = P^T g;  dP = g v^T;  dS = P ∘ (dP − delta);
      dQ = scale·dS k;  dK = scale·dS^T q,
    with delta_i = rowsum(g ∘ o)_i per head (== rowsum(dP ∘ P)_i, see the
    module docstring). Masked positions have P = 0, so dS vanishes there.
    Everything ([S, S] included) stays VMEM-resident. Each phase runs for
    all heads before the next starts — the MXU drains head h+1's GEMMs
    while the VPU works head h (measured -38% vs the interleaved order)."""
    if use_pad:
        (q_ref, k_ref, v_ref, g_ref, o_ref, m_ref, r_ref, pad_ref,
         dq_ref, dk_ref, dv_ref) = refs
        pad_row = pad_ref[pl.program_id(0), :]
    else:
        (q_ref, k_ref, v_ref, g_ref, o_ref, m_ref, r_ref,
         dq_ref, dk_ref, dv_ref) = refs
        pad_row = None
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    o = o_ref[0]
    d = q.shape[-1]
    sls = _head_slices(d, num_heads)
    go = g.astype(jnp.float32) * o.astype(jnp.float32)  # one [S, D] pass
    logits = _qk_logits(q, k, sls, scale, causal, pad_row)
    ps = [
        jnp.exp(l - m_ref[0][:, h:h + 1]) * r_ref[0][:, h:h + 1]
        for h, l in enumerate(logits)
    ]
    pbs = [p.astype(q.dtype) for p in ps]
    dvs = [
        jax.lax.dot_general(  # P^T g -> [S, hd]
            pb, g[:, sl],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for pb, sl in zip(pbs, sls)
    ]
    dps = [
        jax.lax.dot_general(  # g v^T -> [S, S]
            g[:, sl], v[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for sl in sls
    ]
    deltas = [jnp.sum(go[:, sl], axis=-1, keepdims=True) for sl in sls]
    dsbs = [
        (p * (dp - delta)).astype(q.dtype)
        for p, dp, delta in zip(ps, dps, deltas)
    ]
    dqs = [
        scale * jnp.dot(dsb, k[:, sl], preferred_element_type=jnp.float32)
        for dsb, sl in zip(dsbs, sls)
    ]
    dks = [
        scale * jax.lax.dot_general(  # dS^T q -> [S, hd]
            dsb, q[:, sl],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for dsb, sl in zip(dsbs, sls)
    ]
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _self_attention_bwd_stats(
    q, k, v, g, o, m, r, num_heads: int, padding_mask=None,
    causal: bool = False, interpret: bool = False,
):
    """(dq, dk, dv) given the forward output and softmax stats."""
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    spec = _row_specs(b, s, d)
    sspec = pl.BlockSpec((1, s, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec] * 5 + [sspec, sspec]
    inputs = [q, k, v, g, o, m, r]
    use_pad = padding_mask is not None
    if use_pad:
        in_specs.append(_pad_spec(b, s))
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
            bytes_accessed=8 * b * s * d * q.dtype.itemsize,
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
    """Differentiable fused attention: Pallas forward + Pallas recompute
    backward (q/k/v, the output, and the [B, S, H] softmax stats are
    saved; no [B, h, S, S] tensor ever reaches HBM in either direction).
    The padding mask is a non-differentiable input."""

    @jax.custom_vjp
    def fwd_fn(q, k, v, padding_mask):
        return self_attention_fused(
            q, k, v, num_heads=num_heads, padding_mask=padding_mask,
            causal=causal, interpret=interpret,
        )

    def fwd(q, k, v, padding_mask):
        o, m, r = _self_attention_fwd_stats(
            q, k, v, num_heads=num_heads, padding_mask=padding_mask,
            causal=causal, interpret=interpret,
        )
        return o, (q, k, v, o, m, r, padding_mask)

    def bwd(res, g):
        q, k, v, o, m, r, padding_mask = res
        dq, dk, dv = _self_attention_bwd_stats(
            q, k, v, g.astype(q.dtype), o, m, r, num_heads=num_heads,
            padding_mask=padding_mask, causal=causal, interpret=interpret,
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None

    fwd_fn.defvjp(fwd, bwd)
    return fwd_fn(q, k, v, padding_mask)

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
flat or slower, so this ordering is the lever, not tiling. On top of the
ordering, the softmax itself sheds [S, S] VPU passes three ways (see
_LOG2E and the kernel bodies): log2-domain exponentials (no hidden
exp->exp2 multiply), row sums ridden on a ones-column of the PV GEMM
(no [S, S] lane reduction), and normalization applied to the [S, hd]
output / folded into backward terms instead of an [S, S] divide.

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
# Softmax runs in the LOG2 domain: logits are scaled by log2(e) once (a
# scalar folded into the existing QK^T scale pass), so the exponentials
# lower to a bare exp2 — exp(x) otherwise costs exp2(x * log2e), an extra
# [S, S] multiply per head per direction. Stats contract: the saved max
# `m` is in the log2 domain; `rinv` = 1/sum(exp2(l2 - m)) is the same
# value either way (exp2(log2e*(L - m_nat)) == exp(L - m_nat)).
_LOG2E = 1.4426950408889634


def _mask_logits(logits, causal: bool, pad_row, seg_row=None):
    """Apply causal / key-padding / segment masks to one [S, S] tile.

    `seg_row` [S] int32 restricts attention to same-segment pairs; with
    `causal=True` this reproduces ops.packing.packed_attention_bias
    exactly (same segment AND key <= query; padding attends padding, so
    no row is fully masked)."""
    s = logits.shape[0]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        keep = col <= row
        if seg_row is not None:
            keep = keep & (seg_row[None, :] == seg_row[:, None])
        logits = jnp.where(keep, logits, _NEG)
    elif seg_row is not None:
        logits = jnp.where(
            seg_row[None, :] == seg_row[:, None], logits, _NEG
        )
    if pad_row is not None:
        logits = jnp.where(pad_row[None, :] > 0, logits, _NEG)
    return logits


def _head_slices(d: int, num_heads: int):
    hd = d // num_heads
    return [slice(h * hd, (h + 1) * hd) for h in range(num_heads)]


def _qk_logits(q, k, sls, scale, causal, pad_row, seg_row=None):
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
    if causal or pad_row is not None or seg_row is not None:
        logits = [_mask_logits(l, causal, pad_row, seg_row) for l in logits]
    return logits


def _mask_rows(use_pad: bool, use_seg: bool, refs):
    """Pop the optional pad/segment operands off the tail of the q/k/v
    refs and return (core_refs, pad_row, seg_row) for this program."""
    refs = list(refs)
    i = pl.program_id(0)
    seg_row = refs.pop(3 + use_pad)[i, :] if use_seg else None
    pad_row = refs.pop(3)[i, :] if use_pad else None
    return refs, pad_row, seg_row


def _kernel(num_heads: int, scale: float, causal: bool, use_pad: bool,
            use_seg: bool, *refs):
    (q_ref, k_ref, v_ref, o_ref), pad_row, seg_row = _mask_rows(
        use_pad, use_seg, refs
    )
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    s = q.shape[0]
    sls = _head_slices(q.shape[-1], num_heads)
    # log2-domain softmax, normalized AFTER the PV GEMM: the row-sum rides
    # a ones-column appended to each head's v tile (its lanes are MXU
    # padding anyway at hd=64), removing the [S, S] sum reduction AND the
    # [S, S] divide — the normalize shrinks to an [S, hd] multiply.
    l2s = _qk_logits(q, k, sls, scale * _LOG2E, causal, pad_row, seg_row)
    ms = [jnp.max(l, axis=-1, keepdims=True) for l in l2s]
    ebs = [jnp.exp2(l - m).astype(v.dtype) for l, m in zip(l2s, ms)]
    ones = jnp.ones((s, 1), v.dtype)
    ves = [jnp.concatenate([v[:, sl], ones], axis=1) for sl in sls]
    oes = [
        jnp.dot(eb, ve, preferred_element_type=jnp.float32)
        for eb, ve in zip(ebs, ves)
    ]
    outs = [oe[:, :-1] * (1.0 / oe[:, -1:]) for oe in oes]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _row_specs(b: int, s: int, d: int):
    row = lambda i: (i, 0, 0)  # noqa: E731
    return pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)


def _pad_spec(b: int, s: int):
    # Full [B, S] block (a [1, S] block would break lane tiling); the
    # kernel selects its program row.
    return pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _mask_inputs(b, s, padding_mask, segment_ids):
    """(extra_specs, extra_inputs, use_pad, use_seg) for the two optional
    [B, S] mask operands (order: padding, then segments)."""
    specs, inputs = [], []
    if padding_mask is not None:
        specs.append(_pad_spec(b, s))
        inputs.append(padding_mask.astype(jnp.float32))
    if segment_ids is not None:
        specs.append(_pad_spec(b, s))
        inputs.append(segment_ids.astype(jnp.int32))
    return specs, inputs, padding_mask is not None, segment_ids is not None


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
    segment_ids: Optional[jnp.ndarray] = None,  # [B, S] int (packing)
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(mask(q k^T / sqrt(hd))) v per head, fused per batch row."""
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    spec = _row_specs(b, s, d)
    mspecs, minputs, use_pad, use_seg = _mask_inputs(
        b, s, padding_mask, segment_ids
    )
    flops = 2 * 2 * s * s * d  # QK^T + PV
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, scale, causal, use_pad,
                          use_seg),
        grid=(b,),
        in_specs=[spec, spec, spec] + mspecs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * flops,
            bytes_accessed=4 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(q, k, v, *minputs)


def _xla_attention(q, k, v, num_heads, padding_mask=None, causal=False,
                   segment_ids=None):
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
    if segment_ids is not None:
        same = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        logits = jnp.where(same, logits, _NEG)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d).astype(q.dtype)


def _fwd_stats_kernel(num_heads: int, scale: float, causal: bool,
                      use_pad: bool, use_seg: bool, *refs):
    """Forward emitting (o, m, rinv); o is bit-identical to `_kernel`'s
    (same log2-domain/post-normalized op sequence). `m` is the per-(row,
    head) max of the LOG2-domain logits; `rinv` the reciprocal row sum of
    exp2(l2 - m), read back off the PV GEMM's ones-column."""
    (q_ref, k_ref, v_ref, o_ref, m_ref, r_ref), pad_row, seg_row = (
        _mask_rows(use_pad, use_seg, refs)
    )
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = q.shape[0]
    sls = _head_slices(q.shape[-1], num_heads)
    l2s = _qk_logits(q, k, sls, scale * _LOG2E, causal, pad_row, seg_row)
    ms = [jnp.max(l, axis=-1, keepdims=True) for l in l2s]
    ebs = [jnp.exp2(l - m).astype(v.dtype) for l, m in zip(l2s, ms)]
    ones = jnp.ones((s, 1), v.dtype)
    ves = [jnp.concatenate([v[:, sl], ones], axis=1) for sl in sls]
    oes = [
        jnp.dot(eb, ve, preferred_element_type=jnp.float32)
        for eb, ve in zip(ebs, ves)
    ]
    rinvs = [1.0 / oe[:, -1:] for oe in oes]
    outs = [oe[:, :-1] * rinv for oe, rinv in zip(oes, rinvs)]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    m_ref[0] = jnp.concatenate(ms, axis=-1)  # [S, H] f32, LOG2 domain
    r_ref[0] = jnp.concatenate(rinvs, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "interpret")
)
def _self_attention_fwd_stats(
    q, k, v, num_heads: int, padding_mask=None, causal: bool = False,
    segment_ids=None, interpret: bool = False,
):
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    spec = _row_specs(b, s, d)
    sspec = pl.BlockSpec((1, s, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspecs, minputs, use_pad, use_seg = _mask_inputs(
        b, s, padding_mask, segment_ids
    )
    stat = jax.ShapeDtypeStruct((b, s, num_heads), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_stats_kernel, num_heads, scale, causal,
                          use_pad, use_seg),
        grid=(b,),
        in_specs=[spec, spec, spec] + mspecs,
        out_specs=(spec, sspec, sspec),
        out_shape=(jax.ShapeDtypeStruct((b, s, d), q.dtype), stat, stat),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(q, k, v, *minputs)


def _bwd_kernel(num_heads: int, scale: float, causal: bool, use_pad: bool,
                use_seg: bool, *refs):
    """Phase-split backward reusing the forward's softmax statistics.

    Per head, with e = exp2(mask(scale·log2e·q k^T) - m) (log2-domain
    stats, no reduction passes) and P = e · rinv:
      dV = P^T g = e^T (g·rinv);  dP = g v^T;
      dS = P ∘ (dP − delta) = e ∘ ((dP − delta) · rinv);
      dQ = scale·dS k;  dK = scale·dS^T q,
    with delta_i = rowsum(g ∘ o)_i per head (== rowsum(dP ∘ P)_i, see the
    module docstring). rinv is only ever applied at [S, hd] / fused into
    the (dP − delta) term — P is never materialized. Masked positions
    have e = 0, so dS vanishes there. Everything ([S, S] included) stays
    VMEM-resident. Each phase runs for all heads before the next starts —
    the MXU drains head h+1's GEMMs while the VPU works head h (measured
    -38% vs the interleaved order)."""
    refs = list(refs)
    i = pl.program_id(0)
    seg_row = refs.pop(7 + use_pad)[i, :] if use_seg else None
    pad_row = refs.pop(7)[i, :] if use_pad else None
    (q_ref, k_ref, v_ref, g_ref, o_ref, m_ref, r_ref,
     dq_ref, dk_ref, dv_ref) = refs
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    o = o_ref[0]
    d = q.shape[-1]
    sls = _head_slices(d, num_heads)
    go = g.astype(jnp.float32) * o.astype(jnp.float32)  # one [S, D] pass
    # Unnormalized e = exp2(l2 - m) (log2-domain stats, no reduction
    # passes). The rinv normalization never touches an [S, S] tile: for
    # dV it rides the [S, hd] g slice (dV = e^T (g*rinv), row-scaled);
    # for dS it folds into the (dP - delta) term, which is computed
    # anyway: dS = P*(dP - delta) = e * ((dP - delta) * rinv).
    l2s = _qk_logits(q, k, sls, scale * _LOG2E, causal, pad_row, seg_row)
    es = [
        jnp.exp2(l - m_ref[0][:, h:h + 1]) for h, l in enumerate(l2s)
    ]
    ebs = [e.astype(q.dtype) for e in es]
    # A p = e*rinv single-normalization variant (v1 style, exp2) measured
    # indistinguishable on v5e (interleaved reps: 1.15-1.44 vs
    # 1.32-1.57 ms at B=256, noise-bound); this form keeps rinv off the
    # [S, S] tiles entirely.
    grs = [
        (g[:, sl].astype(jnp.float32) * r_ref[0][:, h:h + 1]).astype(
            q.dtype
        )
        for h, sl in enumerate(sls)
    ]
    dvs = [
        jax.lax.dot_general(  # e^T (g*rinv) -> [S, hd]
            eb, gr,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for eb, gr in zip(ebs, grs)
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
        (e * ((dp - delta) * r_ref[0][:, h:h + 1])).astype(q.dtype)
        for h, (e, dp, delta) in enumerate(zip(es, dps, deltas))
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
    causal: bool = False, segment_ids=None, interpret: bool = False,
):
    """(dq, dk, dv) given the forward output and softmax stats."""
    b, s, d = q.shape
    scale = (d // num_heads) ** -0.5
    spec = _row_specs(b, s, d)
    sspec = pl.BlockSpec((1, s, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspecs, minputs, use_pad, use_seg = _mask_inputs(
        b, s, padding_mask, segment_ids
    )
    shapes = tuple(jax.ShapeDtypeStruct((b, s, d), t.dtype) for t in (q, k, v))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, scale, causal, use_pad,
                          use_seg),
        grid=(b,),
        in_specs=[spec] * 5 + [sspec, sspec] + mspecs,
        out_specs=(spec, spec, spec),
        out_shape=shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * s * s * d,
            bytes_accessed=8 * b * s * d * q.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(q, k, v, g, o, m, r, *minputs)


def self_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention: Pallas forward + Pallas recompute
    backward (q/k/v, the output, and the [B, S, H] softmax stats are
    saved; no [B, h, S, S] tensor ever reaches HBM in either direction).
    The padding mask and segment ids are non-differentiable inputs
    (`segment_ids` + `causal=True` = the packed-caption within-segment
    causal mask, ops/packing.packed_attention_bias semantics in-kernel)."""

    @jax.custom_vjp
    def fwd_fn(q, k, v, padding_mask, segment_ids):
        return self_attention_fused(
            q, k, v, num_heads=num_heads, padding_mask=padding_mask,
            causal=causal, segment_ids=segment_ids, interpret=interpret,
        )

    def fwd(q, k, v, padding_mask, segment_ids):
        o, m, r = _self_attention_fwd_stats(
            q, k, v, num_heads=num_heads, padding_mask=padding_mask,
            causal=causal, segment_ids=segment_ids, interpret=interpret,
        )
        return o, (q, k, v, o, m, r, padding_mask, segment_ids)

    def bwd(res, g):
        q, k, v, o, m, r, padding_mask, segment_ids = res
        dq, dk, dv = _self_attention_bwd_stats(
            q, k, v, g.astype(q.dtype), o, m, r, num_heads=num_heads,
            padding_mask=padding_mask, causal=causal,
            segment_ids=segment_ids, interpret=interpret,
        )
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                None, None)

    fwd_fn.defvjp(fwd, bwd)
    return fwd_fn(q, k, v, padding_mask, segment_ids)

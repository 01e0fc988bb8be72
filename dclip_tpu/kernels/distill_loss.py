"""Fused distillation-loss Pallas kernel with analytic custom VJP.

The student objective (reference CLIP_image_distillation.py:532-576,628):

    L = mean(1 - cos(s_img, t_img)) + mean(1 - cos(s_txt, t_txt))
        + w * InfoNCE(s_img, s_txt; temp)

computed in ONE kernel over VMEM-resident embeddings: normalizations, the
[B, B] similarity matrix, both cross-entropies and the cosine terms never
round-trip to HBM. The backward pass is a second kernel implementing the
closed-form gradients:

    dInfoNCE/dZ = ((P_row - I) + (P_col - I)^T) / 2B,  Z = (Si St^T)/temp
    d(1 - <s^, t^>)/ds = -(t^ - <s^, t^> s^) / ||s||   (per row, /B)

with the normalization chain rule folded in — no [B, B] residuals are
stored; the backward recomputes softmaxes from the saved normalized
embeddings (cheaper than writing P to HBM).

Numerics are float32 inside the kernel regardless of input dtype; parity
with the XLA reference (`dclip_tpu.ops.losses.distillation_loss`) is pinned
in tests/test_kernels.py, gradients included.

VMEM bound: the [B, B] block caps B around ~1024 per call; the public
wrapper falls back to the XLA path beyond that (and on non-TPU backends).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
MAX_FUSED_BATCH = 1024


def _norm_rows(x):
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, _EPS * _EPS))
    return x * inv, inv


def _fwd_kernel(temperature, weight, si_ref, st_ref, ti_ref, tt_ref, out_ref):
    # All intermediates stay 2-D (keepdims) — Mosaic relayout of 1-D
    # vectors is unsupported; means are taken of 2-D arrays directly.
    si, _ = _norm_rows(si_ref[:].astype(jnp.float32))
    st, _ = _norm_rows(st_ref[:].astype(jnp.float32))
    ti, _ = _norm_rows(ti_ref[:].astype(jnp.float32))
    tt, _ = _norm_rows(tt_ref[:].astype(jnp.float32))

    li = 1.0 - jnp.mean(jnp.sum(si * ti, axis=-1, keepdims=True))
    lt = 1.0 - jnp.mean(jnp.sum(st * tt, axis=-1, keepdims=True))

    z = jnp.dot(si, st.T, preferred_element_type=jnp.float32) / temperature
    # mean(lse - diag) = mean(lse) - mean(diag): avoids transposing diag
    # between row/column orientations.
    mean_diag = jnp.mean(jnp.sum(si * st, axis=-1, keepdims=True)) / temperature
    mean_lse_row = jnp.mean(jax.nn.logsumexp(z, axis=1, keepdims=True))
    mean_lse_col = jnp.mean(jax.nn.logsumexp(z, axis=0, keepdims=True))
    lc = 0.5 * (mean_lse_row + mean_lse_col) - mean_diag

    total = li + lt + weight * lc
    out_ref[0, 0] = li
    out_ref[0, 1] = lt
    out_ref[0, 2] = lc
    out_ref[0, 3] = total


def _bwd_kernel(
    temperature, si_ref, st_ref, ti_ref, tt_ref, ct_ref, dsi_ref, dst_ref
):
    """ct_ref holds [c_li, c_lt, c_lc] cotangent weights (SMEM)."""
    si_raw = si_ref[:].astype(jnp.float32)
    st_raw = st_ref[:].astype(jnp.float32)
    si, inv_i = _norm_rows(si_raw)
    st, inv_t = _norm_rows(st_raw)
    ti, _ = _norm_rows(ti_ref[:].astype(jnp.float32))
    tt, _ = _norm_rows(tt_ref[:].astype(jnp.float32))
    b = si.shape[0]
    c_li = ct_ref[0, 0]
    c_lt = ct_ref[0, 1]
    c_lc = ct_ref[0, 2]

    # Cosine-distill grads wrt normalized rows.
    g_si = -(c_li / b) * ti
    g_st = -(c_lt / b) * tt

    # InfoNCE grads wrt normalized rows.
    z = jnp.dot(si, st.T, preferred_element_type=jnp.float32) / temperature
    p_row = jax.nn.softmax(z, axis=1)
    p_col = jax.nn.softmax(z, axis=0)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        == jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    ).astype(jnp.float32)
    g_z = c_lc * ((p_row - eye) + (p_col - eye)) / (2.0 * b * temperature)
    g_si = g_si + jnp.dot(g_z, st, preferred_element_type=jnp.float32)
    g_st = g_st + jnp.dot(g_z.T, si, preferred_element_type=jnp.float32)

    # Chain through L2 normalization: dL/dx = (g - <g, x^> x^) / ||x||.
    dsi = (g_si - jnp.sum(g_si * si, axis=-1, keepdims=True) * si) * inv_i
    dst = (g_st - jnp.sum(g_st * st, axis=-1, keepdims=True) * st) * inv_t
    dsi_ref[:] = dsi.astype(dsi_ref.dtype)
    dst_ref[:] = dst.astype(dst_ref.dtype)


def _vmem_spec(shape):
    return pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=pltpu.VMEM)


def _run_fwd(si, st, ti, tt, temperature, weight, interpret):
    b, d = si.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, temperature, weight),
        in_specs=[_vmem_spec((b, d))] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * b * d + 8 * b * d,
            bytes_accessed=4 * 4 * b * d,
            transcendentals=2 * b * b,
        ),
    )(si, st, ti, tt)
    return out[0]


def _run_bwd(si, st, ti, tt, cts, temperature, interpret):
    b, d = si.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel, temperature),
        in_specs=[_vmem_spec((b, d))] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(_vmem_spec((b, d)), _vmem_spec((b, d))),
        out_shape=(
            jax.ShapeDtypeStruct(si.shape, si.dtype),
            jax.ShapeDtypeStruct(st.shape, st.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * b * d,
            bytes_accessed=4 * 6 * b * d,
            transcendentals=2 * b * b,
        ),
    )(si, st, ti, tt, cts)


def make_fused_distillation_loss(
    temperature: float = 0.05,
    contrastive_weight: float = 1.0,
    interpret: bool = False,
):
    """Build the custom-VJP fused loss fn(si, st, ti, tt) -> parts dict.

    parts = {image_distill_loss, text_distill_loss, contrastive_loss, loss};
    gradients flow from any part (chain-weighted), teacher inputs get zero
    cotangents (they are targets).
    """

    @jax.custom_vjp
    def loss_fn(si, st, ti, tt):
        li, lt, lc, total = _run_fwd(
            si, st, ti, tt, temperature, contrastive_weight, interpret
        )
        return {
            "image_distill_loss": li,
            "text_distill_loss": lt,
            "contrastive_loss": lc,
            "loss": total,
        }

    def fwd(si, st, ti, tt):
        return loss_fn(si, st, ti, tt), (si, st, ti, tt)

    def bwd(res, g):
        si, st, ti, tt = res
        c_li = g["image_distill_loss"] + g["loss"]
        c_lt = g["text_distill_loss"] + g["loss"]
        c_lc = g["contrastive_loss"] + contrastive_weight * g["loss"]
        cts = jnp.stack([c_li, c_lt, c_lc]).reshape(1, 3).astype(jnp.float32)
        dsi, dst = _run_bwd(si, st, ti, tt, cts, temperature, interpret)
        return dsi, dst, jnp.zeros_like(ti), jnp.zeros_like(tt)

    loss_fn.defvjp(fwd, bwd)
    return loss_fn


def fused_distillation_loss(
    student_image: jnp.ndarray,
    student_text: jnp.ndarray,
    teacher_image: jnp.ndarray,
    teacher_text: jnp.ndarray,
    temperature: float = 0.05,
    contrastive_weight: float = 1.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Drop-in twin of `dclip_tpu.ops.losses.distillation_loss`.

    Falls back to the XLA implementation when the batch exceeds the VMEM
    bound (B > 1024) or when the default backend is not a TPU and interpret
    mode was not requested (compiled Pallas is TPU-only).
    """
    import jax as _jax

    from dclip_tpu.core.platform import is_tpu_platform

    on_tpu = is_tpu_platform(_jax.default_backend())
    if student_image.shape[0] > MAX_FUSED_BATCH or (not on_tpu and not interpret):
        from dclip_tpu.ops.losses import distillation_loss

        return distillation_loss(
            student_image, student_text, teacher_image, teacher_text,
            temperature, contrastive_weight,
        )
    fn = make_fused_distillation_loss(temperature, contrastive_weight, interpret)
    parts = fn(student_image, student_text, teacher_image, teacher_text)
    return parts["loss"], parts

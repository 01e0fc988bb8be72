"""Trainable fused MLP block: full weight gradients, no HBM mlp tensor.

The student's TEXT stack is fully trainable under the default distillation
mask (train/optim.py, reference CLIP_image_distillation.py:504-506 — its
effective behavior trains every text leaf), so kernels/mlp_frozen.py's
zero-weight-cotangent contract rules it out there. On the XLA path the
text MLP backward streams the [B, S, mlp_dim] intermediates through HBM
repeatedly (a1 saved + read 3x, the dhg/da1 chain written + read ~3x —
~9 moves of the widest tensor per layer). This module fuses the same
`y = x + fc2(quick_gelu(fc1(LN(x))))` sub-block with REAL cotangents for
all six weights:

  forward:   kernels/mlp_frozen._fwd_save_kernel (emits y and the fc1
             pre-activation a1 — 1 write of the wide tensor).
  backward:  TWO rowwise Pallas kernels, both reading (x, g, a1):
    A: dx (residual + LN backward) fused with the dW2/dB2/dLN(scale,bias)
       accumulators — the [D] / [mlp, D] grads accumulate f32 in VMEM
       across the whole batch grid and are written once.
    B: dW1/dB1 — needs da1 = (g W2^T) * gelu'(a1), recomputed chunk-wise
       (one extra [S,D]x[D,chunk] GEMM per row; cheaper than writing and
       re-reading a [B, S, mlp] da1 tensor, which is what XLA does).

HBM traffic for the [B, S, mlp] tensor: 1 write (fwd) + 2 reads (bwd)
vs XLA's ~9 moves; no mlp-wide tensor is written in the backward at all.

Accumulator outputs use the standard Pallas TPU reduction pattern: the
output BlockSpec maps every grid step to block (0, 0), the kernel zeroes
it at program 0 and accumulates f32 across the sequential batch grid, so
weight-grad numerics match XLA's f32-accumulated GEMMs.

Numerics: LN statistics / softmax-free elementwise in f32, matmul
operands in the input dtype (bf16 on TPU) with f32 accumulation — same
rules as kernels/vit_attention.py; parity with `jax.grad` of the XLA
twin is pinned in tests/test_kernels.py.

VMEM fit (`mlp_trainable_fit`): the bound is the resident f32 weight-grad
accumulator + the bf16 weights. CLIP text shapes (D=512, mlp=2048) fit
comfortably; ViT-B/16 vision (768x3072: 9.4 MB weights + 9.4 MB dW2) does
not — post-unfreeze vision MLPs stay on the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dclip_tpu.kernels.mlp_frozen import (
    _const_specs,
    _fwd_save_kernel,
    _pick_chunk,
    _row_spec,
)

_TRAINABLE_VMEM_LIMIT = 16 * 2**20


def mlp_trainable_fit(seq: int, hidden: int, mlp_dim: int, itemsize: int) -> bool:
    """Whether both backward kernels fit one program's VMEM.

    Kernel A is the larger: both weight matrices resident
    (2*hidden*mlp_dim*itemsize) + the f32 dW2 accumulator
    (hidden*mlp_dim*4) + double-buffered row blocks + chunk working set.
    """
    f32 = 4
    chunk = _pick_chunk(mlp_dim)
    weights = 2 * hidden * mlp_dim * itemsize
    acc = hidden * mlp_dim * f32
    blocks = 2 * (4 * seq * hidden + seq * mlp_dim) * itemsize
    work = 2 * seq * hidden * f32 + 4 * seq * chunk * f32
    return weights + acc + blocks + work <= _TRAINABLE_VMEM_LIMIT


def _quick_gelu_pair(a):
    """(quick_gelu(a), quick_gelu'(a)) sharing the sigmoid."""
    s = jax.nn.sigmoid(1.702 * a)
    return a * s, s + 1.702 * a * s * (1.0 - s)


def _bwd_a_kernel(eps: float, chunk: int,
                  x_ref, g_ref, a1_ref, lns_ref, w1_ref, w2_ref,
                  dx_ref, dw2_ref, db2_ref, dlns_ref, dlnb_ref):
    """dx + (dW2, dB2, dLN scale/bias) accumulated across the batch grid."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    x = x_ref[0].astype(jnp.float32)  # [S, D]
    g = g_ref[0].astype(jnp.float32)
    gb = g_ref[0]  # input-dtype operand for the MXU
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    dh = jnp.zeros_like(x)
    mlp_dim = w1_ref.shape[1]
    for c0 in range(0, mlp_dim, chunk):
        sl = slice(c0, c0 + chunk)
        a1_c = a1_ref[0, :, sl].astype(jnp.float32)  # [S, C]
        gelu_c, dgelu_c = _quick_gelu_pair(a1_c)
        dw2_ref[sl, :] += jax.lax.dot_general(  # gelu(a1)_c^T g -> [C, D]
            gelu_c.astype(gb.dtype), gb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dhg_c = jax.lax.dot_general(  # g W2_c^T -> [S, C]
            gb, w2_ref[sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da1_c = dhg_c * dgelu_c
        dh = dh + jax.lax.dot_general(  # da1_c W1_c^T -> [S, D]
            da1_c.astype(gb.dtype), w1_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    db2_ref[0, :] += jnp.sum(g, axis=0)
    dlns_ref[0, :] += jnp.sum(dh * xhat, axis=0)
    dlnb_ref[0, :] += jnp.sum(dh, axis=0)
    # LayerNorm backward w.r.t. x:
    # dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
    dxhat = dh * lns_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (g + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _bwd_b_kernel(eps: float, chunk: int,
                  x_ref, g_ref, a1_ref, lns_ref, lnb_ref, w2_ref,
                  dw1_ref, db1_ref):
    """dW1/dB1 with da1 recomputed chunk-wise from the saved a1."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    x = x_ref[0].astype(jnp.float32)
    gb = g_ref[0]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + eps)) * lns_ref[:] + lnb_ref[:]  # LN(x)
    hb = h.astype(gb.dtype)
    mlp_dim = w2_ref.shape[0]
    for c0 in range(0, mlp_dim, chunk):
        sl = slice(c0, c0 + chunk)
        a1_c = a1_ref[0, :, sl].astype(jnp.float32)
        _, dgelu_c = _quick_gelu_pair(a1_c)
        dhg_c = jax.lax.dot_general(  # g W2_c^T -> [S, C]
            gb, w2_ref[sl, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da1_c = dhg_c * dgelu_c
        dw1_ref[:, sl] += jax.lax.dot_general(  # h^T da1_c -> [D, C]
            hb, da1_c.astype(gb.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[0, sl] += jnp.sum(da1_c, axis=0)


def _acc_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM
    )


def mlp_block_trainable(
    x: jnp.ndarray,  # [B, S, D]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,  # [D, mlp]
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [mlp, D]
    b2: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MLP block differentiable in x AND all six weights."""
    b, s, d = x.shape
    mlp_dim = w1.shape[1]
    chunk = _pick_chunk(mlp_dim)

    def _cast(x, ln_scale, ln_bias, w1, b1, w2, b2):
        wdt = x.dtype
        return [
            ln_scale.astype(jnp.float32),
            ln_bias.astype(jnp.float32),
            w1.astype(wdt),
            b1.astype(jnp.float32),
            w2.astype(wdt),
            b2.astype(jnp.float32),
        ]

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, w1, b1, w2, b2):
        y, _ = fwd(x, ln_scale, ln_bias, w1, b1, w2, b2)
        return y

    def fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
        consts = _cast(x, ln_scale, ln_bias, w1, b1, w2, b2)
        a1_spec = pl.BlockSpec(
            (1, s, mlp_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        y, a1 = pl.pallas_call(
            functools.partial(_fwd_save_kernel, eps, chunk),
            grid=(b,),
            in_specs=[_row_spec(b, s, d)] + _const_specs(consts),
            out_specs=(_row_spec(b, s, d), a1_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, s, d), x.dtype),
                jax.ShapeDtypeStruct((b, s, mlp_dim), x.dtype),
            ),
            interpret=interpret,
        )(x, *consts)
        return y, (x, a1, consts[0], consts[1], consts[2], consts[4],
                   (ln_scale, ln_bias, w1, b1, w2, b2))

    def bwd(res, g):
        xr, a1, ln_s, ln_b, w1c, w2c, origs = res
        gc = g.astype(xr.dtype)
        a1_spec = pl.BlockSpec(
            (1, s, mlp_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        f32 = jnp.float32
        dx, dw2, db2, dlns, dlnb = pl.pallas_call(
            functools.partial(_bwd_a_kernel, eps, chunk),
            grid=(b,),
            in_specs=[_row_spec(b, s, d), _row_spec(b, s, d), a1_spec]
            + _const_specs([ln_s, w1c, w2c]),
            out_specs=(
                _row_spec(b, s, d),
                _acc_spec((mlp_dim, d)),
                _acc_spec((1, d)),
                _acc_spec((1, d)),
                _acc_spec((1, d)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, s, d), xr.dtype),
                jax.ShapeDtypeStruct((mlp_dim, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * b * s * d * mlp_dim,
                bytes_accessed=(3 * b * s * d + b * s * mlp_dim)
                * xr.dtype.itemsize,
                transcendentals=b * s * mlp_dim,
            ),
        )(xr, gc, a1, ln_s, w1c, w2c)
        dw1, db1 = pl.pallas_call(
            functools.partial(_bwd_b_kernel, eps, chunk),
            grid=(b,),
            in_specs=[_row_spec(b, s, d), _row_spec(b, s, d), a1_spec]
            + _const_specs([ln_s, ln_b, w2c]),
            out_specs=(_acc_spec((d, mlp_dim)), _acc_spec((1, mlp_dim))),
            out_shape=(
                jax.ShapeDtypeStruct((d, mlp_dim), f32),
                jax.ShapeDtypeStruct((1, mlp_dim), f32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=3 * 2 * b * s * d * mlp_dim,
                bytes_accessed=(2 * b * s * d + b * s * mlp_dim)
                * xr.dtype.itemsize,
                transcendentals=b * s * mlp_dim,
            ),
        )(xr, gc, a1, ln_s, ln_b, w2c)
        o_lns, o_lnb, o_w1, o_b1, o_w2, o_b2 = origs
        return (
            dx.astype(xr.dtype),
            dlns[0].astype(o_lns.dtype),
            dlnb[0].astype(o_lnb.dtype),
            dw1.astype(o_w1.dtype),
            db1[0].astype(o_b1.dtype),
            dw2.astype(o_w2.dtype),
            db2[0].astype(o_b2.dtype),
        )

    f.defvjp(fwd, bwd)
    return f(x, ln_scale, ln_bias, w1, b1, w2, b2)

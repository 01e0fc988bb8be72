"""Trainable-input fused MLP block for FROZEN-weight encoder layers.

The student's default trainable mask (train/optim.py, reference
CLIP_image_distillation.py:504-506 semantics) trains only the attention
projections inside the vision encoder — every MLP and LayerNorm weight is
frozen. The backward through each vision layer therefore needs ONLY dx
for the MLP sub-block, yet the XLA path still streams the [B, S, mlp_dim]
intermediate through HBM ~5 times per layer (fc1 write, fc2 read, dhg
write+read, gelu' read of the saved pre-activation). At the bench shape
(B=64, S=197, mlp=3072, bf16) that is ~390 MB/layer — the student step's
dominant bandwidth term once attention is fused.

This module fuses the whole sub-block `y = x + fc2(quick_gelu(fc1(LN(x))))`
as a custom-VJP pair of rowwise Pallas kernels:

  forward:  one kernel per batch row, weights VMEM-resident, emits y and
            the fc1 pre-activation a1 (the flash-style "cheap residual" —
            saving it costs ONE [B, S, mlp] write instead of recomputing
            fc1 in the backward).
  backward: one kernel per batch row, reads (x, g, a1), loops the mlp dim
            in static chunks so only [S, chunk] f32 intermediates are ever
            live, and emits dx = g + LN_bwd(sum_c (g W2_c^T * gelu'(a1_c))
            W1_c^T). Weight cotangents are ZERO by construction.

HBM traffic for the [B, S, mlp] tensor: 1 write (fwd) + 1 read (bwd) vs
XLA's ~5 moves; nothing else leaves VMEM.

CORRECTNESS CONTRACT: the zero weight cotangents are only valid while the
layer's LN+MLP weights are excluded from the optimizer (the default
student mask). DistillTrainer enables this path exactly when its
trainable mask freezes every vision `mlp/` and `layer_norm2` leaf and
disables it on unfreeze (`_maybe_unfreeze` rebuilds the module).

Numerics: LayerNorm statistics and GELU in f32, matmuls bf16-in/f32-acc —
same rules as kernels/vit_block.py; parity with the Flax module and with
`jax.grad` of the XLA twin is pinned in tests/test_kernels.py.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dclip_tpu.kernels.vit_block import (
    _layer_norm,
    _mlp_kernel,
    _quick_gelu,
)


def _pick_chunk(mlp_dim: int) -> int:
    """Largest divisor of mlp_dim that is <= 256 and lane-aligned when
    possible (the chunk is the kernels' [S, chunk] working-set width)."""
    for c in (256, 128):
        if mlp_dim % c == 0:
            return c
    return mlp_dim


# The kernel pair is admitted against the FULL 16 MB VMEM, not the 15 MB
# shared-kernel budget: the estimate below is already conservative (Mosaic
# reuses the f32 row buffers it counts separately), and the B/16 shape —
# 197x768x3072, the flagship config — was validated to compile and run on
# a real v5e chip. ViT-L/14 (16.8 MB of bf16 fc weights alone) exceeds
# physical VMEM with resident weights and takes the TILED variant below
# (weights streamed in mlp-dim blocks over a second grid axis).
_FROZEN_VMEM_LIMIT = 16 * 2**20
# The tiled variant leaves headroom for Mosaic's double-buffered weight
# streams on top of the accumulators it keeps live across grid steps.
_TILED_VMEM_LIMIT = 14 * 2**20


def _resident_fit(seq: int, hidden: int, mlp_dim: int, itemsize: int) -> bool:
    """Whether the weights-resident kernel pair fits one program's VMEM.

    Backward budget (the larger of the two): both weight matrices resident
    (2*hidden*mlp_dim*itemsize), the double-buffered row blocks
    (x, g, a1 in; dx out), ~2 live [seq, hidden] f32 rows (Mosaic reuses
    the rest in place) and ~3 live [seq, chunk] f32 chunk intermediates.
    """
    f32 = 4
    chunk = _pick_chunk(mlp_dim)
    blocks = 2 * (4 * seq * hidden + seq * mlp_dim) * itemsize
    weights = 2 * hidden * mlp_dim * itemsize
    work = 2 * seq * hidden * f32 + 3 * seq * chunk * f32
    return weights + blocks + work <= _FROZEN_VMEM_LIMIT


def _tiled_chunk(
    seq: int, hidden: int, mlp_dim: int, itemsize: int
) -> Optional[int]:
    """Largest mlp-dim tile for the weight-streaming kernels, or None.

    Per grid step: both weight tiles double-buffered (4*hidden*C), the
    resident row blocks (x, g double-buffered entering a new batch row;
    dx out; the [S, C] a1 tile), one [S, D] f32 accumulator that lives
    across the j sweep, and ~3 [S, C] f32 chunk intermediates.
    """
    f32 = 4
    for c in (1024, 512, 256, 128):
        if mlp_dim % c or mlp_dim // c < 2:
            continue
        weights = 4 * hidden * c * itemsize
        blocks = (5 * seq * hidden + 3 * seq * c) * itemsize
        work = seq * hidden * f32 + 3 * seq * c * f32
        acc = seq * hidden * f32
        if weights + blocks + work + acc <= _TILED_VMEM_LIMIT:
            return c
    return None


def mlp_frozen_fit(
    seq: int, hidden: int, mlp_dim: int, itemsize: int,
    allow_tiled: bool = False,
) -> bool:
    """Whether the frozen-MLP kernel pair should engage at these shapes.

    B/16 (197x768x3072) takes the weights-resident pair — MEASURED faster
    than XLA on v5e (cache-warm step 968 -> 1010 img/s). ViT-L/14
    (257x1024x4096) overflows weight residency; the tiled weight-streaming
    pair compiles and is parity-correct but MEASURED SLOWER than XLA there
    (fwd+bwd 2.84 vs 1.85 ms at B=32 on v5e: XLA's one big [B*S, D] GEMM
    already runs ~78% of peak, while the tiled grid re-fetches weight
    tiles per batch row and recomputes LN per tile). So tiled is opt-in
    (`allow_tiled`), not the default."""
    if _resident_fit(seq, hidden, mlp_dim, itemsize):
        return True
    return allow_tiled and _tiled_chunk(seq, hidden, mlp_dim, itemsize) is not None


def _fwd_save_kernel(eps: float, chunk: int,
                     x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     o_ref, a1_ref):
    """y = x + fc2(quick_gelu(fc1(LN(x)))), also emitting the fc1
    pre-activation. Chunked over the mlp dim so the extra a1 output block
    does not push the working set past the existing MLP kernel's budget."""
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    h = _layer_norm(x, lns_ref[:], lnb_ref[:], eps)
    out = x
    mlp_dim = w1_ref.shape[1]
    for c0 in range(0, mlp_dim, chunk):
        sl = slice(c0, c0 + chunk)
        a1_c = jnp.dot(
            h, w1_ref[:, sl].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + b1_ref[sl]
        a1_ref[0, :, sl] = a1_c.astype(a1_ref.dtype)
        out = out + jnp.dot(
            _quick_gelu(a1_c), w2_ref[sl, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (out + b2_ref[:]).astype(o_ref.dtype)


def _bwd_dx_kernel(eps: float, chunk: int,
                   x_ref, g_ref, a1_ref, lns_ref, w1_ref, w2_ref,
                   dx_ref):
    """dx for y = x + fc2(quick_gelu(fc1(LN(x)))) with frozen weights.

    Reads the saved pre-activation instead of recomputing fc1 (saves a
    full [S, D]x[D, mlp] GEMM per row); LayerNorm statistics are
    recomputed from x (cheaper than saving [S, D] xhat)."""
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    g = g_ref[0].astype(jnp.float32)
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
        s = jax.nn.sigmoid(1.702 * a1_c)
        # d/da quick_gelu(a) = s + 1.702 a s (1 - s)
        dgelu = s + 1.702 * a1_c * s * (1.0 - s)
        dhg_c = jax.lax.dot_general(  # g W2_c^T -> [S, C]
            g, w2_ref[sl, :].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        da1_c = dhg_c * dgelu
        dh = dh + jax.lax.dot_general(  # da1_c W1_c^T -> [S, D]
            da1_c, w1_ref[:, sl].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # LayerNorm backward w.r.t. x (scale/bias frozen):
    # dx = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat))
    dxhat = dh * lns_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (g + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _fwd_kernel_tiled(eps: float, save_a1: bool, *refs):
    """Weight-streaming forward: grid (batch, mlp_tiles), j innermost.

    Per (i, j): recompute LN(x) (VPU-cheap vs the tile GEMMs), run the
    fc1/fc2 tile pair, and add the fc2 contribution into a [S, D] f32
    accumulator that lives across the j sweep; the row output (and the
    optional a1 tile for the backward) leave VMEM once."""
    if save_a1:
        (x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         o_ref, a1_ref, acc_ref) = refs
    else:
        (x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         o_ref, acc_ref) = refs
        a1_ref = None
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    h = _layer_norm(x, lns_ref[:], lnb_ref[:], eps)
    a1_c = jnp.dot(
        h, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
    ) + b1_ref[0]  # [S, C]
    if a1_ref is not None:
        a1_ref[0] = a1_c.astype(a1_ref.dtype)
    contrib = jnp.dot(
        _quick_gelu(a1_c), w2_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [S, D]

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = x + b2_ref[:] + contrib

    @pl.when(j > 0)
    def _accum():
        acc_ref[:, :] = acc_ref[:, :] + contrib

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[0] = acc_ref[:, :].astype(o_ref.dtype)


def _bwd_dx_kernel_tiled(eps: float, *refs):
    """Weight-streaming dx backward: grid (batch, mlp_tiles), j innermost.

    Accumulates dh = sum_j (g W2_j^T * gelu'(a1_j)) W1_j^T in a [S, D]
    f32 accumulator; the LayerNorm backward runs once at the last tile."""
    (x_ref, g_ref, a1_ref, lns_ref, w1_ref, w2_ref, dx_ref, dh_ref) = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    g = g_ref[0].astype(jnp.float32)  # [S, D]
    a1_c = a1_ref[0].astype(jnp.float32)  # [S, C]
    s = jax.nn.sigmoid(1.702 * a1_c)
    dgelu = s + 1.702 * a1_c * s * (1.0 - s)
    dhg_c = jax.lax.dot_general(  # g W2_j^T -> [S, C]
        g, w2_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da1_c = dhg_c * dgelu
    contrib = jax.lax.dot_general(  # da1_c W1_j^T -> [S, D]
        da1_c, w1_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        dh_ref[:, :] = contrib

    @pl.when(j > 0)
    def _accum():
        dh_ref[:, :] = dh_ref[:, :] + contrib

    @pl.when(j == nj - 1)
    def _ln_bwd():
        x = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mean
        var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        dxhat = dh_ref[:, :] * lns_ref[:]
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx_ref[0] = (g + rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _row_spec(b, s, d):
    return pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _const_specs(weights):
    return [
        pl.BlockSpec(
            w.shape,
            (lambda i: (0, 0)) if w.ndim == 2 else (lambda i: (0,)),
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]


def mlp_block_frozen(
    x: jnp.ndarray,  # [B, S, D]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,  # [D, mlp]
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [mlp, D]
    b2: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
    tile: Optional[int] = None,
) -> jnp.ndarray:
    """Differentiable-in-x fused MLP block with FROZEN weights.

    Weight cotangents are zero (see module docstring for the contract);
    callers must only enable this when the optimizer mask excludes the
    layer's LN+MLP weights.

    Picks the weights-resident kernel pair when it fits VMEM (B/16) and
    the weight-streaming tiled pair otherwise (L/14); `tile` forces a
    specific mlp-dim tile (tests / tuning).
    """
    b, s, d = x.shape
    mlp_dim = w1.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    if tile is None and _resident_fit(s, d, mlp_dim, itemsize):
        c = None  # resident
    else:
        c = tile or _tiled_chunk(s, d, mlp_dim, itemsize)
        if c is None:
            raise ValueError(
                f"frozen-MLP kernel does not fit VMEM at S={s} D={d} "
                f"mlp={mlp_dim}; gate callers with mlp_frozen_fit()"
            )
    if c is None:
        return _mlp_block_frozen_resident(
            x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret
        )
    return _mlp_block_frozen_tiled(
        x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret, c
    )


def _mlp_block_frozen_resident(
    x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret
):
    b, s, d = x.shape
    mlp_dim = w1.shape[1]
    chunk = _pick_chunk(mlp_dim)

    # The weights are EXPLICIT custom_vjp args (a custom_vjp may not close
    # over values under differentiation — the trainer differentiates the
    # whole param tree even though the optimizer masks these leaves); the
    # bwd rule returns zero cotangents for all six.
    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, w1, b1, w2, b2):
        # Primal (no-grad) call: the existing forward-only MLP kernel —
        # no pointless [B, S, mlp] residual write on inference paths.
        consts = _cast_consts(x, ln_scale, ln_bias, w1, b1, w2, b2)
        return pl.pallas_call(
            functools.partial(_mlp_kernel, eps),
            grid=(b,),
            in_specs=[_row_spec(b, s, d)] + _const_specs(consts),
            out_specs=_row_spec(b, s, d),
            out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
            interpret=interpret,
        )(x, *consts)

    def fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
        consts = _cast_consts(x, ln_scale, ln_bias, w1, b1, w2, b2)
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
        return y, (x, a1, consts[0], consts[2], consts[4],
                   (ln_scale, ln_bias, w1, b1, w2, b2))

    def bwd(res, g):
        xr, a1, ln_s, w1c, w2c, origs = res
        bwd_consts = [ln_s, w1c, w2c]
        a1_spec = pl.BlockSpec(
            (1, s, mlp_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        dx = pl.pallas_call(
            functools.partial(_bwd_dx_kernel, eps, chunk),
            grid=(b,),
            in_specs=[_row_spec(b, s, d), _row_spec(b, s, d), a1_spec]
            + _const_specs(bwd_consts),
            out_specs=_row_spec(b, s, d),
            out_shape=jax.ShapeDtypeStruct((b, s, d), xr.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * b * s * d * mlp_dim,
                bytes_accessed=(3 * b * s * d + b * s * mlp_dim)
                * xr.dtype.itemsize,
                transcendentals=b * s * mlp_dim,
            ),
        )(xr, g.astype(xr.dtype), a1, *bwd_consts)
        return (dx.astype(xr.dtype),) + tuple(
            jnp.zeros_like(o) for o in origs
        )

    f.defvjp(fwd, bwd)
    return f(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_block_frozen_tiled(
    x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret, c
):
    """Weight-streaming variant: grid (B, mlp/c), weight tiles DMA'd per
    step, one [S, D] f32 accumulator lives across the inner sweep."""
    b, s, d = x.shape
    mlp_dim = w1.shape[1]
    nj = mlp_dim // c
    row = lambda i, j: (i, 0, 0)  # noqa: E731
    x_spec = pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)
    vec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    w1_spec = pl.BlockSpec((d, c), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    # b1 ships as [nj, 1, c] so the block's last-two dims are (1, c): the
    # sublane dim equals the array's (Mosaic requires each of the last two
    # block dims to divide (8, 128) or match the array dim).
    b1_spec = pl.BlockSpec((1, 1, c), lambda i, j: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((c, d), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    a1_spec = pl.BlockSpec((1, s, c), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((s, d), jnp.float32)]

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, w1, b1, w2, b2):
        consts = _cast_consts(x, ln_scale, ln_bias, w1, b1, w2, b2)
        consts[3] = consts[3].reshape(nj, 1, c)  # b1 rows per tile
        return pl.pallas_call(
            functools.partial(_fwd_kernel_tiled, eps, False),
            grid=(b, nj),
            in_specs=[x_spec, vec((d,)), vec((d,)), w1_spec, b1_spec,
                      w2_spec, vec((d,))],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, *consts)

    def fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
        consts = _cast_consts(x, ln_scale, ln_bias, w1, b1, w2, b2)
        consts[3] = consts[3].reshape(nj, 1, c)
        y, a1 = pl.pallas_call(
            functools.partial(_fwd_kernel_tiled, eps, True),
            grid=(b, nj),
            in_specs=[x_spec, vec((d,)), vec((d,)), w1_spec, b1_spec,
                      w2_spec, vec((d,))],
            out_specs=(x_spec, a1_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, s, d), x.dtype),
                jax.ShapeDtypeStruct((b, s, mlp_dim), x.dtype),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, *consts)
        return y, (x, a1, consts[0], consts[2], consts[4],
                   (ln_scale, ln_bias, w1, b1, w2, b2))

    def bwd(res, g):
        xr, a1, ln_s, w1c, w2c, origs = res
        dx = pl.pallas_call(
            functools.partial(_bwd_dx_kernel_tiled, eps),
            grid=(b, nj),
            in_specs=[x_spec, x_spec, a1_spec, vec((d,)), w1_spec, w2_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, d), xr.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * b * s * d * mlp_dim,
                bytes_accessed=(3 * b * s * d + b * s * mlp_dim)
                * xr.dtype.itemsize
                + 2 * b * d * mlp_dim * xr.dtype.itemsize,
                transcendentals=b * s * mlp_dim,
            ),
        )(xr, g.astype(xr.dtype), a1, ln_s, w1c, w2c)
        return (dx.astype(xr.dtype),) + tuple(
            jnp.zeros_like(o) for o in origs
        )

    f.defvjp(fwd, bwd)
    return f(x, ln_scale, ln_bias, w1, b1, w2, b2)


def _cast_consts(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Weight list in kernel order/dtypes: LN params + biases f32, fc
    kernels in the activation dtype (bf16 on TPU)."""
    wdt = x.dtype
    return [
        ln_scale.astype(jnp.float32),
        ln_bias.astype(jnp.float32),
        w1.astype(wdt),
        b1.astype(jnp.float32),
        w2.astype(wdt),
        b2.astype(jnp.float32),
    ]


def mlp_frozen_xla(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=1e-5):
    """XLA twin (parity reference for the kernels above)."""
    xf = x.astype(jnp.float32)
    h = _layer_norm(
        xf, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32), eps
    )
    h = h @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    h = _quick_gelu(h)
    h = h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    return (xf + h).astype(x.dtype)

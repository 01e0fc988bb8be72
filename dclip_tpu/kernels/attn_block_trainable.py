"""Fused-forward TRAINABLE ViT attention block: x + O(MHA(LN1(x))).

On the student's trainable path LN1 and the QKV/output projections run as
separate XLA ops around the fused attention kernel: per layer the forward
streams ~1.3 GB of [B,S,D] activations through HBM at the bench shape
(B=256, S=197, D=768) — reads of x/h/q/k/v/attn between every op plus the
residency writes jit keeps for the backward. This kernel computes the
WHOLE block forward in one Pallas pass per batch row (one read of x, all
weights VMEM-resident) and emits exactly the tensors the backward needs
(o, q, k, v, attn, softmax stats): ~0.5 GB, no intermediate round-trips.

The backward is deliberately NOT a recompute kernel. A full-recompute
backward (rebuild h/q/k/v/P in-kernel from x) was built and MEASURED
SLOWER on v5e: cache-warm 1416 vs 1493 img/s — the recomputed QKV/PV/gWo^T
GEMMs add ~1 ms/layer of MXU work, more than the forward's bandwidth win.
Instead the VJP reuses the proven pieces of the per-op path, which this
measurement showed to be MXU-bound, not bandwidth-bound:

    g_attn = g Wo^T;  dWo = attn^T g;  dbo = sum g            (XLA GEMMs)
    dq, dk, dv = stats-reusing Pallas backward                 (vit_attention)
    dWq = h^T dq, ... (h recomputed elementwise from x);  dbq = sum dq
    dh = dq Wq^T + dk Wk^T + dv Wv^T;  dx = g + LN1_bwd(dh)   (XLA)

so backward cost is unchanged and only the forward's schedule differs.

MEASURED NET SLOWER at the bench shape, so it ships default-OFF
(`fused_attn_block` opt-in, core/config.py:320): cache-warm 1413 vs
1493 img/s on v5e — the per-program [S, D]-row projection GEMMs
under-fill the MXU that XLA's single [B*S, D] x [D, 3D] GEMM saturates
(the same effect that keeps fused_text_mlp off, kernels/mlp_trainable).
The forward's HBM savings are real but smaller than that GEMM loss.

Head phases run in chunks of 4 (kernels/vit_attention measured the
phase-split order -38% on the backward; chunking bounds live [S,S] tiles
next to the 4.7 MB of resident weights).

No masks: this block serves the VISION tower (no causal, no padding); the
text path keeps kernels/vit_attention with its in-kernel masks. Numerics:
matmuls accumulate f32, LN/softmax in f32 — parity with the Flax module
pinned in tests/test_kernels.py.

Reference frame: the student hot loop this accelerates is
/root/reference/training/CLIP_image_distillation.py:580-634.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dclip_tpu.kernels.vit_attention import _LOG2E


_HEAD_CHUNK = 4


def _layer_norm_fwd(x, scale, bias, eps):
    """(y, xhat, rstd) in f32."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    return xhat * scale + bias, xhat, rstd


def _head_slices(d: int, num_heads: int):
    hd = d // num_heads
    return [slice(h * hd, (h + 1) * hd) for h in range(num_heads)]


def _chunks(seq, n):
    return [seq[i:i + n] for i in range(0, len(seq), n)]


def _fwd_kernel(num_heads: int, eps: float, *refs):
    (x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
     bv_ref, wo_ref, bo_ref,
     o_ref, q_ref, k_ref, v_ref, a_ref, m_ref, r_ref) = refs
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    h32, _, _ = _layer_norm_fwd(x, lns_ref[:], lnb_ref[:], eps)
    cdt = x_ref.dtype  # compute dtype (bf16 on TPU): MXU inputs
    h = h32.astype(cdt)
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    k = jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:]
    v = jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    d = x.shape[-1]
    scale = (d // num_heads) ** -0.5
    qb, kb, vb = q.astype(cdt), k.astype(cdt), v.astype(cdt)
    sls = _head_slices(d, num_heads)
    outs, ms, rs = [], [], []
    for chunk in _chunks(sls, _HEAD_CHUNK):
        # Phase-split inside the chunk: all QK^T GEMMs issue before the
        # VPU softmaxes, so the MXU drains head h+1 while head h reduces.
        # Log2-domain softmax, matching the stats contract of
        # kernels/vit_attention (whose bwd kernel this block's VJP reuses):
        # m is the max of the log2-domain logits, rinv = 1/sum(exp2(.)).
        logits = [
            (scale * _LOG2E) * jax.lax.dot_general(
                qb[:, sl], kb[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for sl in chunk
        ]
        cm = [jnp.max(l, axis=-1, keepdims=True) for l in logits]
        es = [jnp.exp2(l - m) for l, m in zip(logits, cm)]
        cr = [1.0 / jnp.sum(e, axis=-1, keepdims=True) for e in es]
        pbs = [(e * r).astype(cdt) for e, r in zip(es, cr)]
        outs += [
            jnp.dot(pb, vb[:, sl], preferred_element_type=jnp.float32)
            for pb, sl in zip(pbs, chunk)
        ]
        ms += cm
        rs += cr
    attn = jnp.concatenate(outs, axis=-1).astype(cdt)
    out = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:]
    o_ref[0] = (x + out).astype(o_ref.dtype)
    q_ref[0] = qb
    k_ref[0] = kb
    v_ref[0] = vb
    a_ref[0] = attn
    m_ref[0] = jnp.concatenate(ms, axis=-1)  # [S, H] f32
    r_ref[0] = jnp.concatenate(rs, axis=-1)


def _row_spec(s, d):
    return pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _weight_specs(weights):
    specs = []
    for w in weights:
        idx = (lambda i: (0, 0)) if w.ndim == 2 else (lambda i: (0,))
        specs.append(pl.BlockSpec(w.shape, idx, memory_space=pltpu.VMEM))
    return specs


def _cast_weights(dtype, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo):
    """Kernels take matmul weights in the compute dtype (bf16 MXU inputs),
    LN params and biases f32 (added to f32 accumulators)."""
    f = jnp.float32
    return [
        lns.astype(f), lnb.astype(f),
        wq.astype(dtype), bq.astype(f), wk.astype(dtype), bk.astype(f),
        wv.astype(dtype), bv.astype(f), wo.astype(dtype), bo.astype(f),
    ]


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "interpret"))
def _fwd_call(x, weights, num_heads, eps, interpret):
    b, s, d = x.shape
    wlist = _cast_weights(x.dtype, *weights)
    spec = _row_spec(s, d)
    sspec = pl.BlockSpec((1, s, num_heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    big = jax.ShapeDtypeStruct((b, s, d), x.dtype)
    stat = jax.ShapeDtypeStruct((b, s, num_heads), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads, eps),
        grid=(b,),
        in_specs=[spec] + _weight_specs(wlist),
        out_specs=(spec,) * 5 + (sspec, sspec),
        out_shape=(big,) * 5 + (stat, stat),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (8 * s * d * d + 4 * s * s * d),
            bytes_accessed=6 * b * s * d * x.dtype.itemsize,
            transcendentals=b * s * s,
        ),
    )(x, *wlist)


# Per-program VMEM budget (see kernels/vit_block._VMEM_BUDGET).
_VMEM_BUDGET = 15 * 2**20


def attn_block_fit(seq: int, hidden: int, num_heads: int, itemsize: int):
    """Whether one forward program's residency fits VMEM: 4 DxD weights +
    x/h/q/k/v/attn/out rows + one head chunk's [S, S] f32 tiles."""
    f32 = 4
    weights = 4 * hidden * hidden * itemsize
    rows = 6 * seq * hidden * f32  # x, h32, q, k, v, out accumulators
    rows_c = 5 * seq * hidden * itemsize  # bf16 casts + outputs in flight
    chunk = min(num_heads, _HEAD_CHUNK)
    ss = 3 * chunk * seq * seq * f32  # logits + e live per chunk
    return weights + rows + rows_c + ss <= _VMEM_BUDGET


def attention_block_trainable(
    x: jnp.ndarray,  # [B, S, D]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq, bq, wk, bk, wv, bv, wo, bo,
    *,
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + out_proj(MHA(LN1(x))) with real cotangents for ALL weights
    (valid under any optimizer mask, unlike kernels/mlp_frozen). Fused
    Pallas forward; the backward reuses the stats-reusing attention
    kernel + XLA GEMMs (see the module docstring for why not recompute)."""

    @jax.custom_vjp
    def block(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo):
        o, *_ = _fwd_call(
            x, (lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo),
            num_heads=num_heads, eps=eps, interpret=interpret,
        )
        return o

    def fwd(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo):
        weights = (lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo)
        o, q, k, v, attn, m, r = _fwd_call(
            x, weights, num_heads=num_heads, eps=eps, interpret=interpret
        )
        return o, (x, q, k, v, attn, m, r, weights)

    def bwd(res, g):
        from dclip_tpu.kernels.vit_attention import _self_attention_bwd_stats

        x, q, k, v, attn, m, r, weights = res
        lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo = weights
        cdt = x.dtype
        g = g.astype(cdt)
        b, s, d = x.shape
        f32 = jnp.float32
        flat = lambda t: t.reshape(b * s, d)  # noqa: E731
        # Output projection backward (plain GEMMs).
        ga = jax.lax.dot_general(  # g Wo^T
            g, wo.astype(cdt),
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32,
        ).astype(cdt)
        dwo = jax.lax.dot_general(  # attn^T g
            flat(attn), flat(g),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dbo = jnp.sum(flat(g).astype(f32), axis=0)
        # Attention backward: the proven stats-reusing Pallas kernel
        # (o_attn = attn is the saved forward output the flash identity
        # rowsum(dP.P) = rowsum(g.o) consumes).
        dq, dk, dv = _self_attention_bwd_stats(
            q, k, v, ga, attn, m, r, num_heads=num_heads,
            padding_mask=None, causal=False, interpret=interpret,
        )
        # QKV projection backward; h recomputed elementwise from x (XLA
        # fuses the LN math into the GEMM operand read).
        xf = x.astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        h = (xhat * lns.astype(f32) + lnb.astype(f32)).astype(cdt)
        gemm = lambda a, c: jax.lax.dot_general(  # a^T c, f32 accum
            flat(a), flat(c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dwq, dwk, dwv = gemm(h, dq), gemm(h, dk), gemm(h, dv)
        dbq = jnp.sum(flat(dq).astype(f32), axis=0)
        dbk = jnp.sum(flat(dk).astype(f32), axis=0)
        dbv = jnp.sum(flat(dv).astype(f32), axis=0)
        back = lambda dt, w: jax.lax.dot_general(  # dt w^T
            dt, w.astype(cdt),
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        dh = back(dq, wq) + back(dk, wk) + back(dv, wv)
        # LN1 backward.
        dxhat = dh * lns.astype(f32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = (g.astype(f32) + rstd * (dxhat - mean1 - xhat * mean2))
        dscale = jnp.sum(dh * xhat, axis=(0, 1))
        dbias = jnp.sum(dh, axis=(0, 1))
        cast = lambda t, like: t.astype(like.dtype)  # noqa: E731
        return (
            dx.astype(x.dtype),
            cast(dscale, lns), cast(dbias, lnb),
            cast(dwq, wq), cast(dbq, bq), cast(dwk, wk), cast(dbk, bk),
            cast(dwv, wv), cast(dbv, bv), cast(dwo, wo), cast(dbo, bo),
        )

    block.defvjp(fwd, bwd)
    return block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo)

"""Fully fused ViT encoder blocks for the FROZEN CLIP forwards.

`vit_attention.py` fuses softmax(QK^T)V; the layer's remaining ops (two
LayerNorms, QKV/O projections, the 4x MLP with its [B*P, S, 4D]
intermediate, residual adds) still stream activations through HBM between
every XLA op. For the teacher's region encode — the step's FLOP budget, a
frozen forward with no backward — that traffic is the gap between ~56%
and speed-of-light MFU.

Two kernels per encoder layer, each gridded over batch rows with all
weights VMEM-resident (constant index maps — Mosaic loads them once and
keeps them across grid steps):

  attention_block:  x + out_proj(MHA(LN1(x)))          one HBM read+write
  mlp_block:        x + fc2(quick_gelu(fc1(LN2(x))))   one HBM read+write

VMEM budget per program (B/16: S=197, D=768, mlp=3072, bf16 weights):
attention 4*D*D*2B = 4.7 MB + activations ~2 MB; MLP 2*D*mlp*2B = 9.4 MB +
[S, mlp] f32 intermediate 2.4 MB — both under the 16 MB roof.

Forward-only by design: these serve the frozen teacher path (the student's
differentiable path uses kernels.vit_attention with its recompute VJP).
Numerics: all matmuls accumulate f32; LayerNorm/GELU in f32; parity with
the Flax module pinned in tests/test_kernels.py.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attn_kernel(num_heads: int, eps: float,
                 x_ref, lns_ref, lnb_ref,
                 wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                 wo_ref, bo_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    h = _layer_norm(x, lns_ref[:], lnb_ref[:], eps)
    wq = wq_ref[:].astype(jnp.float32)
    wk = wk_ref[:].astype(jnp.float32)
    wv = wv_ref[:].astype(jnp.float32)
    q = jnp.dot(h, wq, preferred_element_type=jnp.float32) + bq_ref[:]
    k = jnp.dot(h, wk, preferred_element_type=jnp.float32) + bk_ref[:]
    v = jnp.dot(h, wv, preferred_element_type=jnp.float32) + bv_ref[:]
    d = x.shape[-1]
    head_dim = d // num_heads
    scale = head_dim**-0.5
    # Phase-split head loop (all QK^T GEMMs, all softmaxes, all PV GEMMs)
    # so the MXU drains head h+1's logits while the VPU runs head h's
    # softmax — same scheduling fix as kernels.vit_attention, where the
    # interleaved order measured up to 38% slower at these shapes.
    sls = [slice(hh * head_dim, (hh + 1) * head_dim) for hh in range(num_heads)]
    # Log2-domain softmax, normalized after the PV GEMM (same three VPU
    # savings as kernels.vit_attention: bare exp2, row sums ridden on a
    # ones-column of the PV GEMM, no [S, S] divide). The scale (folded
    # with log2e) rides the [S, hd] q slice, not the [S, S] logits.
    log2e = 1.4426950408889634
    s_len = x.shape[0]
    logits = [
        jax.lax.dot_general(
            q[:, sl] * (scale * log2e), k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for sl in sls
    ]
    ms = [jnp.max(l, axis=-1, keepdims=True) for l in logits]
    es = [jnp.exp2(l - m) for l, m in zip(logits, ms)]
    ones = jnp.ones((s_len, 1), jnp.float32)
    ves = [jnp.concatenate([v[:, sl], ones], axis=1) for sl in sls]
    oes = [
        jnp.dot(e, ve, preferred_element_type=jnp.float32)
        for e, ve in zip(es, ves)
    ]
    outs = [oe[:, :-1] * (1.0 / oe[:, -1:]) for oe in oes]
    attn = jnp.concatenate(outs, axis=-1)
    out = jnp.dot(attn, wo_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + bo_ref[:]
    o_ref[0] = (x + out).astype(o_ref.dtype)


def _mlp_kernel(eps: float,
                x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref):
    x = x_ref[0].astype(jnp.float32)  # [S, D]
    h = _layer_norm(x, lns_ref[:], lnb_ref[:], eps)
    h = jnp.dot(h, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1_ref[:]
    h = _quick_gelu(h)
    h = jnp.dot(h, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[0] = (x + h).astype(o_ref.dtype)


def _call_rowwise(kernel, x, weights, interpret):
    b, s, d = x.shape
    row = lambda i: (i, 0, 0)  # noqa: E731
    x_spec = pl.BlockSpec((1, s, d), row, memory_space=pltpu.VMEM)
    in_specs = [x_spec]
    inputs: List[Any] = [x]
    for w in weights:
        spec = (lambda i: (0, 0)) if w.ndim == 2 else (lambda i: (0,))
        in_specs.append(pl.BlockSpec(w.shape, spec, memory_space=pltpu.VMEM))
        inputs.append(w)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        interpret=interpret,
    )(*inputs)


def attention_block_fused(
    x: jnp.ndarray,  # [B, S, D]
    layer_params: Dict[str, Any],  # flax EncoderLayer params
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + out_proj(MHA(LN1(x))), one kernel per batch row."""
    p = layer_params
    a = p["self_attn"]
    wdt = x.dtype  # keep weights in the activation dtype (bf16 on TPU)
    weights = [
        p["layer_norm1"]["scale"].astype(jnp.float32),
        p["layer_norm1"]["bias"].astype(jnp.float32),
        a["q_proj"]["kernel"].astype(wdt), a["q_proj"]["bias"].astype(jnp.float32),
        a["k_proj"]["kernel"].astype(wdt), a["k_proj"]["bias"].astype(jnp.float32),
        a["v_proj"]["kernel"].astype(wdt), a["v_proj"]["bias"].astype(jnp.float32),
        a["out_proj"]["kernel"].astype(wdt), a["out_proj"]["bias"].astype(jnp.float32),
    ]
    kernel = functools.partial(_attn_kernel, num_heads, eps)
    return _call_rowwise(kernel, x, weights, interpret)


def mlp_block_fused(
    x: jnp.ndarray,  # [B, S, D]
    layer_params: Dict[str, Any],
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + fc2(quick_gelu(fc1(LN2(x)))), one kernel per batch row."""
    p = layer_params
    wdt = x.dtype
    weights = [
        p["layer_norm2"]["scale"].astype(jnp.float32),
        p["layer_norm2"]["bias"].astype(jnp.float32),
        p["mlp"]["fc1"]["kernel"].astype(wdt),
        p["mlp"]["fc1"]["bias"].astype(jnp.float32),
        p["mlp"]["fc2"]["kernel"].astype(wdt),
        p["mlp"]["fc2"]["bias"].astype(jnp.float32),
    ]
    kernel = functools.partial(_mlp_kernel, eps)
    return _call_rowwise(kernel, x, weights, interpret)


def encoder_forward_fused(
    encoder_params: Dict[str, Any],  # {"layers_0": {...}, ...}
    x: jnp.ndarray,  # [B, S, D]
    num_layers: int,
    num_heads: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """The full encoder stack as 2*num_layers fused block kernels."""
    for i in range(num_layers):
        p = encoder_params[f"layers_{i}"]
        x = attention_block_fused(x, p, num_heads, eps, interpret)
        x = mlp_block_fused(x, p, eps, interpret)
    return x


def _ln_f32(x, params, eps):
    return _layer_norm(
        x.astype(jnp.float32),
        params["scale"].astype(jnp.float32),
        params["bias"].astype(jnp.float32),
        eps,
    )


# Per-program VMEM budget for deciding kernel vs XLA fallback. v5e has
# 16 MB/core; the budget leaves ~1 MB for the double-buffered [1, S, D]
# activation blocks. The flagship B/16 bf16 MLP block totals 14.3 MB and
# is verified compiled+running on v5e — a tighter budget silently demoted
# it to XLA (review finding).
_VMEM_BUDGET = 15 * 2**20


def block_fit(seq: int, hidden: int, mlp_dim: int, itemsize: int):
    """(attention_fits, mlp_fits) for one program's VMEM residency.

    ViT-L/14 (D=1024, mlp=4096) overflows the MLP kernel even in bf16
    (16.8 MB of weights); the forward then falls back per-block to XLA,
    which is correct just slower — never an error."""
    f32 = 4
    attn = (
        4 * hidden * hidden * itemsize  # qkvo weights
        + 8 * seq * hidden * f32  # x, h, q, k, v, out (+slack)
        + seq * seq * f32  # per-head logits
    )
    mlp = (
        2 * hidden * mlp_dim * itemsize
        + seq * mlp_dim * f32  # intermediate
        + 4 * seq * hidden * f32
    )
    return attn <= _VMEM_BUDGET, mlp <= _VMEM_BUDGET


def _attn_block_xla(x, p, num_heads, eps):
    from dclip_tpu.kernels.vit_attention import _xla_attention

    a = p["self_attn"]
    h = _ln_f32(x, p["layer_norm1"], eps)
    q = h @ a["q_proj"]["kernel"].astype(jnp.float32) + a["q_proj"]["bias"]
    k = h @ a["k_proj"]["kernel"].astype(jnp.float32) + a["k_proj"]["bias"]
    v = h @ a["v_proj"]["kernel"].astype(jnp.float32) + a["v_proj"]["bias"]
    out = _xla_attention(q, k, v, num_heads)
    out = out @ a["out_proj"]["kernel"].astype(jnp.float32) + a["out_proj"]["bias"]
    return (x.astype(jnp.float32) + out).astype(x.dtype)


def _mlp_block_xla(x, p, eps):
    h = _ln_f32(x, p["layer_norm2"], eps)
    h = h @ p["mlp"]["fc1"]["kernel"].astype(jnp.float32) + p["mlp"]["fc1"]["bias"]
    h = _quick_gelu(h)
    h = h @ p["mlp"]["fc2"]["kernel"].astype(jnp.float32) + p["mlp"]["fc2"]["bias"]
    return (x.astype(jnp.float32) + h).astype(x.dtype)


def fused_image_features(
    clip_cfg,  # core.config.CLIPConfig
    variables: Dict[str, Any],
    pixel_values: jnp.ndarray,  # [B, H, W, 3] NHWC
    dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Frozen-path `get_image_features`: patch-embed conv + projection in
    XLA (pure GEMMs), the encoder stack as fused block kernels. Numerics
    mirror models.clip.CLIPVisionEncoder (LN statistics in f32, quick-GELU,
    CLS pooling, bias-free projection); parity pinned in tests."""
    p = variables["params"]
    vm = p["vision_model"]
    c = clip_cfg.vision
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(dtype),
        vm["patch_embedding"]["kernel"].astype(dtype),
        window_strides=(c.patch_size, c.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, -1, c.hidden_size)
    cls = vm["class_embedding"].astype(dtype)
    x = jnp.concatenate([jnp.tile(cls[None, None, :], (b, 1, 1)), x], axis=1)
    x = x + vm["position_embedding"].astype(dtype)[None]
    x = _ln_f32(x, vm["pre_layernorm"], c.layer_norm_eps).astype(dtype)
    seq = x.shape[1]
    attn_ok, mlp_ok = block_fit(
        seq, c.hidden_size, c.mlp_dim, jnp.dtype(dtype).itemsize
    )
    for i in range(c.num_layers):
        lp = vm["encoder"][f"layers_{i}"]
        if attn_ok:
            x = attention_block_fused(x, lp, c.num_heads, c.layer_norm_eps, interpret)
        else:
            x = _attn_block_xla(x, lp, c.num_heads, c.layer_norm_eps)
        if mlp_ok:
            x = mlp_block_fused(x, lp, c.layer_norm_eps, interpret)
        else:
            x = _mlp_block_xla(x, lp, c.layer_norm_eps)
    pooled = _ln_f32(x[:, 0], vm["post_layernorm"], c.layer_norm_eps).astype(dtype)
    return jnp.dot(
        pooled, p["visual_projection"]["kernel"].astype(dtype)
    )

"""Pallas kernels vs their XLA reference twins (interpret mode on CPU)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from dclip_tpu.kernels import cross_attention_fused, fused_distillation_loss
from dclip_tpu.kernels.distill_loss import make_fused_distillation_loss
from dclip_tpu.models.cross_modal import CrossModalAttention
from dclip_tpu.ops.losses import distillation_loss

D, H, T, P = 64, 4, 8, 4


@pytest.fixture(scope="module")
def cm_setup():
    model = CrossModalAttention(embed_dim=D, num_heads=H)
    rng = np.random.RandomState(0)
    text = rng.randn(3, T, D).astype(np.float32)
    image = rng.randn(3, P, D).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(text), jnp.asarray(image))
    return model, variables, text, image


def test_cross_attention_kernel_parity(cm_setup):
    model, variables, text, image = cm_setup
    want_t, want_i = model.apply(variables, jnp.asarray(text), jnp.asarray(image))
    got_t, got_i = cross_attention_fused(
        variables["params"], jnp.asarray(text), jnp.asarray(image),
        num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), atol=1e-4)


def test_cross_attention_kernel_masked_parity(cm_setup):
    model, variables, text, image = cm_setup
    rng = np.random.RandomState(1)
    tmask = (rng.rand(3, T) > 0.3).astype(np.float32)
    tmask[:, 0] = 1
    imask = (rng.rand(3, P) > 0.3).astype(np.float32)
    imask[:, 0] = 1
    want_t, want_i = model.apply(
        variables, jnp.asarray(text), jnp.asarray(image),
        text_mask=jnp.asarray(tmask), image_mask=jnp.asarray(imask),
    )
    got_t, got_i = cross_attention_fused(
        variables["params"], jnp.asarray(text), jnp.asarray(image),
        jnp.asarray(tmask), jnp.asarray(imask), num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i), atol=1e-4)


@pytest.fixture(scope="module")
def loss_inputs():
    rng = np.random.RandomState(2)
    return tuple(
        jnp.asarray(rng.randn(16, 32).astype(np.float32)) for _ in range(4)
    )


def test_fused_loss_forward_parity(loss_inputs):
    si, st, ti, tt = loss_inputs
    want_total, want_parts = distillation_loss(si, st, ti, tt, 0.05, 0.7)
    got_total, got_parts = fused_distillation_loss(
        si, st, ti, tt, 0.05, 0.7, interpret=True
    )
    assert np.isclose(float(got_total), float(want_total), atol=1e-5)
    for k in want_parts:
        assert np.isclose(float(got_parts[k]), float(want_parts[k]), atol=1e-5), k


def test_fused_loss_gradient_parity(loss_inputs):
    si, st, ti, tt = loss_inputs
    fn = make_fused_distillation_loss(0.05, 1.0, interpret=True)

    g_got = jax.grad(lambda a, b: fn(a, b, ti, tt)["loss"], argnums=(0, 1))(si, st)
    g_want = jax.grad(
        lambda a, b: distillation_loss(a, b, ti, tt)[0], argnums=(0, 1)
    )(si, st)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_want[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got[1]), np.asarray(g_want[1]), atol=1e-5)


def test_fused_loss_part_gradients(loss_inputs):
    """Gradients taken through an individual part match the XLA part grad."""
    si, st, ti, tt = loss_inputs
    fn = make_fused_distillation_loss(0.05, 1.0, interpret=True)
    from dclip_tpu.ops.losses import cosine_distillation

    g_got = jax.grad(lambda a: fn(a, st, ti, tt)["image_distill_loss"])(si)
    g_want = jax.grad(lambda a: cosine_distillation(a, ti))(si)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=1e-6)


def test_fused_loss_large_batch_fallback():
    rng = np.random.RandomState(3)
    args = tuple(
        jnp.asarray(rng.randn(1100, 8).astype(np.float32)) for _ in range(4)
    )
    total, parts = fused_distillation_loss(*args)  # silently uses XLA path
    want, _ = distillation_loss(*args)
    assert np.isclose(float(total), float(want), atol=1e-5)


def test_cross_attention_trainable_gradient_parity(cm_setup):
    """Pallas-fwd + XLA-recompute-bwd == pure Flax gradients."""
    from dclip_tpu.kernels import cross_attention_trainable

    model, variables, text, image = cm_setup
    tmask = np.ones((3, T), np.float32)
    imask = np.ones((3, P), np.float32)
    tmask[:, -2:] = 0
    imask[:, -1:] = 0

    def loss_kernel(p, t, i):
        at, ai = cross_attention_trainable(
            p, t, i, jnp.asarray(tmask), jnp.asarray(imask),
            num_heads=H, interpret=True,
        )
        return jnp.sum(at**2) + jnp.sum(ai**2)

    def loss_flax(p, t, i):
        at, ai = model.apply(
            {"params": p}, t, i,
            text_mask=jnp.asarray(tmask), image_mask=jnp.asarray(imask),
        )
        return jnp.sum(at**2) + jnp.sum(ai**2)

    args = (variables["params"], jnp.asarray(text), jnp.asarray(image))
    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    g_f = jax.grad(loss_flax, argnums=(0, 1, 2))(*args)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        ),
        g_k, g_f,
    )


def test_cross_attention_single_sided_mask_not_dropped(cm_setup):
    """A lone image_mask must affect the fused forward (was silently
    dropped; forward/backward then disagreed)."""
    model, variables, text, image = cm_setup
    imask = np.ones((3, P), np.float32)
    imask[:, -2:] = 0
    got_t, _ = cross_attention_fused(
        variables["params"], jnp.asarray(text), jnp.asarray(image),
        None, jnp.asarray(imask), num_heads=H, interpret=True,
    )
    want_t, _ = model.apply(
        variables, jnp.asarray(text), jnp.asarray(image),
        image_mask=jnp.asarray(imask),
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-4)


def test_topk_streamed_matches_xla(loss_inputs):
    from dclip_tpu.kernels import topk_streamed
    from dclip_tpu.ops.knn import knn_search

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    store = jnp.asarray(rng.randn(1000, 32).astype(np.float32))
    got_s, got_i = topk_streamed(q, store, k=5, block_n=256, interpret=True)
    want_s, want_i = knn_search(q, store, k=5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_topk_streamed_negative_scores_and_padding():
    """Padded sentinel rows must not beat genuinely negative scores, and
    exact block multiples need no padding at all."""
    from dclip_tpu.kernels import topk_streamed
    from dclip_tpu.ops.knn import knn_search

    rng = np.random.RandomState(10)
    q = jnp.asarray(-np.abs(rng.randn(4, 16)).astype(np.float32))
    store = jnp.asarray(np.abs(rng.randn(130, 16)).astype(np.float32))
    got_s, got_i = topk_streamed(q, store, k=3, block_n=64, interpret=True)
    want_s, want_i = knn_search(q, store, k=3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    assert (np.asarray(got_i) < 130).all()


def test_vit_self_attention_fused_matches_xla():
    """Fused ViT self-attention (interpret mode) == the Flax Attention
    module's math, odd sequence length included (S=197-style)."""
    from dclip_tpu.kernels.vit_attention import (
        _xla_attention,
        self_attention_fused,
    )

    rng = np.random.RandomState(0)
    b, s, d, heads = 3, 13, 32, 4
    q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    got = self_attention_fused(q, k, v, num_heads=heads, interpret=True)
    ref = _xla_attention(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_vit_self_attention_trainable_grads():
    """Custom-VJP (Pallas fwd + XLA recompute bwd) gradients == plain XLA."""
    from dclip_tpu.kernels.vit_attention import (
        _xla_attention,
        self_attention_trainable,
    )

    rng = np.random.RandomState(1)
    b, s, d, heads = 2, 9, 16, 2
    q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(
            self_attention_trainable(q, k, v, num_heads=heads, interpret=True) ** 2
        )

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, heads) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_vit_self_attention_trainable_grads_masked():
    """Gradients through the fused kernel under the causal + key-padding
    masks (the unpacked text-tower configuration, models/clip.py:75-84):
    the stats-reusing backward recomputes p from MASKED logits — an
    unmasked recompute would give nonzero dS at masked positions."""
    from dclip_tpu.kernels.vit_attention import (
        _xla_attention,
        self_attention_trainable,
    )

    rng = np.random.RandomState(2)
    b, s, d, heads = 2, 9, 16, 2
    q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    pad = jnp.asarray([[1] * 6 + [0] * 3, [1] * 9], jnp.float32)

    for causal, mask in ((True, pad), (True, None), (False, pad)):
        def loss_fused(q, k, v, causal=causal, mask=mask):
            return jnp.sum(
                self_attention_trainable(
                    q, k, v, num_heads=heads, padding_mask=mask,
                    causal=causal, interpret=True) ** 2
            )

        def loss_xla(q, k, v, causal=causal, mask=mask):
            return jnp.sum(
                _xla_attention(q, k, v, heads, padding_mask=mask,
                               causal=causal) ** 2
            )

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_fused, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5,
                err_msg=f"causal={causal} mask={'pad' if mask is not None else None}",
            )


def test_vit_self_attention_fwd_stats_bit_parity():
    """The stats-emitting forward (what the trainable path actually runs)
    is BIT-identical to self_attention_fused — e/s is the same op
    sequence jax.nn.softmax performs."""
    from dclip_tpu.kernels.vit_attention import (
        _self_attention_fwd_stats,
        self_attention_fused,
    )

    rng = np.random.RandomState(3)
    b, s, d, heads = 2, 13, 32, 4
    q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    want = self_attention_fused(q, k, v, num_heads=heads, interpret=True)
    got, m, r = _self_attention_fwd_stats(q, k, v, num_heads=heads,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert m.shape == (b, s, heads) and r.shape == (b, s, heads)


def test_clip_module_fused_attention_parity():
    """CLIPModule(fused_attention=True) == the XLA module bit-for-bit on
    image features AND their gradients (interpret mode on CPU)."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule

    cfg = CLIPConfig.tiny_test()
    m0 = CLIPModule(cfg)
    m1 = CLIPModule(cfg, fused_attention=True, pallas_interpret=True)
    v = m0.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, cfg.text.max_length), jnp.int32),
        jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    px = jnp.asarray(
        np.random.RandomState(0)
        .randn(4, cfg.vision.image_size, cfg.vision.image_size, 3)
        .astype(np.float32)
    )
    a = m0.apply(v, px, method=m0.get_image_features)
    b = m1.apply(v, px, method=m1.get_image_features)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def loss(p, mod):
        return jnp.sum(
            mod.apply({"params": p}, px, method=mod.get_image_features) ** 2
        )

    g0 = jax.grad(loss)(v["params"], m0)
    g1 = jax.grad(loss)(v["params"], m1)
    # atol 1e-5: the Pallas backward reorders f32 accumulations, and
    # cancellation-dominated near-zero grads (class_embedding ~1e-7) can
    # differ by a few ulp-equivalents.
    for x, y in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_fused_encoder_blocks_match_flax_module():
    """Fully fused LN+attention+residual / LN+MLP+residual block kernels
    (interpret mode) == the Flax encoder, and the end-to-end
    fused_image_features == CLIPModule.get_image_features bit-for-bit at
    f32."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.kernels.vit_block import (
        attention_block_fused,
        fused_image_features,
        mlp_block_fused,
    )
    from dclip_tpu.models.clip import CLIPModule, EncoderLayer

    rng = np.random.RandomState(0)
    d, heads, mlp, s, b = 32, 4, 64, 13, 3
    layer = EncoderLayer(d, heads, mlp, eps=1e-5)
    x = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    ref = layer.apply({"params": params}, x)
    got = mlp_block_fused(
        attention_block_fused(x, params, heads, 1e-5, interpret=True),
        params, 1e-5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    cfg = CLIPConfig.tiny_test()
    m = CLIPModule(cfg)
    v = m.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, cfg.text.max_length), jnp.int32),
        jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    px = jnp.asarray(
        rng.randn(4, cfg.vision.image_size, cfg.vision.image_size, 3).astype(
            np.float32
        )
    )
    a = m.apply(v, px, method=m.get_image_features)
    bb = fused_image_features(cfg, v, px, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6)


def test_fused_image_features_vmem_fallback(monkeypatch):
    """Configs whose blocks exceed per-program VMEM (ViT-L/14 MLP) fall
    back to XLA per block — numerics unchanged."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.kernels import vit_block

    cfg = CLIPConfig.tiny_test()
    from dclip_tpu.models.clip import CLIPModule

    m = CLIPModule(cfg)
    v = m.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, cfg.text.max_length), jnp.int32),
        jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    px = jnp.asarray(
        np.random.RandomState(1)
        .randn(3, cfg.vision.image_size, cfg.vision.image_size, 3)
        .astype(np.float32)
    )
    ref = m.apply(v, px, method=m.get_image_features)
    monkeypatch.setattr(vit_block, "_VMEM_BUDGET", 1)  # force full fallback
    got = vit_block.fused_image_features(cfg, v, px, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # ViT-L/14 must select the MLP fallback (16.8 MB of fc weights in bf16).
    monkeypatch.undo()
    l14 = CLIPConfig.vit_l_14().vision
    attn_ok, mlp_ok = vit_block.block_fit(257, l14.hidden_size, l14.mlp_dim, 2)
    assert not mlp_ok


# -- frozen-weight fused MLP block (kernels/mlp_frozen.py) --------------------


@pytest.fixture(scope="module")
def frozen_mlp_args():
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen  # noqa: F401

    rng = np.random.RandomState(7)
    B, S, Dm, M = 3, 16, 64, 256
    x = jnp.asarray(rng.randn(B, S, Dm).astype(np.float32))
    return (
        x,
        jnp.asarray(1 + 0.1 * rng.randn(Dm).astype(np.float32)),
        jnp.asarray(0.1 * rng.randn(Dm).astype(np.float32)),
        jnp.asarray(rng.randn(Dm, M).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.randn(M).astype(np.float32)),
        jnp.asarray(rng.randn(M, Dm).astype(np.float32) * 0.05),
        jnp.asarray(0.1 * rng.randn(Dm).astype(np.float32)),
    )


def test_mlp_frozen_forward_parity(frozen_mlp_args):
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen, mlp_frozen_xla

    want = mlp_frozen_xla(*frozen_mlp_args)
    got = mlp_block_frozen(*frozen_mlp_args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_mlp_frozen_grad_parity(frozen_mlp_args):
    """dx matches jax.grad of the XLA twin; all six weight cotangents are
    exactly zero (the frozen-weight contract the trainer relies on)."""
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen, mlp_frozen_xla

    co = jnp.asarray(
        np.random.RandomState(8).randn(*frozen_mlp_args[0].shape).astype(np.float32)
    )
    gk = jax.grad(
        lambda *a: jnp.sum(mlp_block_frozen(*a, interpret=True) * co),
        argnums=tuple(range(7)),
    )(*frozen_mlp_args)
    gx = jax.grad(lambda *a: jnp.sum(mlp_frozen_xla(*a) * co), argnums=0)(
        *frozen_mlp_args
    )
    np.testing.assert_allclose(
        np.asarray(gk[0]), np.asarray(gx), rtol=1e-4, atol=1e-5
    )
    for g in gk[1:]:
        assert float(jnp.abs(g).max()) == 0.0


def test_mlp_frozen_fit_budget():
    """B/16 takes the weights-resident pair. ViT-L/14 overflows residency:
    the tiled pair admits it only under allow_tiled (opt-in — measured
    slower than XLA at L/14 shapes on v5e, see mlp_frozen_fit docstring)."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.kernels.mlp_frozen import (
        _resident_fit,
        _tiled_chunk,
        mlp_frozen_fit,
    )

    b16 = CLIPConfig.vit_b_16().vision
    assert _resident_fit(b16.num_patches + 1, b16.hidden_size, b16.mlp_dim, 2)
    assert mlp_frozen_fit(b16.num_patches + 1, b16.hidden_size, b16.mlp_dim, 2)
    l14 = CLIPConfig.vit_l_14().vision
    s14 = l14.num_patches + 1
    assert not _resident_fit(s14, l14.hidden_size, l14.mlp_dim, 2)
    c = _tiled_chunk(s14, l14.hidden_size, l14.mlp_dim, 2)
    assert c is not None and l14.mlp_dim % c == 0
    assert not mlp_frozen_fit(s14, l14.hidden_size, l14.mlp_dim, 2)
    assert mlp_frozen_fit(
        s14, l14.hidden_size, l14.mlp_dim, 2, allow_tiled=True
    )


def test_mlp_frozen_tiled_forward_parity(frozen_mlp_args):
    """The weight-streaming variant matches the XLA twin bit-for-tolerance
    (4 tiles of 64 over mlp_dim=256)."""
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen, mlp_frozen_xla

    want = mlp_frozen_xla(*frozen_mlp_args)
    got = mlp_block_frozen(*frozen_mlp_args, interpret=True, tile=64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_mlp_frozen_tiled_grad_parity(frozen_mlp_args):
    """Tiled dx matches jax.grad of the XLA twin; weight cotangents zero."""
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen, mlp_frozen_xla

    co = jnp.asarray(
        np.random.RandomState(9).randn(*frozen_mlp_args[0].shape).astype(np.float32)
    )
    gk = jax.grad(
        lambda *a: jnp.sum(mlp_block_frozen(*a, interpret=True, tile=64) * co),
        argnums=tuple(range(7)),
    )(*frozen_mlp_args)
    gx = jax.grad(lambda *a: jnp.sum(mlp_frozen_xla(*a) * co), argnums=0)(
        *frozen_mlp_args
    )
    np.testing.assert_allclose(
        np.asarray(gk[0]), np.asarray(gx), rtol=1e-4, atol=1e-5
    )
    for g in gk[1:]:
        assert float(jnp.abs(g).max()) == 0.0


@pytest.mark.slow
def test_mlp_frozen_tpu_lowering():
    """Both frozen-MLP pairs (resident at B/16 shapes, tiled at L/14
    shapes) LOWER for the real TPU backend, fwd and grad, via
    cross-platform jax.export on CPU.

    Interpret mode skips Mosaic's block-spec validation — a (1, c) bias
    block over a (nj, c) array passed interpret parity but failed on
    hardware with "last two dimensions of your block shape are divisible
    by 8 and 128" — so this is the CPU-runnable regression net for that
    whole bug class."""
    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen

    for s, d, mlp, tile in ((200, 768, 3072, None), (264, 1024, 4096, 512)):
        x = jnp.zeros((2, s, d), jnp.bfloat16)
        w = (
            jnp.ones((d,), jnp.float32),
            jnp.zeros((d,), jnp.float32),
            jnp.zeros((d, mlp), jnp.bfloat16),
            jnp.zeros((mlp,), jnp.bfloat16),
            jnp.zeros((mlp, d), jnp.bfloat16),
            jnp.zeros((d,), jnp.bfloat16),
        )

        def loss(x):
            y = mlp_block_frozen(x, *w, tile=tile)
            return jnp.sum(y.astype(jnp.float32))

        jax.export.export(jax.jit(mlp_block_frozen), platforms=["tpu"])(
            x, *w
        )
        jax.export.export(jax.jit(jax.grad(loss)), platforms=["tpu"])(x)


def test_clip_fused_frozen_mlp_module_parity():
    """CLIPModule(fused_frozen_mlp=True) produces the same param tree and
    (to bf16-vs-f32 LN tolerance) the same image features as the default
    module; grads flow to attention while vision LN2/MLP get zeros."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule

    cfg = CLIPConfig.tiny_test()
    base = CLIPModule(cfg)
    fused = CLIPModule(cfg, fused_frozen_mlp=True, pallas_interpret=True)
    ids = jnp.ones((2, cfg.text.max_length), jnp.int32)
    px = jnp.asarray(
        np.random.RandomState(3)
        .randn(2, cfg.vision.image_size, cfg.vision.image_size, 3)
        .astype(np.float32)
    )
    v = base.init(jax.random.PRNGKey(0), ids, px)
    vf = fused.init(jax.random.PRNGKey(0), ids, px)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)

    want = base.apply(v, px, method=base.get_image_features)
    got = fused.apply(v, px, method=fused.get_image_features)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )

    def loss(params, m):
        return jnp.sum(m.apply({"params": params}, px, method=m.get_image_features))

    g = jax.grad(loss)(vf["params"], fused)
    l0 = g["vision_model"]["encoder"]["layers_0"]
    assert float(jnp.abs(l0["mlp"]["fc1"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(l0["layer_norm2"]["scale"]).max()) == 0.0
    assert float(jnp.abs(l0["self_attn"]["q_proj"]["kernel"]).max()) > 0.0


# -- trainable fused MLP block (kernels/mlp_trainable.py) ---------------------


def test_mlp_trainable_forward_parity(frozen_mlp_args):
    from dclip_tpu.kernels.mlp_frozen import mlp_frozen_xla
    from dclip_tpu.kernels.mlp_trainable import mlp_block_trainable

    want = mlp_frozen_xla(*frozen_mlp_args)
    got = mlp_block_trainable(*frozen_mlp_args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_mlp_trainable_grad_parity(frozen_mlp_args):
    """ALL seven cotangents (x + six weights) match jax.grad of the XLA
    twin — the real-weight-gradient contract the text stack relies on."""
    from dclip_tpu.kernels.mlp_frozen import mlp_frozen_xla
    from dclip_tpu.kernels.mlp_trainable import mlp_block_trainable

    co = jnp.asarray(
        np.random.RandomState(9).randn(*frozen_mlp_args[0].shape).astype(np.float32)
    )
    gk = jax.grad(
        lambda *a: jnp.sum(mlp_block_trainable(*a, interpret=True) * co),
        argnums=tuple(range(7)),
    )(*frozen_mlp_args)
    gx = jax.grad(
        lambda *a: jnp.sum(mlp_frozen_xla(*a) * co), argnums=tuple(range(7))
    )(*frozen_mlp_args)
    names = ("x", "ln_scale", "ln_bias", "w1", "b1", "w2", "b2")
    for name, k, x in zip(names, gk, gx):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(x), rtol=1e-4, atol=2e-4, err_msg=name
        )


def test_mlp_trainable_fit_budget():
    """CLIP text shapes (512/2048) fit; B/16 vision (768/3072) does not."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.kernels.mlp_trainable import mlp_trainable_fit

    txt = CLIPConfig.vit_b_16().text
    assert mlp_trainable_fit(txt.max_length, txt.hidden_size, txt.mlp_dim, 2)
    b16 = CLIPConfig.vit_b_16().vision
    assert not mlp_trainable_fit(
        b16.num_patches + 1, b16.hidden_size, b16.mlp_dim, 2
    )


def test_clip_fused_trainable_text_mlp_module_parity():
    """CLIPModule(fused_trainable_text_mlp=True): identical param tree,
    text-feature parity, and REAL grads on text LN2/MLP weights that match
    the unfused module's."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule

    cfg = CLIPConfig.tiny_test()
    base = CLIPModule(cfg)
    fused = CLIPModule(cfg, fused_trainable_text_mlp=True, pallas_interpret=True)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(1, cfg.text.vocab_size, (2, cfg.text.max_length)))
    mask = jnp.ones_like(ids)
    px = jnp.asarray(
        rng.randn(2, cfg.vision.image_size, cfg.vision.image_size, 3)
        .astype(np.float32)
    )
    v = base.init(jax.random.PRNGKey(0), ids, px)
    vf = fused.init(jax.random.PRNGKey(0), ids, px)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)

    want = base.apply(v, ids, mask, method=base.get_text_features)
    got = fused.apply(v, ids, mask, method=fused.get_text_features)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )

    def loss(params, m):
        out = m.apply(
            {"params": params}, ids, mask, method=m.get_text_features
        )
        return jnp.sum(out * out)

    gb = jax.grad(loss)(v["params"], base)
    gf = jax.grad(loss)(vf["params"], fused)
    l0b = gb["text_model"]["encoder"]["layers_0"]
    l0f = gf["text_model"]["encoder"]["layers_0"]
    for path in (("mlp", "fc1", "kernel"), ("mlp", "fc2", "bias"),
                 ("layer_norm2", "scale"), ("layer_norm2", "bias")):
        wb, wf = l0b, l0f
        for k in path:
            wb, wf = wb[k], wf[k]
        assert float(jnp.abs(wf).max()) > 0.0, path
        np.testing.assert_allclose(
            np.asarray(wf), np.asarray(wb), rtol=2e-3, atol=2e-4,
            err_msg="/".join(path),
        )


# -- fully fused trainable attention block (kernels/attn_block_trainable) ----


@pytest.fixture(scope="module")
def attn_block_args():
    rng = np.random.RandomState(7)
    b, s, d, heads = 3, 13, 32, 4
    x = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    mk = lambda *shape: jnp.asarray(  # noqa: E731
        (rng.randn(*shape) / np.sqrt(shape[0])).astype(np.float32)
    )
    weights = dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32)),
        ln_bias=jnp.asarray(0.1 * rng.randn(d).astype(np.float32)),
        wq=mk(d, d), bq=mk(d), wk=mk(d, d), bk=mk(d), wv=mk(d, d), bv=mk(d),
        wo=mk(d, d), bo=mk(d),
    )
    return x, weights, heads


def _attn_block_xla_ref(x, w, heads, eps=1e-5):
    """Plain-JAX reference: x + out_proj(MHA(LN1(x)))."""
    from dclip_tpu.kernels.vit_attention import _xla_attention

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps) * w["ln_scale"] + w["ln_bias"]
    q = h @ w["wq"] + w["bq"]
    k = h @ w["wk"] + w["bk"]
    v = h @ w["wv"] + w["bv"]
    out = _xla_attention(q, k, v, heads)
    return xf + out @ w["wo"] + w["bo"]


def test_attn_block_trainable_forward_parity(attn_block_args):
    from dclip_tpu.kernels import attention_block_trainable

    x, w, heads = attn_block_args
    got = attention_block_trainable(
        x, w["ln_scale"], w["ln_bias"], w["wq"], w["bq"], w["wk"], w["bk"],
        w["wv"], w["bv"], w["wo"], w["bo"], num_heads=heads, interpret=True,
    )
    want = _attn_block_xla_ref(x, w, heads)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_attn_block_trainable_grad_parity(attn_block_args):
    """REAL cotangents for x and all ten weights: the custom VJP (Pallas
    recompute backward + XLA weight-grad GEMMs) matches jax.grad through
    the plain-JAX block for every input."""
    from dclip_tpu.kernels import attention_block_trainable

    x, w, heads = attn_block_args
    target = jnp.asarray(
        np.random.RandomState(8).randn(*x.shape).astype(np.float32)
    )
    keys = list(w)

    def loss_kernel(x, *ws):
        wd = dict(zip(keys, ws))
        o = attention_block_trainable(
            x, wd["ln_scale"], wd["ln_bias"], wd["wq"], wd["bq"], wd["wk"],
            wd["bk"], wd["wv"], wd["bv"], wd["wo"], wd["bo"],
            num_heads=heads, interpret=True,
        )
        return jnp.sum((o - target) ** 2)

    def loss_ref(x, *ws):
        wd = dict(zip(keys, ws))
        return jnp.sum((_attn_block_xla_ref(x, wd, heads) - target) ** 2)

    args = (x,) + tuple(w[k] for k in keys)
    gk = jax.grad(loss_kernel, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for name, a, b in zip(["x"] + keys, gk, gr):
        assert float(jnp.abs(a).max()) > 0.0, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_clip_fused_attn_block_module_parity():
    """CLIPModule(fused_trainable_attn_block=True): identical param tree,
    image-feature parity, and REAL grads on vision LN1/attention weights
    matching the unfused module's — while the TEXT tower (causal mask)
    transparently keeps the per-op path."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule

    cfg = CLIPConfig.tiny_test()
    base = CLIPModule(cfg)
    fused = CLIPModule(
        cfg, fused_trainable_attn_block=True, pallas_interpret=True
    )
    rng = np.random.RandomState(9)
    ids = jnp.asarray(rng.randint(1, cfg.text.vocab_size, (2, cfg.text.max_length)))
    mask = jnp.ones_like(ids)
    px = jnp.asarray(
        rng.randn(2, cfg.vision.image_size, cfg.vision.image_size, 3)
        .astype(np.float32)
    )
    v = base.init(jax.random.PRNGKey(0), ids, px)
    vf = fused.init(jax.random.PRNGKey(0), ids, px)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)

    want = base.apply(v, px, method=base.get_image_features)
    got = fused.apply(v, px, method=fused.get_image_features)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )
    # Text path unchanged (the block kernel has no masks; the module must
    # route text through the per-op attention).
    tw = base.apply(v, ids, mask, method=base.get_text_features)
    tg = fused.apply(v, ids, mask, method=fused.get_text_features)
    np.testing.assert_allclose(
        np.asarray(tg), np.asarray(tw), rtol=1e-5, atol=1e-5
    )

    def loss(params, m):
        out = m.apply({"params": params}, px, method=m.get_image_features)
        return jnp.sum(out * out)

    gb = jax.grad(loss)(v["params"], base)
    gf = jax.grad(loss)(vf["params"], fused)
    l0b = gb["vision_model"]["encoder"]["layers_0"]
    l0f = gf["vision_model"]["encoder"]["layers_0"]
    for path in (("self_attn", "q_proj", "kernel"),
                 ("self_attn", "out_proj", "bias"),
                 ("layer_norm1", "scale"), ("layer_norm1", "bias")):
        wb, wf = l0b, l0f
        for k in path:
            wb, wf = wb[k], wf[k]
        assert float(jnp.abs(wf).max()) > 0.0, path
        np.testing.assert_allclose(
            np.asarray(wf), np.asarray(wb), rtol=2e-3, atol=2e-4,
            err_msg="/".join(path),
        )


def test_attn_block_fit_budget():
    from dclip_tpu.kernels import attn_block_fit

    # B/16 bf16 (S=197, D=768, H=12) must fit; ViT-L/14 (D=1024) must not.
    assert attn_block_fit(197, 768, 12, 2)
    assert not attn_block_fit(257, 1024, 16, 2)


def test_vit_self_attention_segment_mask_parity_and_grads():
    """In-kernel segment masking (causal=True + segment_ids) reproduces
    ops.packing.packed_attention_bias exactly: forward and q/k/v grads
    match the XLA additive-bias reference (the packed-caption contract)."""
    from dclip_tpu.kernels.vit_attention import self_attention_trainable
    from dclip_tpu.ops.packing import packed_attention_bias

    rng = np.random.RandomState(7)
    b, s, d, heads = 3, 12, 32, 4
    q = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    # Rows: two segments + trailing padding, three segments, all padding
    # (a bucket row) — the degenerate all-zeros row must stay finite.
    seg = jnp.asarray(
        np.array(
            [
                [1, 1, 1, 1, 2, 2, 2, 0, 0, 0, 0, 0],
                [1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 3, 0],
                [0] * 12,
            ],
            np.int32,
        )
    )

    def ref(q, k, v):
        hd = d // heads
        bias = packed_attention_bias(seg)

        def split(t):
            return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q) * hd**-0.5, split(k),
            preferred_element_type=jnp.float32,
        ) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
        return out.transpose(0, 2, 1, 3).reshape(b, s, d)

    def fused(q, k, v):
        return self_attention_trainable(
            q, k, v, num_heads=heads, causal=True, segment_ids=seg,
            interpret=True,
        )

    got = fused(q, k, v)
    want = ref(q, k, v)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    t = jnp.asarray(rng.randn(b, s, d).astype(np.float32))
    g_got = jax.grad(lambda *a: jnp.sum((fused(*a) - t) ** 2), (0, 1, 2))(
        q, k, v
    )
    g_want = jax.grad(lambda *a: jnp.sum((ref(*a) - t) ** 2), (0, 1, 2))(
        q, k, v
    )
    for a, b_ in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5
        )


def test_packed_text_features_fused_kernel_parity():
    """The packed text tower on the FUSED path (in-kernel segment mask,
    no [R, 1, S, S] bias tensor) matches the XLA additive-bias path."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.ops.packing import pack_captions

    cfg = CLIPConfig.tiny_test()
    rng = np.random.RandomState(11)
    b, s = 8, cfg.text.max_length
    lengths = rng.randint(3, max(4, s // 3), size=b)
    ids = np.zeros((b, s), np.int64)
    mask = np.zeros((b, s), np.int64)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.randint(1, cfg.text.vocab_size - 1, size=n)
        ids[i, n - 1] = cfg.text.eos_token_id
        mask[i, :n] = 1
    p = pack_captions(ids, mask, cfg.text.eos_token_id)
    args = tuple(
        jnp.asarray(p[k])
        for k in ("packed_ids", "packed_segments", "packed_positions",
                  "packed_eos_rows", "packed_eos_cols")
    )

    xla = CLIPModule(cfg)
    fused = CLIPModule(cfg, fused_attention=True, pallas_interpret=True)
    variables = xla.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    want = xla.apply(variables, *args, method=xla.get_packed_text_features)
    got = fused.apply(variables, *args,
                      method=fused.get_packed_text_features)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(m, params):
        f = m.apply({"params": params}, *args,
                    method=m.get_packed_text_features)
        return jnp.sum(f**2)

    gw = jax.grad(lambda p_: loss(xla, p_))(variables["params"])
    gg = jax.grad(lambda p_: loss(fused, p_))(variables["params"])
    flat_w = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gw)
    )
    checked = 0
    for k, vg in jax.tree_util.tree_leaves_with_path(gg):
        name = jax.tree_util.keystr(k)
        if "text_model" not in name and "text_projection" not in name:
            continue
        np.testing.assert_allclose(
            np.asarray(vg), np.asarray(flat_w[name]), rtol=5e-4, atol=1e-5,
            err_msg=name,
        )
        checked += 1
    assert checked >= 10

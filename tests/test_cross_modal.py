"""CrossModalAttention parity vs the torch reference architecture
(patch_text_aggregation.py:13-46) + teacher module behavior."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import TeacherConfig
from dclip_tpu.models.cross_modal import CrossModalAttention, import_torch_cross_modal
from dclip_tpu.models.teacher import PatchTextAggregation, import_torch_teacher

torch = pytest.importorskip("torch")


class _TorchCrossModalAttention(torch.nn.Module):
    """Verbatim re-implementation of the reference block (:13-46)."""

    def __init__(self, embed_dim, num_heads):
        super().__init__()
        self.text_to_image = torch.nn.MultiheadAttention(embed_dim, num_heads)
        self.image_to_text = torch.nn.MultiheadAttention(embed_dim, num_heads)
        self.norm_text = torch.nn.LayerNorm(embed_dim)
        self.norm_image = torch.nn.LayerNorm(embed_dim)

    def forward(self, text_embedding, image_embedding):
        q_text = text_embedding.transpose(0, 1)
        k_img = image_embedding.transpose(0, 1)
        text_out, _ = self.text_to_image(q_text, k_img, k_img)
        text_out = self.norm_text(text_embedding + text_out.transpose(0, 1))
        q_img = image_embedding.transpose(0, 1)
        k_text = text_embedding.transpose(0, 1)
        img_out, _ = self.image_to_text(q_img, k_text, k_text)
        img_out = self.norm_image(image_embedding + img_out.transpose(0, 1))
        return text_out, img_out


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = _TorchCrossModalAttention(32, 4).eval()
    params = import_torch_cross_modal(ref.state_dict())
    model = CrossModalAttention(embed_dim=32, num_heads=4)
    return ref, model, {"params": params}


def test_parity_with_torch_multihead_attention(pair):
    ref, model, variables = pair
    rng = np.random.RandomState(0)
    text = rng.randn(3, 7, 32).astype(np.float32)
    image = rng.randn(3, 5, 32).astype(np.float32)
    with torch.no_grad():
        want_t, want_i = ref(torch.tensor(text), torch.tensor(image))
    got_t, got_i = model.apply(variables, jnp.asarray(text), jnp.asarray(image))
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(), atol=5e-5)


def test_key_padding_masks_make_padding_inert(pair):
    _, model, variables = pair
    rng = np.random.RandomState(1)
    text = rng.randn(2, 4, 32).astype(np.float32)
    image = rng.randn(2, 3, 32).astype(np.float32)
    # Pad the image stream with garbage + mask; attended_text must not change.
    image_pad = np.concatenate([image, 50 * rng.randn(2, 2, 32).astype(np.float32)], 1)
    imask = np.concatenate([np.ones((2, 3)), np.zeros((2, 2))], 1)
    got_t_ref, _ = model.apply(variables, jnp.asarray(text), jnp.asarray(image))
    got_t_pad, _ = model.apply(
        variables,
        jnp.asarray(text),
        jnp.asarray(image_pad),
        image_mask=jnp.asarray(imask),
    )
    np.testing.assert_allclose(np.asarray(got_t_pad), np.asarray(got_t_ref), atol=1e-5)


def test_teacher_forward_and_mask_invariance():
    cfg = TeacherConfig(embed_dim=32, num_heads=4, max_patches=6, max_text_tokens=8)
    model = PatchTextAggregation(cfg)
    rng = np.random.RandomState(2)
    text = rng.randn(2, 8, 32).astype(np.float32)
    patch = rng.randn(2, 6, 32).astype(np.float32)
    tmask = np.array([[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8], np.float32)
    pmask = np.array([[1, 1, 0, 0, 0, 0], [1] * 6], np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(text),
        jnp.asarray(patch),
        jnp.asarray(tmask),
        jnp.asarray(pmask),
    )
    out = model.apply(
        variables,
        jnp.asarray(text),
        jnp.asarray(patch),
        jnp.asarray(tmask),
        jnp.asarray(pmask),
    )
    assert out.global_embedding.shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(out.global_embedding),
        0.5 * np.asarray(out.text_global) + 0.5 * np.asarray(out.image_global),
        atol=1e-6,
    )
    # Masked garbage in padding slots must not change the output.
    text2 = text.copy()
    text2[0, 3:] = 99.0
    patch2 = patch.copy()
    patch2[0, 2:] = -99.0
    out2 = model.apply(
        variables,
        jnp.asarray(text2),
        jnp.asarray(patch2),
        jnp.asarray(tmask),
        jnp.asarray(pmask),
    )
    np.testing.assert_allclose(
        np.asarray(out2.global_embedding),
        np.asarray(out.global_embedding),
        atol=1e-5,
    )


def test_import_torch_teacher_prefix_mapping():
    torch.manual_seed(3)
    ref = _TorchCrossModalAttention(32, 4)
    sd = {f"cross_modal_attention.{k}": v for k, v in ref.state_dict().items()}
    sd["text_tokenizer.some_buffer"] = torch.zeros(3)  # must be ignored
    params = import_torch_teacher(sd)
    cfg = TeacherConfig(embed_dim=32, num_heads=4, mask_padding=False)
    model = PatchTextAggregation(cfg)
    rng = np.random.RandomState(4)
    text = rng.randn(1, 4, 32).astype(np.float32)
    patch = rng.randn(1, 3, 32).astype(np.float32)
    out = model.apply({"params": params}, jnp.asarray(text), jnp.asarray(patch))
    # Cross-check fused output against torch ref + aggregation semantics.
    with torch.no_grad():
        at, ai = ref(torch.tensor(text), torch.tensor(patch))
    from tests.test_aggregation import _torch_aggregation

    want = 0.5 * _torch_aggregation(at.numpy()) + 0.5 * _torch_aggregation(ai.numpy())
    np.testing.assert_allclose(np.asarray(out.global_embedding), want, atol=2e-5)


def test_encode_patches_with_context():
    """Context view = frame minus box; a box covering the whole frame makes
    the context view black -> context embedding equals the all-black
    embedding, while the patch embedding matches the plain crop encode."""
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import encode_patches, encode_patches_with_context
    from dclip_tpu.ops.image_ops import normalize

    cfg = CLIPConfig.tiny_test()
    clip = CLIPModule(cfg)
    s = cfg.vision.image_size
    variables = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, s, s, 3)),
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, s, s, 3).astype(np.float32))
    boxes = jnp.asarray([[[0.0, 0.0, float(s), float(s)], [4, 4, 12, 12]]])
    mask = jnp.ones((1, 2))
    pe, ce = encode_patches_with_context(clip, variables, images, boxes, mask, s)
    assert pe.shape == ce.shape == (1, 2, cfg.projection_dim)
    want_pe = encode_patches(clip, variables, images, boxes, mask, s)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(want_pe), atol=1e-6)
    black = clip.apply(
        variables, normalize(jnp.zeros((1, s, s, 3))),
        method=clip.get_image_features,
    )
    np.testing.assert_allclose(np.asarray(ce[0, 0]), np.asarray(black[0]), atol=1e-4)

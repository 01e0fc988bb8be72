"""Numeric parity: Flax CLIPModule vs torch transformers CLIPModel.

Random-weight torch CLIP (tiny config, CPU) -> convert -> compare
get_image_features / get_text_features / logits. This is the test the
reference never had: it pins our encoder numerics to the HF semantics the
whole DCLIP pipeline assumes.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from dclip_tpu.core.config import CLIPConfig  # noqa: E402
from dclip_tpu.models.clip import CLIPModule  # noqa: E402
from dclip_tpu.models.hf_import import convert_state_dict, nchw_to_nhwc  # noqa: E402


@pytest.fixture(scope="module")
def models():
    cfg = CLIPConfig.tiny_test()
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            intermediate_size=cfg.text.mlp_dim,
            max_position_embeddings=cfg.text.max_length,
            eos_token_id=cfg.text.eos_token_id,
            bos_token_id=998,
            pad_token_id=0,
        ),
        vision_config=dict(
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            hidden_size=cfg.vision.hidden_size,
            num_hidden_layers=cfg.vision.num_layers,
            num_attention_heads=cfg.vision.num_heads,
            intermediate_size=cfg.vision.mlp_dim,
        ),
        projection_dim=cfg.projection_dim,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_cfg).eval()
    params = convert_state_dict(hf.state_dict(), cfg)
    flax_model = CLIPModule(cfg)
    return cfg, hf, flax_model, {"params": params}


def _text_batch(cfg, bs=3):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, cfg.text.vocab_size - 2, size=(bs, cfg.text.max_length))
    lengths = [5, 9, cfg.text.max_length - 1]
    mask = np.zeros_like(ids)
    for i, L in enumerate(lengths):
        ids[i, L] = cfg.text.eos_token_id
        ids[i, L + 1 :] = 0
        mask[i, : L + 1] = 1
    return ids.astype(np.int32), mask.astype(np.int32)


def test_text_features_parity(models):
    cfg, hf, fm, variables = models
    ids, mask = _text_batch(cfg)
    with torch.no_grad():
        ref = hf.get_text_features(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).numpy()
    got = fm.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), method=fm.get_text_features
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_image_features_parity(models):
    cfg, hf, fm, variables = models
    rng = np.random.RandomState(1)
    pix = rng.randn(2, 3, cfg.vision.image_size, cfg.vision.image_size).astype(
        np.float32
    )
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.tensor(pix)).numpy()
    got = fm.apply(
        variables, jnp.asarray(nchw_to_nhwc(pix)), method=fm.get_image_features
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_logits_parity(models):
    cfg, hf, fm, variables = models
    ids, mask = _text_batch(cfg)
    rng = np.random.RandomState(2)
    pix = rng.randn(3, 3, cfg.vision.image_size, cfg.vision.image_size).astype(
        np.float32
    )
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pix),
        )
        ref_img = out.logits_per_image.numpy()
    got_img, got_txt = fm.apply(
        variables, jnp.asarray(ids), jnp.asarray(nchw_to_nhwc(pix)), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(got_img), ref_img, atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(got_txt), ref_img.T, atol=3e-5, rtol=3e-5)


def test_token_features_shapes(models):
    cfg, hf, fm, variables = models
    ids, mask = _text_batch(cfg)
    tok, pooled = fm.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), method=fm.get_token_features
    )
    assert tok.shape == (3, cfg.text.max_length, cfg.projection_dim)
    assert pooled.shape == (3, cfg.projection_dim)

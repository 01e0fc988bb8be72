"""HF export: the inverse of hf_import, verified against transformers.

Three layers of proof:
  1. import -> export roundtrip is byte-identical to the original HF
     state dict (every key, every transpose undone exactly);
  2. a from-scratch Flax CLIPModule exported to disk loads with
     `transformers.CLIPModel.from_pretrained` and produces the SAME
     image/text features as the Flax model (the deployment contract);
  3. the cli.export_hf path from a saved TrainState msgpack.
"""
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dclip_tpu.core.config import CLIPConfig  # noqa: E402
from dclip_tpu.models.clip import CLIPModule  # noqa: E402
from dclip_tpu.models.hf_export import export_state_dict, save_pretrained  # noqa: E402
from dclip_tpu.models.hf_import import convert_state_dict, nchw_to_nhwc  # noqa: E402


def _hf_cfg(cfg):
    return transformers.CLIPConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            intermediate_size=cfg.text.mlp_dim,
            max_position_embeddings=cfg.text.max_length,
            eos_token_id=cfg.text.eos_token_id,
            bos_token_id=cfg.text.eos_token_id - 1,
            pad_token_id=cfg.text.eos_token_id,
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


def test_roundtrip_state_dict_identical():
    """HF -> flax -> HF recovers every tensor of every key exactly."""
    cfg = CLIPConfig.tiny_test()
    torch.manual_seed(0)
    hf = transformers.CLIPModel(_hf_cfg(cfg)).eval()
    original = {k: v.numpy() for k, v in hf.state_dict().items()}
    back = export_state_dict(convert_state_dict(hf.state_dict(), cfg))
    assert set(back) == set(original)
    for k in original:
        np.testing.assert_array_equal(back[k], original[k], err_msg=k)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """A random Flax CLIPModule exported to an HF snapshot dir."""
    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    variables = model.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    out = tmp_path_factory.mktemp("hf_export") / "snapshot"
    save_pretrained(variables["params"], cfg, str(out))
    return cfg, model, variables, out


def test_from_pretrained_feature_parity(exported):
    """transformers loads the export and agrees with the Flax forward."""
    cfg, model, variables, out = exported
    hf = transformers.CLIPModel.from_pretrained(str(out)).eval()

    rng = np.random.RandomState(1)
    pixels = rng.rand(2, 3, cfg.vision.image_size, cfg.vision.image_size).astype(
        np.float32
    )
    ids = rng.randint(1, cfg.text.vocab_size - 2, size=(2, cfg.text.max_length))
    mask = np.zeros_like(ids)
    for i, L in enumerate((4, 11)):
        ids[i, L] = cfg.text.eos_token_id
        ids[i, L + 1:] = 0
        mask[i, : L + 1] = 1
    ids = ids.astype(np.int32)

    with torch.no_grad():
        ref_img = hf.get_image_features(pixel_values=torch.tensor(pixels)).numpy()
        ref_txt = hf.get_text_features(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).numpy()
    got_img = model.apply(
        variables, jnp.asarray(nchw_to_nhwc(pixels)), method=model.get_image_features
    )
    got_txt = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask.astype(np.int32)),
        method=model.get_text_features,
    )
    np.testing.assert_allclose(np.asarray(got_img), ref_img, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_txt), ref_txt, atol=2e-5, rtol=2e-5)


def test_export_config_and_preprocessor(exported):
    """config.json pins quick_gelu; preprocessor matches CLIP constants."""
    cfg, _, _, out = exported
    conf = json.loads((out / "config.json").read_text())
    assert conf["model_type"] == "clip"
    assert conf["text_config"]["hidden_act"] == "quick_gelu"
    assert conf["vision_config"]["hidden_act"] == "quick_gelu"
    pp = json.loads((out / "preprocessor_config.json").read_text())
    assert pp["crop_size"]["height"] == cfg.vision.image_size
    np.testing.assert_allclose(pp["image_mean"], [0.48145466, 0.4578275, 0.40821073])


def test_cli_export_from_checkpoint(tmp_path):
    """cli.export_hf: TrainState msgpack -> loadable HF snapshot whose
    weights are the checkpoint's params (not the template zeros)."""
    import flax.serialization

    from dclip_tpu.cli.export_hf import main, template_params

    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    variables = model.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    params = jax.device_get(variables["params"])
    state_like = {"params": params, "step": 7}
    ckpt = tmp_path / "student.msgpack"
    ckpt.write_bytes(
        flax.serialization.msgpack_serialize(
            flax.serialization.to_state_dict(state_like)
        )
    )
    out = tmp_path / "snapshot"
    assert main(["--model_preset", "tiny", "--checkpoint", str(ckpt),
                 "--out", str(out)]) == 0
    hf = transformers.CLIPModel.from_pretrained(str(out)).eval()
    got = hf.state_dict()["text_projection.weight"].numpy()
    np.testing.assert_array_equal(got, np.asarray(params["text_projection"]["kernel"]).T)
    # Template structure matches the real init tree.
    tp = template_params(cfg)
    assert jax.tree_util.tree_structure(tp) == jax.tree_util.tree_structure(params)

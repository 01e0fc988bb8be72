"""Projection MLP parity vs the reference torch architectures
(text_projection_module.py:4-31, image_projection_module.py:5-36)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.models.projections import ImageProjectionModule, TextProjectionModule

torch = pytest.importorskip("torch")


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].numpy().T, "bias": sd[f"{key}.bias"].numpy()}


def test_text_projection_parity():
    torch.manual_seed(0)
    ref = torch.nn.Sequential(
        torch.nn.Linear(768, 1024), torch.nn.ReLU(), torch.nn.Linear(1024, 512)
    ).eval()
    sd = ref.state_dict()
    params = {"fc1": _dense(sd, "0"), "fc2": _dense(sd, "2")}
    x = np.random.RandomState(0).randn(3, 768).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = TextProjectionModule().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_image_projection_parity():
    torch.manual_seed(1)
    ref = torch.nn.Sequential(
        torch.nn.Linear(512 + 4, 1024),
        torch.nn.ReLU(),
        torch.nn.Linear(1024, 1024),
        torch.nn.ReLU(),
        torch.nn.Linear(1024, 512),
    ).eval()
    sd = ref.state_dict()
    params = {"fc1": _dense(sd, "0"), "fc2": _dense(sd, "2"), "fc3": _dense(sd, "4")}
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 512).astype(np.float32)
    pos = rng.rand(2, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(np.concatenate([feats, pos], 1))).numpy()
    got = ImageProjectionModule().apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(pos)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_image_projection_batched_over_patches():
    model = ImageProjectionModule(clip_dim=16, hidden_dim=32)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(4, 5, 16).astype(np.float32))
    pos = jnp.asarray(rng.rand(4, 5, 4).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats, pos)
    out = model.apply(variables, feats, pos)
    assert out.shape == (4, 5, 16)

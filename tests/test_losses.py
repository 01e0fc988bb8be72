"""Loss ops vs independent numpy/torch references.

Pins the reference numerics: symmetric InfoNCE temp=0.05
(CLIP_image_distillation.py:532-562), cosine distillation (:564-576),
combined objective (:628).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.ops import (
    cosine_distillation,
    distillation_loss,
    distillation_loss_global,
    info_nce,
    info_nce_global,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _torch_info_nce(img, txt, temperature=0.05):
    img = F.normalize(torch.tensor(img), dim=1)
    txt = F.normalize(torch.tensor(txt), dim=1)
    logits = img @ txt.T / temperature
    labels = torch.arange(img.shape[0])
    return ((F.cross_entropy(logits, labels) + F.cross_entropy(logits.T, labels)) / 2).item()


def _torch_cos_distill(s, t):
    s = F.normalize(torch.tensor(s), dim=1)
    t = F.normalize(torch.tensor(t), dim=1)
    return torch.mean(1.0 - torch.sum(s * t, dim=1)).item()


@pytest.fixture
def embs():
    rng = np.random.RandomState(0)
    return {
        k: rng.randn(16, 32).astype(np.float32)
        for k in ("si", "st", "ti", "tt")
    }


def test_info_nce_matches_torch(embs):
    got = info_nce(jnp.asarray(embs["si"]), jnp.asarray(embs["st"]))
    assert np.isclose(float(got), _torch_info_nce(embs["si"], embs["st"]), atol=1e-5)


def test_info_nce_other_temperature(embs):
    got = info_nce(jnp.asarray(embs["si"]), jnp.asarray(embs["st"]), temperature=0.5)
    ref = _torch_info_nce(embs["si"], embs["st"], temperature=0.5)
    assert np.isclose(float(got), ref, atol=1e-5)


def test_cosine_distillation_matches_torch(embs):
    got = cosine_distillation(jnp.asarray(embs["si"]), jnp.asarray(embs["ti"]))
    assert np.isclose(float(got), _torch_cos_distill(embs["si"], embs["ti"]), atol=1e-6)


def test_distillation_loss_composition(embs):
    total, parts = distillation_loss(
        *(jnp.asarray(embs[k]) for k in ("si", "st", "ti", "tt")),
        contrastive_weight=0.7,
    )
    ref = (
        _torch_cos_distill(embs["si"], embs["ti"])
        + _torch_cos_distill(embs["st"], embs["tt"])
        + 0.7 * _torch_info_nce(embs["si"], embs["st"])
    )
    assert np.isclose(float(total), ref, atol=1e-5)
    assert set(parts) == {
        "image_distill_loss",
        "text_distill_loss",
        "contrastive_loss",
        "loss",
    }


def test_global_losses_match_single_device(embs, cpu_devices):
    """Sharded global-batch loss == single-device loss on the full batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(cpu_devices), ("data",))

    def body(si, st, ti, tt):
        total, parts = distillation_loss_global(si, st, ti, tt, axis="data")
        return total, parts["contrastive_loss"]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    total, con = f(*(jnp.asarray(embs[k]) for k in ("si", "st", "ti", "tt")))
    ref_total, ref_parts = distillation_loss(
        *(jnp.asarray(embs[k]) for k in ("si", "st", "ti", "tt"))
    )
    assert np.isclose(float(total), float(ref_total), atol=1e-5)
    assert np.isclose(float(con), float(ref_parts["contrastive_loss"]), atol=1e-5)


def test_global_info_nce_gradients_flow(embs, cpu_devices):
    """grad through all_gather: sharded grads == single-device grads."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(cpu_devices), ("data",))
    f = shard_map(
        lambda a, b: info_nce_global(a, b, axis="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    g_sharded = jax.grad(lambda a, b: f(a, b))(
        jnp.asarray(embs["si"]), jnp.asarray(embs["st"])
    )
    g_ref = jax.grad(lambda a, b: info_nce(a, b))(
        jnp.asarray(embs["si"]), jnp.asarray(embs["st"])
    )
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), atol=1e-5)

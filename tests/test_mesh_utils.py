"""Mesh/sharding helpers + metrics logger."""
import numpy as np

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import MeshConfig
from dclip_tpu.core.metrics import MetricsLogger, trace_span
from dclip_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to,
    replicate_tree,
    shard_batch,
)


def test_make_mesh_shapes(cpu_devices):
    m = make_mesh(MeshConfig(), devices=cpu_devices)
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = make_mesh(MeshConfig(data_parallel=2, model_parallel=4), devices=cpu_devices)
    assert dict(m2.shape) == {"data": 2, "model": 4}


def test_shard_batch_and_replicate(cpu_devices):
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "y": np.ones((8,), np.int32)}
    dev = shard_batch(batch, mesh)
    assert set(dev) == {"x", "y"}
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])
    sh = batch_sharding(mesh)
    assert dev["x"].sharding == sh
    tree = replicate_tree({"w": jnp.ones((4, 4))}, mesh)
    np.testing.assert_array_equal(np.asarray(tree["w"]), 1.0)


def test_pad_batch_to():
    batch = {"a": np.arange(10).reshape(5, 2), "b": np.arange(5)}
    padded, n = pad_batch_to(batch, 8)
    assert n == 5
    assert padded["a"].shape == (8, 2) and padded["b"].shape == (8,)
    np.testing.assert_array_equal(padded["a"][5:], np.tile(batch["a"][:1], (3, 1)))
    same, n2 = pad_batch_to(batch, 5)
    assert n2 == 5 and same["a"].shape == (5, 2)


def test_metrics_logger_csv_and_print(tmp_path, capsys):
    csv_path = str(tmp_path / "m.csv")
    logger = MetricsLogger(csv_path, print_every=10)
    logger.log(3, {"train_loss": 1.25})
    logger.log(15, {"train_loss": 0.75})
    logger.close()
    out = capsys.readouterr().out
    # log() prints every call (callers gate cadence).
    assert "step 3: train_loss=1.2500" in out
    assert "step 15: train_loss=0.7500" in out
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0].startswith("step,time,train_loss")
    assert len(rows) == 3


def test_trace_span_noop():
    with trace_span("unit-test-span"):
        x = jnp.ones(3) * 2
    assert float(x.sum()) == 6.0


def test_sharded_image_encoder_matches_single_device(cpu_devices):
    from dclip_tpu.core.config import CLIPConfig
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.encoding import make_image_encoder

    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    s = cfg.vision.image_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, s, s, 3)),
    )
    rng = np.random.RandomState(0)
    pixels = [rng.randn(s, s, 3).astype(np.float32) for _ in range(11)]
    single = make_image_encoder(model, variables, batch_size=8)(pixels)
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    sharded = make_image_encoder(model, variables, batch_size=8, mesh=mesh)(pixels)
    np.testing.assert_allclose(sharded, single, atol=2e-5)

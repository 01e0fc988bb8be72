"""Optimizer masking, schedules, accumulation, checkpoint manager."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.train import (
    CheckpointManager,
    TrainState,
    count_trainable,
    linear_warmup_schedule,
    make_optimizer,
    pattern_mask,
    student_trainable_mask,
)


def _params():
    return {
        "vision_model": {
            "encoder": {
                "layers_0": {
                    "self_attn": {"q_proj": {"kernel": jnp.ones((2, 2))}},
                    "mlp": {"fc1": {"kernel": jnp.ones((2, 2))}},
                }
            },
            "patch_embedding": {"kernel": jnp.ones((2, 2))},
        },
        "text_model": {"token_embedding": {"embedding": jnp.ones((4, 2))}},
        "visual_projection": {"kernel": jnp.ones((2, 2))},
        "logit_scale": jnp.asarray(1.0),
    }


def test_pattern_mask_substring_semantics():
    mask = pattern_mask(_params(), ["proj", "logit"])
    assert mask["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert not mask["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]
    assert mask["visual_projection"]["kernel"]
    assert mask["logit_scale"]
    n, total = count_trainable(mask)
    assert (n, total) == (3, 6)


def test_student_trainable_mask_reference_semantics():
    """Reference :504-506: vision params need 'proj' in name; the rest of
    the model (text, projections, logit_scale) is never frozen."""
    mask = student_trainable_mask(_params())
    assert mask["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert not mask["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]
    assert not mask["vision_model"]["patch_embedding"]["kernel"]
    assert mask["text_model"]["token_embedding"]["embedding"]
    assert mask["visual_projection"]["kernel"]
    assert mask["logit_scale"]


def test_masked_optimizer_freezes_leaves():
    params = _params()
    mask = student_trainable_mask(params)
    tx = make_optimizer(0.1, mask, kind="adam")
    state = TrainState.create(params, tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new = state.apply_gradients(grads, tx)
    # Frozen leaf unchanged; trainable leaf moved.
    np.testing.assert_array_equal(
        np.asarray(new.params["vision_model"]["patch_embedding"]["kernel"]), 1.0
    )
    assert not np.allclose(
        np.asarray(
            new.params["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        ),
        1.0,
    )
    assert int(new.step) == 1


def test_gradient_accumulation_semantics():
    params = {"w": jnp.zeros(())}
    mask = {"w": True}
    tx = make_optimizer(0.1, mask, kind="adam", accumulate_steps=3)
    state = TrainState.create(params, tx)
    for i in range(3):
        before = float(state.params["w"])
        state = state.apply_gradients({"w": jnp.asarray(1.0)}, tx)
        if i < 2:
            assert float(state.params["w"]) == before  # accumulating
    assert float(state.params["w"]) != 0.0  # applied at step 3


def test_linear_warmup_schedule():
    sched = linear_warmup_schedule(1.0, 4)
    vals = [float(sched(i)) for i in range(6)]
    np.testing.assert_allclose(vals, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])


def test_checkpoint_manager_roundtrip_topk_best(tmp_path):
    params = {"w": jnp.arange(4.0)}
    tx = make_optimizer(0.1, {"w": True}, kind="adam")
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path), prefix="teacher", save_top_k=2)
    losses = [0.5, 0.2, 0.9, 0.1]
    for epoch, vl in enumerate(losses):
        state = state.apply_gradients({"w": jnp.ones(4)}, tx)
        mgr.save(state, step=int(state.step), epoch=epoch, metrics={"val_loss": vl})
    best = mgr.best()
    assert best["metrics"]["val_loss"] == 0.1
    latest = mgr.latest()
    assert latest["step"] == 4
    # top-2 retention (+ latest is also in the top-2 here): 0.1 and 0.2 kept.
    import os

    kept = [e for e in mgr._index if os.path.exists(e["path"])]
    kept_losses = sorted(e["metrics"]["val_loss"] for e in kept)
    assert kept_losses == [0.1, 0.2]
    # Restore with a fresh manager (index reload) and template.
    mgr2 = CheckpointManager(str(tmp_path), prefix="teacher", save_top_k=2)
    template = jax.device_get(TrainState.create(params, tx))
    restored, step = mgr2.restore_latest_or_none(template)
    assert step == 4
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )


def test_checkpoint_interrupt_tag_never_pruned(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_top_k=1)
    state = {"w": jnp.zeros(2)}
    mgr.save_interrupt(state, step=3, kind="error")
    for e in range(3):
        mgr.save(state, step=e, epoch=e, metrics={"val_loss": float(e)})
    import os

    tagged = [e for e in mgr._index if e.get("tag") == "error"]
    assert len(tagged) == 1 and os.path.exists(tagged[0]["path"])


def test_checkpoint_async_writes(tmp_path):
    mgr = CheckpointManager(str(tmp_path), save_top_k=0, async_writes=True)
    state = {"w": jnp.arange(6.0)}
    for e in range(3):
        mgr.save(state, step=e, epoch=e, metrics={"val_loss": 1.0 - e * 0.1})
    mgr.wait()
    mgr2 = CheckpointManager(str(tmp_path))
    restored, step = mgr2.restore_latest_or_none({"w": jnp.zeros(6)})
    assert step == 2
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(6.0))


def test_checkpoint_metricless_entries_pruned_by_recency(tmp_path):
    """A caller that never passes the monitored metric must not accumulate
    unbounded checkpoints: metric-less regular entries retain top-k by
    recency (latest always protected)."""
    import os

    mgr = CheckpointManager(str(tmp_path), save_top_k=2)
    state = {"w": jnp.zeros(2)}
    for step in range(6):
        mgr.save(state, step=step)  # no metrics at all
    kept = [e for e in mgr._index if os.path.exists(e["path"])]
    assert len(kept) == 2
    assert sorted(e["step"] for e in kept) == [4, 5]  # most recent two


def test_teacher_fingerprint_full_digest(cpu_devices):
    """The teacher-cache fingerprint hashes ALL weight bytes: a change deep
    inside a leaf (beyond the first 128 bytes) must change the salt."""
    from dclip_tpu.core.config import (
        CLIPConfig,
        DistillConfig,
        MeshConfig,
        TeacherConfig,
    )
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train import DistillTrainer

    clip_cfg = CLIPConfig.tiny_test()
    tcfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim, num_heads=4,
        max_patches=3, max_text_tokens=clip_cfg.text.max_length,
    )
    clip = CLIPModule(clip_cfg)
    variables = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, clip_cfg.text.max_length), jnp.int32),
        jnp.zeros((1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3)),
    )
    teacher = PatchTextAggregation(tcfg)
    d = clip_cfg.projection_dim
    tparams = teacher.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, d)), jnp.zeros((1, 3, d))
    )["params"]
    cfg = DistillConfig(
        train_batch_size=2, teacher=tcfg, student_model="tiny",
        teacher_clip_model="tiny", mesh=MeshConfig(data_parallel=1),
    )
    mesh = make_mesh(cfg.mesh, devices=cpu_devices[:1])
    trainer = DistillTrainer(
        cfg, variables, variables, tparams, clip_cfg, clip_cfg, mesh=mesh
    )
    fp1 = trainer._teacher_fingerprint()
    # Flip one element at the END of the largest teacher leaf: the old
    # leading-128-bytes scheme would not see this.
    flat = jax.device_get(trainer.teacher_params)
    leaves, treedef = jax.tree_util.tree_flatten(flat)
    big = max(range(len(leaves)), key=lambda i: np.asarray(leaves[i]).size)
    arr = np.array(leaves[big])
    arr.reshape(-1)[-1] += 1.0
    leaves[big] = jnp.asarray(arr)
    trainer.teacher_params = jax.tree_util.tree_unflatten(treedef, leaves)
    fp2 = trainer._teacher_fingerprint()
    assert fp1 != fp2


def test_checkpoint_duplicate_filename_replaces_entry(tmp_path):
    """A deterministic rerun reproducing an existing checkpoint filename
    replaces the old index entry — two entries sharing one path would let
    retention unlink the file the survivor still points to."""
    import os

    mgr = CheckpointManager(str(tmp_path), save_top_k=2)
    state = {"w": jnp.zeros(2)}
    for _ in range(2):  # identical (epoch, metric, step) -> same filename
        mgr.save(state, step=5, epoch=1, metrics={"val_loss": 0.5})
    paths = [e["path"] for e in mgr._index if not e.get("tag")]
    assert len(paths) == len(set(paths)) == 1
    # Fill top-k and force retention several times; the file must survive.
    for s in (6, 7, 8):
        mgr.save(state, step=s, epoch=s, metrics={"val_loss": 0.1 * s})
    for e in mgr._index:
        assert os.path.exists(e["path"]), e["path"]


def test_make_train_step_trainable_mask_matches_full_backward():
    """`trainable_mask` must be a pure compute optimization: the training
    trajectory (params, opt state, metrics) is bit-identical to the full
    value_and_grad step, and the masked backward really produces zero
    grads for frozen leaves."""
    from dclip_tpu.train import make_train_step

    params = _params()
    mask = student_trainable_mask(params)

    def loss_fn(p, x):
        h = x @ p["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        h = h @ p["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]
        h = h @ p["vision_model"]["patch_embedding"]["kernel"]
        h = h @ p["visual_projection"]["kernel"]
        emb = p["text_model"]["token_embedding"]["embedding"]
        loss = jnp.sum(h * p["logit_scale"]) + jnp.sum(emb**2)
        return loss, {"loss": loss}

    tx = make_optimizer(1e-2, mask, kind="adamw", grad_clip=0.5)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 2), jnp.float32)

    full = make_train_step(loss_fn, tx, donate=False)
    masked = make_train_step(loss_fn, tx, donate=False, trainable_mask=mask)
    s_full = TrainState.create(params, tx)
    s_masked = TrainState.create(params, tx)
    for _ in range(3):
        s_full, m_full = full(s_full, x)
        s_masked, m_masked = masked(s_masked, x)
        np.testing.assert_array_equal(
            np.asarray(m_full["loss"]), np.asarray(m_masked["loss"])
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_masked.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Frozen leaves really get zero cotangents in the masked backward.
    def masked_loss(p):
        merged = jax.tree_util.tree_map(
            lambda m, t, f: t if m else f, mask, p, params
        )
        return loss_fn(merged, x)[0]

    grads = jax.grad(masked_loss)(params)
    assert not np.any(
        np.asarray(grads["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"])
    )
    assert not np.any(np.asarray(grads["vision_model"]["patch_embedding"]["kernel"]))
    assert np.any(
        np.asarray(
            grads["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        )
    )

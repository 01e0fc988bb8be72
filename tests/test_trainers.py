"""Teacher + distillation trainers end-to-end on tiny synthetic data,
on an 8-device CPU mesh (the multi-chip path the reference never had)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import (
    CLIPConfig,
    DistillConfig,
    MeshConfig,
    TeacherConfig,
    TeacherTrainConfig,
    UnfreezeStage,
)
from dclip_tpu.data.pipeline import Batch
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.teacher import PatchTextAggregation
from dclip_tpu.parallel.mesh import make_mesh
from dclip_tpu.train import CheckpointManager, DistillTrainer, TeacherTrainer

B, P, T = 8, 3, 16
IMG = 32


def _tiny_teacher_cfg(clip_cfg):
    return TeacherConfig(
        embed_dim=clip_cfg.projection_dim,
        num_heads=4,
        max_patches=P,
        max_text_tokens=T,
    )


class FakePipeline:
    """Deterministic in-memory pipeline of `n_batches` fixed batches."""

    def __init__(self, clip_cfg, n_batches=2, seed=0):
        rng = np.random.RandomState(seed)
        self.batches = []
        for bi in range(n_batches):
            ids = rng.randint(1, 900, size=(B, T)).astype(np.int32)
            ids[:, 5] = clip_cfg.text.eos_token_id
            ids[:, 6:] = 0
            mask = np.zeros((B, T), np.int32)
            mask[:, :6] = 1
            boxes = rng.rand(B, P, 4).astype(np.float32) * 10
            boxes[..., 2:] += boxes[..., :2] + 4
            self.batches.append(
                Batch(
                    pixel_values=rng.randn(B, IMG, IMG, 3).astype(np.float32) * 0.1,
                    input_ids=ids,
                    attention_mask=mask,
                    teacher_pixels=rng.rand(B, IMG, IMG, 3).astype(np.float32),
                    boxes=boxes,
                    conf=rng.rand(B, P).astype(np.float32),
                    box_mask=(rng.rand(B, P) > 0.2).astype(np.float32),
                    # Unique per ITEM like real corpus indices (duplicate
                    # ids across batches would alias cache rows).
                    index=np.arange(bi * B, (bi + 1) * B, dtype=np.int64),
                )
            )

    def epoch(self, epoch):
        return iter(self.batches)


@pytest.fixture(scope="module")
def clip_setup():
    cfg = CLIPConfig.tiny_test()
    clip = CLIPModule(cfg)
    variables = clip.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    return cfg, variables


@pytest.fixture(scope="module")
def cpu_mesh(cpu_devices):
    return make_mesh(MeshConfig(), devices=cpu_devices)  # 8x1


def test_teacher_trainer_loss_decreases(clip_setup, cpu_mesh, tmp_path):
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=2,
        batch_size=B,
        learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg),
        clip_model="tiny",
    )
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    pipe = FakePipeline(clip_cfg, n_batches=3)
    ckpts = CheckpointManager(str(tmp_path / "ck"), prefix="contrastive_teacher")
    first = trainer.validate(pipe.epoch(0))
    history = trainer.fit(pipe, pipe, checkpoints=ckpts)
    assert len(history["train_loss"]) == 2
    assert history["val_loss"][-1] < first  # learning happened
    assert ckpts.best() is not None
    # Per-epoch checkpoint filename carries the val loss (reference :393-402).
    assert "val" in ckpts.best()["path"]


def test_teacher_trainer_only_attention_params_move(clip_setup, cpu_mesh):
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny"
    )
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    before = jax.device_get(trainer.state.params)
    trainer.train_epoch(FakePipeline(clip_cfg, 1).epoch(0))
    after = jax.device_get(trainer.state.params)
    # All teacher params live under cross_modal_attention and all train
    # (the reference's pattern list matches them via 'attention').
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), before, after
    )
    assert all(d > 0 for d in jax.tree_util.tree_leaves(diffs))


def test_teacher_resume_roundtrip(clip_setup, cpu_mesh, tmp_path):
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny"
    )
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    pipe = FakePipeline(clip_cfg, 2)
    ckpts = CheckpointManager(str(tmp_path))
    trainer.fit(pipe, checkpoints=ckpts)
    saved_params = jax.device_get(trainer.state.params)
    trainer2 = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    start = trainer2.resume(ckpts)
    assert start == 1
    restored = jax.device_get(trainer2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b), saved_params, restored
    )


@pytest.fixture(scope="module")
def distill_setup(clip_setup, cpu_mesh):
    clip_cfg, clip_vars = clip_setup
    tcfg = _tiny_teacher_cfg(clip_cfg)
    teacher = PatchTextAggregation(tcfg)
    d = clip_cfg.projection_dim
    tparams = teacher.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, T, d)),
        jnp.zeros((1, P, d)),
    )["params"]
    cfg = DistillConfig(
        phase1_epochs=1,
        train_batch_size=B,
        learning_rate=1e-3,
        warmup_steps=2,
        accumulate_grad_batches=1,
        teacher=tcfg,
        student_model="tiny",
        teacher_clip_model="tiny",
    )
    return clip_cfg, clip_vars, tparams, cfg


def test_distill_trainer_step_and_mask(distill_setup, cpu_mesh):
    clip_cfg, clip_vars, tparams, cfg = distill_setup
    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    before = jax.device_get(trainer.state.params)
    pipe = FakePipeline(clip_cfg, 2)
    history = trainer.fit(pipe, pipe)
    assert len(history["train_loss"]) == 1
    after = jax.device_get(trainer.state.params)
    # Frozen by the reference rule: vision patch_embedding (no 'proj').
    np.testing.assert_array_equal(
        before["vision_model"]["patch_embedding"]["kernel"],
        after["vision_model"]["patch_embedding"]["kernel"],
    )
    # Trainable: vision self_attn q_proj, text encoder, visual_projection.
    assert not np.allclose(
        before["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
        after["vision_model"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
    )
    assert not np.allclose(
        before["visual_projection"]["kernel"], after["visual_projection"]["kernel"]
    )
    assert not np.allclose(
        before["text_model"]["token_embedding"]["embedding"],
        after["text_model"]["token_embedding"]["embedding"],
    )


def test_distill_dimension_validation(distill_setup, cpu_mesh):
    clip_cfg, clip_vars, tparams, cfg = distill_setup
    import dataclasses

    bad = dataclasses.replace(cfg, teacher=dataclasses.replace(cfg.teacher, embed_dim=8))
    with pytest.raises(ValueError, match="matching widths"):
        DistillTrainer(bad, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh)


def test_distill_unfreeze_schedule(distill_setup, cpu_mesh):
    clip_cfg, clip_vars, tparams, cfg = distill_setup
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg,
        phase1_epochs=2,
        unfreeze_schedule=(UnfreezeStage(epoch=1, patterns=("mlp",)),),
    )
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    pipe = FakePipeline(clip_cfg, 1)
    before = jax.device_get(trainer.state.params)
    trainer._maybe_unfreeze(0)
    trainer.train_epoch(pipe.epoch(0))
    mid = jax.device_get(trainer.state.params)
    np.testing.assert_array_equal(
        before["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
        mid["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
    )
    trainer._maybe_unfreeze(1)
    trainer.train_epoch(pipe.epoch(1))
    after = jax.device_get(trainer.state.params)
    assert not np.allclose(
        mid["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
        after["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
    )


def test_unfreeze_text_at_epoch(distill_setup, cpu_mesh):
    """With the knob set, text_model params stay fixed before the epoch
    and train after it; without it, text trains from epoch 0 (the
    reference's effective behavior)."""
    clip_cfg, clip_vars, tparams, cfg = distill_setup
    import dataclasses

    def text_kernel(params):
        return params["text_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"]

    cfg2 = dataclasses.replace(cfg, phase1_epochs=2, unfreeze_text_at_epoch=1)
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    pipe = FakePipeline(clip_cfg, 1)
    before = jax.device_get(trainer.state.params)
    trainer._maybe_unfreeze(0)
    trainer.train_epoch(pipe.epoch(0))
    mid = jax.device_get(trainer.state.params)
    np.testing.assert_array_equal(text_kernel(before), text_kernel(mid))
    trainer._maybe_unfreeze(1)
    trainer.train_epoch(pipe.epoch(1))
    after = jax.device_get(trainer.state.params)
    assert not np.allclose(text_kernel(mid), text_kernel(after))

    # Default (knob unset): text trains immediately.
    trainer0 = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    b0 = jax.device_get(trainer0.state.params)
    trainer0.train_epoch(pipe.epoch(0))
    a0 = jax.device_get(trainer0.state.params)
    assert not np.allclose(text_kernel(b0), text_kernel(a0))


def test_teacher_target_cache_hits_and_matches(distill_setup, cpu_mesh):
    """Second epoch uses cached teacher targets; results identical."""
    import jax as _jax
    import numpy as _np

    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    cache = TeacherTargetCache()
    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=cpu_mesh, teacher_cache=cache,
    )
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]
    dev = trainer._device_batch(batch)
    t_img1, t_txt1 = trainer._get_teacher_targets(batch, dev)  # miss: computes
    assert len(cache._mem) == 2 * B  # B full targets + B patch embeds
    t_img2, t_txt2 = trainer._get_teacher_targets(batch, dev)  # hit: cached
    _np.testing.assert_allclose(
        _np.asarray(t_img1), _np.asarray(t_img2), atol=1e-6
    )
    _np.testing.assert_allclose(
        _np.asarray(t_txt1), _np.asarray(t_txt2), atol=1e-6
    )
    # Different caption ids -> different key -> miss.
    batch2 = FakePipeline(clip_cfg, 1, seed=9).batches[0]
    keys1 = cache.keys_for(batch.as_dict())
    keys2 = cache.keys_for(batch2.as_dict())
    assert set(keys1).isdisjoint(keys2)
    del _jax


def test_cache_keys_cover_detections(distill_setup):
    """Re-running precache with a different detector changes the boxes —
    both key levels must miss (never serve stale teacher targets)."""
    import dataclasses

    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, _, _, _ = distill_setup
    cache = TeacherTargetCache(salt="s")
    batch = FakePipeline(clip_cfg, 1).batches[0]
    d1 = batch.as_dict()
    # Same items + captions, different detections.
    d2 = dataclasses.replace(batch, boxes=batch.boxes + 1.0).as_dict()
    d3 = dataclasses.replace(
        batch, box_mask=1.0 - batch.box_mask
    ).as_dict()
    assert set(cache.keys_for(d1)).isdisjoint(cache.keys_for(d2))
    assert set(cache.keys_for(d1)).isdisjoint(cache.keys_for(d3))
    assert set(cache.pe_keys_for(d1)).isdisjoint(cache.pe_keys_for(d2))
    assert set(cache.pe_keys_for(d1)).isdisjoint(cache.pe_keys_for(d3))
    # Identical detections -> identical keys (cache still hits).
    assert cache.keys_for(d1) == cache.keys_for(dict(d1))
    assert cache.pe_keys_for(d1) == cache.pe_keys_for(dict(d1))


def test_distill_use_pallas_matches_xla(distill_setup, cpu_mesh):
    """use_pallas path (interpret mode on CPU) == XLA path numerics."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]
    results = {}
    for use_pallas in (False, True):
        cfg2 = dataclasses.replace(cfg, use_pallas=use_pallas)
        tr = DistillTrainer(
            cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
        )
        dev = tr._device_batch(batch)
        t_img, t_txt = tr._get_teacher_targets(batch, dev)
        loss, _ = tr._eval_loss(
            tr.state.params, tr.teacher_clip_variables, tr.teacher_params, dev
        )
        results[use_pallas] = (np.asarray(t_img), float(loss))
    np.testing.assert_allclose(results[True][0], results[False][0], atol=1e-4)
    assert np.isclose(results[True][1], results[False][1], atol=1e-4)


def test_teacher_trainer_use_pallas_matches_xla(clip_setup, cpu_mesh):
    clip_cfg, clip_vars = clip_setup
    pipe = FakePipeline(clip_cfg, 1)
    losses = {}
    for use_pallas in (False, True):
        cfg = TeacherTrainConfig(
            epochs=1, teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
            use_pallas=use_pallas, learning_rate=1e-3,
        )
        tr = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
        losses[use_pallas] = (
            tr.validate(pipe.epoch(0)),
            tr.train_epoch(pipe.epoch(0)),
        )
    np.testing.assert_allclose(losses[True][0], losses[False][0], atol=1e-4)
    np.testing.assert_allclose(losses[True][1], losses[False][1], atol=1e-4)


def test_patch_embed_cache_survives_caption_change(distill_setup, cpu_mesh):
    """New caption -> full-target miss but patch-level hit; targets match a
    cold computation exactly."""
    import dataclasses

    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    cache = TeacherTargetCache()
    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=cpu_mesh, teacher_cache=cache,
    )
    batch1 = FakePipeline(clip_cfg, 1, seed=0).batches[0]
    trainer._get_teacher_targets(batch1, trainer._device_batch(batch1))
    n_after_first = len(cache._mem)
    assert n_after_first == 2 * B  # B full targets + B patch embeds

    # Same images (same index), different captions.
    batch2 = dataclasses.replace(
        batch1,
        input_ids=np.roll(batch1.input_ids, 1, axis=0),
        attention_mask=np.roll(batch1.attention_mask, 1, axis=0),
    )
    t_img, t_txt = trainer._get_teacher_targets(batch2, trainer._device_batch(batch2))
    # Cold trainer (no cache) must agree.
    trainer2 = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    w_img, w_txt = trainer2._get_teacher_targets(batch2, trainer2._device_batch(batch2))
    np.testing.assert_allclose(np.asarray(t_img), np.asarray(w_img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_txt), np.asarray(w_txt), atol=1e-5)


def test_distill_resume_after_unfreeze(distill_setup, cpu_mesh, tmp_path):
    """Resume must replay the unfreeze schedule so the opt_state template
    matches a checkpoint saved after a stage boundary."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    cfg2 = dataclasses.replace(
        cfg,
        phase1_epochs=2,
        unfreeze_schedule=(UnfreezeStage(epoch=1, patterns=("mlp",)),),
    )
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    pipe = FakePipeline(clip_cfg, 1)
    ckpts = CheckpointManager(str(tmp_path), monitor="train_loss")
    trainer.fit(pipe, checkpoints=ckpts)  # saves epoch 0 AND epoch 1 (post-unfreeze)
    saved = jax.device_get(trainer.state.params)

    trainer2 = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    start = trainer2.resume(ckpts)
    assert start == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        saved, jax.device_get(trainer2.state.params),
    )


def test_compact_patch_encode_matches_dense(distill_setup, cpu_mesh):
    """Crop compaction is bitwise-equal to dense encode when masked."""
    import dataclasses

    from dclip_tpu.models.teacher import patch_budget

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    cfg2 = dataclasses.replace(cfg, compact_patches=True)
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    batch = FakePipeline(clip_cfg, 1, seed=3).batches[0]
    # Force a sparse mask so a sub-full bucket is selected.
    sparse = batch.box_mask.copy()
    sparse[:, 1:] = 0.0
    import dataclasses as dc

    batch = dc.replace(batch, box_mask=sparse)
    dev = trainer._device_batch(batch)
    pe_compact = trainer._encode_patches_budgeted(batch, dev)
    pe_dense = jax.jit(trainer._encode_patches_only)(
        trainer.teacher_clip_variables, dev
    )
    assert patch_budget(int(sparse.sum()), sparse.size) < sparse.size
    np.testing.assert_allclose(
        np.asarray(pe_compact), np.asarray(pe_dense), atol=1e-5
    )
    # Full mask routes through the dense path (same jit), still equal.
    full = FakePipeline(clip_cfg, 1, seed=3).batches[0]
    full = dc.replace(full, box_mask=np.ones_like(full.box_mask))
    devf = trainer._device_batch(full)
    np.testing.assert_allclose(
        np.asarray(trainer._encode_patches_budgeted(full, devf)),
        np.asarray(
            jax.jit(trainer._encode_patches_only)(
                trainer.teacher_clip_variables, devf
            )
        ),
        atol=1e-6,
    )


def test_teacher_trainer_knn_store_gate(clip_setup, cpu_mesh):
    """With a store seeded by near-duplicates of the raw patch embeddings
    and threshold 0, the gate swaps in stored VALUES; the loss changes vs
    the ungated trainer but training still runs."""
    from dclip_tpu.data.embedding_store import EmbeddingStore

    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny"
    )
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]

    plain = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    pe_plain = plain._patch_embeddings(batch, plain._device_batch(batch))

    store = EmbeddingStore(dim=clip_cfg.projection_dim)
    rng = np.random.RandomState(7)
    values = rng.randn(10, clip_cfg.projection_dim).astype(np.float32)
    store.add_batch(
        [f"s{i}" for i in range(10)],
        rng.randn(10, clip_cfg.projection_dim).astype(np.float32),
        values=values,
    )
    gated = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh, knn_store=store)
    # Threshold default 0.85: random queries vs random store rarely hit;
    # force hits with threshold -1 via config.
    import dataclasses

    cfg_hit = dataclasses.replace(
        cfg, teacher=dataclasses.replace(cfg.teacher, similarity_threshold=-1.0)
    )
    gated_hit = TeacherTrainer(
        cfg_hit, clip_vars, clip_cfg, mesh=cpu_mesh, knn_store=store
    )
    pe_hit = gated_hit._patch_embeddings(batch, gated_hit._device_batch(batch))
    # Every valid slot replaced by a stored value row.
    mask = batch.box_mask > 0
    got = np.asarray(pe_hit)[mask]
    dists = np.linalg.norm(got[:, None, :] - values[None], axis=-1)
    assert (dists.min(axis=1) < 1e-4).all()
    assert not np.allclose(np.asarray(pe_hit), np.asarray(pe_plain))
    # And the gated trainer still trains.
    loss = gated_hit.eval_loss_on_batch(batch)
    assert np.isfinite(loss)
    del gated


def test_knn_gate_projection_branch(distill_setup, cpu_mesh):
    """With projection params wired, the knn gate's three-way semantics
    (reference image_tokenizer.py:278-315) are fully reachable: knn hits
    above threshold, PROJECTION below threshold (not raw clip), and clip
    only when no projection is given. All three sources appear across the
    two configurations under a mid threshold."""
    import dataclasses as dc

    from dclip_tpu.models.projections import init_image_projection
    from dclip_tpu.ops.knn import (
        SOURCE_CLIP,
        SOURCE_KNN,
        SOURCE_PROJECTION,
        knn_or_projection,
    )

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    d = clip_cfg.projection_dim
    rng = np.random.RandomState(0)

    class Store:
        keys = rng.randn(16, d).astype(np.float32)
        keys /= np.linalg.norm(keys, axis=1, keepdims=True)
        values = keys.copy()

        def __len__(self):
            return 16

    _, pparams = init_image_projection(jax.random.PRNGKey(3), d)
    tcfg = dc.replace(cfg.teacher, similarity_threshold=0.6)
    cfg2 = dc.replace(cfg, teacher=tcfg)
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=cpu_mesh, knn_store=Store(), projection_params=pparams,
    )
    assert trainer._projection_fn is not None

    # Half the queries are exact stored keys (knn hits), half random
    # (below the 0.6 threshold with overwhelming probability at d=16).
    q = np.concatenate([Store.keys[:4], rng.randn(4, d).astype(np.float32)])
    pos = rng.rand(8, 4).astype(np.float32)
    res = knn_or_projection(
        jnp.asarray(q), jnp.asarray(pos), trainer._knn_keys,
        trainer._knn_values, trainer._projection_fn, 0.6,
    )
    sources = set(np.asarray(res.source).tolist())
    assert SOURCE_KNN in sources and SOURCE_PROJECTION in sources
    assert SOURCE_CLIP not in sources  # projection available -> no raw-clip

    res_noproj = knn_or_projection(
        jnp.asarray(q), jnp.asarray(pos), trainer._knn_keys,
        trainer._knn_values, None, 0.6,
    )
    sources2 = set(np.asarray(res_noproj.source).tolist())
    assert SOURCE_KNN in sources2 and SOURCE_CLIP in sources2

    # The projection branch actually changes the training-path gate output.
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]
    db = trainer._device_batch(batch)
    pe = jax.jit(trainer._encode_patches_only)(trainer.teacher_clip_variables, db)
    thr = trainer.cfg.teacher.similarity_threshold
    gated_proj = trainer._maybe_knn_gate(pe, db, thr)
    trainer._projection_fn = None
    gated_clip = trainer._maybe_knn_gate(pe, db, thr)
    assert not np.allclose(np.asarray(gated_proj), np.asarray(gated_clip))
    # And a full training step with the projection wired is finite.
    trainer2 = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=cpu_mesh, knn_store=Store(), projection_params=pparams,
    )
    metrics = trainer2.train_step_on_batch(batch)
    assert np.isfinite(float(metrics["loss"]))


def test_teacher_fingerprint_covers_knn_and_projection(distill_setup, cpu_mesh):
    """The knn store and projection head are part of the effective teacher:
    swapping their CONTENTS must change the cache salt (review finding —
    presence-only hashing served stale targets after a store rebuild)."""
    from dclip_tpu.models.projections import init_image_projection

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    d = clip_cfg.projection_dim
    rng = np.random.RandomState(0)

    def store(seed):
        class S:
            keys = np.random.RandomState(seed).randn(8, d).astype(np.float32)
            values = keys

            def __len__(self):
                return 8

        return S()

    def make(knn_store=None, pparams=None):
        return DistillTrainer(
            cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
            mesh=cpu_mesh, knn_store=knn_store, projection_params=pparams,
        )

    base = make()._teacher_fingerprint()
    with_knn = make(store(1))._teacher_fingerprint()
    with_other_knn = make(store(2))._teacher_fingerprint()
    assert base != with_knn
    assert with_knn != with_other_knn  # contents, not presence
    _, p1 = init_image_projection(jax.random.PRNGKey(1), d)
    _, p2 = init_image_projection(jax.random.PRNGKey(2), d)
    assert make(pparams=p1)._teacher_fingerprint() != make(
        pparams=p2
    )._teacher_fingerprint()


def test_teacher_cache_keys_use_content_key(distill_setup):
    """Cache identity prefers the pipeline's content_key (image digest) so
    a regenerated corpus (same indices, different images) never serves
    another image's cached targets."""
    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    cache = TeacherTargetCache(salt="s")
    ids = np.zeros((2, 4), np.int32)
    by_index = {"index": np.asarray([0, 1]), "input_ids": ids}
    by_content = {
        "index": np.asarray([0, 1]),
        "content_key": np.asarray([1234, -99], np.int64),
        "input_ids": ids,
    }
    k1 = cache.keys_for(by_index)
    k2 = cache.keys_for(by_content)
    assert k1 != k2  # content_key takes precedence over index
    by_content2 = dict(by_content, index=np.asarray([7, 8]))
    assert cache.keys_for(by_content2) == k2  # index is irrelevant with it


def test_teacher_trainer_pe_cache(clip_setup, cpu_mesh):
    """The teacher trainer's frozen-region pe cache: identical losses with
    and without the cache, region encode skipped on hits."""
    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
    )
    pipe = FakePipeline(clip_cfg, 2)

    t_plain = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=cpu_mesh)
    cache = TeacherTargetCache()
    t_cached = TeacherTrainer(
        cfg, clip_vars, clip_cfg, mesh=cpu_mesh, pe_cache=cache
    )
    assert cache.salt  # fingerprint assigned
    for batch in pipe.epoch(0):
        a = float(t_plain.eval_loss_on_batch(batch))
        b = float(t_cached.eval_loss_on_batch(batch))  # miss: computes+stores
        np.testing.assert_allclose(a, b, rtol=1e-6)
    assert len(cache._mem) == 2 * B  # one pe row per example
    # Hits: same losses again, and the encode path is NOT taken.
    calls = []
    orig = t_cached._frozen_image_features
    t_cached._patch_jits.clear()

    import dclip_tpu.train.base as base_mod

    real = base_mod.budgeted_patch_encode

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    base_mod.budgeted_patch_encode = counting
    try:
        for batch in pipe.epoch(0):
            b2 = float(t_cached.eval_loss_on_batch(batch))
        assert not calls  # served from cache, no region encode
    finally:
        base_mod.budgeted_patch_encode = real


def test_tp_resume_keeps_opt_state_sharded(distill_setup, cpu_devices, tmp_path):
    """VERDICT r2 #7: restored adam moments must carry the SAME TP
    shardings as the params (1/mp per-device bytes), not replicate."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh = make_mesh(
        MeshConfig(data_parallel=1, model_parallel=2), devices=cpu_devices
    )
    cfg2 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, data_parallel=1, model_parallel=2)
    )
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh
    )
    pipe = FakePipeline(clip_cfg, 1)
    ckpts = CheckpointManager(str(tmp_path), monitor="train_loss")
    trainer.fit(pipe, checkpoints=ckpts)

    trainer2 = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh
    )
    assert trainer2.resume(ckpts) == cfg.phase1_epochs

    def specs_by_suffix(tree, suffix):
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
                for k in path
            )
            if name.endswith(suffix):
                out.append((name, leaf))
        return out

    # q_proj kernels are trainable under the default mask ("proj" in name),
    # so mu/nu hold real moments for them; all must be column-sharded.
    hits = specs_by_suffix(trainer2.state.opt_state, "self_attn/q_proj/kernel")
    assert len(hits) >= 2  # mu and nu at least
    for name, leaf in hits:
        assert leaf.sharding.spec == P(None, "model"), name
        # Per-device shard holds HALF the columns.
        shard = leaf.addressable_shards[0].data
        assert shard.shape[-1] == leaf.shape[-1] // 2, name
    # Row-sharded example too (fc2).
    for name, leaf in specs_by_suffix(trainer2.state.opt_state, "mlp/fc2/kernel"):
        assert leaf.sharding.spec == P("model", None), name
    # Scalar counts replicate.
    for name, leaf in specs_by_suffix(trainer2.state.opt_state, "count"):
        assert leaf.sharding.spec == P(), name
    # And resumed training still steps.
    m = trainer2.train_step_on_batch(pipe.batches[0])
    assert np.isfinite(float(m["loss"]))


def test_distill_fused_frozen_mlp_toggle(distill_setup, cpu_devices):
    """With use_pallas, the student's vision stack runs the frozen-weight
    fused MLP blocks exactly while the mask freezes vision LN2/MLP; an
    unfreeze stage touching them rebuilds the module WITHOUT the kernel
    (whose VJP would silently zero their grads), and training then
    actually updates the vision MLP weights. Single-device mesh: the
    in-module kernels demote to XLA twins on multi-device meshes (GSPMD
    would replicate them — see test_distill_multi_device_demotes_*)."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])
    cfg2 = dataclasses.replace(
        cfg,
        use_pallas=True,
        phase1_epochs=2,
        unfreeze_schedule=(UnfreezeStage(epoch=1, patterns=("mlp",)),),
    )
    trainer = DistillTrainer(
        cfg2, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh1
    )
    assert trainer.student.fused_frozen_mlp
    pipe = FakePipeline(clip_cfg, 1)
    trainer._maybe_unfreeze(0)
    trainer.train_epoch(pipe.epoch(0))
    assert trainer.student.fused_frozen_mlp
    mid = jax.device_get(trainer.state.params)
    trainer._maybe_unfreeze(1)
    assert not trainer.student.fused_frozen_mlp
    trainer.train_epoch(pipe.epoch(1))
    after = jax.device_get(trainer.state.params)
    assert not np.allclose(
        mid["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
        after["vision_model"]["encoder"]["layers_0"]["mlp"]["fc1"]["kernel"],
    )


def test_distill_fused_text_mlp_opt_in(distill_setup, cpu_devices):
    """The trainable fused text-MLP kernels are OFF by default (measured
    slower than XLA at CLIP text shapes on v5e) and opt-in via
    cfg.fused_text_mlp; when on, text MLP weights still receive real
    gradients (the kernel's weight cotangents are live, unlike the
    frozen vision kernel's). Single-device mesh (in-module kernels
    demote off it)."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])
    cfg_on = dataclasses.replace(cfg, use_pallas=True, fused_text_mlp=True)
    trainer_default = DistillTrainer(
        dataclasses.replace(cfg, use_pallas=True),
        clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh1,
    )
    assert not trainer_default.student.fused_trainable_text_mlp

    trainer = DistillTrainer(
        cfg_on, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=mesh1,
    )
    assert trainer.student.fused_trainable_text_mlp
    pipe = FakePipeline(clip_cfg, 1)
    before = np.asarray(jax.device_get(
        trainer.state.params["text_model"]["encoder"]["layers_0"]["mlp"]
        ["fc1"]["kernel"]
    ))
    m = trainer.train_step_on_batch(pipe.batches[0])
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(jax.device_get(
        trainer.state.params["text_model"]["encoder"]["layers_0"]["mlp"]
        ["fc1"]["kernel"]
    ))
    assert not np.allclose(before, after)


# -- HBM-resident level-0 teacher-target cache (train/device_cache.py) --------


def test_distill_donation_decouples_teacher_aliases(distill_setup, cpu_mesh):
    """The student step donates its TrainState, which frees the input
    buffers after each call. When the student is initialized from the SAME
    tree as the teacher CLIP (common: distill from the pretrained weights),
    construction must copy the aliased leaves — otherwise the frozen
    teacher jits would read deleted arrays on the next step. Pin buffer
    disjointness and that teacher-path steps keep working after updates."""
    clip_cfg, clip_vars, tparams, cfg = distill_setup
    # Device-commit ONE tree and hand it to both sides, so placement
    # no-ops and the raw aliasing reaches the trainer.
    committed = jax.device_put(clip_vars, jax.devices("cpu")[0])
    trainer = DistillTrainer(
        cfg, committed, committed, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh
    )
    teacher_ids = {
        id(l) for l in jax.tree_util.tree_leaves(trainer.teacher_clip_variables)
    }
    student_ids = {id(l) for l in jax.tree_util.tree_leaves(trainer.state.params)}
    assert not (teacher_ids & student_ids)
    # Two steps then an eval through the TEACHER path: with a shared
    # buffer this is where deleted-array errors would surface.
    pipe = FakePipeline(clip_cfg, 2)
    trainer.fit(pipe, pipe)
    batch = pipe.batches[0]
    assert np.isfinite(trainer.eval_loss_on_batch(batch))


def test_device_target_cache_unit():
    """Roundtrip, growth, all-or-nothing miss, idempotent overwrite, and
    the capacity stop (default evict=False: past budget, puts are
    skipped — optimal for stable keys scanned every epoch)."""
    import jax as _jax

    from dclip_tpu.train.device_cache import DeviceTargetCache

    dev = _jax.devices("cpu")[0]
    row = (2, 4)
    row_bytes = 2 * 4 * 4
    c = DeviceTargetCache(row, jnp.float32, capacity_bytes=6 * row_bytes,
                          device=dev, min_rows=2)
    vals = jnp.arange(3 * 2 * 4, dtype=jnp.float32).reshape(3, 2, 4)
    assert c.get(["a", "b"]) is None  # empty
    c.put(["a", "b", "c"], vals)
    assert len(c) == 3
    got = c.get(["b", "a"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals)[[1, 0]])
    assert c.get(["a", "zzz"]) is None  # any miss -> None
    # Overwrite is idempotent and respects existing rows.
    c.put(["a", "d"], vals[:2] + 100.0)
    np.testing.assert_array_equal(
        np.asarray(c.get(["a"])), np.asarray(vals[:1] + 100.0)
    )
    assert len(c) == 4
    # Duplicate keys in one put: last value wins, one row allocated.
    c.put(["e", "e"], vals[:2])
    assert len(c) == 5
    np.testing.assert_array_equal(np.asarray(c.get(["e"])), np.asarray(vals[1:2]))
    # Capacity: 6 rows total; inserting 2 new keys would need 7 -> skipped.
    before = len(c)
    c.put(["f", "g"], vals[:2])
    assert len(c) == before and c.skipped_puts == 1
    assert c.get(["f"]) is None
    # Exactly-at-capacity insert still lands.
    c.put(["f"], vals[:1])
    assert len(c) == 6


def test_device_target_cache_fifo_eviction():
    """evict=True (the caption-resampled full level): past budget, the
    OLDEST keys not in the current batch are evicted and their rows
    reused; a batch bigger than the whole cache is skipped outright."""
    import jax as _jax

    from dclip_tpu.train.device_cache import DeviceTargetCache

    dev = _jax.devices("cpu")[0]
    row = (2, 4)
    row_bytes = 2 * 4 * 4
    c = DeviceTargetCache(row, jnp.float32, capacity_bytes=4 * row_bytes,
                          device=dev, min_rows=2, evict=True)
    vals = jnp.arange(4 * 2 * 4, dtype=jnp.float32).reshape(4, 2, 4)
    c.put(["a", "b", "c", "d"], vals)
    assert len(c) == 4 and c.evictions == 0
    # Two new keys: evicts the two oldest ("a", "b"), reuses their rows.
    c.put(["e", "f"], vals[:2] + 50.0)
    assert len(c) == 4 and c.evictions == 2 and c.skipped_puts == 0
    assert c.get(["a"]) is None and c.get(["b"]) is None
    np.testing.assert_array_equal(
        np.asarray(c.get(["e", "f"])), np.asarray(vals[:2] + 50.0)
    )
    # Survivors are intact (their rows were not the reused ones).
    np.testing.assert_array_equal(
        np.asarray(c.get(["c", "d"])), np.asarray(vals[2:4])
    )
    # In-batch keys are never chosen as victims: "c" stays writable while
    # "d" (older than "g"'s need) is evicted.
    c.put(["c", "g"], vals[:2])
    assert c.get(["d"]) is None
    np.testing.assert_array_equal(np.asarray(c.get(["c"])), np.asarray(vals[:1]))
    # A batch of new keys larger than the whole cache: skipped, not thrashed.
    before = dict(c._rows)
    c.put(["p", "q", "r", "s", "t"], jnp.zeros((5, 2, 4), jnp.float32))
    assert c._rows == before and c.skipped_puts == 1


def test_device_target_cache_sharding_passthrough(cpu_devices):
    """Constructed with a NamedSharding, gathers carry THAT sharding (so
    trainer-hit paths never retrace jits first traced on the miss path)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train.device_cache import DeviceTargetCache

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                     devices=cpu_devices[:1])
    sh = NamedSharding(mesh, PartitionSpec("data"))
    c = DeviceTargetCache((3,), jnp.float32, capacity_bytes=1 << 16,
                          device=sh, min_rows=2)
    c.put(["a", "b"], jnp.ones((2, 3), jnp.float32))
    got = c.get(["b", "a"])
    assert got.sharding == sh


def test_distill_device_cache_matches_host_path(distill_setup, cpu_devices):
    """On a single-device mesh the HBM level-0 engages (auto): first step
    computes and populates it, the second full-hits on device, and a
    pe-only hit (caption resampling analogue) goes through the device pe
    level — all numerically identical to the host-cache-only trainer."""
    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])

    def build(device_cache):
        import dataclasses

        c = dataclasses.replace(cfg, device_target_cache=device_cache)
        return DistillTrainer(
            c, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
            mesh=mesh1, teacher_cache=TeacherTargetCache(),
        )

    t_dev, t_host = build(None), build(False)
    assert t_dev._dev_full is not None and t_dev._dev_pe is not None
    assert t_host._dev_full is None
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]

    # Step 1 (miss): populates both levels on the device trainer.
    m1d = t_dev.train_step_on_batch(batch)
    m1h = t_host.train_step_on_batch(batch)
    np.testing.assert_allclose(float(m1d["loss"]), float(m1h["loss"]), rtol=1e-6)
    assert len(t_dev._dev_full) == B and len(t_dev._dev_pe) == B

    # Step 2 (full hit on device): identical metrics, hit counted.
    hits0 = t_dev._dev_full.hits
    m2d = t_dev.train_step_on_batch(batch)
    m2h = t_host.train_step_on_batch(batch)
    assert t_dev._dev_full.hits == hits0 + 1
    np.testing.assert_allclose(float(m2d["loss"]), float(m2h["loss"]), rtol=1e-6)
    # The device-hit targets carry the SAME sharding as the miss path:
    # the student step (the heaviest compile) must not retrace on a hit.
    assert t_dev._train_step._cache_size() == 1

    # pe-level: wipe the full maps (device + host) so only the
    # caption-independent pe level can hit — the device pe gather must
    # serve it and results must still match the host trainer.
    t_dev._dev_full._rows.clear()
    full_keys = t_dev.teacher_cache.keys_for(batch.as_dict())
    for k in full_keys:
        t_dev.teacher_cache._mem.pop(k, None)
    for k in full_keys:
        t_host.teacher_cache._mem.pop(k, None)
    pe_hits0 = t_dev._dev_pe.hits
    m3d = t_dev.train_step_on_batch(batch)
    m3h = t_host.train_step_on_batch(batch)
    assert t_dev._dev_pe.hits == pe_hits0 + 1
    np.testing.assert_allclose(float(m3d["loss"]), float(m3h["loss"]), rtol=1e-6)
    # pe-level hits feed the teacher tail without retracing it either.
    assert t_dev._teacher_tail_step._cache_size() == 1
    assert t_dev._train_step._cache_size() == 1


def test_teacher_trainer_device_pe_cache(clip_setup, cpu_devices):
    """Teacher trainer level-0: on a single-device mesh the device pe
    cache auto-engages; epoch-1 hits gather on device (no host get) with
    losses identical to the host-cache-only trainer."""
    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
    )
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])
    pipe = FakePipeline(clip_cfg, 2)

    t_host = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh1,
                            pe_cache=TeacherTargetCache())
    import dataclasses

    t_dev = TeacherTrainer(
        dataclasses.replace(cfg, device_target_cache=None),
        clip_vars, clip_cfg, mesh=mesh1, pe_cache=TeacherTargetCache(),
    )
    assert t_dev._dev_pe is not None  # auto: single-device + pe_cache
    assert TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh1)._dev_pe is None

    for batch in pipe.epoch(0):  # misses populate both levels
        a = float(t_host.eval_loss_on_batch(batch))
        b = float(t_dev.eval_loss_on_batch(batch))
        np.testing.assert_allclose(a, b, rtol=1e-6)
    assert len(t_dev._dev_pe) == 2 * B

    hits0 = t_dev._dev_pe.hits
    host_gets = []
    orig_get = t_dev.pe_cache.get_batch
    t_dev.pe_cache.get_batch = lambda *a, **k: host_gets.append(1) or orig_get(*a, **k)
    for batch in pipe.epoch(0):  # epoch 1: device hits, host cache untouched
        a = float(t_host.eval_loss_on_batch(batch))
        b = float(t_dev.eval_loss_on_batch(batch))
        np.testing.assert_allclose(a, b, rtol=1e-6)
    assert t_dev._dev_pe.hits == hits0 + 2 and not host_gets
    # Device-hit pe carries the canonical batch sharding: no retrace.
    assert t_dev._eval_loss._cache_size() == 1


def test_teacher_trainer_device_pe_cache_dp_mesh(clip_setup, cpu_devices):
    """Teacher-trainer device pe level under dp=4: engages (auto, the
    buffer rows shard over the data axis), epoch-1 hits gather on device
    with no host-cache reads, losses identical to the host-only path."""
    import dataclasses

    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
        mesh=MeshConfig(data_parallel=4, model_parallel=1),
    )
    mesh4 = make_mesh(cfg.mesh, devices=cpu_devices[:4])
    pipe = FakePipeline(clip_cfg, 2)
    t_host = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh4,
                            pe_cache=TeacherTargetCache())
    t_dev = TeacherTrainer(
        dataclasses.replace(cfg, device_target_cache=None),
        clip_vars, clip_cfg, mesh=mesh4, pe_cache=TeacherTargetCache(),
    )
    assert t_dev._dev_pe is not None and t_dev._dev_pe.shards == 4
    for batch in pipe.epoch(0):
        np.testing.assert_allclose(
            float(t_host.eval_loss_on_batch(batch)),
            float(t_dev.eval_loss_on_batch(batch)), rtol=1e-6,
        )
    n = t_dev._dev_pe._buf.shape[0]
    assert n % 4 == 0
    assert {s.data.shape[0]
            for s in t_dev._dev_pe._buf.addressable_shards} == {n // 4}
    hits0 = t_dev._dev_pe.hits
    host_gets = []
    orig_get = t_dev.pe_cache.get_batch
    t_dev.pe_cache.get_batch = (
        lambda *a, **k: host_gets.append(1) or orig_get(*a, **k)
    )
    for batch in pipe.epoch(0):
        np.testing.assert_allclose(
            float(t_host.eval_loss_on_batch(batch)),
            float(t_dev.eval_loss_on_batch(batch)), rtol=1e-6,
        )
    assert t_dev._dev_pe.hits == hits0 + 2 and not host_gets
    assert t_dev._eval_loss._cache_size() == 1


def test_device_target_cache_sharded_unit(cpu_devices):
    """dp>1 buffer: rows shard over the data axis (each device holds
    rows/dp), growth sizes stay multiples of the shard count, the
    per-device byte budget scales capacity with the mesh, and global-
    index gathers return exact rows with the batch sharding."""
    from jax.sharding import NamedSharding, PartitionSpec

    from dclip_tpu.train.device_cache import DeviceTargetCache

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=1),
                     devices=cpu_devices[:4])
    sh = NamedSharding(mesh, PartitionSpec("data"))
    row = (2, 4)
    row_bytes = 2 * 4 * 4
    # 3 rows/device budget -> 12 rows total (capacity scales with mesh).
    c = DeviceTargetCache(row, jnp.float32, capacity_bytes=3 * row_bytes,
                          device=sh, min_rows=2)
    assert c.shards == 4 and c.capacity_rows == 12
    # Batch sizes are dp-multiples — the same divisibility contract the
    # batch sharding imposes on every step input (pipeline pads to it).
    vals = jnp.arange(8 * 2 * 4, dtype=jnp.float32).reshape(8, 2, 4)
    c.put([f"k{i}" for i in range(8)], vals)
    # Buffer allocated in multiples of the shard count, evenly sharded.
    assert c._buf.shape[0] % 4 == 0
    shard_rows = {s.data.shape[0] for s in c._buf.addressable_shards}
    assert shard_rows == {c._buf.shape[0] // 4}
    got = c.get(["k3", "k0", "k5", "k1"])
    assert got.sharding == sh
    np.testing.assert_array_equal(np.asarray(got), np.asarray(vals)[[3, 0, 5, 1]])
    # Overwrite still holds under sharding (idempotent, last wins).
    c.put(["k0"] * 4, jnp.stack([vals[2]] * 4))
    np.testing.assert_array_equal(
        np.asarray(c.get(["k0", "k1", "k2", "k3"])),
        np.asarray(vals)[[2, 1, 2, 3]],
    )
    # 8 existing + 8 new = 16 > capacity 12 (evict=False): skipped whole.
    c.put([f"x{i}" for i in range(8)], jnp.zeros((8, 2, 4), jnp.float32))
    assert len(c) == 8 and c.skipped_puts == 1
    # Exactly filling the remaining 4 rows still lands.
    c.put([f"y{i}" for i in range(4)], vals[:4])
    assert len(c) == 12
    np.testing.assert_array_equal(
        np.asarray(c.get(["y0", "y1", "y2", "y3"])), np.asarray(vals[:4])
    )


def test_device_target_cache_multihost_disabled(distill_setup, cpu_mesh,
                                                capsys, monkeypatch):
    """Under multihost (process_count > 1) the device cache stays off —
    cache keys are computed from process-LOCAL batch rows while the
    buffer would be a global array."""
    import dataclasses

    import jax as _jax

    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    c = dataclasses.replace(cfg, device_target_cache=True)
    trainer = DistillTrainer(
        c, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=cpu_mesh, teacher_cache=TeacherTargetCache(),
    )
    assert trainer._dev_full is None and trainer._dev_pe is None
    assert "multihost" in capsys.readouterr().out


def test_distill_device_cache_dp_mesh_matches_host_path(distill_setup,
                                                        cpu_devices):
    """VERDICT r4 #1 'done' criteria: on a dp=4 mesh the device cache
    ENGAGES (auto), numerics are identical to the host-cache path, the
    buffer rows shard over the data axis, and on an epoch>=1 full hit the
    teacher side uploads NOTHING but the [B] index vector — no teacher
    batch fields, no host-cache [B, 2, D] numpy rows — without retracing
    the student step."""
    import dataclasses

    from dclip_tpu.train import TeacherTargetCache

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh4 = make_mesh(MeshConfig(data_parallel=4, model_parallel=1),
                      devices=cpu_devices[:4])
    cfg4 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, data_parallel=4)
    )

    def build(device_cache):
        c = dataclasses.replace(cfg4, device_target_cache=device_cache)
        return DistillTrainer(
            c, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
            mesh=mesh4, teacher_cache=TeacherTargetCache(),
        )

    t_dev, t_host = build(None), build(False)
    assert t_dev._dev_full is not None and t_dev._dev_pe is not None
    assert t_host._dev_full is None
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]

    # Step 1 (miss): populates both levels; losses match the host path.
    m1d = t_dev.train_step_on_batch(batch)
    m1h = t_host.train_step_on_batch(batch)
    np.testing.assert_allclose(float(m1d["loss"]), float(m1h["loss"]), rtol=1e-6)
    # Buffer rows are sharded over the 4 data-axis devices.
    for cache in (t_dev._dev_full, t_dev._dev_pe):
        assert cache.shards == 4
        n = cache._buf.shape[0]
        assert n % 4 == 0
        assert {s.data.shape[0] for s in cache._buf.addressable_shards} == {n // 4}

    # Step 2 (full device hit): teacher-side H2D is ONLY the index vector.
    import dclip_tpu.parallel.multihost as mh

    uploads = []
    real_put = mh.put_sharded

    def spying_put(v, sh):
        uploads.append(np.asarray(v).nbytes)
        return real_put(v, sh)

    host_gets = []
    orig_get = t_dev.teacher_cache.get_batch
    t_dev.teacher_cache.get_batch = (
        lambda *a, **k: host_gets.append(1) or orig_get(*a, **k)
    )
    hits0 = t_dev._dev_full.hits
    mh.put_sharded = spying_put
    try:
        m2d = t_dev.train_step_on_batch(batch)
    finally:
        mh.put_sharded = real_put
    m2h = t_host.train_step_on_batch(batch)
    assert t_dev._dev_full.hits == hits0 + 1
    assert not host_gets  # the [B, 2, D] host rows never re-upload
    # put_sharded carried only the student fields (pixel_values,
    # input_ids, attention_mask) — teacher_pixels/boxes/box_mask, the
    # bulk of the batch bytes, never crossed H2D on the hit.
    d = batch.as_dict()
    student_bytes = sorted(
        np.asarray(d[k]).nbytes
        for k in ("pixel_values", "input_ids", "attention_mask")
    )
    assert sorted(uploads) == student_bytes
    np.testing.assert_allclose(float(m2d["loss"]), float(m2h["loss"]), rtol=1e-6)
    # No retrace on the hit path: one student-step compile total.
    assert t_dev._train_step._cache_size() == 1

    # pe-level hit under dp>1 (caption-resampling analogue).
    t_dev._dev_full._rows.clear()
    for k in t_dev.teacher_cache.keys_for(d):
        t_dev.teacher_cache._mem.pop(k, None)
        t_host.teacher_cache._mem.pop(k, None)
    pe_hits0 = t_dev._dev_pe.hits
    m3d = t_dev.train_step_on_batch(batch)
    m3h = t_host.train_step_on_batch(batch)
    assert t_dev._dev_pe.hits == pe_hits0 + 1
    np.testing.assert_allclose(float(m3d["loss"]), float(m3h["loss"]), rtol=1e-6)
    assert t_dev._teacher_tail_step._cache_size() == 1
    assert t_dev._train_step._cache_size() == 1


def test_distill_fused_paths_dp_mesh(distill_setup, cpu_devices, capsys):
    """Mesh-true fast paths under dp=4 + use_pallas (interpret on CPU):
    since round 5 the in-module differentiated kernels stay ENGAGED on
    dp-only meshes (shard_map over the data axis — no demotion print), the
    frozen region encode and teacher-tail cross-attention stay fused, and
    one train step matches the dp=1 Pallas trainer's loss (data-parallel
    invariance of the global step). Deep grad/loss parity lives in
    tests/test_mesh_true_paths.py."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh4 = make_mesh(MeshConfig(data_parallel=4, model_parallel=1),
                      devices=cpu_devices[:4])
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])
    cfg4 = dataclasses.replace(
        cfg, use_pallas=True,
        mesh=dataclasses.replace(cfg.mesh, data_parallel=4),
    )
    cfg1 = dataclasses.replace(cfg, use_pallas=True)
    t4 = DistillTrainer(
        cfg4, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh4
    )
    out = capsys.readouterr().out
    assert "demoted" not in out  # dp-only meshes never demote anymore
    # Frozen fast paths AND the in-module kernels engaged (shard_map).
    assert t4._frozen_image_features is not None
    assert t4._fused_cross_attention is not None
    assert t4._module_pallas
    assert t4.student.fused_attention
    t1 = DistillTrainer(
        cfg1, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh1
    )
    assert t1._module_pallas and t1.student.fused_attention
    pipe = FakePipeline(clip_cfg, 1)
    batch = pipe.batches[0]
    m4 = t4.train_step_on_batch(batch)
    m1 = t1.train_step_on_batch(batch)
    assert np.isfinite(float(m4["loss"]))
    # dp=4 runs the same fused kernels but the XLA (all-gather) loss vs
    # dp=1's fused loss kernel: parity-pinned elsewhere, so losses agree
    # to kernel tolerance, not bitwise.
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=2e-4)


# -- Caption sequence packing (ops/packing.py) through the trainer ------------


def _variable_length_batch(clip_cfg, seed=3):
    """A FakePipeline batch whose caption lengths vary (3..3+B-1 tokens,
    EOS-terminated) so packing places several captions per row."""
    import dataclasses as dc

    base = FakePipeline(clip_cfg, 1, seed=seed).batches[0]
    rng = np.random.RandomState(seed + 100)
    ids = rng.randint(1, 900, size=(B, T)).astype(np.int32)
    mask = np.zeros((B, T), np.int32)
    for b in range(B):
        n = 3 + b  # distinct lengths, max 3+7=10 <= T=16
        ids[b, n - 1] = clip_cfg.text.eos_token_id
        ids[b, n:] = 0
        mask[b, :n] = 1
    return dc.replace(base, input_ids=ids, attention_mask=mask)


def test_distill_packed_text_step_parity(distill_setup, cpu_devices):
    """cfg.packed_text must not change training numerics: over a
    variable-length batch the packed student loss AND its full gradient
    tree match the unpacked path, and a full packed train step produces
    the same step loss. Parity is pinned at the gradient level — post-Adam
    params are NOT comparable (leaves whose true gradient is numeric
    noise get sign-random updates of full learning-rate magnitude).
    Single-data-shard mesh (the flag's supported domain)."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    mesh1 = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                      devices=cpu_devices[:1])
    batch = _variable_length_batch(clip_cfg)

    # Sanity: packing actually compresses this batch.
    from dclip_tpu.ops.packing import pack_captions

    packed = pack_captions(
        batch.input_ids, batch.attention_mask, clip_cfg.text.eos_token_id
    )
    assert packed["packed_ids"].shape[0] < B

    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh1,
    )
    d = batch.as_dict()
    ti, tt = trainer._teacher_targets(
        trainer.teacher_clip_variables, trainer.teacher_params, d
    )
    plain_b = {k: d[k] for k in ("pixel_values", "input_ids",
                                 "attention_mask")}
    packed_b = {"pixel_values": d["pixel_values"], **packed}

    def loss_of(b):
        return lambda p: trainer._student_loss(p, ti, tt, b)[0]

    params = trainer.state.params
    l_plain, g_plain = jax.value_and_grad(loss_of(plain_b))(params)
    l_packed, g_packed = jax.value_and_grad(loss_of(packed_b))(params)
    np.testing.assert_allclose(float(l_packed), float(l_plain), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        jax.device_get(g_plain), jax.device_get(g_packed),
    )

    # And the full packed train step (host packing + bucketed H2D + jit)
    # runs and reproduces the unpacked step loss.
    t_packed = DistillTrainer(
        dataclasses.replace(cfg, packed_text=True),
        clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=mesh1,
    )
    assert t_packed._packed_text is True
    m = t_packed.train_step_on_batch(batch)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(l_plain), rtol=1e-5)


def test_distill_packed_text_dp_mesh_enabled(distill_setup, cpu_mesh):
    """Since round 5 packed_text stays ENABLED on dp>1 meshes: captions
    pack per data shard (ops.packing.pack_captions_sharded) and the step
    runs packed. Numeric parity with the unpacked dp step is pinned in
    tests/test_mesh_true_paths.py."""
    import dataclasses

    clip_cfg, clip_vars, tparams, cfg = distill_setup
    trainer = DistillTrainer(
        dataclasses.replace(cfg, packed_text=True),
        clip_vars, clip_vars, tparams, clip_cfg, clip_cfg, mesh=cpu_mesh,
    )
    assert trainer._packed_text is True
    m = trainer.train_step_on_batch(_variable_length_batch(clip_cfg))
    assert np.isfinite(float(m["loss"]))

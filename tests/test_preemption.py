"""Graceful preemption (train/preemption.py): SIGTERM -> stop at the next
step boundary -> tagged 'preempt' checkpoint -> clean unwind."""
import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig, MeshConfig, TeacherTrainConfig
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.parallel.mesh import make_mesh
from dclip_tpu.train import CheckpointManager
from dclip_tpu.train.preemption import Preempted, PreemptionGuard
from dclip_tpu.train.teacher_trainer import TeacherTrainer

from tests.test_trainers import B, FakePipeline, _tiny_teacher_cfg  # noqa: E501 (shared tiny-trainer fixtures)


def test_guard_flag_and_handler_restore():
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard() as guard:
            assert not guard.requested
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested
            assert guard.should_stop(step=3)  # single-process: every step
            # The previous handler chained.
            assert seen == [signal.SIGTERM]
        # Restored on exit: a new signal hits only the old handler.
        os.kill(os.getpid(), signal.SIGTERM)
        assert seen == [signal.SIGTERM, signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_multiprocess_agreement_is_sticky_and_synced():
    """Under process_count>1 the flag is only honored at sync points, via
    an any() over all processes' flags — and once agreed, stays agreed."""
    calls = []

    def allgather(flag):
        calls.append(flag)
        return [flag, True]  # some OTHER process saw the signal

    g = PreemptionGuard(sync_every=4, _allgather=allgather, _process_count=2)
    assert not g.should_stop(step=1)  # not a sync point: no gather
    assert not g.should_stop(step=3)
    assert calls == []
    assert g.should_stop(step=4)  # sync point: gather -> any() True
    assert calls == [False]
    assert g.should_stop(step=5)  # sticky, no second gather
    assert calls == [False]


def test_guard_local_flag_ignored_until_sync_point():
    g = PreemptionGuard(sync_every=4, _allgather=lambda f: [f, False],
                        _process_count=2)
    g._flag = True
    assert not g.should_stop(step=2)  # waits for the agreement point
    assert g.should_stop(step=4)


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


class SignalingPipeline(FakePipeline):
    """Delivers SIGTERM to this process after yielding the Nth batch."""

    def __init__(self, clip_cfg, n_batches, kill_after):
        super().__init__(clip_cfg, n_batches)
        self.kill_after = kill_after

    def epoch(self, epoch):
        for i, b in enumerate(self.batches):
            yield b
            if epoch == 0 and i + 1 == self.kill_after:
                os.kill(os.getpid(), signal.SIGTERM)


def test_fit_preempted_saves_tagged_checkpoint_and_unwinds(
    clip_setup, cpu_devices, tmp_path
):
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=3, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
    )
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh)
    ckpts = CheckpointManager(str(tmp_path), prefix="teacher")
    pipe = SignalingPipeline(clip_cfg, n_batches=4, kill_after=2)

    with PreemptionGuard() as guard:
        with pytest.raises(Preempted):
            trainer.fit(pipe, pipe, checkpoints=ckpts, preemption=guard)

    # Exactly 2 steps ran (the signal landed after batch 2; batch 3's
    # boundary check stopped the epoch).
    assert int(trainer.state.step) == 2
    entries = [e for e in ckpts._index if e.get("tag") == "preempt"]
    assert len(entries) == 1 and entries[0]["step"] == 2
    assert os.path.exists(entries[0]["path"])
    # The preempt checkpoint does NOT hijack resume (epoch-granular).
    assert ckpts.latest() is None


class DyingWorkersPipeline(FakePipeline):
    """Simulates a process-group SIGTERM: the signal lands AND the spawned
    decode workers die, so the next batch fetch raises a pool error before
    any step-boundary check ran."""

    def __init__(self, clip_cfg, n_batches, die_after, send_signal=True):
        super().__init__(clip_cfg, n_batches)
        self.die_after = die_after
        self.send_signal = send_signal

    def epoch(self, epoch):
        for i, b in enumerate(self.batches):
            if epoch == 0 and i == self.die_after:
                if self.send_signal:
                    os.kill(os.getpid(), signal.SIGTERM)
                raise OSError("worker pool died (simulated group SIGTERM)")
            yield b


def test_group_sigterm_pipeline_death_takes_graceful_path(
    clip_setup, cpu_devices, tmp_path
):
    """A pipeline failure AFTER the preemption signal is the preemption,
    not a crash: fit reclassifies it as Preempted and tags the checkpoint
    'preempt' (so CLIs exit 0 and supervisors see a graceful shutdown)."""
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=2, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
    )
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh)
    ckpts = CheckpointManager(str(tmp_path), prefix="teacher")
    pipe = DyingWorkersPipeline(clip_cfg, n_batches=3, die_after=2)

    with PreemptionGuard() as guard:
        with pytest.raises(Preempted, match="pipeline failed"):
            trainer.fit(pipe, pipe, checkpoints=ckpts, preemption=guard)
    entries = [e for e in ckpts._index if e.get("tag") == "preempt"]
    assert len(entries) == 1 and entries[0]["step"] == 2
    # Without the signal, the same failure stays an 'error' crash.
    trainer2 = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh)
    ckpts2 = CheckpointManager(str(tmp_path / "e"), prefix="teacher")
    pipe2 = DyingWorkersPipeline(clip_cfg, n_batches=3, die_after=2,
                                 send_signal=False)
    with PreemptionGuard() as guard2:
        with pytest.raises(OSError):
            trainer2.fit(pipe2, pipe2, checkpoints=ckpts2, preemption=guard2)
    assert [e["tag"] for e in ckpts2._index if e.get("tag")] == ["error"]


def test_fit_without_guard_unaffected(clip_setup, cpu_devices, tmp_path):
    """No guard installed: SIGTERM keeps its default (fatal) semantics —
    pin only that fit() runs to completion with preemption=None."""
    clip_cfg, clip_vars = clip_setup
    cfg = TeacherTrainConfig(
        epochs=1, batch_size=B, learning_rate=1e-3,
        teacher=_tiny_teacher_cfg(clip_cfg), clip_model="tiny",
    )
    mesh = make_mesh(MeshConfig(), devices=cpu_devices)
    trainer = TeacherTrainer(cfg, clip_vars, clip_cfg, mesh=mesh)
    pipe = FakePipeline(clip_cfg, 2)
    history = trainer.fit(pipe, pipe, preemption=None)
    assert len(history["train_loss"]) == 1

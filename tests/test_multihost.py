"""Multi-host (multi-process) support tests.

The fast tests pin the pipeline's per-process sharding semantics in one
process. The slow test launches an ACTUAL 2-process jax.distributed run
(gloo over localhost, 4 virtual CPU devices per process = 8 global) and
asserts the distillation step over the process-sharded pipeline produces
exactly the same loss and updated params as a single-process 8-device run
on the same corpus — the determinism contract `parallel.multihost`
documents.

Reference counterpart: none (single-GPU reference, devices=1 at
CLIP_image_distill_training.py:39); SURVEY.md §2.5 mandates the
parallelism layer as a new capability.
"""
from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys

import numpy as np
import pytest

from dclip_tpu.data import (
    GridProposalDetector,
    HashTokenizer,
    MultiModalPipeline,
    build_cache,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(tmp_path, n=8):
    from PIL import Image

    rng = np.random.RandomState(0)
    items = []
    for i in range(n):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(
            rng.randint(0, 255, (40, 30, 3), np.uint8)
        ).save(p)
        items.append({
            "image_path": p,
            "captions": [f"caption {i} a", f"caption {i} b"],
            "dataset": "test",
            "boxes": [],
        })
    path = str(tmp_path / "corpus.json")
    with open(path, "w") as f:
        json.dump(items, f)
    return path, items


def test_pipeline_shards_concatenate_to_global_batch(tmp_path):
    """Process shards are the row-slices of the unsharded batch: the
    global array multihost.put_sharded assembles equals what one process
    would have produced."""
    _, items = _corpus(tmp_path)
    cache = build_cache([i["image_path"] for i in items], GridProposalDetector())
    tok = HashTokenizer(max_length=12)

    def batches(shard_index, shard_count):
        pipe = MultiModalPipeline(
            items, tok, cache, batch_size=4, max_patches=2,
            image_size=16, teacher_image_size=16, seed=3, num_threads=1,
            shard_index=shard_index, shard_count=shard_count,
        )
        return list(pipe.epoch(0))

    full = batches(0, 1)
    s0 = batches(0, 2)
    s1 = batches(1, 2)
    assert len(full) == len(s0) == len(s1) == 2
    for b_full, b0, b1 in zip(full, s0, s1):
        for field in ("pixel_values", "input_ids", "boxes", "index"):
            np.testing.assert_array_equal(
                getattr(b_full, field),
                np.concatenate(
                    [getattr(b0, field), getattr(b1, field)], axis=0
                ),
            )


def test_pipeline_shard_validation(tmp_path):
    _, items = _corpus(tmp_path, n=4)
    tok = HashTokenizer(max_length=12)
    with pytest.raises(ValueError, match="divisible"):
        MultiModalPipeline(items, tok, batch_size=3, shard_count=2,
                           shard_index=0)
    with pytest.raises(ValueError, match="out of range"):
        MultiModalPipeline(items, tok, batch_size=4, shard_count=2,
                           shard_index=2)
    with pytest.raises(ValueError, match="drop_remainder"):
        MultiModalPipeline(items, tok, batch_size=4, shard_count=2,
                           shard_index=0, drop_remainder=False)


def test_init_multihost_partial_env_triple_is_explicit(monkeypatch):
    """DCLIP_COORDINATOR without the rest of the triple: an actionable
    SystemExit naming the missing variables, not a raw KeyError."""
    from dclip_tpu.cli.common import init_multihost

    monkeypatch.setenv("DCLIP_COORDINATOR", "127.0.0.1:1234")
    monkeypatch.delenv("DCLIP_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("DCLIP_PROCESS_ID", "0")
    with pytest.raises(SystemExit, match="DCLIP_NUM_PROCESSES"):
        init_multihost()
    monkeypatch.setenv("DCLIP_NUM_PROCESSES", "2")
    monkeypatch.setenv("DCLIP_PROCESS_ID", "")  # empty counts as unset
    with pytest.raises(SystemExit, match="DCLIP_PROCESS_ID"):
        init_multihost()


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(corpus, extra_args):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env.update({
        # Standalone CPU runtime: the axon site hook must not register
        # (a wedged tunnel would hang backend init), and each process
        # gets 4 virtual devices.
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             "--pid", str(pid), "--coordinator", f"127.0.0.1:{port}",
             "--corpus", corpus, *extra_args],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return sorted(outs, key=lambda r: r["pid"])


@pytest.mark.slow
@pytest.mark.parametrize(
    "extra_args,steps,use_cache,mesh_model",
    [
        ([], 1, False, 1),
        # Two steps with the teacher-target cache: step 0 misses and
        # writes this process's rows (multihost.local_rows), step 1 hits
        # and reassembles the global targets via put_sharded.
        (["--steps", "2", "--teacher_cache"], 2, True, 1),
        # Data x model mesh: batch rows replicated across the model axis;
        # local_rows/put_sharded must dedupe/assemble correctly.
        (["--mesh_model", "2"], 1, False, 2),
        # Fast paths x multihost: shard_mapped Pallas kernels (interpret)
        # + per-shard caption packing, with the packed row bucket agreed
        # across processes via allgather — must still bit-match the
        # single-process run with the same flags.
        (["--use_pallas", "--packed_text"], 1, False, 1),
    ],
    ids=["plain", "cache-hit", "dp-x-mp", "pallas-packed"],
)
def test_two_process_distill_step_matches_single_process(
    tmp_path, extra_args, steps, use_cache, mesh_model
):
    """REAL 2-process jax.distributed run vs single-process, same corpus."""
    corpus, items = _corpus(tmp_path, n=16)
    r0, r1 = _run_pair(corpus, extra_args)
    # Both processes ran the SAME global computation.
    assert r0["loss"] == r1["loss"]
    assert r0["checksum"] == r1["checksum"]

    # Single-process 8-device reference on the same corpus (this pytest
    # process already holds 8 virtual CPU devices via conftest).
    import jax
    import jax.numpy as jnp

    from dclip_tpu.core.config import (
        CLIPConfig,
        DistillConfig,
        MeshConfig,
        TeacherConfig,
    )
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.models.teacher import PatchTextAggregation
    from dclip_tpu.parallel.mesh import make_mesh
    from dclip_tpu.train.distill_trainer import DistillTrainer

    clip_cfg = CLIPConfig.tiny_test()
    teacher_cfg = TeacherConfig(
        embed_dim=clip_cfg.projection_dim, num_heads=4, max_patches=2,
        max_text_tokens=clip_cfg.text.max_length,
    )
    model = CLIPModule(clip_cfg)
    clip_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, clip_cfg.text.max_length), jnp.int32),
        jnp.zeros((1, clip_cfg.vision.image_size,
                   clip_cfg.vision.image_size, 3)),
    )
    teacher = PatchTextAggregation(teacher_cfg)
    tparams = teacher.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, teacher_cfg.max_text_tokens, clip_cfg.projection_dim)),
        jnp.zeros((1, teacher_cfg.max_patches, clip_cfg.projection_dim)),
    )["params"]
    cache = build_cache([i["image_path"] for i in items], GridProposalDetector())
    pipe = MultiModalPipeline(
        items, HashTokenizer(max_length=clip_cfg.text.max_length), cache,
        batch_size=8, max_patches=2,
        image_size=clip_cfg.vision.image_size,
        teacher_image_size=clip_cfg.vision.image_size,
        seed=7, num_threads=1,
    )
    cfg = DistillConfig(
        train_batch_size=8, learning_rate=1e-3, warmup_steps=1,
        accumulate_grad_batches=1, teacher=teacher_cfg,
        student_model="tiny", teacher_clip_model="tiny",
        use_pallas=True if "--use_pallas" in extra_args else None,
        packed_text=True if "--packed_text" in extra_args else None,
    )
    from dclip_tpu.train.distill_trainer import TeacherTargetCache

    devices = jax.devices("cpu")[:8]
    trainer = DistillTrainer(
        cfg, clip_vars, clip_vars, tparams, clip_cfg, clip_cfg,
        mesh=make_mesh(
            MeshConfig(model_parallel=mesh_model), devices=devices
        ),
        teacher_cache=TeacherTargetCache(salt="mh-test") if use_cache else None,
    )
    batch = next(iter(pipe.epoch(0)))
    for _ in range(steps):
        want = float(trainer.train_step_on_batch(batch)["loss"])
    np.testing.assert_allclose(r0["loss"], want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_multihost_cli_preemption_lockstep(tmp_path):
    """SIGTERM ONE of two real processes mid-training: the guard's
    all-gather agreement must stop BOTH at the same step boundary (a
    unilateral stop would hang the peer inside the next collective and
    time this test out), save one `.preempt.` checkpoint on process 0,
    and exit 0 from both CLIs."""
    import time

    from PIL import Image

    rng = np.random.RandomState(4)
    items = []
    for i in range(16):
        p = str(tmp_path / f"p{i}.png")
        Image.fromarray(rng.randint(0, 255, (36, 28, 3), np.uint8)).save(p)
        items.append({"image_path": p, "captions": [f"thing {i}"],
                      "dataset": "t", "boxes": []})
    train = tmp_path / "pre_train.json"
    train.write_text(json.dumps(items))
    ckpt_dir = tmp_path / "ckpts"
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update({
            "PYTHONPATH": REPO,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "DCLIP_COORDINATOR": f"127.0.0.1:{port}",
            "DCLIP_NUM_PROCESSES": "2",
            "DCLIP_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "dclip_tpu.cli.train_distill",
             "--multihost", "--train_file", str(train),
             "--train_batch_size", "8", "--phase1_epochs", "300",
             "--checkpoint_dir", str(ckpt_dir),
             "--metrics_csv", str(tmp_path / f"metrics_{pid}.csv"),
             "--teacher_image_size", "32", "--max_patches", "2",
             "--model_preset", "tiny"],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    # Wait for the first per-epoch checkpoint (fit() is definitely inside
    # the guard by then), then preempt ONLY process 0.
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        if ckpt_dir.is_dir() and any(
            f.endswith(".msgpack") for f in os.listdir(ckpt_dir)
        ):
            break
        if any(p.poll() is not None for p in procs):
            break  # fall through to the returncode asserts with stderr
        time.sleep(0.05)
    procs[0].send_signal(signal.SIGTERM)
    outs = []
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"p{pid} rc={p.returncode}:\n{err[-4000:]}"
        outs.append(out)
    # BOTH processes took the graceful path (agreement, not unilateral).
    for pid, out in enumerate(outs):
        assert "Preempted (SIGTERM)" in out, f"p{pid} stdout:\n{out[-2000:]}"
    preempt = [f for f in os.listdir(ckpt_dir) if ".preempt." in f]
    assert len(preempt) == 1, os.listdir(ckpt_dir)
    # 300 epochs did NOT run to completion: the stop really was early.
    assert "Best model" not in outs[0]


@pytest.mark.slow
def test_multihost_cli_train_distill(tmp_path):
    """The full `cli.train_distill --multihost` path across 2 real
    processes: jax.distributed init (env triple), per-process pipeline
    sharding, and checkpoint/metrics writes on process 0 only."""
    from PIL import Image

    rng = np.random.RandomState(2)
    items = []
    for i in range(10):
        p = str(tmp_path / f"c{i}.png")
        Image.fromarray(rng.randint(0, 255, (36, 28, 3), np.uint8)).save(p)
        items.append({"image_path": p, "captions": [f"thing {i}"],
                      "dataset": "t", "boxes": []})
    train = tmp_path / "mh_train.json"
    train.write_text(json.dumps(items))
    ckpt_dir = tmp_path / "ckpts"
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update({
            "PYTHONPATH": REPO,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "DCLIP_COORDINATOR": f"127.0.0.1:{port}",
            "DCLIP_NUM_PROCESSES": "2",
            "DCLIP_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "dclip_tpu.cli.train_distill",
             "--multihost", "--train_file", str(train),
             "--train_batch_size", "8", "--phase1_epochs", "1",
             "--checkpoint_dir", str(ckpt_dir),
             "--metrics_csv", str(tmp_path / f"metrics_{pid}.csv"),
             "--teacher_image_size", "32", "--max_patches", "2",
             "--model_preset", "tiny"],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"p{pid} failed:\n{err[-4000:]}"
    # Checkpoints written exactly once (process 0).
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack")]
    assert ckpts, os.listdir(ckpt_dir)
    # Process 1's logger/checkpoints are gated off (is_primary): its
    # metrics CSV must not exist even as an empty file.
    assert not os.path.exists(tmp_path / "metrics_1.csv")

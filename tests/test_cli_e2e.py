"""End-to-end CLI pipeline on synthetic data: the full reference workflow
(precache -> teacher -> distill -> retrieval eval -> zero-shot eval) with
the documented flag contracts (README.md:20-81 order)."""
import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("e2e")
    imgs = root / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    items = []
    for i in range(12):
        p = str(imgs / f"img{i}.png")
        Image.fromarray((rng.rand(40, 48, 3) * 255).astype("uint8")).save(p)
        items.append(
            {"image_path": p, "captions": [f"a photo of thing {i}"],
             "dataset": "syn", "boxes": []}
        )
    (root / "syn_train.json").write_text(json.dumps(items[:10]))
    (root / "syn_val.json").write_text(json.dumps(items[10:]))
    (root / "syn_eval.json").write_text(
        json.dumps(
            [{"image_path": it["image_path"], "image_id": i, "captions": it["captions"]}
             for i, it in enumerate(items)]
        )
    )
    cdir = root / "cifar" / "cifar-10-batches-py"
    cdir.mkdir(parents=True)
    with open(cdir / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": (rng.rand(8, 3072) * 255).astype("uint8"),
             b"labels": list(rng.randint(0, 10, 8))}, f)
    with open(cdir / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"c{i}".encode() for i in range(10)]}, f)
    return root


MODEL_FLAGS = ["--model_preset", "tiny", "--mesh_data", "1"]


@pytest.mark.deadline(900)  # full 5-CLI drive on a 1-core host
def test_full_cli_pipeline(workspace, monkeypatch):
    monkeypatch.chdir(workspace)
    from dclip_tpu.cli import (
        flickr30k_eval,
        precache,
        train_distill,
        train_teacher,
        zero_shot_eval,
    )

    # 1. precache (train_pickle + compute_faiss role)
    assert precache.main(
        ["--json_file", "syn_train.json", "--cache_dir", "cache",
         "--build_index", "--batch_size", "16"] + MODEL_FLAGS[:2]
    ) == 0
    assert os.path.exists("cache/syn_train_precache.npz")
    assert os.path.exists("cache/syn_train_patch_index.npz")

    # 2. teacher training
    assert train_teacher.main(
        ["--train_file", "syn_train.json", "--val_file", "syn_val.json",
         "--epochs", "1", "--batch_size", "5", "--learning_rate", "1e-3",
         "--output_path", "models/teacher",
         "--detection_cache", "cache/syn_train_precache.npz",
         "--max_patches", "4", "--teacher_image_size", "32"] + MODEL_FLAGS
    ) == 0
    teacher_ckpts = [f for f in os.listdir("models") if f.endswith(".msgpack")]
    assert teacher_ckpts, "teacher checkpoint written"
    assert "val" in teacher_ckpts[0]  # val-loss-stamped filename

    # 3. distillation
    assert train_distill.main(
        ["--train_file", "syn_train.json", "--train_batch_size", "5",
         "--phase1_epochs", "1", "--checkpoint_dir", "ckpts",
         "--accumulate_grad_batches", "1",
         "--teacher_checkpoint", os.path.join("models", teacher_ckpts[0]),
         "--detection_cache", "cache/syn_train_precache.npz",
         "--max_patches", "4", "--teacher_image_size", "32"] + MODEL_FLAGS
    ) == 0
    student_ckpts = [f for f in os.listdir("ckpts") if f.endswith(".msgpack")]
    assert student_ckpts

    # 4. retrieval eval (base vs custom table)
    assert flickr30k_eval.main(
        ["--dataset_json", "syn_eval.json", "--max_images", "12",
         "--model", "both", "--checkpoint", os.path.join("ckpts", student_ckpts[0]),
         "--batch_size", "12"] + MODEL_FLAGS[:2]
    ) == 0

    # 5. zero-shot eval + results file in the reference format
    assert zero_shot_eval.main(
        ["--dataset", "cifar10", "--data_dir", "cifar", "--model", "both",
         "--checkpoint", os.path.join("ckpts", student_ckpts[0]),
         "--batch_size", "8"] + MODEL_FLAGS[:2]
    ) == 0
    body = open("cifar_zero_shot_results.txt").read()
    assert body.startswith("Zero-Shot CIFAR Results")
    assert "Base CLIP Top-1:" in body and "Relative Change:" in body


def test_tune_gate_cli(workspace, monkeypatch, capsys):
    """Threshold-sweep utility (reference image_tokenizer.py:490-529):
    prints a knn/fallback table per threshold over a corpus sample."""
    monkeypatch.chdir(workspace)
    from dclip_tpu.cli import precache, tune_gate

    if not os.path.exists("cache/syn_train_patch_index.npz"):
        assert precache.main(
            ["--json_file", "syn_train.json", "--cache_dir", "cache",
             "--build_index", "--batch_size", "16"] + MODEL_FLAGS[:2]
        ) == 0
    assert tune_gate.main(
        ["--json_file", "syn_train.json",
         "--detection_cache", "cache/syn_train_precache.npz",
         "--knn_store", "cache/syn_train_patch_index.npz",
         "--sample", "6", "--max_patches", "4", "--image_size", "32",
         "--thresholds", "0.6", "0.85", "0.95"] + MODEL_FLAGS[:2]
    ) == 0
    out = capsys.readouterr().out
    assert "Gate sweep over 6 items" in out
    assert "threshold" in out and "knn%" in out
    # Three threshold rows, knn fraction monotonically non-increasing.
    rows = [
        line.split() for line in out.splitlines()
        if line[:4] in ("0.60", "0.85", "0.95")
    ]
    assert len(rows) == 3
    fracs = [float(r[1]) for r in rows]
    assert fracs[0] >= fracs[1] >= fracs[2]


def test_doctor_collect_fast():
    """cli.doctor: environment diagnosis returns the full key set and
    ok=True on a healthy backend."""
    from dclip_tpu.cli.doctor import collect

    info = collect(fast=True)
    assert info["ok"] is True
    for key in ("versions", "backend", "devices", "process",
                "matmul_smoke", "native_runtime"):
        assert key in info, key
    assert info["devices"]["count"] >= 1


def test_profile_cli(capsys):
    """cli.profile: phase decomposition sums sensibly and both output
    modes carry the full field set (reference: no profiling subsystem,
    SURVEY.md §5 — this is the TPU build's one-command equivalent)."""
    import json

    from dclip_tpu.cli import profile

    assert profile.main(
        ["--model_preset", "tiny", "--batch", "4", "--steps", "2"]
    ) == 0
    out = capsys.readouterr().out
    assert "full uncached step" in out
    assert "teacher patch encode" in out
    assert "student step (cache-warm)" in out
    assert "MFU uncached" in out

    assert profile.main(
        ["--model_preset", "tiny", "--batch", "4", "--steps", "2", "--json"]
    ) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    for key in ("phases_ms", "images_per_sec_uncached",
                "images_per_sec_cache_warm", "mfu_uncached",
                "use_pallas", "compute_dtype"):
        assert key in rec, key
    ph = rec["phases_ms"]
    full = ph["full uncached step"]
    # Isolated sub-phases can each exceed their in-step share (no overlap
    # with dispatch), but a pathological decomposition (a phase orders of
    # magnitude above the step it is part of) must fail loudly. 20x is
    # deliberately loose: tiny-model CPU timings are dispatch-dominated.
    assert full > 0
    for phase in ("teacher patch encode", "teacher tail (text+xattn)",
                  "student step (cache-warm)"):
        assert 0 < ph[phase] < 20 * full, (phase, ph[phase], full)

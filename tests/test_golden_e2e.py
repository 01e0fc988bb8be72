"""Golden end-to-end real-weight validation (VERDICT r1 item 4).

Pins the whole ready-to-run path against torch/HF ground truth with REAL
artifacts: an HF `CLIPModel` checkpoint written to disk as safetensors
(generated locally — zero-egress), real JPEG files decoded by both stacks,
and the full eval harness (`eval.retrieval.evaluate_retrieval`). Any drift
in the weight importer, the CLIPProcessor-parity preprocessing, the
encoders, or the ranking semantics (eval_scripts/flickr30k_eval.py:16-88)
fails this test with identical-rank precision.

Uses the tiny architecture (same code path as the full presets — layer
count and widths are config, not code) because a real ViT-B/16 forward
on this CPU would take minutes per batch.
"""
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dclip_tpu.core.config import CLIPConfig  # noqa: E402
from dclip_tpu.data.tokenizer import HashTokenizer  # noqa: E402
from dclip_tpu.eval.retrieval import evaluate_retrieval  # noqa: E402
from dclip_tpu.models.clip import CLIPModule  # noqa: E402
from dclip_tpu.models.hf_import import load_pretrained  # noqa: E402

N_IMAGES = 16


@pytest.fixture(scope="module")
def golden_workspace(tmp_path_factory):
    """Tiny HF CLIPModel saved as safetensors + 16 real JPEGs + eval JSON."""
    import torch
    import transformers

    root = tmp_path_factory.mktemp("golden")
    cfg = CLIPConfig.tiny_test()
    hf_cfg = transformers.CLIPConfig(
        text_config={
            "vocab_size": cfg.text.vocab_size,
            "hidden_size": cfg.text.hidden_size,
            "intermediate_size": cfg.text.mlp_dim,
            "num_hidden_layers": cfg.text.num_layers,
            "num_attention_heads": cfg.text.num_heads,
            "max_position_embeddings": cfg.text.max_length,
            "eos_token_id": cfg.text.eos_token_id,
            "bos_token_id": cfg.text.eos_token_id - 1,
            "pad_token_id": cfg.text.eos_token_id,
        },
        vision_config={
            "hidden_size": cfg.vision.hidden_size,
            "intermediate_size": cfg.vision.mlp_dim,
            "num_hidden_layers": cfg.vision.num_layers,
            "num_attention_heads": cfg.vision.num_heads,
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
        },
        projection_dim=cfg.projection_dim,
    )
    torch.manual_seed(0)
    hf_model = transformers.CLIPModel(hf_cfg).eval()
    snapshot = root / "clip_snapshot"
    hf_model.save_pretrained(str(snapshot), safe_serialization=True)

    from PIL import Image

    rng = np.random.RandomState(7)
    items = []
    for i in range(N_IMAGES):
        # Non-square, varied sizes: exercises shortest-side resize + crop.
        h, w = int(40 + 8 * (i % 3)), int(48 + 6 * (i % 4))
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        path = str(root / f"img{i}.jpg")
        Image.fromarray(arr).save(path, "JPEG", quality=90)  # REAL jpeg
        items.append(
            {
                "image_path": path,
                "image_id": i,
                "captions": [f"object number {i} alpha", f"scene {i} beta"],
            }
        )
    eval_json = root / "eval.json"
    eval_json.write_text(json.dumps(items))
    return root, snapshot, items, cfg, hf_model


def _reference_metrics(cap_emb, img_emb, caption_to_image):
    """Reference rank semantics (flickr30k_eval.py:16-88) in plain numpy,
    independent of dclip_tpu.ops.retrieval."""
    cap = cap_emb / np.linalg.norm(cap_emb, axis=1, keepdims=True)
    img = img_emb / np.linalg.norm(img_emb, axis=1, keepdims=True)
    sim = cap @ img.T  # [C, I]
    c2i = np.asarray(caption_to_image)

    t2i_ranks = []
    for c in range(sim.shape[0]):
        order = np.argsort(-sim[c])
        t2i_ranks.append(int(np.where(order == c2i[c])[0][0]))
    i2t_ranks = []
    for i in range(sim.shape[1]):
        order = np.argsort(-sim[:, i])
        rank_of = np.empty_like(order)
        rank_of[order] = np.arange(len(order))
        gt = np.where(c2i == i)[0]
        i2t_ranks.append(int(rank_of[gt].min()))

    def metrics(ranks):
        r = np.asarray(ranks, np.float32)
        return {
            "R@1": float((r < 1).mean()),
            "R@5": float((r < 5).mean()),
            "R@10": float((r < 10).mean()),
            "MAP": float((1.0 / (r + 1.0)).mean()),
        }

    return {"t2i": metrics(t2i_ranks), "i2t": metrics(i2t_ranks)}


def test_golden_retrieval_matches_torch(golden_workspace):
    import torch
    import transformers

    root, snapshot, items, cfg, hf_model = golden_workspace
    size = cfg.vision.image_size
    tok = HashTokenizer(
        vocab_size=cfg.text.vocab_size, max_length=cfg.text.max_length
    )

    # --- torch ground truth: HF processor decode+preprocess, HF encoders.
    from PIL import Image

    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": size},
        crop_size={"height": size, "width": size},
    )
    pil = [Image.open(it["image_path"]).convert("RGB") for it in items]
    pixel_values = proc(images=pil, return_tensors="pt")["pixel_values"]
    captions, caption_to_image = [], []
    for idx, it in enumerate(items):
        for cap in it["captions"]:
            captions.append(cap)
            caption_to_image.append(idx)
    ids, mask = tok.encode_batch(captions)
    with torch.no_grad():
        t_img = hf_model.get_image_features(pixel_values=pixel_values).numpy()
        t_cap = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).numpy()
    ref = _reference_metrics(t_cap, t_img, caption_to_image)

    # --- ours: safetensors import -> eval harness (real JPEG decode inside).
    params = load_pretrained(str(snapshot), cfg)
    model = CLIPModule(cfg)
    ours = evaluate_retrieval(
        model, {"params": params}, tok, items, batch_size=8, image_size=size
    )

    for direction in ("t2i", "i2t"):
        for metric in ("R@1", "R@5", "R@10", "MAP"):
            assert ours[direction][metric] == pytest.approx(
                ref[direction][metric], abs=1e-6
            ), f"{direction}/{metric}: ours={ours[direction]} ref={ref[direction]}"


def test_golden_embeddings_bitclose(golden_workspace):
    """Importer + preprocessing parity at the embedding level on real JPEGs
    (tighter than rank equality: catches sub-rank drift early)."""
    import torch
    import transformers

    root, snapshot, items, cfg, hf_model = golden_workspace
    size = cfg.vision.image_size
    from PIL import Image

    from dclip_tpu.eval.retrieval import embed_images

    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": size},
        crop_size={"height": size, "width": size},
    )
    paths = [it["image_path"] for it in items]
    pil = [Image.open(p).convert("RGB") for p in paths]
    with torch.no_grad():
        t_img = hf_model.get_image_features(
            pixel_values=proc(images=pil, return_tensors="pt")["pixel_values"]
        ).numpy()
    params = load_pretrained(str(snapshot), cfg)
    model = CLIPModule(cfg)
    ours = embed_images(model, {"params": params}, paths, batch_size=8,
                        image_size=size)
    scale = np.abs(t_img).max()
    assert np.abs(ours - t_img).max() / scale < 2e-4


def test_runbook_cli_dryrun(golden_workspace, tmp_path, monkeypatch, capsys):
    """docs/RUNBOOK.md commands 1 and 2, executed via the CLI mains with
    the REAL-weights argument path (--clip_weights <hf snapshot dir>) and
    the golden safetensors checkpoint standing in for a mounted
    openai/clip-vit-base-patch16 (VERDICT r2 missing #1 / next #3).

    Pins the exact flags a maintainer will type plus the output formats
    documented in the runbook."""
    import pickle

    import flax.serialization

    from dclip_tpu.cli import flickr30k_eval, zero_shot_eval

    root, snapshot, items, cfg, hf_model = golden_workspace
    monkeypatch.chdir(tmp_path)

    # A "distilled" checkpoint for --model both: the imported params with
    # the vision projection scaled (any real checkpoint is params-shaped).
    params = load_pretrained(str(snapshot), cfg)
    perturbed = jax.tree_util.tree_map(lambda x: x, params)
    perturbed["visual_projection"]["kernel"] = (
        perturbed["visual_projection"]["kernel"] * 1.05
    )
    ckpt = tmp_path / "distilled.msgpack"
    ckpt.write_bytes(
        flax.serialization.msgpack_serialize(
            {"params": flax.serialization.to_state_dict(perturbed)}
        )
    )

    # --- Runbook command 1: Flickr30k retrieval, base vs custom.
    rc = flickr30k_eval.main([
        "--dataset_json", str(root / "eval.json"), "--max_images", "1000",
        "--model", "both", "--checkpoint", str(ckpt),
        "--model_preset", "tiny", "--clip_weights", str(snapshot),
        "--tokenizer_dir", "hash", "--batch_size", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"Evaluating on {len(items)} images" in out
    for label in ("Text -> Image Retrieval", "Image -> Text Retrieval"):
        assert label in out
    header = "Model        R@1        R@5        R@10       MAP"
    assert out.count(header) == 2
    base_rows = [l for l in out.splitlines() if l.startswith("base ")]
    custom_rows = [l for l in out.splitlines() if l.startswith("custom ")]
    assert len(base_rows) == 2 and len(custom_rows) == 2
    for row in base_rows + custom_rows:
        vals = [float(v) for v in row.split()[1:]]
        assert len(vals) == 4 and all(0.0 <= v <= 1.0 for v in vals)
    assert out.count("Relative R@1 gain:") == 2

    # --- Runbook command 2: CIFAR-10 zero-shot with a results file.
    rng = np.random.RandomState(3)
    cdir = tmp_path / "cifar" / "cifar-10-batches-py"
    cdir.mkdir(parents=True)
    with open(cdir / "test_batch", "wb") as f:
        pickle.dump(
            {b"data": (rng.rand(8, 3072) * 255).astype("uint8"),
             b"labels": list(rng.randint(0, 10, 8))}, f)
    with open(cdir / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"c{i}".encode() for i in range(10)]}, f)

    rc = zero_shot_eval.main([
        "--dataset", "cifar10", "--data_dir", str(tmp_path / "cifar"),
        "--model", "both", "--checkpoint", str(ckpt),
        "--model_preset", "tiny", "--clip_weights", str(snapshot),
        "--tokenizer_dir", "hash",
        "--results_file", "cifar_zero_shot_results.txt",
    ])
    assert rc == 0
    body = (tmp_path / "cifar_zero_shot_results.txt").read_text()
    assert body.startswith("Zero-Shot CIFAR Results")
    # Reference body format (CIFAR_zeroshot.py:203-214): one line per model
    # with Top-1 and Top-5 together, plus the relative change.
    for line in ("Base CLIP Top-1:", "Custom Model Top-1:",
                 "Relative Change:"):
        assert line in body, body
    assert ", Top-5:" in body

"""Retrieval ranking vs a verbatim-semantics numpy port of the reference's
calculate_retrieval_metrics (eval_scripts/flickr30k_eval.py:16-88)."""
import numpy as np

import jax.numpy as jnp

from dclip_tpu.ops import retrieval_metrics, similarity_matrix, t2i_ranks, i2t_ranks


def _reference_metrics(similarity, image_ids, caption_image_ids):
    """Numpy port of flickr30k_eval.py:16-88 (loops and all)."""
    from collections import defaultdict

    img_to_captions = defaultdict(list)
    for i, img_id in enumerate(caption_image_ids):
        img_to_captions[img_id].append(i)
    t2i = []
    for ci, gt in enumerate(caption_image_ids):
        gt_idx = image_ids.index(gt)
        order = np.argsort(-similarity[ci])
        t2i.append(int(np.where(order == gt_idx)[0][0]))
    i2t = []
    for ii, img_id in enumerate(image_ids):
        gt_caps = img_to_captions.get(img_id, [])
        if not gt_caps:
            continue
        order = np.argsort(-similarity[:, ii])
        i2t.append(min(int(np.where(order == g)[0][0]) for g in gt_caps))

    def r_at_k(ranks, k):
        return len([r for r in ranks if r < k]) / len(ranks)

    def mean_ap(ranks):
        return float(np.mean([1.0 / (r + 1) for r in ranks]))

    return {
        "t2i": {f"R@{k}": r_at_k(t2i, k) for k in (1, 5, 10)} | {"MAP": mean_ap(t2i)},
        "i2t": {f"R@{k}": r_at_k(i2t, k) for k in (1, 5, 10)} | {"MAP": mean_ap(i2t)},
        "t2i_ranks": t2i,
        "i2t_ranks": i2t,
    }


def _setup(seed=0, n_images=20, caps_per_image=5, d=8):
    rng = np.random.RandomState(seed)
    img = rng.randn(n_images, d).astype(np.float32)
    cap = rng.randn(n_images * caps_per_image, d).astype(np.float32)
    cap_to_img = np.repeat(np.arange(n_images), caps_per_image)
    return img, cap, cap_to_img


def test_ranks_match_reference():
    img, cap, cap_to_img = _setup()
    sim = np.asarray(similarity_matrix(jnp.asarray(cap), jnp.asarray(img)))
    ref = _reference_metrics(sim, list(range(img.shape[0])), list(cap_to_img))
    got_t2i = np.asarray(t2i_ranks(jnp.asarray(sim), jnp.asarray(cap_to_img)))
    got_i2t = np.asarray(i2t_ranks(jnp.asarray(sim), jnp.asarray(cap_to_img), chunk=7))
    np.testing.assert_array_equal(got_t2i, ref["t2i_ranks"])
    np.testing.assert_array_equal(got_i2t, ref["i2t_ranks"])


def test_metrics_match_reference():
    img, cap, cap_to_img = _setup(seed=1)
    got = retrieval_metrics(jnp.asarray(cap), jnp.asarray(img), jnp.asarray(cap_to_img))
    imn = img / np.linalg.norm(img, axis=1, keepdims=True)
    capn = cap / np.linalg.norm(cap, axis=1, keepdims=True)
    ref = _reference_metrics(capn @ imn.T, list(range(img.shape[0])), list(cap_to_img))
    for d in ("t2i", "i2t"):
        for k in ("R@1", "R@5", "R@10", "MAP"):
            assert np.isclose(float(got[d][k]), ref[d][k], atol=1e-6), (d, k)


def test_tie_breaking_matches_numpy_argsort():
    # Constant similarities: every rank decided purely by stable tie-break.
    sim = np.zeros((10, 4), np.float32)
    cap_to_img = np.array([0, 0, 1, 1, 2, 2, 3, 3, 0, 1])
    ref = _reference_metrics(sim, list(range(4)), list(cap_to_img))
    got_t2i = np.asarray(t2i_ranks(jnp.asarray(sim), jnp.asarray(cap_to_img)))
    got_i2t = np.asarray(i2t_ranks(jnp.asarray(sim), jnp.asarray(cap_to_img), chunk=3))
    np.testing.assert_array_equal(got_t2i, ref["t2i_ranks"])
    np.testing.assert_array_equal(got_i2t, ref["i2t_ranks"])


def test_perfect_retrieval():
    img = np.eye(6, 8, dtype=np.float32)
    cap = np.repeat(img, 2, axis=0)  # 2 captions per image, identical
    cap_to_img = np.repeat(np.arange(6), 2)
    got = retrieval_metrics(jnp.asarray(cap), jnp.asarray(img), jnp.asarray(cap_to_img))
    assert float(got["t2i"]["R@1"]) == 1.0
    assert float(got["i2t"]["R@1"]) == 1.0
    assert float(got["i2t"]["MAP"]) == 1.0


def test_sharded_metrics_bit_parity(cpu_devices):
    """retrieval_metrics_sharded == retrieval_metrics on a CPU mesh, with
    row counts NOT divisible by the mesh (pad rows masked) and with a
    constant-similarity block so stable tie-breaking is exercised."""
    from dclip_tpu.core.config import MeshConfig
    from dclip_tpu.ops.retrieval import retrieval_metrics_sharded
    from dclip_tpu.parallel.mesh import make_mesh

    img, cap, cap_to_img = _setup(seed=3, n_images=13, caps_per_image=3)
    cap[10:20] = cap[10]  # exact duplicate rows -> similarity ties
    mesh = make_mesh(MeshConfig(data_parallel=4), devices=cpu_devices[:4])
    want = retrieval_metrics(
        jnp.asarray(cap), jnp.asarray(img), jnp.asarray(cap_to_img)
    )
    got = retrieval_metrics_sharded(
        jnp.asarray(cap), jnp.asarray(img), jnp.asarray(cap_to_img), mesh,
        i2t_chunk=2,  # 13 images -> two host chunks + a padded tail
    )
    for d in ("t2i", "i2t"):
        for k in ("R@1", "R@5", "R@10"):
            # Ranks are exact, so recall fractions match bit-for-bit.
            assert float(got[d][k]) == float(want[d][k]), (d, k)
        # MAP sums reciprocals in a different (sharded) reduction order:
        # equal to f32 roundoff, not bitwise.
        np.testing.assert_allclose(
            float(got[d]["MAP"]), float(want[d]["MAP"]), atol=1e-6
        )


def test_sharded_eval_end_to_end(cpu_devices, tmp_path):
    """evaluate_retrieval(mesh=...) == evaluate_retrieval() through the
    real embed paths on a tiny model."""
    import jax

    from PIL import Image

    from dclip_tpu.core.config import CLIPConfig, MeshConfig
    from dclip_tpu.data.tokenizer import HashTokenizer
    from dclip_tpu.eval.retrieval import evaluate_retrieval
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.parallel.mesh import make_mesh

    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    rng = np.random.RandomState(5)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    items = []
    for i in range(6):
        p = str(tmp_path / f"e{i}.png")
        Image.fromarray(rng.randint(0, 255, (40, 30, 3), np.uint8)).save(p)
        items.append({"image_path": p, "image_id": i,
                      "captions": [f"cap {i} a", f"cap {i} b"]})
    tok = HashTokenizer(max_length=cfg.text.max_length)
    mesh = make_mesh(MeshConfig(data_parallel=4), devices=cpu_devices[:4])
    want = evaluate_retrieval(model, variables, tok, items, batch_size=4,
                              image_size=cfg.vision.image_size)
    got = evaluate_retrieval(model, variables, tok, items, batch_size=4,
                             image_size=cfg.vision.image_size, mesh=mesh)
    for d in ("t2i", "i2t"):
        for k in ("R@1", "R@5", "R@10", "MAP"):
            np.testing.assert_allclose(got[d][k], want[d][k], atol=1e-6), (d, k)


def test_packed_caption_embed_parity(cpu_devices):
    """embed_captions(packed=True) must reproduce the unpacked embeddings
    bit-close and in the same caption order — through the tail-padded
    chunk path (captions not a batch multiple). Under a mesh (since round
    5) captions pack PER DATA SHARD with globalized eos rows and stay
    packed — same numerics."""
    import jax

    from dclip_tpu.core.config import CLIPConfig, MeshConfig
    from dclip_tpu.data.tokenizer import HashTokenizer
    from dclip_tpu.eval.retrieval import embed_captions
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.parallel.mesh import make_mesh

    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    tok = HashTokenizer(max_length=cfg.text.max_length)
    captions = [f"tile number {i} " + "x " * (i % 5) for i in range(11)]

    want = embed_captions(model, variables, tok, captions, batch_size=4)
    got = embed_captions(model, variables, tok, captions, batch_size=4,
                         packed=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    mesh = make_mesh(MeshConfig(data_parallel=4), devices=cpu_devices[:4])
    sharded = embed_captions(model, variables, tok, captions[:8],
                             batch_size=4, mesh=mesh, packed=True)
    np.testing.assert_allclose(sharded, want[:8], rtol=2e-5, atol=1e-6)

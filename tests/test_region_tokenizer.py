"""RegionTokenizer facade + context views + complexity scorer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig
from dclip_tpu.data.embedding_store import EmbeddingStore
from dclip_tpu.data.text_complexity import ComplexityScorer, WordVectors
from dclip_tpu.data.tokenizer import HashTokenizer
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.models.region_tokenizer import RegionTokenizer
from dclip_tpu.ops.image_ops import black_out_boxes


@pytest.fixture(scope="module")
def clip_setup():
    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    return cfg, model, variables


def test_black_out_boxes():
    imgs = jnp.ones((1, 8, 8, 3))
    boxes = jnp.asarray([[[2.0, 2.0, 5.0, 6.0], [0.0, 0.0, 0.0, 0.0]]])
    out = np.asarray(black_out_boxes(imgs, boxes))
    assert out.shape == (1, 2, 8, 8, 3)
    assert out[0, 0, 3, 3, 0] == 0.0  # inside box -> blacked
    assert out[0, 0, 7, 7, 0] == 1.0  # outside -> untouched
    np.testing.assert_allclose(out[0, 1], 1.0)  # degenerate box -> identity


def test_region_tokenizer_knn_hits_and_fallback(clip_setup):
    cfg, model, variables = clip_setup
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[[0, 0, 32, 32], [4, 4, 20, 20]]] * 2, np.float32)
    )
    mask = jnp.ones((2, 2), jnp.float32)

    # Store seeded with the actual crop embeddings -> threshold 0.99 hits.
    tok_empty = RegionTokenizer(model, variables, None,
                                patch_size=cfg.vision.image_size)
    raw = tok_empty.batch_tokenize(images, boxes, mask)
    assert (np.asarray(raw.source) == 2).all()  # no store, no projection -> clip

    store = EmbeddingStore(dim=cfg.projection_dim)
    flat = np.asarray(raw.embeddings).reshape(-1, cfg.projection_dim)
    store.add_batch([f"p{i}" for i in range(len(flat))], flat)
    tok = RegionTokenizer(model, variables, store,
                          similarity_threshold=0.99,
                          patch_size=cfg.vision.image_size)
    hit = tok.batch_tokenize(images, boxes, mask)
    assert (np.asarray(hit.source) == 0).all()
    assert (np.asarray(hit.similarity) > 0.99).all()
    # Positions normalized to [0, 1].
    assert float(jnp.max(hit.positions)) <= 1.0 + 1e-6


def test_evaluate_threshold_sweep_monotone(clip_setup):
    cfg, model, variables = clip_setup
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    boxes = jnp.asarray(np.array([[[0, 0, 32, 32], [8, 8, 24, 24]]] * 2, np.float32))
    mask = jnp.ones((2, 2), jnp.float32)
    store = EmbeddingStore(dim=cfg.projection_dim)
    store.add_batch(
        ["r0", "r1"], rng.randn(2, cfg.projection_dim).astype(np.float32)
    )
    tok = RegionTokenizer(model, variables, store,
                          patch_size=cfg.vision.image_size)
    sweep = tok.evaluate_threshold(images, boxes, mask,
                                   thresholds=[0.0, 0.5, 1.01])
    # knn fraction must be non-increasing in the threshold.
    fracs = [sweep[k]["knn_fraction"] for k in sorted(sweep)]
    assert fracs[0] == 1.0  # threshold 0: everything hits
    assert fracs == sorted(fracs, reverse=True)
    assert sweep[1.01]["knn_fraction"] == 0.0


def test_complexity_scorer_token_factor():
    tok = HashTokenizer()

    class FakeTok:
        def tokenize(self, w):
            return [0] * max(len(w) // 3, 1)  # longer word -> more subwords

    scorer = ComplexityScorer(FakeTok())
    assert scorer.compute_word_complexity("cat") == 0.0
    assert scorer.compute_word_complexity("abcdef") == 0.3
    assert scorer.compute_word_complexity("abcdefghi") == 0.6
    assert scorer.compute_word_complexity("abcdefghijklmnop") == 0.8
    marked = scorer.mark_complex_words("cat abcdefghi cat")
    assert marked == "cat [MASK] cat"
    del tok


def test_complexity_scorer_with_vectors(tmp_path):
    glove = tmp_path / "glove.txt"
    glove.write_text(
        "cat 1.0 0.0\nkitten 0.99 0.1\nfeline 0.98 0.15\ndog 0.2 0.9\n"
    )
    vectors = WordVectors.load_glove_txt(str(glove))

    class OneTok:
        def tokenize(self, w):
            return [0]

    scorer = ComplexityScorer(OneTok(), vectors)
    # "cat" has close neighbors -> low embedding score; token score 0.
    assert scorer.compute_word_complexity("cat") < 0.2
    # OOV word > 2 chars -> 0.4 * 0.9 = 0.36.
    assert np.isclose(scorer.compute_word_complexity("zebra"), 0.36)
    # Threshold 0.35: OOV word masked.
    assert scorer.mark_complex_words("cat zebra") == "cat [MASK]"

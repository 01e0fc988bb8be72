"""BERT encoder parity vs torch transformers.BertModel (random weights) and
the BERT->CLIP projection path (reference text_tokenizer.py:27-39)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dclip_tpu.models.bert import (  # noqa: E402
    BertConfig,
    BertEncoder,
    bert_to_clip_features,
    convert_bert_state_dict,
)


@pytest.fixture(scope="module")
def bert_pair():
    import torch
    import transformers

    cfg = BertConfig.tiny_test()
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.mlp_dim,
        max_position_embeddings=cfg.max_length,
        type_vocab_size=cfg.type_vocab_size,
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg).eval()
    params = convert_bert_state_dict(hf.state_dict(), cfg)
    return cfg, hf, params


def test_bert_parity_with_torch(bert_pair):
    import torch

    cfg, hf, params = bert_pair
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        )
        t_hidden = out.last_hidden_state.numpy()
        t_pooled = out.pooler_output.numpy()

    model = BertEncoder(cfg)
    hidden, pooled = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(hidden), t_hidden, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), t_pooled, rtol=2e-4, atol=2e-5)


def test_bert_import_from_prefixed_state_dict(bert_pair):
    cfg, hf, params = bert_pair
    prefixed = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    params2 = convert_bert_state_dict(prefixed, cfg)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bert_to_clip_projection_path(bert_pair):
    """BERT pooled -> TextProjectionModule -> CLIP-width embedding, the
    wiring the reference loads but never runs (deviation closed here)."""
    from dclip_tpu.models.projections import TextProjectionModule

    cfg, hf, params = bert_pair
    clip_dim = 16
    proj = TextProjectionModule(clip_dim=clip_dim, hidden_dim=32)
    pparams = proj.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.hidden_size))
    )["params"]
    model = BertEncoder(cfg)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, size=(4, 10))
    out = bert_to_clip_features(
        model, params,
        lambda x: proj.apply({"params": pparams}, x),
        jnp.asarray(ids, jnp.int32),
    )
    assert out.shape == (4, clip_dim)
    assert np.all(np.isfinite(np.asarray(out)))


# -- WordPiece tokenizer (reference text_tokenizer.py:27-39) -------------------


def _vocab_file(tmp_path):
    tokens = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "the", "cat", "dog", "run", "##ning", "##s", "##ed", "jump",
        "a", "photo", "of", "un", "##believ", "##able", "over",
        ",", ".", "!", "?", "-", "'", '"',
        "naive", "cafe", "hello", "world", "12", "##3", "中", "国",
    ]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(tokens) + "\n", encoding="utf-8")
    return str(p)


TEXTS = [
    "The cat runs over the dog!",
    "a photo of a running cat, unbelievable.",
    "naïve café-dog 123",
    "hello 中国 world",
    "  whitespace\t\teverywhere   ",
    "unknownword the",
    "",
]


def test_wordpiece_parity_with_hf(tmp_path):
    import transformers

    from dclip_tpu.data.bert_tokenizer import BertWordPieceTokenizer

    vf = _vocab_file(tmp_path)
    hf = transformers.BertTokenizer(vocab_file=vf, do_lower_case=True)
    ours = BertWordPieceTokenizer.from_vocab_file(vf, max_length=16)
    for text in TEXTS:
        expected = hf(
            text, padding="max_length", truncation=True, max_length=16
        )
        ids, mask = ours.encode(text)
        np.testing.assert_array_equal(ids, expected["input_ids"])
        np.testing.assert_array_equal(mask, expected["attention_mask"])


def test_wordpiece_batch_and_truncation(tmp_path):
    from dclip_tpu.data.bert_tokenizer import BertWordPieceTokenizer

    ours = BertWordPieceTokenizer.from_vocab_file(
        _vocab_file(tmp_path), max_length=8
    )
    ids, mask = ours.encode_batch(["the cat " * 20, "dog"])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == ours.cls_id and ids[0, -1] == ours.sep_id
    assert mask[0].sum() == 8  # truncated to the max
    assert ids[1, -1] == ours.pad_id


def test_bert_text_branch_end_to_end(tmp_path, bert_pair):
    """Raw string -> WordPiece ids (HF-identical) -> BertEncoder ->
    TextProjectionModule -> CLIP-width vector (VERDICT r2 missing #2)."""
    import transformers

    from dclip_tpu.data.bert_tokenizer import BertWordPieceTokenizer
    from dclip_tpu.models.bert import bert_to_clip_features
    from dclip_tpu.models.projections import TextProjectionModule

    cfg, hf_model, params = bert_pair
    vf = _vocab_file(tmp_path)
    tok = BertWordPieceTokenizer.from_vocab_file(vf, max_length=12)
    hf_tok = transformers.BertTokenizer(vocab_file=vf, do_lower_case=True)
    texts = ["a photo of the running dog", "unbelievable cat!"]
    ids, mask = tok.encode_batch(texts)
    expected = hf_tok(
        list(texts), padding="max_length", truncation=True, max_length=12
    )
    np.testing.assert_array_equal(ids, expected["input_ids"])

    clip_dim = 16
    proj = TextProjectionModule(clip_dim=clip_dim, hidden_dim=32)
    pparams = proj.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.hidden_size))
    )["params"]
    model = BertEncoder(cfg)
    out = bert_to_clip_features(
        model, params,
        lambda x: proj.apply({"params": pparams}, x),
        jnp.asarray(ids % cfg.vocab_size, jnp.int32),
        jnp.asarray(mask, jnp.int32),
    )
    assert out.shape == (len(texts), clip_dim)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_wordpiece_fuzz_parity_with_hf(tmp_path):
    """Property fuzz vs transformers.BertTokenizer over a hostile pool
    (unicode, CJK, zero-width/nbsp, punctuation runs) — same guarantee
    the CLIP BPE fuzz pins in tests/test_tokenizer.py."""
    import random

    import transformers

    from dclip_tpu.data.bert_tokenizer import BertWordPieceTokenizer

    vf = _vocab_file(tmp_path)
    hf = transformers.BertTokenizer(vocab_file=vf, do_lower_case=True)
    ours = BertWordPieceTokenizer.from_vocab_file(vf, max_length=16)
    pool = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n  .,!?;:'\"-()[]/&%$#@*+=<>"
        "àéîöüñçß"
        "中国日本語한국"
        "🙂🚀"
        "​ "  # zero-width space, nbsp
    )
    rng = random.Random(7)
    for i in range(150):
        n = rng.randint(0, 40)
        text = "".join(rng.choice(pool) for _ in range(n))
        want = hf(text, padding="max_length", truncation=True, max_length=16)
        ids, mask = ours.encode(text)
        assert list(ids) == want["input_ids"], (i, repr(text))
        assert list(mask) == want["attention_mask"], (i, repr(text))

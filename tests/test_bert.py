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

"""Caption sequence packing (ops/packing.py + the packed text-encoder
branch): packed pooled features must equal per-caption encoding exactly
(same positional codes, same within-caption causal visibility, same EOS
pooling), and gradients through the packed path must match too."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.ops.packing import (
    pack_captions,
    packed_attention_bias,
    packed_rows_bucket,
)


def _caption_batch(clip_cfg, b=8, seed=0):
    """Variable-length captions: BOS .. content .. EOS .. padding."""
    rng = np.random.RandomState(seed)
    t = clip_cfg.text.max_length
    ids = np.zeros((b, t), np.int32)
    mask = np.zeros((b, t), np.int32)
    for i in range(b):
        n = rng.randint(3, t // 2 + 1)  # content incl BOS/EOS
        row = rng.randint(1, clip_cfg.text.vocab_size - 2, size=n)
        row[-1] = clip_cfg.text.eos_token_id
        ids[i, :n] = row
        mask[i, :n] = 1
    return ids, mask


def test_pack_captions_layout():
    cfg = CLIPConfig.tiny_test()
    ids, mask = _caption_batch(cfg, b=8, seed=1)
    eos = cfg.text.eos_token_id
    p = pack_captions(ids, mask, eos)
    r, s = p["packed_ids"].shape
    assert s == ids.shape[1]
    assert r == packed_rows_bucket(r_min_rows(ids, mask, s), 8)
    for b in range(len(ids)):
        n = mask[b].sum()
        row, col = p["packed_eos_rows"][b], p["packed_eos_cols"][b]
        # The EOS token landed where the map says.
        assert p["packed_ids"][row, col] == eos
        # The caption's content is contiguous in its row with its own
        # segment id, positions restarting at 0.
        seg = p["packed_segments"][row, col]
        cols = np.where(p["packed_segments"][row] == seg)[0]
        assert len(cols) == n
        np.testing.assert_array_equal(p["packed_ids"][row, cols], ids[b, :n])
        np.testing.assert_array_equal(
            p["packed_positions"][row, cols], np.arange(n)
        )
    # Padding slots are segment 0 / id 0 / position 0.
    pad = p["packed_segments"] == 0
    assert (p["packed_ids"][pad] == 0).all()
    assert (p["packed_positions"][pad] == 0).all()


def r_min_rows(ids, mask, s):
    lengths = np.maximum(mask.sum(1), 1)
    # FFD row count, replayed.
    used = []
    for n in sorted(lengths, reverse=True):
        for i, u in enumerate(used):
            if u + n <= s:
                used[i] += n
                break
        else:
            used.append(n)
    return len(used)


def test_packed_attention_bias_semantics():
    seg = jnp.asarray([[1, 1, 2, 2, 0]])
    bias = np.asarray(packed_attention_bias(seg))[0, 0]
    neg = np.finfo(np.float32).min
    # Within segment 1: causal.
    assert bias[1, 0] == 0 and bias[0, 1] == neg
    # Across segments: blocked both ways.
    assert bias[2, 1] == neg and bias[1, 2] == neg
    # Padding row attends itself (finite softmax), never serves as a key
    # for real queries.
    assert bias[4, 4] == 0 and bias[0, 4] == neg and bias[4, 0] == neg


@pytest.mark.slow
def test_packed_text_features_parity_and_grads():
    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    ids, mask = _caption_batch(cfg, b=8, seed=2)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(ids), jnp.zeros(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)
        ),
    )
    p = pack_captions(ids, mask, cfg.text.eos_token_id)
    assert p["packed_ids"].shape[0] < len(ids)  # actually packed denser

    unpacked = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask),
        method=model.get_text_features,
    )
    packed = model.apply(
        variables,
        jnp.asarray(p["packed_ids"]), jnp.asarray(p["packed_segments"]),
        jnp.asarray(p["packed_positions"]),
        jnp.asarray(p["packed_eos_rows"]), jnp.asarray(p["packed_eos_cols"]),
        method=model.get_packed_text_features,
    )
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(unpacked), rtol=2e-5, atol=2e-5
    )

    # Gradients wrt params agree between the two encodings.
    target = np.asarray(
        np.random.RandomState(3).randn(*unpacked.shape), np.float32
    )

    def loss_unpacked(params):
        f = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            method=model.get_text_features,
        )
        return jnp.mean((f - target) ** 2)

    def loss_packed(params):
        f = model.apply(
            {"params": params},
            jnp.asarray(p["packed_ids"]), jnp.asarray(p["packed_segments"]),
            jnp.asarray(p["packed_positions"]),
            jnp.asarray(p["packed_eos_rows"]),
            jnp.asarray(p["packed_eos_cols"]),
            method=model.get_packed_text_features,
        )
        return jnp.mean((f - target) ** 2)

    gu = jax.grad(loss_unpacked)(variables["params"])
    gp = jax.grad(loss_packed)(variables["params"])
    flat_u = jax.tree_util.tree_leaves_with_path(gu)
    flat_p = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(gp)
    )
    checked = 0
    for k, vu in flat_u:
        name = jax.tree_util.keystr(k)
        if "text_model" not in name and "text_projection" not in name:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_p[name]), np.asarray(vu), rtol=5e-4, atol=1e-5,
            err_msg=name,
        )
        checked += 1
    assert checked >= 10  # embeddings, per-layer weights, projection


def test_pack_captions_sharded_layout_and_local_rows():
    """Per-shard packing: each contiguous row block packs independently
    into the SAME row count; eos rows are shard-LOCAL; globalize_eos_rows
    recovers indices into the concatenated arrays; n_shards=1 degenerates
    to pack_captions exactly."""
    from dclip_tpu.ops.packing import (
        globalize_eos_rows,
        pack_captions_sharded,
    )

    cfg = CLIPConfig.tiny_test()
    ids, mask = _caption_batch(cfg, b=8, seed=5)
    eos = cfg.text.eos_token_id
    p = pack_captions_sharded(ids, mask, eos, n_shards=4)
    r_total = p["packed_ids"].shape[0]
    rows = int(p["rows_per_shard"])
    assert r_total == 4 * rows
    b_shard = 2
    g = globalize_eos_rows(p, 4)
    for b in range(len(ids)):
        shard = b // b_shard
        # Local rows index within the shard's block.
        assert 0 <= p["packed_eos_rows"][b] < rows
        grow, col = g["packed_eos_rows"][b], p["packed_eos_cols"][b]
        assert grow // rows == shard
        assert p["packed_ids"][grow, col] == eos
        # Full caption content lives in the shard's block, contiguous.
        n = mask[b].sum()
        seg = p["packed_segments"][grow, col]
        cols = np.where(p["packed_segments"][grow] == seg)[0]
        assert len(cols) == n
        np.testing.assert_array_equal(p["packed_ids"][grow, cols], ids[b, :n])

    # n_shards=1 == pack_captions.
    p1 = pack_captions_sharded(ids, mask, eos, n_shards=1)
    ref = pack_captions(ids, mask, eos)
    for k in ref:
        np.testing.assert_array_equal(p1[k], ref[k])

    # Forced rows: multihost processes agree on one R.
    pf = pack_captions_sharded(ids, mask, eos, n_shards=2, rows_per_shard=4)
    assert pf["packed_ids"].shape[0] == 8
    # Forcing fewer rows than a shard needs raises (silent truncation would
    # drop captions).
    full_ids = np.full((4, ids.shape[1]), 7, np.int32)
    full_ids[:, -1] = eos
    full_mask = np.ones_like(full_ids)
    with pytest.raises(ValueError, match="forced rows_per_shard"):
        pack_captions_sharded(
            full_ids, full_mask, eos, n_shards=2, rows_per_shard=1
        )
    with pytest.raises(ValueError, match="not divisible"):
        pack_captions_sharded(ids, mask, eos, n_shards=3)


def test_pack_captions_sharded_parity_with_unpacked():
    """Packed-sharded features (globalized rows, plain gather) equal the
    unpacked per-caption encoding — per-shard packing preserves semantics."""
    from dclip_tpu.ops.packing import (
        globalize_eos_rows,
        pack_captions_sharded,
    )

    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    ids, mask = _caption_batch(cfg, b=8, seed=6)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(ids),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    p = globalize_eos_rows(
        pack_captions_sharded(ids, mask, cfg.text.eos_token_id, n_shards=4), 4
    )
    unpacked = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask),
        method=model.get_text_features,
    )
    packed = model.apply(
        variables,
        jnp.asarray(p["packed_ids"]), jnp.asarray(p["packed_segments"]),
        jnp.asarray(p["packed_positions"]),
        jnp.asarray(p["packed_eos_rows"]), jnp.asarray(p["packed_eos_cols"]),
        method=model.get_packed_text_features,
    )
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(unpacked), rtol=2e-5, atol=2e-5
    )


def test_pack_captions_full_length_degenerates_gracefully():
    """All-77-token captions cannot pack: R == B and output equals the
    unpacked encoding (1 caption per row, segment 1 everywhere valid)."""
    cfg = CLIPConfig.tiny_test()
    t = cfg.text.max_length
    rng = np.random.RandomState(4)
    ids = rng.randint(1, cfg.text.vocab_size - 2, size=(4, t)).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    mask = np.ones((4, t), np.int32)
    p = pack_captions(ids, mask, cfg.text.eos_token_id)
    assert p["packed_ids"].shape[0] == 4
    assert (p["packed_segments"] == 1).all()

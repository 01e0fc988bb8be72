"""Caption sequence packing: fewer, denser text-encoder rows.

CLIP pads every caption to max_length=77 (reference text_tokenizer.py:13),
but real captions run ~10-30 tokens — so the unpacked text tower spends
most of its FLOPs on padding positions. Packing places several captions'
CONTENT tokens into one 77-token row and encodes the batch in R << B
rows; per-caption semantics are preserved exactly by three mechanisms:

- segment ids: attention is blocked across captions sharing a row
  (`packed_attention_bias` — within-segment causal, exactly the mask the
  unpacked causal+padding combination induces inside one caption);
- positions: the position-embedding index restarts at 0 for each segment,
  so every token sees the same positional code as unpacked;
- EOS gather: pooled features are read at each caption's own EOS
  (row, col), in the ORIGINAL caption order, so downstream losses are
  unchanged.

Packing itself is a HOST step (first-fit-decreasing over content lengths,
deterministic) over the pipeline's numpy batch; the packed row count is
bucketed (`packed_rows_bucket`) so jit retraces stay bounded like the
patch-compaction budgets (models/teacher.patch_budget).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp


def packed_attention_bias(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """[B, S] int segment ids (0 = padding) -> additive [B, 1, S, S] bias.

    Allowed = same segment AND key position <= query position (causal
    within the caption). Padding attends padding (0 == 0), keeping its
    softmax rows finite — padding tokens are blocked as KEYS for every
    real query and are never gathered, so their garbage never propagates.
    """
    s = segment_ids.shape[-1]
    idx = jnp.arange(s)
    allowed = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
        idx[None, None, :] <= idx[None, :, None]
    )
    neg = jnp.finfo(jnp.float32).min
    return jnp.where(allowed, 0.0, neg)[:, None].astype(jnp.float32)


def packed_rows_bucket(min_rows: int, batch: int, n_buckets: int = 4) -> int:
    """Smallest bucket (multiples of batch/n_buckets) covering min_rows —
    bounded distinct R values -> bounded student-step retraces."""
    step = max(batch // n_buckets, 1)
    bucket = ((max(min_rows, 1) + step - 1) // step) * step
    return min(bucket, batch)


def pack_captions(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    eos_token_id: int,
    n_buckets: int = 4,
) -> Dict[str, np.ndarray]:
    """First-fit-decreasing packing of B captions into R rows of width S.

    Returns numpy fields (device transfer is the caller's job):
      packed_ids [R, S] int32        token ids, 0-padded
      packed_segments [R, S] int32   1..k per row, 0 on padding
      packed_positions [R, S] int32  within-caption position index
      packed_eos_rows [B] int32      (row, col) of caption b's EOS token
      packed_eos_cols [B] int32

    Content of caption b = its first `attention_mask[b].sum()` tokens
    (BOS..EOS; CLIP masks cover exactly that span). R is bucketed via
    `packed_rows_bucket`; extra rows are left all-padding.
    """
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)
    b, s = ids.shape
    lengths = mask.sum(axis=1).astype(np.int64)
    # A caption with no mask would lose its EOS anchor; give it 1 token.
    lengths = np.maximum(lengths, 1)
    eos_off = np.argmax(ids == eos_token_id, axis=1)
    has_eos = (ids == eos_token_id).any(axis=1)
    eos_off = np.where(has_eos, eos_off, lengths - 1)
    # EOS must live inside the copied span.
    lengths = np.maximum(lengths, eos_off + 1)

    order = np.argsort(-lengths, kind="stable")  # FFD: longest first
    row_used: list = []
    placement = np.empty((b, 2), np.int64)  # (row, start) per caption
    for cap in order:
        need = int(lengths[cap])
        for r, used in enumerate(row_used):
            if used + need <= s:
                placement[cap] = (r, used)
                row_used[r] = used + need
                break
        else:
            placement[cap] = (len(row_used), 0)
            row_used.append(need)

    rows = packed_rows_bucket(len(row_used), b, n_buckets)
    packed_ids = np.zeros((rows, s), np.int32)
    segments = np.zeros((rows, s), np.int32)
    positions = np.zeros((rows, s), np.int32)
    eos_rows = np.empty(b, np.int32)
    eos_cols = np.empty(b, np.int32)
    seg_counter = np.zeros(rows, np.int32)
    for cap in range(b):
        r, start = placement[cap]
        n = int(lengths[cap])
        seg_counter[r] += 1
        packed_ids[r, start:start + n] = ids[cap, :n]
        segments[r, start:start + n] = seg_counter[r]
        positions[r, start:start + n] = np.arange(n)
        eos_rows[cap] = r
        eos_cols[cap] = start + int(eos_off[cap])
    return {
        "packed_ids": packed_ids,
        "packed_segments": segments,
        "packed_positions": positions,
        "packed_eos_rows": eos_rows,
        "packed_eos_cols": eos_cols,
    }

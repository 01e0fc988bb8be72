"""Streamed top-k retrieval kernel: scores + selection in one pass.

The XLA path (`ops.knn.knn_search`) materializes the full [Q, N] score
matrix in HBM before `top_k`. For stores beyond a few hundred thousand rows
that matrix dominates HBM traffic (and can exceed memory outright). This
kernel streams the store through VMEM in row blocks, computing each block's
scores on the MXU and folding them into a running top-k that lives in a
VMEM scratch across grid steps — the [Q, N] matrix never exists.

Grid iteration on TPU is sequential, so the scratch carries state from
block to block (the standard accumulator pattern). Selection per step is
`top_k(concat(running, block_topk))` — k is small (<=64), the concat is
[Q, 2k].

Parity vs the XLA path is pinned in tests (interpret mode on CPU, compiled
on TPU when the tunnel cooperates). Indices match on ties because both
paths resolve ties by ascending index.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BIG_IDX = 2**30


def _select_topk(scores, idx, k):
    """k-fold (max, min-index-on-tie) selection — jax.lax.top_k has no
    Pallas TPU lowering, and min-index tie-breaking matches the XLA
    knn_search/argsort-stable contract exactly.

    scores/idx [Q, M] -> ([Q, k], [Q, k]) descending.
    """
    out_s, out_i = [], []
    for _ in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)  # [Q, 1]
        is_max = scores == m
        pick = jnp.min(jnp.where(is_max, idx, _BIG_IDX), axis=1)  # [Q]
        out_s.append(m[:, 0])
        out_i.append(pick)
        scores = jnp.where(idx == pick[:, None], -jnp.inf, scores)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1).astype(jnp.int32)


def _kernel(k, block_n, n_real, q_ref, s_ref, out_s_ref, out_i_ref, run_s, run_i):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        run_s[...] = jnp.full_like(run_s, -jnp.inf)
        run_i[...] = jnp.full_like(run_i, _BIG_IDX)

    scores = jax.lax.dot_general(
        q_ref[...],
        s_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, block_n]
    base = step * block_n
    idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    # Padded sentinel rows must never enter the top-k (a zero score would
    # beat genuinely negative real scores).
    scores = jnp.where(idx < n_real, scores, -jnp.inf)

    cand_s = jnp.concatenate([run_s[...], scores], axis=1)  # [Q, k+block_n]
    cand_i = jnp.concatenate([run_i[...], idx], axis=1)
    new_s, new_i = _select_topk(cand_s, cand_i, k)
    run_s[...] = new_s
    run_i[...] = new_i

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_s_ref[...] = run_s[...]
        out_i_ref[...] = run_i[...]


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def topk_streamed(
    queries: jnp.ndarray,  # [Q, D]
    store: jnp.ndarray,  # [N, D]
    k: int = 3,
    block_n: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores [Q, k], indices [Q, k]) descending, FAISS/knn_search contract.

    N is padded to a block multiple with -inf-scoring sentinel rows.
    """
    qn, d = queries.shape
    n = store.shape[0]
    k = min(k, n)
    pad = (-n) % block_n
    if pad:
        store = jnp.concatenate(
            [store, jnp.zeros((pad, d), store.dtype)], axis=0
        )
    n_pad = store.shape[0]
    grid = n_pad // block_n

    out_s, out_i = pl.pallas_call(
        functools.partial(_kernel, k, block_n, n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((qn, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qn, k), jnp.float32),
            pltpu.VMEM((qn, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n_pad * d,
            bytes_accessed=4 * (qn * d + n_pad * d + 2 * qn * k),
            transcendentals=0,
        ),
    )(queries.astype(jnp.float32), store.astype(jnp.float32))

    return out_s, out_i

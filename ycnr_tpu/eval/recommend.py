"""Top-N recommendation serving (SURVEY.md C13, call stack 3.5).

scores = U[u] . V^T with already-rated items masked to -inf, then top-k —
exactly the reference's serving path, run fully on device and batched:

* ``recommend_all``: scans the user-major blocked layout, so the rated-item
  masks come straight from the training layout (no per-user host work). This
  is the throughput path behind the "top-10 recs/sec" metric (BASELINE.json:2).
* ``recommend_users``: ad-hoc user list; the rated lists are sliced on host
  (the reference reads them from Postgres) and padded to one rectangle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.models.base import MFState
from ycnr_tpu.ops.gram import BlockData
from ycnr_tpu.ops.layout import BlockedCSR

NEG_INF = -3.0e38  # large-negative fill (safe in fp32, avoids inf-inf NaNs)


def topn_block(U, V, bu, bi, mu, blk: BlockData, n: int):
    """Masked top-n for one layout block: scores U[slots] . V^T with this
    block's rated pairs set to -inf. Shared by the single-chip and sharded
    serving paths (U/bu may be a local shard; blk.entity_ids index into U)."""
    n_items = V.shape[0] - 1
    rows = U[blk.entity_ids]  # [U_B, k]
    scores = (mu + bu[blk.entity_ids][:, None] + bi[None, :] + rows @ V.T)
    U_B = blk.entity_ids.shape[0]
    slot = jnp.minimum(blk.chunk_seg, U_B - 1)  # padding chunks -> safe row
    flat_rows = jnp.repeat(slot, blk.other_idx.shape[1])
    flat_cols = blk.other_idx.reshape(-1)  # padding -> col n_items
    scores = scores.at[flat_rows, flat_cols].set(NEG_INF)
    scores = scores.at[:, n_items].set(NEG_INF)  # trash column off
    top_s, top_i = lax.top_k(scores, n)
    return top_i.astype(jnp.int32), top_s


@partial(jax.jit, static_argnames=("n",))
def _topn_blocks(state: MFState, layout: BlockedCSR, n: int):
    """[NB, U_B, n] top items + scores per entity slot, rated items masked."""

    def body(_, blk_arrays):
        blk = BlockData(*blk_arrays)
        return None, topn_block(state.U, state.V, state.bu, state.bi,
                                state.mu, blk, n)

    _, (ids, sc) = lax.scan(body, None, tuple(layout))
    return ids, sc


def recommend_all(state: MFState, user_layout: BlockedCSR, n: int = 10):
    """Top-N for every user with >=1 training rating.

    Returns (user_ids [m], item_ids [m, n], scores [m, n]) as numpy.
    """
    ids, sc = _topn_blocks(state, user_layout, n)
    eids = np.asarray(user_layout.entity_ids).reshape(-1)
    ids = np.asarray(ids).reshape(-1, n)
    sc = np.asarray(sc).reshape(-1, n)
    real = eids < state.n_users
    return eids[real], ids[real], sc[real]


@partial(jax.jit, static_argnames=("n",))
def _topn_users(state: MFState, user_ids: jnp.ndarray,
                rated_padded: jnp.ndarray, n: int):
    n_items = state.V.shape[0] - 1
    rows = state.U[user_ids]
    scores = (state.mu + state.bu[user_ids][:, None] + state.bi[None, :]
              + rows @ state.V.T)
    b = jax.lax.broadcasted_iota(jnp.int32, rated_padded.shape, 0)
    scores = scores.at[b.reshape(-1), rated_padded.reshape(-1)].set(NEG_INF)
    scores = scores.at[:, n_items].set(NEG_INF)
    return lax.top_k(scores, n)


def sort_ratings_by_user(train_u, train_i):
    """One-time host index for serving: (sorted_u, sorted_i). Build once and
    pass to recommend_users to avoid re-sorting the COO per request."""
    train_u = np.asarray(train_u)
    train_i = np.asarray(train_i)
    order = np.argsort(train_u, kind="stable")
    return train_u[order], train_i[order]


def recommend_users(state: MFState, train_u, train_i, user_ids, n: int = 10,
                    sorted_index=None):
    """Top-N for an explicit user list (the reference's recommend(userId, N)
    entry). Rated lists are gathered host-side and padded with n_items.

    sorted_index: optional (sorted_u, sorted_i) from sort_ratings_by_user —
    pass it for repeated serving so the O(nnz log nnz) sort happens once.
    The mask width is padded to a power of two so the jitted scorer compiles
    once per width bucket rather than once per distinct rated-count.
    """
    su, si = sorted_index if sorted_index is not None else (
        sort_ratings_by_user(train_u, train_i))
    user_ids = np.asarray(user_ids, np.int32)
    lists = []
    for u in user_ids:
        s, t = np.searchsorted(su, u), np.searchsorted(su, u, side="right")
        lists.append(si[s:t])
    width = max(8, max((len(x) for x in lists), default=1))
    width = 1 << int(np.ceil(np.log2(width)))  # bound recompilations
    rated = np.full((len(user_ids), width), state.n_items, np.int32)
    for j, x in enumerate(lists):
        rated[j, : len(x)] = x
    top_s, top_i = _topn_users(state, jnp.asarray(user_ids),
                               jnp.asarray(rated), n)
    return np.asarray(top_i), np.asarray(top_s)

"""Fold-in: factors for new/updated users at serving time, no retraining.

The reference can only recommend for users present at training (its factors
live in shm written by the last training run; SURVEY.md call stack 3.5). A
production recommender constantly sees new users and fresh ratings, so this
adds the standard MF fold-in: holding the trained item factors V fixed,
solve the SAME per-user normal equation the ALS U-step solves for one ad-hoc
rating list —

    explicit (ALS-WR):  (V_rᵀ V_r + λ n I) u = V_rᵀ r          [Appendix A]
    implicit (iALS):    (VᵀV + α V_rᵀ diag(r) V_r + λI) u = V_rᵀ(1 + αr)

and recommend from the folded row. Batched over users and jitted; rating
lists are padded to pow2 widths (compile-count bound, zero-row trick masks
the padding: index n_items hits V's zero row).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.eval.recommend import NEG_INF
from ycnr_tpu.models.base import MFState


@partial(jax.jit, static_argnames=("implicit",))
def _fold_in(V, G, item_idx, rating, bias, mu, lam, alpha, implicit: bool):
    """Solve the per-user normal equations for padded rating lists.

    V [n_items+1, k] (zero last row); G [k, k] the cached base Gram
    V[:-1]ᵀV[:-1] (only read on the implicit path — pass a [0, 0] dummy
    for explicit); item_idx [m, L] padded with n_items; rating [m, L]
    padded with 0; bias [n_items+1] the OTHER side's trained bias terms
    (zero for ALS/iALS states). Returns factors [m, k].
    """
    Vr = V[item_idx]  # [m, L, k]; padding rows are zero
    k = V.shape[1]
    mask = (item_idx < V.shape[0] - 1).astype(V.dtype)
    if implicit:
        # base Gram over ALL items + confidence correction over rated ones
        A = (G[None] + alpha * jnp.einsum("mlk,ml,mle->mke", Vr, rating, Vr)
             + lam * jnp.eye(k, dtype=V.dtype))
        # padding contributes nothing: its Vr rows are V's zero row
        b = jnp.einsum("mlk,ml->mk", Vr, 1.0 + alpha * rating)
    else:
        # fit the factor to the RESIDUAL r - (mu + b_i): for biased (SGD)
        # states the baseline is carried by mu/biases, and serving re-adds
        # them (predict = mu + b_i + u.v) — solving on raw r would double-
        # count it. ALS/iALS states have mu = biases = 0, so this is the
        # plain Appendix-A solve there. (masked so padding stays 0)
        resid = (rating - (mu + bias[item_idx])) * mask
        n_r = jnp.sum(mask, axis=1)
        A = (jnp.einsum("mlk,mle->mke", Vr, Vr)
             + (lam * n_r + (n_r == 0))[:, None, None]
             * jnp.eye(k, dtype=V.dtype))
        b = jnp.einsum("mlk,ml->mk", Vr, resid)
    cf = jax.scipy.linalg.cho_factor(A)
    return jax.scipy.linalg.cho_solve(cf, b)


_GRAM_CACHE: dict = {}  # id(V) -> (V, G); V kept alive so its id is stable


@jax.jit
def _base_gram(V):
    return V[:-1].T @ V[:-1]


def _item_gram(V):
    """Cached base Gram VᵀV for the implicit fold-in solve: recomputing it
    per request costs ~2·n·k² FLOPs (≈220 MFLOP for a 27k×64 V) for a
    result that only changes when a new epoch is published."""
    key = id(V)
    hit = _GRAM_CACHE.get(key)
    if hit is not None and hit[0] is V:
        return hit[1]
    G = _base_gram(V)
    if len(_GRAM_CACHE) >= 8:  # a serving process holds a handful of states
        _GRAM_CACHE.clear()
    _GRAM_CACHE[key] = (V, G)
    return G


def _pad_lists(item_lists, rating_lists, n_items, dtype):
    m = len(item_lists)
    width = max(8, max((len(x) for x in item_lists), default=1))
    width = 1 << int(np.ceil(np.log2(width)))
    idx = np.full((m, width), n_items, np.int32)
    r = np.zeros((m, width), dtype)
    for j, (ii, rr) in enumerate(zip(item_lists, rating_lists)):
        idx[j, : len(ii)] = ii
        r[j, : len(rr)] = rr
    return idx, r


def _fold_in_padded(state: MFState, idx, r, dtype, lam, alpha):
    G = (_item_gram(state.V) if alpha is not None
         else jnp.zeros((0, 0), state.V.dtype))
    return np.asarray(_fold_in(state.V, G, jnp.asarray(idx), jnp.asarray(r),
                               state.bi, state.mu,
                               dtype.type(lam), dtype.type(alpha or 0.0),
                               alpha is not None))


def fold_in_users(state: MFState, item_lists: Sequence,
                  rating_lists: Sequence, lam: float = 0.05,
                  alpha: Optional[float] = None) -> np.ndarray:
    """Factors [m, k] for m ad-hoc users given their (item_ids, ratings)
    lists. alpha=None -> explicit ALS-WR solve; alpha set -> implicit iALS
    confidence solve (ratings are the raw confidence inputs)."""
    dtype = np.dtype(state.U.dtype) if state.U.dtype != jnp.bfloat16 \
        else np.float32
    idx, r = _pad_lists(item_lists, rating_lists, state.n_items, dtype)
    return _fold_in_padded(state, idx, r, dtype, lam, alpha)


def fold_in_items(state: MFState, user_lists: Sequence,
                  rating_lists: Sequence, lam: float = 0.05,
                  alpha: Optional[float] = None) -> np.ndarray:
    """Factors [m, k] for m ad-hoc ITEMS from (user_ids, ratings) lists —
    the symmetric V-step solve against the trained user factors (a new
    catalog item becomes recommendable without retraining)."""
    dtype = np.dtype(state.V.dtype) if state.V.dtype != jnp.bfloat16 \
        else np.float32
    idx, r = _pad_lists(user_lists, rating_lists, state.n_users, dtype)
    # the jitted solve is symmetric in U/V: pass U as the fixed factor
    G = (_item_gram(state.U) if alpha is not None
         else jnp.zeros((0, 0), state.U.dtype))
    return np.asarray(_fold_in(state.U, G, jnp.asarray(idx), jnp.asarray(r),
                               state.bu, state.mu,
                               dtype.type(lam), dtype.type(alpha or 0.0),
                               alpha is not None))


@partial(jax.jit, static_argnames=("n",))
def _topn_rows(rows, V, bi, mu, rated_padded, n: int):
    n_items = V.shape[0] - 1
    scores = mu + bi[None, :] + rows @ V.T
    b = lax.broadcasted_iota(jnp.int32, rated_padded.shape, 0)
    scores = scores.at[b.reshape(-1), rated_padded.reshape(-1)].set(NEG_INF)
    scores = scores.at[:, n_items].set(NEG_INF)
    return lax.top_k(scores, n)


def recommend_fold_in(state: MFState, item_lists: Sequence,
                      rating_lists: Sequence, n: int = 10,
                      lam: float = 0.05, alpha: Optional[float] = None):
    """Top-N for ad-hoc users straight from their rating lists (fold-in +
    masked top-k). Returns (items [m, n], scores [m, n]). The users' own
    rated items are masked exactly like the trained serving path."""
    dtype = np.dtype(state.U.dtype) if state.U.dtype != jnp.bfloat16 \
        else np.float32
    n = min(int(n), state.n_items)  # top_k crashes past the catalog size
    idx, r = _pad_lists(item_lists, rating_lists, state.n_items, dtype)
    rows = _fold_in_padded(state, idx, r, dtype, lam, alpha)
    top_s, top_i = _topn_rows(jnp.asarray(rows, state.V.dtype), state.V,
                              state.bi, state.mu, jnp.asarray(idx), n)
    return np.asarray(top_i), np.asarray(top_s)

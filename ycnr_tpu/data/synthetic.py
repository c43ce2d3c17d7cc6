"""Synthetic ratings generator.

The reference imports MovieLens into PostgreSQL (SURVEY.md C7, call stack
3.1). This environment has no network (SURVEY.md §7), so the primary dataset
source is a controllable synthetic generator: a planted low-rank model with
power-law entity popularity, which reproduces the padding-waste profile of
real MovieLens/Netflix data (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import numpy as np


def synthetic_ratings(
    n_users: int,
    n_items: int,
    n_ratings: int,
    true_rank: int = 8,
    noise: float = 0.25,
    seed: int = 0,
    rating_levels: bool = True,
    power_law: float = 1.0,
):
    """Sample (user, item, rating) COO from a planted rank-`true_rank` model.

    Popularity of users and items follows an approximate Zipf distribution
    with exponent ``power_law`` (0 disables). Duplicate (u, i) pairs are
    removed, so the returned nnz may be slightly below ``n_ratings``.
    """
    rng = np.random.default_rng(seed)

    def zipf_probs(n: int) -> np.ndarray:
        if power_law <= 0:
            return np.full(n, 1.0 / n)
        p = 1.0 / np.arange(1, n + 1) ** power_law
        rng.shuffle(p)
        return p / p.sum()

    pu = zipf_probs(n_users)
    pi = zipf_probs(n_items)
    # sample in rounds, deduping (u, i) cumulatively, until the target count
    # is reached (zipf-concentrated popularity collides heavily, so a single
    # oversampled draw can fall far short)
    seen = np.zeros(0, np.int64)
    for _ in range(12):
        short = n_ratings - len(seen)
        if short <= 0:
            break
        m = int(short * 1.6) + 16
        uu = rng.choice(n_users, size=m, p=pu).astype(np.int64)
        ii = rng.choice(n_items, size=m, p=pi).astype(np.int64)
        seen = np.unique(np.concatenate([seen, uu * n_items + ii]))
        if len(seen) >= 0.98 * n_users * n_items:
            break  # grid nearly full; stop resampling
    if len(seen) > n_ratings:
        seen = seen[rng.choice(len(seen), n_ratings, replace=False)]
    u = (seen // n_items).astype(np.int64)
    i = (seen % n_items).astype(np.int64)

    P = rng.normal(0, 1.0 / np.sqrt(true_rank), (n_users, true_rank))
    Q = rng.normal(0, 1.0 / np.sqrt(true_rank), (n_items, true_rank))
    raw = np.einsum("nk,nk->n", P[u], Q[i]) + noise * rng.normal(size=u.shape)
    # map scores onto a 1..5 star scale like MovieLens
    r = 3.0 + 1.5 * np.tanh(raw)
    if rating_levels:
        r = np.clip(np.round(r * 2) / 2, 0.5, 5.0)
    return u.astype(np.int32), i.astype(np.int32), r.astype(np.float32)

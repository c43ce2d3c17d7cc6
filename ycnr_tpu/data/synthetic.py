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

    def zipf_cdf(n: int) -> np.ndarray:
        if power_law <= 0:
            p = np.full(n, 1.0 / n)
        else:
            p = 1.0 / np.arange(1, n + 1) ** power_law
            rng.shuffle(p)
        c = np.cumsum(p)
        return c / c[-1]

    # inverse-CDF sampling (cumsum once + searchsorted per draw) is ~4x
    # faster than Generator.choice(p=...) at the 10^7-sample scale the
    # ML-20M/Netflix benches need
    cu = zipf_cdf(n_users)
    ci = zipf_cdf(n_items)
    # sample in rounds, deduping (u, i) cumulatively, until the target count
    # is reached (zipf-concentrated popularity collides heavily, so a single
    # oversampled draw can fall far short). `seen` stays sorted; each round
    # uniques only the NEW draws, drops members already seen, and merges via
    # one vectorized sorted insert — never re-sorting the accumulated set.
    seen = np.zeros(0, np.int64)
    oversample = 1.6
    for _ in range(12):
        short = n_ratings - len(seen)
        if short <= 0:
            break
        m = int(short * oversample) + 16
        uu = np.searchsorted(cu, rng.random(m)).astype(np.int64)
        ii = np.searchsorted(ci, rng.random(m)).astype(np.int64)
        new = np.unique(uu * n_items + ii)
        if len(seen):
            pos = np.searchsorted(seen, new)
            hit = (pos < len(seen)) & (seen[np.minimum(pos, len(seen) - 1)]
                                       == new)
            # dropping already-seen keys does not move the survivors'
            # insertion points, so pos can be reused instead of re-searching
            pos, new = pos[~hit], new[~hit]
            seen = np.insert(seen, pos, new)
        else:
            seen = new
        # adapt the oversample factor to the measured collision yield (intra-
        # draw AND vs prior rounds) so the loop converges in ~3 rounds instead
        # of the worst-case 12 — each round's draws are expensive on a 1-core
        # host at 10^7 scale
        oversample = min(1.25 / max(len(new) / m, 0.05), 24.0)
        if len(seen) >= 0.98 * n_users * n_items:
            break  # grid nearly full; stop resampling
    if len(seen) > n_ratings:
        seen = seen[rng.choice(len(seen), n_ratings, replace=False)]
    u = (seen // n_items).astype(np.int64)
    i = (seen % n_items).astype(np.int64)

    P = rng.normal(0, 1.0 / np.sqrt(true_rank),
                   (n_users, true_rank)).astype(np.float32)
    Q = rng.normal(0, 1.0 / np.sqrt(true_rank),
                   (n_items, true_rank)).astype(np.float32)
    # score in f32 chunks: materializing P[u]/Q[i] whole would allocate
    # O(nnz * rank) fresh pages, which dominates wall time on ballooned VMs
    r = np.empty(len(u), np.float32)
    for s in range(0, len(u), 4_000_000):
        e = min(s + 4_000_000, len(u))
        raw = np.einsum("nk,nk->n", P[u[s:e]], Q[i[s:e]])
        raw += noise * rng.standard_normal(e - s, dtype=np.float32)
        # squash onto a star-like scale centered at 3. tanh in (-1, 1)
        # bounds this to (1.5, 4.5) — a COMPRESSED version of MovieLens's
        # 0.5..5.0 range (extreme ratings never occur). Kept as-is: the
        # perf benches are value-independent, parity tests compare
        # implementations on the same draw, and widening the scale would
        # invalidate every pinned golden metric for cosmetic realism.
        r[s:e] = 3.0 + 1.5 * np.tanh(raw)
    if rating_levels:
        r = np.clip(np.round(r * 2) / 2, 0.5, 5.0)
    return u.astype(np.int32), i.astype(np.int32), r.astype(np.float32)

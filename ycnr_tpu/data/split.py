"""Held-out train/test split (reference C7: train/test split; SURVEY.md 3.1)."""

from __future__ import annotations

import numpy as np


def train_test_split(user_idx, item_idx, rating, test_fraction: float = 0.1,
                     seed: int = 0):
    """Random held-out split of a COO ratings triple.

    Returns ((train_u, train_i, train_r), (test_u, test_i, test_r)).
    """
    n = len(rating)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_test = int(n * test_fraction)
    te, tr = perm[:n_test], perm[n_test:]
    u = np.asarray(user_idx)
    i = np.asarray(item_idx)
    r = np.asarray(rating)
    return (u[tr], i[tr], r[tr]), (u[te], i[te], r[te])

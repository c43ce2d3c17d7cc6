"""Ranking metrics for implicit-feedback models (complements RMSE).

The reference validates with RMSE (SURVEY.md C12), which is meaningful for
explicit ALS/SGD but not for iALS preference scores. Hit-rate@N / recall@N
against the held-out interactions is the standard implicit-feedback check:
for each test interaction (u, i), is i inside u's top-N over unrated items?
Computed fully on device in user batches.
"""

from __future__ import annotations

import numpy as np

from ycnr_tpu.eval.recommend import recommend_users
from ycnr_tpu.models.base import MFState


def hit_rate_at_n(state: MFState, train_u, train_i, test_u, test_i,
                  n: int = 10, max_users: int = 2048,
                  seed: int = 0) -> float:
    """Fraction of held-out (u, i) whose item appears in u's masked top-N.

    Evaluates up to max_users distinct test users (sampled deterministically)
    to bound serving cost on large datasets.
    """
    test_u = np.asarray(test_u)
    test_i = np.asarray(test_i)
    if len(test_u) == 0:
        return 0.0
    users = np.unique(test_u)
    if len(users) > max_users:
        rng = np.random.default_rng(seed)
        users = rng.choice(users, max_users, replace=False)
        keep = np.isin(test_u, users)
        test_u, test_i = test_u[keep], test_i[keep]
    items, _ = recommend_users(state, train_u, train_i, users, n)
    top = {int(u): set(row.tolist()) for u, row in zip(users, items)}
    hits = sum(1 for u, i in zip(test_u, test_i) if int(i) in top[int(u)])
    return hits / len(test_u)

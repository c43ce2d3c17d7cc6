"""Serving facade: the reference's engine.recommend(userId, N) entry
(SURVEY.md §1 public interface; call stack 3.5), with the C8 cache in front.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ycnr_tpu.eval.recommend import recommend_users, sort_ratings_by_user
from ycnr_tpu.models.base import MFState
from ycnr_tpu.serve.cache import RecCache


class Recommender:
    def __init__(self, state: MFState, train_u, train_i,
                 cache: Optional[RecCache] = None):
        self.state = state
        self.train_u = np.asarray(train_u)
        self.train_i = np.asarray(train_i)
        # one-time CSR sort so per-request mask building is O(log nnz)
        self._sorted = sort_ratings_by_user(self.train_u, self.train_i)
        self.cache = cache if cache is not None else RecCache()

    def recommend(self, user_id: int, n: int = 10):
        """Top-n item ids for one user (rated items masked)."""
        key = (int(user_id), int(n))
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        items, _ = recommend_users(self.state, self.train_u, self.train_i,
                                   np.asarray([user_id]), n,
                                   sorted_index=self._sorted)
        result = items[0]
        self.cache.put(key, result)
        return result

    def recommend_batch(self, user_ids: Sequence[int], n: int = 10):
        items, _ = recommend_users(self.state, self.train_u, self.train_i,
                                   np.asarray(user_ids), n,
                                   sorted_index=self._sorted)
        return items

    def update_state(self, state: MFState):
        """Swap in retrained factors; cached recs are stale -> flush."""
        self.state = state
        self.cache.invalidate()

    def recommend_cold(self, item_ids, ratings, n: int = 10,
                       lam: float = 0.05, alpha=None):
        """Top-n for a user NOT in the trained factors, from their ad-hoc
        rating list via fold-in (serve/fold_in.py). alpha selects the
        implicit-confidence solve."""
        from ycnr_tpu.serve.fold_in import recommend_fold_in

        items, _ = recommend_fold_in(self.state, [np.asarray(item_ids)],
                                     [np.asarray(ratings, np.float32)],
                                     n=n, lam=lam, alpha=alpha)
        return items[0]

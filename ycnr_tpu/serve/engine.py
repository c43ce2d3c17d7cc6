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
    def __init__(self, state: MFState, train_u, train_i, train_r=None,
                 cache: Optional[RecCache] = None):
        self.state = state
        self.train_u = np.asarray(train_u)
        self.train_i = np.asarray(train_i)
        # ratings are only needed for online updates (add_ratings)
        self.train_r = None if train_r is None else np.asarray(train_r,
                                                               np.float32)
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

    def add_ratings(self, user_id: int, item_ids, ratings,
                    lam: float = 0.05, alpha=None):
        """Online update: record new ratings for an EXISTING user and
        re-solve their factor row in place (fold-in over the user's full
        updated list — exactly the ALS U-step for that user, V fixed).

        The reference's analog is inserting rows into Postgres and
        retraining; here the serving state absorbs the update immediately.
        Requires train_r at construction. Biases/mu are left untouched, so
        use with ALS/iALS-trained states (SGD states would need a bias
        update rule). O(nnz) host scan per call. New users: recommend_cold.
        """
        if self.train_r is None:
            raise ValueError("add_ratings needs train_r at construction")
        user_id = int(user_id)
        if not 0 <= user_id < self.state.n_users:
            raise IndexError(
                f"user {user_id} not in trained factors (0.."
                f"{self.state.n_users - 1}); use recommend_cold for new "
                f"users")
        item_ids = np.asarray(item_ids).reshape(-1)
        ratings = np.asarray(ratings, np.float32).reshape(-1)
        # re-rating replaces: keep the last value per item within the update
        # and drop the user's previous rows for the updated items
        uniq, inv = np.unique(item_ids, return_inverse=True)
        last = np.zeros(len(uniq), np.int64)
        last[inv] = np.arange(len(item_ids))  # later writes win
        item_ids, ratings = item_ids[last], ratings[last]
        drop = (self.train_u == user_id) & np.isin(self.train_i, item_ids)
        if drop.any():
            keep = ~drop
            self.train_u = self.train_u[keep]
            self.train_i = self.train_i[keep]
            self.train_r = self.train_r[keep]
        self.train_u = np.concatenate(
            [self.train_u, np.full(len(item_ids), user_id,
                                   self.train_u.dtype)])
        self.train_i = np.concatenate([self.train_i, item_ids])
        self.train_r = np.concatenate([self.train_r, ratings])
        self._sorted = sort_ratings_by_user(self.train_u, self.train_i)
        from ycnr_tpu.serve.fold_in import fold_in_users

        mine = self.train_u == user_id
        row = fold_in_users(self.state, [self.train_i[mine]],
                            [self.train_r[mine]], lam=lam, alpha=alpha)[0]
        self.state = self.state._replace(
            U=self.state.U.at[user_id].set(row.astype(self.state.U.dtype)))
        self.cache.invalidate(user_id)

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

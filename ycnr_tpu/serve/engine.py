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

    def _check_users(self, user_ids: np.ndarray):
        # out-of-range ids would silently gather the zero trash row and
        # return (then cache!) identical bias-only recommendations
        if len(user_ids) and (int(user_ids.min()) < 0
                              or int(user_ids.max()) >= self.state.n_users):
            bad = user_ids[(user_ids < 0)
                           | (user_ids >= self.state.n_users)]
            raise IndexError(
                f"user ids {bad.tolist()[:5]} not in trained factors "
                f"(0..{self.state.n_users - 1}); use recommend_cold for "
                f"new users")

    def recommend(self, user_id: int, n: int = 10):
        """Top-n item ids for one user (rated items masked)."""
        self._check_users(np.asarray([user_id]))
        key = (int(user_id), int(n))
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        items, scores = recommend_users(self.state, self.train_u,
                                        self.train_i, np.asarray([user_id]),
                                        n, sorted_index=self._sorted)
        # when n exceeds the user's unrated count, top_k fills the tail
        # with NEG_INF-masked (already-rated) entries — drop them
        from ycnr_tpu.eval.recommend import NEG_INF

        result = items[0][scores[0] > NEG_INF / 2]
        self.cache.put(key, result)
        return result

    def recommend_batch(self, user_ids: Sequence[int], n: int = 10):
        user_ids = np.asarray(user_ids)
        self._check_users(user_ids)
        items, _ = recommend_users(self.state, self.train_u, self.train_i,
                                   user_ids, n,
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
        Requires train_r at construction. The re-solve fits the residual
        r - (mu + b_i), so biased (SGD) states stay consistent; the user's
        own bias term is left untouched (approximation: only the factor row
        refits). O(nnz) host work per call. New users: recommend_cold.
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
        self._check_items(item_ids)
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
        from ycnr_tpu.serve.fold_in import fold_in_users

        mine = self.train_u == user_id
        # maintain the sorted serving index incrementally: replace the
        # user's span in place (one O(nnz) copy, no global re-sort — keeps
        # the documented O(nnz) bound instead of O(nnz log nnz))
        su, si = self._sorted
        lo = np.searchsorted(su, user_id, "left")
        hi = np.searchsorted(su, user_id, "right")
        mine_items = np.sort(self.train_i[mine]).astype(si.dtype)
        self._sorted = (
            np.concatenate([su[:lo],
                            np.full(len(mine_items), user_id, su.dtype),
                            su[hi:]]),
            np.concatenate([si[:lo], mine_items, si[hi:]]))
        row = fold_in_users(self.state, [self.train_i[mine]],
                            [self.train_r[mine]], lam=lam, alpha=alpha)[0]
        self.state = self.state._replace(
            U=self.state.U.at[user_id].set(row.astype(self.state.U.dtype)))
        self.cache.invalidate(user_id)

    def _check_items(self, item_ids: np.ndarray):
        # ids past the catalog silently hit V's zero trash row: the rating
        # would be inert in the solve yet persisted into the train arrays
        if len(item_ids) and (int(item_ids.min()) < 0
                              or int(item_ids.max()) >= self.state.n_items):
            bad = item_ids[(item_ids < 0)
                           | (item_ids >= self.state.n_items)]
            raise IndexError(f"item ids {bad.tolist()[:5]} not in the "
                             f"catalog (0..{self.state.n_items - 1})")

    def recommend_cold(self, item_ids, ratings, n: int = 10,
                       lam: float = 0.05, alpha=None):
        """Top-n for a user NOT in the trained factors, from their ad-hoc
        rating list via fold-in (serve/fold_in.py). alpha selects the
        implicit-confidence solve."""
        from ycnr_tpu.serve.fold_in import recommend_fold_in

        item_ids = np.asarray(item_ids)
        self._check_items(item_ids)
        items, _ = recommend_fold_in(self.state, [np.asarray(item_ids)],
                                     [np.asarray(ratings, np.float32)],
                                     n=n, lam=lam, alpha=alpha)
        return items[0]

"""Masked top-N serving vs oracle (SURVEY.md C13, call stack 3.5)."""

import numpy as np

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.eval.recommend import recommend_all, recommend_users
from ycnr_tpu.models.base import state_from_numpy
from ycnr_tpu.ops.layout import build_blocked_csr
from ycnr_tpu.oracle import numpy_mf as om


def _setup(seed=0, n_users=40, n_items=60, nnz=1200, k=5):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=3, seed=seed)
    rng = np.random.default_rng(seed)
    U = rng.normal(0, 1.0, (n_users, k))
    V = rng.normal(0, 1.0, (n_items, k))
    return u, i, r, U, V, n_users, n_items


def test_recommend_all_matches_oracle():
    u, i, r, U, V, nu, ni = _setup()
    layout = build_blocked_csr(u, i, r, nu, ni, 8, 32)
    state = state_from_numpy(U, V)
    uids, items, scores = recommend_all(state, layout, n=7)
    assert set(uids.tolist()) == set(np.unique(u).tolist())
    for row, uid in enumerate(uids):
        rated = i[u == uid]
        # beyond the unrated count, slots hold arbitrary -inf ties
        m = min(7, ni - len(set(rated.tolist())))
        expect = om.topn(U.astype(np.float32), V.astype(np.float32),
                         rated, uid, 7)
        np.testing.assert_array_equal(items[row][:m], expect[:m])
        assert not (set(items[row][:m].tolist()) & set(rated.tolist()))
        assert np.all(np.diff(scores[row]) <= 0)


def test_recommend_users_matches_oracle():
    u, i, r, U, V, nu, ni = _setup(seed=2)
    state = state_from_numpy(U, V)
    ask = np.array([0, 5, 17, 39])
    items, scores = recommend_users(state, u, i, ask, n=5)
    for row, uid in enumerate(ask):
        rated = i[u == uid]
        m = min(5, ni - len(set(rated.tolist())))
        expect = om.topn(U.astype(np.float32), V.astype(np.float32),
                         rated, uid, 5)
        np.testing.assert_array_equal(items[row][:m], expect[:m])


def test_recommend_with_biases():
    """SGD-trained states serve with mu + b_u + b_i + UV^T scores."""
    u, i, r, U, V, nu, ni = _setup(seed=3)
    rng = np.random.default_rng(3)
    bu = rng.normal(0, 0.3, nu)
    bi = rng.normal(0, 0.3, ni)
    state = state_from_numpy(U, V, bu, bi, mu=3.2)
    ask = np.array([1, 2])
    items, scores = recommend_users(state, u, i, ask, n=5)
    for row, uid in enumerate(ask):
        rated = i[u == uid]
        expect = om.topn(U.astype(np.float32), V.astype(np.float32), rated,
                         uid, 5, bu=bu.astype(np.float32),
                         bi=bi.astype(np.float32), mu=3.2)
        np.testing.assert_array_equal(items[row], expect)


def test_user_with_all_items_rated():
    # a user who rated every item gets NEG_INF everywhere; top-k still returns
    # n indices without crashing
    u = np.zeros(10, np.int32)
    i = np.arange(10, dtype=np.int32)
    r = np.ones(10, np.float32)
    rng = np.random.default_rng(0)
    state = state_from_numpy(rng.normal(size=(1, 3)), rng.normal(size=(10, 3)))
    items, scores = recommend_users(state, u, i, np.array([0]), n=5)
    assert items.shape == (1, 5)
    assert np.all(scores <= -1e38)

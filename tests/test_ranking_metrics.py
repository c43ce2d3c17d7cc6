"""ranking_metrics_at_n vs hand-computed values on a constructed case.

The factor state is built so the score of item j for every user is exactly
-j (descending by item id), making the top-N deterministic and the metric
arithmetic checkable by hand.
"""

import numpy as np
import pytest

from ycnr_tpu.eval.ranking import hit_rate_at_n, ranking_metrics_at_n
from ycnr_tpu.models.base import state_from_numpy


def _state_descending_scores(n_users, n_items):
    """score(u, j) = -j for all users: top-N = [0, 1, 2, ...] minus rated."""
    U = np.ones((n_users, 1))
    V = -np.arange(n_items, dtype=np.float64)[:, None]
    return state_from_numpy(U, V)


def test_known_case():
    state = _state_descending_scores(2, 12)
    # user 0 rated item 0 -> top-4 = [1, 2, 3, 4]
    # user 1 rated nothing -> top-4 = [0, 1, 2, 3]
    train_u = np.array([0])
    train_i = np.array([0])
    # held-out: user 0 -> {1, 3, 9}; user 1 -> {2}
    test_u = np.array([0, 0, 0, 1])
    test_i = np.array([1, 3, 9, 2])
    m = ranking_metrics_at_n(state, train_u, train_i, test_u, test_i, n=4)

    assert m["users"] == 2
    # user 0: hits at positions 1,3 (items 1,3) of [1,2,3,4]; user 1: pos 3
    assert m["hit_rate"] == pytest.approx(3 / 4)  # 3 of 4 interactions
    assert m["precision"] == pytest.approx((2 / 4 + 1 / 4) / 2)
    assert m["recall"] == pytest.approx((2 / 3 + 1 / 1) / 2)
    # user 0: DCG = 1/log2(2) + 1/log2(4) = 1.5; IDCG(min(4,3)=3 ideal hits)
    #         = 1 + 1/log2(3) + 1/2
    # user 1: DCG = 1/log2(4) = 0.5; IDCG(1) = 1
    idcg0 = 1 + 1 / np.log2(3) + 0.5
    assert m["ndcg"] == pytest.approx((1.5 / idcg0 + 0.5 / 1) / 2, abs=1e-6)
    # user 0: AP = (prec@1 + prec@3)/min(4,3) = (1 + 2/3)/3
    # user 1: AP = (prec@3)/min(4,1) = (1/3)/1
    assert m["map"] == pytest.approx(((1 + 2 / 3) / 3 + 1 / 3) / 2, abs=1e-6)
    # interaction-level hit_rate agrees with the standalone helper
    assert hit_rate_at_n(state, train_u, train_i, test_u, test_i,
                         n=4) == pytest.approx(m["hit_rate"])
    # coverage: recommended lists are {1,2,3,4} and {0,1,2,3} -> 5 of 12
    assert m["coverage"] == pytest.approx(5 / 12, abs=1e-6)
    # novelty: 1 training interaction (item 0, count 1, nnz 1); every
    # recommended item has count<=1 -> -log2(1/1) = 0 across the board
    assert m["novelty"] == pytest.approx(0.0)


def test_novelty_prefers_rare_items():
    """A popularity-skewed train set: lists containing only the hot item
    score lower novelty than lists of rare items."""
    from ycnr_tpu.eval.ranking import ranking_metrics_at_n as rm

    state = _state_descending_scores(1, 8)
    # item 0 rated 6 times (by OTHER users), item 7 once; user 0 unrated
    train_u = np.array([1, 1, 1, 1, 1, 1, 1])
    train_i = np.array([0, 0, 0, 0, 0, 0, 7])
    m = rm(state, train_u, train_i, np.array([0]), np.array([1]), n=2)
    # top-2 for user 0 = [0, 1]: novelty = mean(-log2(6/7), -log2(1/7))
    want = float(np.mean([-np.log2(6 / 7), -np.log2(1 / 7)]))
    assert m["novelty"] == pytest.approx(want, abs=1e-3)


def test_perfect_and_empty():
    state = _state_descending_scores(1, 8)
    # user 0, no training ratings; held-out = exactly the top-3 items
    m = ranking_metrics_at_n(state, np.array([], np.int64),
                             np.array([], np.int64),
                             np.array([0, 0, 0]), np.array([0, 1, 2]), n=3)
    for k in ("hit_rate", "precision", "recall", "ndcg", "map"):
        assert m[k] == pytest.approx(1.0), k
    z = ranking_metrics_at_n(state, np.array([0]), np.array([0]),
                             np.array([], np.int64), np.array([], np.int64),
                             n=3)
    assert z["users"] == 0 and z["ndcg"] == 0.0


def test_subsampling_is_deterministic():
    rng = np.random.default_rng(0)
    state = _state_descending_scores(50, 30)
    tu = rng.integers(0, 50, 200)
    ti = rng.integers(0, 30, 200)
    a = ranking_metrics_at_n(state, tu[:50], ti[:50], tu[50:], ti[50:],
                             n=5, max_users=10, seed=1)
    b = ranking_metrics_at_n(state, tu[:50], ti[:50], tu[50:], ti[50:],
                             n=5, max_users=10, seed=1)
    assert a == b and a["users"] == 10

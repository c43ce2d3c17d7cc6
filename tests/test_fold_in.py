"""Fold-in parity: ad-hoc per-user solves must equal the training solves.

The fold-in path advertises "the SAME normal equation as the ALS U-step";
these tests hold it to that literally, against the jitted training phase and
against a direct NumPy solve.
"""

import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.als import _phase
from ycnr_tpu.models.base import device_layout, init_state
from ycnr_tpu.ops.layout import build_blocked_csr
from ycnr_tpu.serve.fold_in import fold_in_users, recommend_fold_in


@pytest.fixture(scope="module")
def setup():
    n_users, n_items, rank = 50, 30, 6
    (u, i, r) = synthetic_ratings(n_users, n_items, 900, true_rank=3, seed=4)
    state = init_state(n_users, n_items, rank, seed=1)
    return n_users, n_items, u, i, r, state


def _user_lists(u, i, r, users):
    return ([i[u == x] for x in users], [r[u == x] for x in users])


def test_explicit_matches_training_phase(setup):
    n_users, n_items, u, i, r, state = setup
    lam = 0.07
    ul = device_layout(build_blocked_csr(u, i, r, n_users, n_items, 8, 16),
                       state.U.dtype)
    U_trained = np.asarray(_phase(state.U, state.V, ul, lam))
    users = [0, 3, 17, 42]
    il, rl = _user_lists(u, i, r, users)
    rows = fold_in_users(state, il, rl, lam=lam)
    np.testing.assert_allclose(rows, U_trained[users], rtol=2e-4, atol=2e-6)


def test_explicit_matches_numpy_solve(setup):
    n_users, n_items, u, i, r, state = setup
    lam = 0.05
    V = np.asarray(state.V, np.float64)[:-1]
    users = [5, 11]
    il, rl = _user_lists(u, i, r, users)
    rows = fold_in_users(state, il, rl, lam=lam)
    for j, (ii, rr) in enumerate(zip(il, rl)):
        Vr = V[ii]
        A = Vr.T @ Vr + lam * len(ii) * np.eye(V.shape[1])
        expect = np.linalg.solve(A, Vr.T @ rr)
        np.testing.assert_allclose(rows[j], expect, rtol=2e-4, atol=2e-6)


def test_implicit_matches_numpy_solve(setup):
    n_users, n_items, u, i, r, state = setup
    lam, alpha = 0.1, 8.0
    V = np.asarray(state.V, np.float64)[:-1]
    users = [2, 29]
    il, rl = _user_lists(u, i, r, users)
    rows = fold_in_users(state, il, rl, lam=lam, alpha=alpha)
    G = V.T @ V
    for j, (ii, rr) in enumerate(zip(il, rl)):
        Vr = V[ii]
        A = G + alpha * Vr.T @ np.diag(rr) @ Vr + lam * np.eye(V.shape[1])
        expect = np.linalg.solve(A, Vr.T @ (1.0 + alpha * rr))
        np.testing.assert_allclose(rows[j], expect, rtol=2e-4, atol=2e-6)


def test_recommend_masks_rated(setup):
    n_users, n_items, u, i, r, state = setup
    users = [0, 7]
    il, rl = _user_lists(u, i, r, users)
    items, scores = recommend_fold_in(state, il, rl, n=5, lam=0.05)
    assert items.shape == (2, 5)
    for j in range(2):
        assert not set(items[j].tolist()) & set(il[j].tolist())
        assert n_items not in items[j]  # trash column never recommended
        # descending scores
        assert np.all(np.diff(scores[j]) <= 1e-6)


def test_item_fold_in_matches_numpy_solve(setup):
    n_users, n_items, u, i, r, state = setup
    lam = 0.06
    U = np.asarray(state.U, np.float64)[:-1]
    items = [4, 21]
    ul = [u[i == x] for x in items]
    rl = [r[i == x] for x in items]
    from ycnr_tpu.serve.fold_in import fold_in_items

    rows = fold_in_items(state, ul, rl, lam=lam)
    for j, (uu, rr) in enumerate(zip(ul, rl)):
        Ur = U[uu]
        A = Ur.T @ Ur + lam * len(uu) * np.eye(U.shape[1])
        expect = np.linalg.solve(A, Ur.T @ rr)
        np.testing.assert_allclose(rows[j], expect, rtol=2e-4, atol=2e-6)


def test_empty_list_is_safe(setup):
    *_, state = setup
    rows = fold_in_users(state, [np.array([], np.int64)],
                         [np.array([], np.float32)], lam=0.05)
    np.testing.assert_array_equal(rows, 0.0)  # (n==0 guard) I x = 0


def test_biased_state_solves_residual(setup):
    """With a biased (SGD-style) state, fold-in must fit the residual
    r - (mu + b_i): serving re-adds mu + b_i, so solving on raw r would
    double-count the baseline and rank items a cold user DISLIKED highly."""
    n_users, n_items, u, i, r, state = setup
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    bi = np.zeros(n_items + 1, np.float32)
    bi[:n_items] = rng.normal(0, 0.2, n_items).astype(np.float32)
    biased = state._replace(mu=jnp.asarray(np.float32(3.0)),
                            bi=jnp.asarray(bi))
    # the cold user hates item 3 (rating 1.0) and loves item 11 (5.0);
    # predicted scores for the rated items must approximate the ratings,
    # not ratings + baseline
    items, ratings = [3, 11], [1.0, 5.0]
    rows = fold_in_users(biased, [np.asarray(items)],
                         [np.asarray(ratings, np.float32)], lam=1e-4)
    V = np.asarray(biased.V)
    pred = 3.0 + bi[items] + rows[0] @ V[items].T
    assert abs(pred[0] - 1.0) < 0.3, pred
    assert abs(pred[1] - 5.0) < 0.3, pred


def test_fold_in_topn_clamps_to_catalog(setup):
    n_users, n_items, u, i, r, state = setup
    items, scores = recommend_fold_in(state, [i[u == 0]], [r[u == 0]],
                                      n=n_items + 25)
    assert items.shape[1] <= n_items

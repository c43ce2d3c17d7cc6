"""Oracle sanity: the NumPy reference implementations must actually learn.

SURVEY.md §4: the de-facto acceptance signal of the reference engine is
held-out RMSE improving over epochs on MovieLens-like data. Plus the §4 item
5 closed-form micro-test: rank-1 data, ALS converges essentially in one sweep.
"""

import numpy as np

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.oracle import numpy_mf as om


def _data(seed=0, nnz=4000, n_users=80, n_items=60):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    return train_test_split(u, i, r, 0.1, seed), n_users, n_items


def test_als_learns():
    ((tu, ti, tr), (su, si, sr)), n_users, n_items = _data()
    rng = np.random.default_rng(0)
    k = 8
    U = rng.normal(0, 0.1, (n_users, k))
    V = rng.normal(0, 0.1, (n_items, k))
    r0 = om.rmse(U, V, su, si, sr)
    for _ in range(5):
        U, V = om.als_wr_epoch(U, V, tu, ti, tr, lam=0.05)
    r5 = om.rmse(U, V, su, si, sr)
    assert r5 < r0 * 0.7
    assert om.rmse(U, V, tu, ti, tr) < 0.5


def test_als_rank1_one_sweep():
    # rank-1 planted, no noise: after one U,V sweep starting from the true V,
    # reconstruction on train is (near-)exact.
    rng = np.random.default_rng(1)
    p = rng.normal(size=(20, 1))
    q = rng.normal(size=(15, 1))
    u, i = np.meshgrid(np.arange(20), np.arange(15), indexing="ij")
    u, i = u.ravel(), i.ravel()
    r = (p @ q.T).ravel()
    U0 = rng.normal(size=(20, 1))
    U, V = om.als_wr_epoch(U0, q.copy(), u, i, r, lam=1e-12)
    assert om.rmse(U, V, u, i, r) < 1e-6


def test_sgd_learns():
    ((tu, ti, tr), (su, si, sr)), n_users, n_items = _data(seed=2)
    rng = np.random.default_rng(0)
    k = 8
    U = rng.normal(0, 0.1, (n_users, k))
    V = rng.normal(0, 0.1, (n_items, k))
    bu = np.zeros(n_users)
    bi = np.zeros(n_items)
    mu = float(tr.mean())
    r0 = om.rmse(U, V, tu, ti, tr, bu, bi, mu)
    lr = 0.05
    for ep in range(15):
        perm = np.random.default_rng(ep).permutation(len(tr))
        U, V, bu, bi = om.sgd_epoch_batched(U, V, bu, bi, mu, tu, ti, tr,
                                            lam=0.02, lr=lr, batch_size=256,
                                            perm=perm)
        lr *= 0.95
    # train RMSE must drop clearly; the tiny held-out set here is already at
    # its irreducible noise floor, so train fit is the learning signal.
    r1 = om.rmse(U, V, tu, ti, tr, bu, bi, mu)
    assert r1 < r0 * 0.85


def test_ials_ranks_observed_higher():
    # sparser grid than the default: at 4000/4800 cells observed the
    # observed-vs-unobserved separation margin is structurally tiny
    ((tu, ti, tr), _), n_users, n_items = _data(seed=3, nnz=1500)
    rng = np.random.default_rng(0)
    k = 8
    U = rng.normal(0, 0.1, (n_users, k))
    V = rng.normal(0, 0.1, (n_items, k))
    for _ in range(5):
        U, V = om.ials_epoch(U, V, tu, ti, tr, lam=0.1, alpha=10.0)
    scores = U @ V.T
    obs = scores[tu, ti].mean()
    unobs_mask = np.ones((n_users, n_items), bool)
    unobs_mask[tu, ti] = False
    assert obs > scores[unobs_mask].mean() + 0.2


def test_topn_masks_rated():
    rng = np.random.default_rng(0)
    U = rng.normal(size=(5, 3))
    V = rng.normal(size=(10, 3))
    rated = [1, 2, 3]
    top = om.topn(U, V, rated, u=0, n=5)
    assert len(set(top) & set(rated)) == 0
    scores = V @ U[0]
    expect = [j for j in np.argsort(-scores) if j not in rated][:5]
    np.testing.assert_array_equal(top, expect)


def test_rmse_padded_chunked_matches_unchunked(monkeypatch):
    """Large COOs take a chunked scan (HBM-bounded); result must be
    identical to the direct path."""
    import jax.numpy as jnp

    from ycnr_tpu.models import base

    ((tu, ti, tr), _), n_users, n_items = _data(seed=6)
    from ycnr_tpu.models.base import init_state
    from ycnr_tpu.ops.layout import pad_coo

    st = init_state(n_users, n_items, 4, seed=0, mu=3.0)
    pu, pi, pr, n = pad_coo(tu, ti, tr, n_users, n_items, 256)
    direct = float(base.rmse_padded(st, jnp.asarray(pu), jnp.asarray(pi),
                                    jnp.asarray(pr), n))
    monkeypatch.setattr(base, "_RMSE_CHUNK", 256)
    chunked = float(base.rmse_padded(st, jnp.asarray(pu), jnp.asarray(pi),
                                     jnp.asarray(pr), n))
    assert abs(direct - chunked) < 1e-12

"""Dual-sharded (users+items sharded, all-gather) ALS/iALS parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.als import als_epoch
from ycnr_tpu.models.base import device_layout, rmse_padded, state_from_numpy
from ycnr_tpu.models.ials import ials_epoch
from ycnr_tpu.ops.layout import build_blocked_csr, pad_coo
from ycnr_tpu.parallel.dual import (
    build_dual_sharded_data,
    dual_als_epoch,
    dual_gather_state,
    dual_ials_epoch,
    dual_rmse,
    dual_scatter_state,
)
from ycnr_tpu.parallel.mesh import make_mesh

DT = jnp.float64


def _setup(seed=0, n_users=70, n_items=50, nnz=3000, k=6):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed)
    rng = np.random.default_rng(seed)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    return (tu, ti, tr), (su, si, sr), U0, V0, n_users, n_items


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dual_als_parity(n_shards):
    (tu, ti, tr), (su, si, sr), U0, V0, nu, ni = _setup()
    lam = 0.05
    mesh = make_mesh(n_shards)
    data, meta = build_dual_sharded_data(tu, ti, tr, nu, ni, n_shards,
                                         chunk_len=8, block_chunks=32,
                                         test_u=su, test_i=si, test_r=sr,
                                         dtype=DT, mesh=mesh)
    st = dual_scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)

    sst = state_from_numpy(U0, V0, dtype=DT)
    dul = device_layout(build_blocked_csr(tu, ti, tr, nu, ni, 8, 32), DT)
    dil = device_layout(build_blocked_csr(ti, tu, tr, ni, nu, 8, 32), DT)
    pu, pi, pr, n = pad_coo(su, si, sr, nu, ni, 64)

    for _ in range(3):
        st = dual_als_epoch(mesh, st, data, lam)
        sst = als_epoch(sst, dul, dil, lam)
        g = dual_gather_state(st, meta)
        np.testing.assert_allclose(np.asarray(g.U), np.asarray(sst.U),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.V), np.asarray(sst.V),
                                   rtol=1e-9, atol=1e-9)
        r_sh = dual_rmse(mesh, st, data, meta.test_n)
        r_ss = float(rmse_padded(sst, jnp.asarray(pu), jnp.asarray(pi),
                                 jnp.asarray(pr), n))
        assert abs(r_sh - r_ss) < 1e-9


def test_dual_ials_parity():
    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=2)
    lam, alpha = 0.1, 8.0
    mesh = make_mesh(4)
    data, meta = build_dual_sharded_data(tu, ti, tr, nu, ni, 4, chunk_len=8,
                                         block_chunks=32, dtype=DT, mesh=mesh)
    st = dual_scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)
    sst = state_from_numpy(U0, V0, dtype=DT)
    dul = device_layout(build_blocked_csr(tu, ti, tr, nu, ni, 8, 32), DT)
    dil = device_layout(build_blocked_csr(ti, tu, tr, ni, nu, 8, 32), DT)
    for _ in range(2):
        st = dual_ials_epoch(mesh, st, data, lam, alpha)
        sst = ials_epoch(sst, dul, dil, lam, alpha)
    g = dual_gather_state(st, meta)
    np.testing.assert_allclose(np.asarray(g.U), np.asarray(sst.U),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g.V), np.asarray(sst.V),
                               rtol=1e-8, atol=1e-9)
    # every shard's trash rows stayed zero
    assert np.all(np.asarray(st.U)[:, -1, :] == 0)
    assert np.all(np.asarray(st.V)[:, -1, :] == 0)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_dual_mesh_serving_parity(n_shards):
    """dual_recommend_all (V sharded, item-cat space) must return the same
    top-N as the single-chip masked serving path on the gathered state."""
    from ycnr_tpu.eval.recommend import recommend_all
    from ycnr_tpu.parallel.dual import dual_recommend_all

    (tu, ti, tr), (su, si, sr), U0, V0, nu, ni = _setup()
    mesh = make_mesh(n_shards)
    data, meta = build_dual_sharded_data(tu, ti, tr, nu, ni, n_shards,
                                         chunk_len=8, block_chunks=32,
                                         dtype=DT, mesh=mesh,
                                         host_user_layout=True)
    st = dual_scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)
    st = dual_als_epoch(mesh, st, data, 0.05)

    du, di, dsc = dual_recommend_all(mesh, st, data, meta, n=5)
    g = dual_gather_state(st, meta)
    ul = build_blocked_csr(tu, ti, tr, nu, ni, 8, 32)
    su_, si_, ss_ = recommend_all(g, ul, n=5)

    order_d, order_s = np.argsort(du), np.argsort(su_)
    np.testing.assert_array_equal(du[order_d], su_[order_s])
    np.testing.assert_allclose(dsc[order_d], ss_[order_s],
                               rtol=1e-9, atol=1e-9)
    # compare items only on real (non-backfill) slots: when a user has
    # fewer than n unrated items both paths pad with arbitrary NEG_INF
    # entries; elsewhere matching scores + matching items pin the top-N
    real = ss_[order_s] > -1e37
    np.testing.assert_array_equal(di[order_d][real], si_[order_s][real])
    assert real.mean() > 0.9  # the dataset mostly has enough unrated items

"""Sharded vs single-chip parity on the fake 8-device CPU mesh.

SURVEY.md §4 items 2-3 and BASELINE.json:5: the sharded run must match the
unsharded factors (1e-5 RMSE per epoch; in float64 here, near machine eps),
with real shard_map collectives (psum of item Grams over the mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.als import als_epoch
from ycnr_tpu.models.base import device_layout, rmse_padded, state_from_numpy
from ycnr_tpu.models.ials import ials_epoch
from ycnr_tpu.models.sgd import prepare_sgd_data, sgd_epoch
from ycnr_tpu.ops.layout import build_blocked_csr, pad_coo
from ycnr_tpu.parallel import (
    build_sharded_data,
    gather_state,
    make_mesh,
    scatter_state,
    sharded_als_epoch,
    sharded_ials_epoch,
    sharded_rmse,
    sharded_sgd_epoch,
)

DT = jnp.float64


def _setup(seed=0, n_users=70, n_items=50, nnz=3000, k=6):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed)
    rng = np.random.default_rng(seed)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    return (tu, ti, tr), (su, si, sr), U0, V0, n_users, n_items


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_als_parity(n_shards):
    (tu, ti, tr), (su, si, sr), U0, V0, nu, ni = _setup()
    lam = 0.05
    mesh = make_mesh(n_shards)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, n_shards,
                                    chunk_len=8, block_chunks=32,
                                    test_u=su, test_i=si, test_r=sr,
                                    dtype=DT, mesh=mesh)
    st = scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)

    # single-chip reference path
    ul = build_blocked_csr(tu, ti, tr, nu, ni, 8, 32)
    il = build_blocked_csr(ti, tu, tr, ni, nu, 8, 32)
    sst = state_from_numpy(U0, V0, dtype=DT)
    dul, dil = device_layout(ul, DT), device_layout(il, DT)
    pu, pi, pr, n = pad_coo(su, si, sr, nu, ni, 64)

    for ep in range(3):
        st = sharded_als_epoch(mesh, st, data, lam)
        sst = als_epoch(sst, dul, dil, lam)
        g = gather_state(st, meta)
        np.testing.assert_allclose(np.asarray(g.U), np.asarray(sst.U),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.V), np.asarray(sst.V),
                                   rtol=1e-9, atol=1e-9)
        r_sh = sharded_rmse(mesh, st, data, meta.test_n)
        r_ss = float(rmse_padded(sst, jnp.asarray(pu), jnp.asarray(pi),
                                 jnp.asarray(pr), n))
        assert abs(r_sh - r_ss) < 1e-9


def test_sharded_ials_parity():
    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=2)
    lam, alpha = 0.1, 8.0
    mesh = make_mesh(4)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, 4, chunk_len=8,
                                    block_chunks=32, dtype=DT, mesh=mesh)
    st = scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)
    ul = build_blocked_csr(tu, ti, tr, nu, ni, 8, 32)
    il = build_blocked_csr(ti, tu, tr, ni, nu, 8, 32)
    sst = state_from_numpy(U0, V0, dtype=DT)
    dul, dil = device_layout(ul, DT), device_layout(il, DT)
    for _ in range(2):
        st = sharded_ials_epoch(mesh, st, data, lam, alpha)
        sst = ials_epoch(sst, dul, dil, lam, alpha)
    g = gather_state(st, meta)
    np.testing.assert_allclose(np.asarray(g.U), np.asarray(sst.U),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g.V), np.asarray(sst.V),
                               rtol=1e-8, atol=1e-9)


def test_sharded_sgd_learns_and_deterministic():
    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=3)
    mesh = make_mesh(4)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, 4, chunk_len=8,
                                    block_chunks=32, sgd_batch=512,
                                    test_u=tu, test_i=ti, test_r=tr,
                                    dtype=DT, mesh=mesh)
    mu = float(tr.mean())

    def run():
        st = scatter_state(state_from_numpy(U0, V0, mu=mu, dtype=DT), meta,
                           mesh)
        key = jax.random.key(0)
        for ep in range(6):
            st = sharded_sgd_epoch(mesh, st, data, 0.02, 0.05 * 0.97**ep,
                                   jax.random.fold_in(key, ep), 512)
        return st

    st = run()
    # train rmse (test arrays carry the train set here) must drop
    r0_state = scatter_state(state_from_numpy(U0, V0, mu=mu, dtype=DT),
                             meta, mesh)
    r0 = sharded_rmse(mesh, r0_state, data, meta.test_n)
    r1 = sharded_rmse(mesh, st, data, meta.test_n)
    assert r1 < r0 * 0.9, (r0, r1)
    # determinism: same seeds => bitwise-equal factors
    st2 = run()
    np.testing.assert_array_equal(np.asarray(st.U), np.asarray(st2.U))
    np.testing.assert_array_equal(np.asarray(st.V), np.asarray(st2.V))
    # trash rows/cols intact
    g = gather_state(st, meta)
    assert np.all(np.asarray(g.U)[-1] == 0)
    assert np.all(np.asarray(g.V)[-1] == 0)


def test_sharded_sgd_d1_matches_single_chip():
    """D=1 sharded SGD == single-chip sgd_epoch given the same permutation."""
    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=4)
    mesh = make_mesh(1)
    B = 256
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, 1, chunk_len=8,
                                    block_chunks=32, sgd_batch=B, dtype=DT,
                                    mesh=mesh)
    mu = float(tr.mean())
    st = scatter_state(state_from_numpy(U0, V0, mu=mu, dtype=DT), meta, mesh)
    key = jax.random.key(7)
    st = sharded_sgd_epoch(mesh, st, data, 0.02, 0.01, key, B)
    g = gather_state(st, meta)

    # single-chip path fed the SAME shuffled stream in GLOBAL user ids.
    d = jax.random.fold_in(key, 0)
    perm = np.asarray(jax.random.permutation(d, data.sgd_u.shape[1]))
    u_loc = np.asarray(data.sgd_u)[0]
    i_gl = np.asarray(data.sgd_i)[0]
    r_gl = np.asarray(data.sgd_r)[0]
    u_gl = np.where(u_loc < meta.upd, meta.user_map[0][np.minimum(u_loc, meta.upd - 1)], nu)
    from ycnr_tpu.models.sgd import SGDData
    sdata = SGDData(jnp.asarray(u_gl, jnp.int32), jnp.asarray(i_gl),
                    jnp.asarray(r_gl, DT), len(tr))
    sst = state_from_numpy(U0, V0, mu=mu, dtype=DT)
    sst = sgd_epoch(sst, sdata, jnp.asarray(perm), 0.02, 0.01, B)
    np.testing.assert_allclose(np.asarray(g.U[:-1]), np.asarray(sst.U[:-1]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g.V), np.asarray(sst.V),
                               rtol=1e-12, atol=1e-12)


def test_sharded_recommend_all_bits_path():
    """Sharded serving with the packed rated-bits fast path must agree with
    the scatter reference path."""
    from ycnr_tpu.eval.recommend import build_rated_bits
    from ycnr_tpu.parallel import sharded_recommend_all

    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=9)
    mesh = make_mesh(4)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, 4, chunk_len=8,
                                    block_chunks=32, dtype=DT)  # host arrays
    bits = build_rated_bits(data.user_layout, ni)
    st = scatter_state(state_from_numpy(U0, V0, dtype=DT), meta, mesh)

    su, si, ss = sharded_recommend_all(mesh, st, data, meta, n=7)
    bu_, bi_, bs_ = sharded_recommend_all(mesh, st, data, meta, n=7,
                                          rated_bits=bits)
    np.testing.assert_array_equal(su, bu_)
    np.testing.assert_allclose(bs_, ss, rtol=0, atol=0)
    np.testing.assert_array_equal(bi_, si)


def test_sharded_recommend_all_matches_single_chip():
    from ycnr_tpu.eval.recommend import recommend_all
    from ycnr_tpu.parallel import sharded_recommend_all

    (tu, ti, tr), _, U0, V0, nu, ni = _setup(seed=6)
    mesh = make_mesh(4)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, 4, chunk_len=8,
                                    block_chunks=32, dtype=DT, mesh=mesh)
    gstate = state_from_numpy(U0, V0, dtype=DT)
    st = scatter_state(gstate, meta, mesh)

    su, si, ss = sharded_recommend_all(mesh, st, data, meta, n=7)
    from ycnr_tpu.ops.layout import build_blocked_csr as bb
    lay = bb(tu, ti, tr, nu, ni, 8, 32)
    gu, gi, gs = recommend_all(gstate, lay, n=7)

    order_s = np.argsort(su)
    order_g = np.argsort(gu)
    np.testing.assert_array_equal(su[order_s], gu[order_g])
    for a, b, uid in zip(si[order_s], gi[order_g], su[order_s]):
        rated = set(ti[tu == uid].tolist())
        m = min(7, ni - len(rated))  # -inf tail order is arbitrary
        np.testing.assert_array_equal(a[:m], b[:m])

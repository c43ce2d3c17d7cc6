"""Fused Pallas serving scorer vs the exact XLA path (ops/pallas_topn.py).

Runs the kernel in interpreter mode on the CPU test mesh. Factors/biases are
small integers, so every score is exactly representable in bf16 and f32 and
the two paths must return *identical value sequences* (both produce the true
top-n value multiset; only tie ordering of ids may differ). Id correctness is
asserted by exact rescoring, plus no rated leaks and no duplicates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ycnr_tpu.eval.recommend import (
    _topn_blocks,
    build_rated_bits,
    recommend_all,
)
from ycnr_tpu.models.base import MFState, device_layout
from ycnr_tpu.ops.layout import build_blocked_csr
from ycnr_tpu.ops.pallas_topn import (
    _chunk_perm,
    fused_supported,
    fused_topn_blocks,
)


def _int_problem(seed=0, n_users=300, n_items=2000, nnz=6000, k=8):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_users, nnz).astype(np.int32)
    i = rng.integers(0, n_items, nnz).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    r = rng.integers(1, 6, len(u)).astype(np.float32)
    lay = build_blocked_csr(u, i, r, n_users, n_items, 8)
    U = rng.integers(-2, 3, (n_users + 1, k)).astype(np.float32)
    V = rng.integers(-2, 3, (n_items + 1, k)).astype(np.float32)
    bu = rng.integers(-2, 3, n_users + 1).astype(np.float32)
    bi = rng.integers(-2, 3, n_items + 1).astype(np.float32)
    U[-1] = V[-1] = 0
    bu[-1] = bi[-1] = 0
    st = MFState(U=jnp.asarray(U), V=jnp.asarray(V), bu=jnp.asarray(bu),
                 bi=jnp.asarray(bi), mu=jnp.float32(1.0))
    bits = build_rated_bits(lay, n_items)
    return st, lay, bits, (u, i)


def _check_ids(st, lay, coo, ids, vals, n):
    """Every returned id: unrated, unique per row, true score == val."""
    U, V = np.asarray(st.U), np.asarray(st.V)
    bu, bi = np.asarray(st.bu), np.asarray(st.bi)
    eids = np.asarray(lay.entity_ids).reshape(-1)
    real = eids < st.n_users
    ue, idf, vf = eids[real], ids[real], vals[real]
    true = (float(st.mu) + bu[ue][:, None] + bi[idf]
            + np.einsum("uk,unk->un", U[ue], V[idf]))
    ok = vf > -1e37
    np.testing.assert_array_equal(true[ok], vf[ok])
    rated = {(int(a), int(b)) for a, b in zip(*coo)}
    for a, row, vr in zip(ue, idf, vf):
        live = row[vr > -1e37]
        assert len(set(live.tolist())) == len(live)  # no dups
        for b in live:
            assert (int(a), int(b)) not in rated  # no rated leaks


@pytest.mark.parametrize("score_bf16", [True, False])
def test_fused_matches_exact(score_bf16):
    st, lay, bits, coo = _int_problem()
    n = 10
    dlay = device_layout(lay)
    _, v_e = _topn_blocks(st, dlay, n, jnp.asarray(bits))
    ids_f, v_f = fused_topn_blocks(st, dlay.entity_ids, jnp.asarray(bits), n,
                                   tu=8, score_bf16=score_bf16,
                                   interpret=True)
    v_e = np.asarray(v_e).reshape(-1, n)
    v_f = np.asarray(v_f).reshape(-1, n)
    real = (np.asarray(lay.entity_ids) < st.n_users).reshape(-1)
    # integer scores: value sequences must agree exactly (true top-n multiset)
    np.testing.assert_array_equal(v_e[real], v_f[real])
    _check_ids(st, lay, coo, np.asarray(ids_f).reshape(-1, n), v_f, n)


def test_fused_odd_tile_tail():
    # U_B not a multiple of tu: partial last user tile must not corrupt rows
    st, lay, bits, coo = _int_problem(seed=3, n_users=150, nnz=3000)
    n = 6
    dlay = device_layout(lay)
    _, v_e = _topn_blocks(st, dlay, n, jnp.asarray(bits))
    u_b = lay.entity_ids.shape[1]
    tu = 16 if u_b % 16 else 24  # force a ragged tail
    ids_f, v_f = fused_topn_blocks(st, dlay.entity_ids, jnp.asarray(bits), n,
                                   tu=tu, interpret=True)
    real = (np.asarray(lay.entity_ids) < st.n_users).reshape(-1)
    np.testing.assert_array_equal(
        np.asarray(v_e).reshape(-1, n)[real],
        np.asarray(v_f).reshape(-1, n)[real])
    _check_ids(st, lay, coo, np.asarray(ids_f).reshape(-1, n),
               np.asarray(v_f).reshape(-1, n), n)


def test_recommend_all_fused_api():
    st, lay, bits, coo = _int_problem(seed=1)
    ue, ie, se = recommend_all(st, lay, n=10, method="exact")
    uf, i_f, sf = recommend_all(st, lay, n=10, method="fused")
    np.testing.assert_array_equal(ue, uf)
    np.testing.assert_array_equal(se, sf)  # integer scores: exact agreement
    u32, i32, s32 = recommend_all(st, lay, n=10, method="fused32")
    np.testing.assert_array_equal(se, s32)


def test_small_catalog_falls_back():
    # S <= n: fused unsupported; recommend_all must silently use exact
    st, lay, bits, coo = _int_problem(seed=2, n_items=500, nnz=2000)
    assert not fused_supported(500, 10)
    ue, ie, se = recommend_all(st, lay, n=10, method="exact")
    uf, i_f, sf = recommend_all(st, lay, n=10, method="fused")
    np.testing.assert_array_equal(se, sf)
    np.testing.assert_array_equal(ie, i_f)


def test_chunk_perm_is_bijection():
    for m_pad, ic in [(4096, 4096), (28672, 4096), (8192, 4096)]:
        p = _chunk_perm(m_pad, ic)
        assert np.array_equal(np.sort(p), np.arange(m_pad))
        # word/bit identity the kernel relies on: the catalog item at slot j
        # has word index (j // ic)*(ic // 32) + (j % (ic // 32)) ... i.e.
        # perm[j] >> 5 == chunk_word_base + (j % wc), perm[j] & 31 == j // wc
        wc = ic // 32
        j = np.arange(m_pad)
        c, jj = j // ic, j % ic
        assert np.array_equal(p >> 5, c * wc + (jj % wc))
        assert np.array_equal(p & 31, jj // wc)


def _int_state_arrays(seed, n_users, n_items, k=8):
    rng = np.random.default_rng(seed)
    U0 = rng.integers(-2, 3, (n_users, k)).astype(np.float64)
    V0 = rng.integers(-2, 3, (n_items, k)).astype(np.float64)
    return U0, V0


def test_sharded_fused_matches_sharded_exact():
    """User-sharded mesh serving: fused Pallas scorer per shard must return
    the same top-n value sequences as the exact sharded path (integer
    factors -> scores exact in bf16; ids pinned by exact rescoring)."""
    from ycnr_tpu.models.base import state_from_numpy
    from ycnr_tpu.parallel import (
        build_sharded_data,
        make_mesh,
        scatter_state,
        sharded_recommend_all,
    )

    rng = np.random.default_rng(11)
    n_users, n_items, nnz, k, n = 300, 2000, 6000, 8, 7
    u = rng.integers(0, n_users, nnz).astype(np.int32)
    i = rng.integers(0, n_items, nnz).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    r = rng.integers(1, 6, len(u)).astype(np.float32)
    U0, V0 = _int_state_arrays(11, n_users, n_items, k)
    mesh = make_mesh(4)
    data, meta = build_sharded_data(u, i, r, n_users, n_items, 4,
                                    chunk_len=8, block_chunks=32,
                                    dtype=jnp.float32)
    bits = build_rated_bits(data.user_layout, n_items)
    st = scatter_state(state_from_numpy(U0, V0, dtype=jnp.float32),
                       meta, mesh)
    eu, ei, es = sharded_recommend_all(mesh, st, data, meta, n=n,
                                       rated_bits=bits)
    fu, fi, fs = sharded_recommend_all(mesh, st, data, meta, n=n,
                                       rated_bits=bits, method="fused")
    oe, of = np.argsort(eu), np.argsort(fu)
    np.testing.assert_array_equal(eu[oe], fu[of])
    np.testing.assert_array_equal(es[oe], fs[of])
    # id validity by exact rescoring (ties may permute between paths)
    true = np.einsum("uk,unk->un", U0[fu], V0[fi])
    live = fs > -1e37
    np.testing.assert_array_equal(true[live], fs[live])
    rated = {(int(a), int(b)) for a, b in zip(u, i)}
    assert not any((int(a), int(b)) in rated
                   for a, row, lv in zip(fu, fi, live)
                   for b, ok in zip(row, lv) if ok)


def test_dual_fused_matches_dual_exact():
    """Item-sharded (dual) mesh serving with the fused scorer in cat space."""
    from ycnr_tpu.models.base import state_from_numpy
    from ycnr_tpu.parallel.dual import (
        build_dual_sharded_data,
        dual_recommend_all,
        dual_scatter_state,
    )
    from ycnr_tpu.parallel import make_mesh

    rng = np.random.default_rng(13)
    n_users, n_items, nnz, k, n = 200, 3000, 5000, 8, 6
    u = rng.integers(0, n_users, nnz).astype(np.int32)
    i = rng.integers(0, n_items, nnz).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    r = rng.integers(1, 6, len(u)).astype(np.float32)
    U0, V0 = _int_state_arrays(13, n_users, n_items, k)
    mesh = make_mesh(4)
    data, meta = build_dual_sharded_data(u, i, r, n_users, n_items, 4,
                                         chunk_len=8, block_chunks=32,
                                         dtype=jnp.float32, mesh=mesh,
                                         host_user_layout=True)
    st = dual_scatter_state(state_from_numpy(U0, V0, dtype=jnp.float32),
                            meta, mesh)
    eu, ei, es = dual_recommend_all(mesh, st, data, meta, n=n)
    fu, fi, fs = dual_recommend_all(mesh, st, data, meta, n=n,
                                    method="fused")
    oe, of = np.argsort(eu), np.argsort(fu)
    np.testing.assert_array_equal(eu[oe], fu[of])
    np.testing.assert_array_equal(es[oe], fs[of])
    live = fs > -1e37
    in_cat = fi < n_items  # clamped pad picks only ever ride NEG_INF vals
    assert np.all(in_cat[live])
    true = np.einsum("uk,unk->un", U0[fu], np.where(
        in_cat[..., None], V0[np.minimum(fi, n_items - 1)], 0.0))
    np.testing.assert_array_equal(true[live], fs[live])

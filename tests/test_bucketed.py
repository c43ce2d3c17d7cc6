"""Bucketed layout + phases: round-trip and parity vs the blocked path."""

import jax.numpy as jnp
import numpy as np

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.als import als_epoch
from ycnr_tpu.models.base import device_layout, state_from_numpy, unpad
from ycnr_tpu.models.bucketed_phase import (
    als_epoch_bucketed,
    device_bucketed,
    ials_epoch_bucketed,
)
from ycnr_tpu.models.ials import ials_epoch
from ycnr_tpu.ops.bucketed import bucketed_stats, build_bucketed
from ycnr_tpu.ops.layout import build_blocked_csr
from ycnr_tpu.oracle import numpy_mf as om


def _setup(seed=0, n_users=60, n_items=45, nnz=2500, k=6):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    (tu, ti, tr), _ = train_test_split(u, i, r, 0.1, seed)
    rng = np.random.default_rng(seed)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    return tu, ti, tr, U0, V0, n_users, n_items


def test_bucketed_roundtrip():
    tu, ti, tr, *_, nu, ni = _setup()
    groups = build_bucketed(tu, ti, tr, nu, ni, chunk_len=8)
    st = bucketed_stats(groups, len(tr))
    assert 0 < st["fill"] <= 1.0
    # reconstruct COO from buckets
    es, os_, rs = [], [], []
    for g in groups:
        eid = np.repeat(np.asarray(g.entity_ids).reshape(-1), g.rows)
        oi = np.asarray(g.other_idx).reshape(-1)
        rr = np.asarray(g.rating).reshape(-1)
        valid = oi != ni
        es.append(eid[valid])
        os_.append(oi[valid])
        rs.append(rr[valid])
    e = np.concatenate(es)
    o = np.concatenate(os_)
    r2 = np.concatenate(rs)
    order = np.lexsort((o, e))
    ref = np.lexsort((ti, tu))
    np.testing.assert_array_equal(e[order], tu[ref])
    np.testing.assert_array_equal(o[order], ti[ref])
    np.testing.assert_allclose(r2[order], tr[ref])


def test_bucketed_als_matches_blocked_and_oracle():
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=3)
    lam = 0.05
    ug = device_bucketed(build_bucketed(tu, ti, tr, nu, ni, 8), jnp.float64)
    ig = device_bucketed(build_bucketed(ti, tu, tr, ni, nu, 8), jnp.float64)
    dul = device_layout(build_blocked_csr(tu, ti, tr, nu, ni, 8, 32),
                        jnp.float64)
    dil = device_layout(build_blocked_csr(ti, tu, tr, ni, nu, 8, 32),
                        jnp.float64)
    sb = state_from_numpy(U0, V0, dtype=jnp.float64)
    sk = state_from_numpy(U0, V0, dtype=jnp.float64)
    Uo, Vo = U0.copy(), V0.copy()
    for _ in range(3):
        sb = als_epoch_bucketed(sb, ug, ig, lam)
        sk = als_epoch(sk, dul, dil, lam)
        Uo, Vo = om.als_wr_epoch(Uo, Vo, tu, ti, tr, lam)
    np.testing.assert_allclose(np.asarray(sb.U), np.asarray(sk.U),
                               rtol=1e-9, atol=1e-9)
    Ud, Vd, *_ = unpad(sb)
    np.testing.assert_allclose(Ud, Uo, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Vd, Vo, rtol=1e-9, atol=1e-9)
    assert np.all(np.asarray(sb.U)[-1] == 0)


def test_bucketed_ials_matches_oracle():
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=4)
    lam, alpha = 0.1, 8.0
    ug = device_bucketed(build_bucketed(tu, ti, tr, nu, ni, 8), jnp.float64)
    ig = device_bucketed(build_bucketed(ti, tu, tr, ni, nu, 8), jnp.float64)
    sb = state_from_numpy(U0, V0, dtype=jnp.float64)
    Uo, Vo = U0.copy(), V0.copy()
    for _ in range(2):
        sb = ials_epoch_bucketed(sb, ug, ig, lam, alpha)
        Uo, Vo = om.ials_epoch(Uo, Vo, tu, ti, tr, lam, alpha)
    Ud, Vd, *_ = unpad(sb)
    np.testing.assert_allclose(Ud, Uo, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(Vd, Vo, rtol=1e-8, atol=1e-10)


def test_bucketed_mega_entity():
    # one user rating everything (single row spanning many chunks)
    u = np.zeros(500, np.int32)
    i = np.arange(500, dtype=np.int32) % 500
    r = np.ones(500, np.float32)
    groups = build_bucketed(u, i, r, 1, 500, chunk_len=8)
    assert sum(g.other_idx.shape[0] * g.other_idx.shape[1]
               for g in groups) >= 1
    total_valid = sum(int((np.asarray(g.other_idx) != 500).sum())
                      for g in groups)
    assert total_valid == 500


def test_bf16_gather_close_to_f32():
    from ycnr_tpu.models.bucketed_phase import als_epoch_bucketed
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=6, nnz=4000)
    ug = device_bucketed(build_bucketed(tu, ti, tr, nu, ni, 8), jnp.float32)
    ig = device_bucketed(build_bucketed(ti, tu, tr, ni, nu, 8), jnp.float32)
    s32 = state_from_numpy(U0, V0, dtype=jnp.float32)
    s16 = state_from_numpy(U0, V0, dtype=jnp.float32)
    for _ in range(3):
        s32 = als_epoch_bucketed(s32, ug, ig, 0.05)
        s16 = als_epoch_bucketed(s16, ug, ig, 0.05, gather_bf16=True)
    a, b = np.asarray(s32.U), np.asarray(s16.U)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 2e-2, rel  # bf16 inputs, f32 accumulation


def test_fused_epochs_match_sequential():
    """als/ials_epochs_bucketed (scan over epochs + in-program RMSE) must
    reproduce the per-epoch dispatch loop: same factors, same RMSE values."""
    from ycnr_tpu.models.base import rmse_padded_jit
    from ycnr_tpu.models.bucketed_phase import (
        als_epochs_bucketed,
        ials_epochs_bucketed,
    )
    from ycnr_tpu.ops.layout import pad_coo

    tu, ti, tr, U0, V0, nu, ni = _setup(seed=5)
    # a held-out COO for the in-program RMSE
    su, si, sr = tu[::7], ti[::7], tr[::7]
    pu, pi, pr, n = pad_coo(su, si, sr, nu, ni, 256)
    coo = (jnp.asarray(pu), jnp.asarray(pi), jnp.asarray(pr),
           jnp.asarray(n))
    ug = device_bucketed(build_bucketed(tu, ti, tr, nu, ni, 8))
    ig = device_bucketed(build_bucketed(ti, tu, tr, ni, nu, 8))
    for algo in ("als", "ials"):
        st_seq = state_from_numpy(U0, V0)
        rms_seq = []
        for _ in range(3):
            if algo == "als":
                st_seq = als_epoch_bucketed(st_seq, ug, ig, 0.05)
            else:
                st_seq = ials_epoch_bucketed(st_seq, ug, ig, 0.05, 10.0)
            rms_seq.append(float(rmse_padded_jit(st_seq, *coo[:3],
                                                 int(n))))
        st_f = state_from_numpy(U0, V0)
        if algo == "als":
            st_f, (rt, rq) = als_epochs_bucketed(st_f, ug, ig, 0.05, 3,
                                                 coo, coo)
        else:
            st_f, (rt, rq) = ials_epochs_bucketed(st_f, ug, ig, 0.05, 10.0,
                                                  3, coo, coo)
        np.testing.assert_allclose(np.asarray(st_f.U),
                                   np.asarray(st_seq.U), rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rt), rms_seq, rtol=1e-5)
        # train_coo == test_coo here, so both RMSE streams must agree
        np.testing.assert_allclose(np.asarray(rq), np.asarray(rt),
                                   rtol=1e-6)
        # train_coo=None path returns an empty second stream
        st_n = state_from_numpy(U0, V0)
        if algo == "als":
            st_n, (rt2, empty) = als_epochs_bucketed(st_n, ug, ig, 0.05, 3,
                                                     coo, None)
        else:
            st_n, (rt2, empty) = ials_epochs_bucketed(st_n, ug, ig, 0.05,
                                                      10.0, 3, coo, None)
        assert empty == ()
        np.testing.assert_allclose(np.asarray(rt2), np.asarray(rt),
                                   rtol=1e-6)


def test_geometry_lockstep_with_builder():
    """bucketed_geometry(counts) must predict build_bucketed's block shapes
    exactly — the first-epoch program warm (train/loop.py) compiles on
    zero layouts of these shapes and relies on the jit cache key matching
    the real layout's."""
    from ycnr_tpu.models.bucketed_phase import zero_bucketed
    from ycnr_tpu.ops.bucketed import bucketed_geometry

    for seed, nu, ni, nnz in ((0, 60, 45, 2500), (3, 700, 300, 30_000),
                              (7, 40, 500_000, 1000)):
        u, i, r = synthetic_ratings(nu, ni, nnz, true_rank=4, seed=seed)
        for kw in (dict(), dict(max_groups=4),
                   dict(max_groups=8, target_bytes=1 << 18, rank_hint=16)):
            lay = build_bucketed(u, i, r, nu, ni, **kw)
            counts = np.bincount(np.asarray(u), minlength=nu)
            geo = bucketed_geometry(
                counts, kw.get("rank_hint", 64),
                target_bytes=kw.get("target_bytes", 192 * 2**20),
                max_groups=kw.get("max_groups", 16))
            got = [(g.rows,) + tuple(g.entity_ids.shape) for g in lay]
            assert got == [(R, nb, ne_b) for R, nb, ne_b in geo]
            z = zero_bucketed(geo, nu, ni)
            for zg, lg in zip(z, lay):
                assert zg.other_idx.shape == lg.other_idx.shape
                assert zg.entity_ids.shape == lg.entity_ids.shape


def test_gather_split_bitwise():
    """Split-gather phases (rank-128 probe) must reproduce the unsplit
    normal equations: same math, block-assembled (XLA's einsum blocking
    differs across shapes, so equality is f64-reduction-order tight, not
    bitwise). ALS and iALS."""
    tu, ti, tr, U0, V0, nu, ni = _setup(k=8)
    lay_u = build_bucketed(tu, ti, tr, nu, ni, 8, 8, max_groups=4)
    lay_i = build_bucketed(ti, tu, tr, ni, nu, 8, 8, max_groups=4)
    dul = device_bucketed(lay_u, jnp.float64)
    dil = device_bucketed(lay_i, jnp.float64)
    for fn, kw in ((als_epoch_bucketed, {}),
                   (ials_epoch_bucketed, {"alpha": 40.0})):
        s0 = state_from_numpy(U0, V0, dtype=jnp.float64)
        s1 = state_from_numpy(U0, V0, dtype=jnp.float64)
        if kw:
            a = fn(s0, dul, dil, 0.05, kw["alpha"])
            b = fn(s1, dul, dil, 0.05, kw["alpha"], gather_split=True)
        else:
            a = fn(s0, dul, dil, 0.05)
            b = fn(s1, dul, dil, 0.05, gather_split=True)
        assert np.allclose(np.asarray(a.U), np.asarray(b.U),
                           rtol=1e-10, atol=1e-12)
        assert np.allclose(np.asarray(a.V), np.asarray(b.V),
                           rtol=1e-10, atol=1e-12)

"""Wire-order storage (round 5): factor tables live in wire order.

Parity contract: a phase_packed_wire epoch computes the SAME per-entity
normal equations as the classic scatter-free OOC epoch — the only delta
is reduction ORDER (each row's ratings re-sort by storage id instead of
entity id), so float64 agreement is ~1e-12, not bitwise. Cold entities
keep their init rows (the classic assemble's sentinel semantics), and
the storage plan built from counts alone must agree with the wire a
later build emits (geometry lockstep).
"""

import numpy as np
import jax.numpy as jnp

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import init_state
from ycnr_tpu.models.ooc import (
    DeviceWirePlan,
    als_epoch_ooc,
    als_epoch_wire,
    ials_epoch_ooc,
    ials_epoch_wire,
    wire_storage_init,
)
from ycnr_tpu.ops.packed import build_packed, wire_storage_plan

NU, NI = 210, 80


def _data(seed=3):
    u, i, r = synthetic_ratings(NU, NI, 4000, true_rank=4, seed=seed)
    # force some cold users: strip every rating of users 0..4
    keep = u >= 5
    return u[keep], i[keep], r[keep]


def _builds(u, i, r, groups=4):
    cu = np.bincount(u, minlength=NU)
    ci = np.bincount(i, minlength=NI)
    up = wire_storage_plan(cu, rank_hint=8, max_groups=groups)
    ip = wire_storage_plan(ci, rank_hint=8, max_groups=groups)
    kw = dict(rank_hint=8, max_groups=groups)
    classic_u = build_packed(u, i, r, NU, NI, **kw)
    classic_i = build_packed(i, u, r, NI, NU, **kw)
    ws_u = build_packed(u, i, r, NU, NI, other_plan=ip, **kw)
    ws_i = build_packed(i, u, r, NI, NU, other_plan=up, **kw)
    return up, ip, classic_u, classic_i, ws_u, ws_i


def _run_pair(algo="als", epochs=2):
    u, i, r = _data()
    up, ip, cu_g, ci_g, wu_g, wi_g = _builds(u, i, r)
    k, lam, alpha = 8, 0.05, 20.0

    st = init_state(NU, NI, k, seed=0, dtype=jnp.float64)
    for _ in range(epochs):
        if algo == "als":
            st = als_epoch_ooc(st, cu_g, ci_g, lam)
        else:
            st = ials_epoch_ooc(st, cu_g, ci_g, lam, alpha)

    U = wire_storage_init(up, k, seed=0, dtype=jnp.float64)
    V = wire_storage_init(ip, k, seed=0, entity_offset=NU,
                          dtype=jnp.float64)
    u_pd, i_pd = DeviceWirePlan(up), DeviceWirePlan(ip)
    for _ in range(epochs):
        if algo == "als":
            U, V = als_epoch_wire(U, V, wu_g, wi_g, lam, u_pd, i_pd)
        else:
            U, V = ials_epoch_wire(U, V, wu_g, wi_g, lam, alpha,
                                   u_pd, i_pd)
    return st, np.asarray(U), np.asarray(V), up, ip


def test_storage_init_matches_classic_init():
    up = wire_storage_plan(np.bincount(_data()[0], minlength=NU),
                           rank_hint=8)
    ip = wire_storage_plan(np.bincount(_data()[1], minlength=NI),
                           rank_hint=8)
    st = init_state(NU, NI, 8, seed=7, dtype=jnp.float64)
    U = np.asarray(wire_storage_init(up, 8, seed=7, dtype=jnp.float64))
    V = np.asarray(wire_storage_init(ip, 8, seed=7, entity_offset=NU,
                                     dtype=jnp.float64))
    np.testing.assert_array_equal(U[up.perm], np.asarray(st.U)[:NU])
    np.testing.assert_array_equal(V[ip.perm], np.asarray(st.V)[:NI])
    # tail rows (group padding / scratch / zero) start zero
    mask = np.ones(up.table_rows, bool)
    mask[up.perm] = False
    assert np.all(U[mask] == 0)


def test_als_parity_f64():
    st, U, V, up, ip = _run_pair("als")
    np.testing.assert_allclose(U[up.perm], np.asarray(st.U)[:NU],
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(V[ip.perm], np.asarray(st.V)[:NI],
                               rtol=0, atol=1e-11)


def test_ials_parity_f64():
    st, U, V, up, ip = _run_pair("ials", epochs=1)
    np.testing.assert_allclose(U[up.perm], np.asarray(st.U)[:NU],
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(V[ip.perm], np.asarray(st.V)[:NI],
                               rtol=0, atol=1e-11)


def test_cold_rows_and_zero_row_persist():
    st, U, V, up, ip = _run_pair("als", epochs=1)
    init_U = np.asarray(wire_storage_init(up, 8, seed=0,
                                          dtype=jnp.float64))
    # users 0..4 were stripped of all ratings -> cold: rows untouched
    cold = up.perm[:5]
    assert np.all(cold >= up.rows)  # cold region by construction
    np.testing.assert_array_equal(U[cold], init_U[cold])
    # the twin-gather sentinel row stays exactly zero after training
    assert np.all(U[up.zero_row] == 0)
    assert np.all(V[ip.zero_row] == 0)


def test_plan_lockstep_with_build():
    """plan.perm from counts == the positions the built wire assigns."""
    u, i, r = _data()
    up, ip, _, _, ws_u, _ = _builds(u, i, r)
    pos = 0
    for g, off in zip(ws_u, up.offs):
        eid = np.asarray(g.eid)
        nb, ne = eid.shape
        rows = off[:, None] + np.arange(ne)[None, :]
        real = eid < NU
        assert np.array_equal(up.perm[eid[real]], rows[real])
        pos += nb * ne
    assert pos == up.rows
    # the decode sentinel is the twin table's zero row
    for g in ws_u:
        assert g.n_other == ip.zero_row


def test_storage_init_chunked_burn_matches():
    """The chunked RNG burn must consume the same stream as one call."""
    import ycnr_tpu.models.ooc as ooc_mod

    up = wire_storage_plan(np.bincount(_data()[1], minlength=NI),
                           rank_hint=8)
    a = np.asarray(wire_storage_init(up, 8, seed=3, entity_offset=NU,
                                     dtype=jnp.float64))
    rng = np.random.default_rng(3)
    rng.normal(0.0, 0.1, (NU, 8))  # one-shot burn
    vals = rng.normal(0.0, 0.1, (NI, 8))
    np.testing.assert_array_equal(a[up.perm], vals)
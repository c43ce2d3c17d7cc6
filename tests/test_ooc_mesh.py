"""Sharded out-of-core training (parallel/ooc_mesh.py) parity.

The sharded OOC epoch must reproduce the single-chip OOC epoch (itself
bitwise the resident epoch, tests/test_ooc.py) to float64 reduction-
order tightness across shard counts — the same standard as the resident
sharded suite (BASELINE.json:5 asks 1e-5 RMSE parity; f64 gives ~1e-9).
Runs on the fake CPU mesh (conftest forces 8 virtual devices).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import MFState, init_state, zero_cold_entities
from ycnr_tpu.models.ooc import als_epoch_ooc, ials_epoch_ooc
from ycnr_tpu.ops.packed import build_packed
from ycnr_tpu.parallel.mesh import make_mesh
from ycnr_tpu.parallel.ooc_mesh import (build_sharded_wire,
                                        feed_sharded_wire,
                                        make_sharded_ooc_epoch,
                                        put_sharded_wire)
from ycnr_tpu.parallel.shard import gather_state, scatter_state

NU, NI = 401, 157
LAM, ALPHA = 0.05, 20.0


@pytest.fixture(scope="module")
def coo():
    u, i, r = synthetic_ratings(NU, NI, 12_000, true_rank=4, noise=0.2,
                                seed=3)
    return u, i, r


def _single_chip(coo, alpha=None, epochs=2):
    u, i, r = coo
    upk = build_packed(u, i, r, NU, NI, rank_hint=8, max_groups=4)
    ipk = build_packed(i, u, r, NI, NU, rank_hint=8, max_groups=4)
    st = init_state(NU, NI, 8, seed=0, dtype=jnp.float64)
    st = zero_cold_entities(st, u, i)
    for _ in range(epochs):
        if alpha is None:
            st = als_epoch_ooc(st, upk, ipk, LAM)
        else:
            st = ials_epoch_ooc(st, upk, ipk, LAM, ALPHA)
    return st


def _sharded(coo, D, alpha=None, epochs=2):
    u, i, r = coo
    mesh = make_mesh(D)
    sw, meta = build_sharded_wire(u, i, r, NU, NI, D, rank_hint=8,
                                  max_groups=4)
    sw = put_sharded_wire(sw, mesh)
    st0 = init_state(NU, NI, 8, seed=0, dtype=jnp.float64)
    st0 = zero_cold_entities(st0, u, i)
    sst = scatter_state(st0, meta, mesh)
    epoch = make_sharded_ooc_epoch(mesh, sw, LAM, alpha=alpha,
                                   dtype=jnp.float64)
    for _ in range(epochs):
        sst = epoch(sst)
    return gather_state(sst, meta)


@pytest.mark.parametrize("D", [1, 4])
def test_sharded_ooc_als_matches_single_chip(coo, D):
    want = _single_chip(coo)
    got = _sharded(coo, D)
    np.testing.assert_allclose(np.asarray(got.U[:NU]),
                               np.asarray(want.U[:NU]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.V[:NI]),
                               np.asarray(want.V[:NI]), atol=1e-9)


def test_sharded_ooc_ials_matches_single_chip(coo):
    want = _single_chip(coo, alpha=ALPHA)
    got = _sharded(coo, 4, alpha=ALPHA)
    np.testing.assert_allclose(np.asarray(got.U[:NU]),
                               np.asarray(want.U[:NU]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.V[:NI]),
                               np.asarray(want.V[:NI]), atol=1e-9)


def test_streamed_feed_matches_pinned_bitwise(coo):
    """The streamed tier (feed_sharded_wire per epoch + wire_as_args
    epoch with donated wire buffers) is the SAME program as the pinned
    closure epoch — factors must match bitwise after two epochs."""
    u, i, r = coo
    D = 4
    mesh = make_mesh(D)
    sw, meta = build_sharded_wire(u, i, r, NU, NI, D, rank_hint=8,
                                  max_groups=4)
    st0 = init_state(NU, NI, 8, seed=0, dtype=jnp.float64)
    st0 = zero_cold_entities(st0, u, i)

    ep = make_sharded_ooc_epoch(mesh, put_sharded_wire(sw, mesh), LAM,
                                dtype=jnp.float64)
    sst = scatter_state(st0, meta, mesh)
    for _ in range(2):
        sst = ep(sst)
    want = gather_state(sst, meta)

    eps = make_sharded_ooc_epoch(mesh, sw, LAM, dtype=jnp.float64,
                                 wire_as_args=True)
    # fresh init: the pinned epoch donated its scattered state, which can
    # alias st0's replicated leaves
    st1 = init_state(NU, NI, 8, seed=0, dtype=jnp.float64)
    st1 = zero_cold_entities(st1, u, i)
    sst = scatter_state(st1, meta, mesh)
    for _ in range(2):  # re-fed every epoch; the epoch donates the wire
        sst = eps(sst, feed_sharded_wire(sw, mesh))
    got = gather_state(sst, meta)
    np.testing.assert_array_equal(np.asarray(got.U), np.asarray(want.U))
    np.testing.assert_array_equal(np.asarray(got.V), np.asarray(want.V))


def test_sharded_ooc_cold_entities_zero(coo):
    """Users/items with no ratings solve to exactly zero on the mesh —
    the mode-interchangeability contract (docs/SCALING.md)."""
    u, i, r = coo
    got = _sharded(coo, 4, epochs=1)
    cold_u = np.nonzero(np.bincount(u, minlength=NU) == 0)[0]
    cold_i = np.nonzero(np.bincount(i, minlength=NI) == 0)[0]
    if len(cold_u):
        assert np.all(np.asarray(got.U)[cold_u] == 0.0)
    if len(cold_i):
        assert np.all(np.asarray(got.V)[cold_i] == 0.0)

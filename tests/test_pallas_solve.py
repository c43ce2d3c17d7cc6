"""Pallas batched SPD solve vs NumPy, in interpreter mode on CPU.

The kernel's algorithm (batch-vectorized Cholesky + substitutions with
static column loops) is validated here through the Pallas interpreter; the
compiled-TPU path is exercised by bench.py and the TPU parity runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ycnr_tpu.ops.pallas_solve import pallas_spd_solve


def _spd_batch(B, n, seed=0, cond_spread=1.0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n))
    A = np.einsum("bij,bkj->bik", M, M) / n + 0.1 * np.eye(n)
    A *= (1.0 + cond_spread * rng.uniform(size=(B, 1, 1)))
    b = rng.normal(size=(B, n))
    return A.astype(np.float32), b.astype(np.float32)


@pytest.mark.parametrize("n", [8, 16, 64])
def test_matches_numpy(n):
    A, b = _spd_batch(24, n, seed=n)
    x = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                    batch_tile=8, interpret=True))
    ref = np.linalg.solve(A.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_pad_to_tile():
    A, b = _spd_batch(13, 16, seed=1)  # 13 not a multiple of the tile
    x = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                    batch_tile=8, interpret=True))
    assert x.shape == (13, 16)
    ref = np.linalg.solve(A.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_identity_guard_rows():
    # padding systems are I x = 0 and must solve to exactly 0
    n = 16
    A = np.tile(np.eye(n, dtype=np.float32)[None], (8, 1, 1))
    b = np.zeros((8, n), np.float32)
    x = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                    batch_tile=8, interpret=True))
    assert np.all(x == 0)


def test_unrolled_variant_matches():
    A, b = _spd_batch(16, 8, seed=3)
    xl = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                     batch_tile=8, interpret=True,
                                     variant="looped"))
    xu = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                     batch_tile=8, interpret=True,
                                     variant="unrolled"))
    np.testing.assert_allclose(xl, xu, rtol=1e-5, atol=1e-6)


def test_panel_variant_matches():
    for n in (8, 16, 64, 24):  # incl. non-multiple-of-16 rank
        A, b = _spd_batch(16, n, seed=n + 1)
        xp = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                         batch_tile=8, interpret=True,
                                         variant="panel"))
        ref = np.linalg.solve(A.astype(np.float64),
                              b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(xp, ref, rtol=2e-3, atol=2e-4)


def test_lanes_variant_matches():
    for n in (16, 64):
        A, b = _spd_batch(24, n, seed=n + 2)
        xl = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                         batch_tile=8, interpret=True,
                                         variant="lanes"))
        ref = np.linalg.solve(A.astype(np.float64),
                              b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(xl, ref, rtol=2e-3, atol=2e-4)


def test_rank128_routes_to_static_hbm():
    # n=128: the lane-axis layout's [n, n, 128] block (8 MB) cannot ride
    # the double-buffering input pipeline; the dispatcher must route to
    # the manually-DMA'd single-buffered static kernel (static_hbm) and
    # stay correct (rank-128 ALS is 79% solves — tools/attrib_als.py).
    A, b = _spd_batch(4, 128, seed=7)
    x = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True, variant="static"))
    ref = np.linalg.solve(A.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_huge_rank_falls_back_to_panel():
    # n=192: the [n, n, 128] block is 18 MB — beyond VMEM even
    # single-buffered, so the dispatcher falls back to the batch-first
    # panel tiling with a VMEM-sized tile and stays correct.
    A, b = _spd_batch(4, 192, seed=11)
    x = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                    interpret=True, variant="static"))
    ref = np.linalg.solve(A.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-4)


def test_static_variant_matches():
    for n in (16, 64):
        A, b = _spd_batch(16, n, seed=n + 5)
        xs = np.asarray(pallas_spd_solve(jnp.asarray(A), jnp.asarray(b),
                                         batch_tile=8, interpret=True,
                                         variant="static"))
        ref = np.linalg.solve(A.astype(np.float64),
                              b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(xs, ref, rtol=2e-3, atol=2e-4)

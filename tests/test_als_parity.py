"""Device ALS-WR vs NumPy oracle (SURVEY.md §4 item 1: CPU oracle parity).

The float64 run must match the oracle to near machine precision — same math,
different execution engine. The float32 run (production dtype) must track it
to the BASELINE.json:5 class of tolerance (1e-3 on RMSE).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.als import als_epoch
from ycnr_tpu.models.base import device_layout, rmse_padded, state_from_numpy, unpad
from ycnr_tpu.ops.layout import build_blocked_csr, pad_coo
from ycnr_tpu.oracle import numpy_mf as om


def _setup(seed=0, n_users=60, n_items=40, nnz=2500, k=6, chunk_len=8,
           block_chunks=32):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed)
    rng = np.random.default_rng(seed)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    ul = build_blocked_csr(tu, ti, tr, n_users, n_items, chunk_len, block_chunks)
    il = build_blocked_csr(ti, tu, tr, n_items, n_users, chunk_len, block_chunks)
    return (tu, ti, tr), (su, si, sr), U0, V0, ul, il, n_users, n_items


@pytest.mark.parametrize("block_chunks", [None, 32])
def test_als_parity_f64(block_chunks):
    (tu, ti, tr), _, U0, V0, ul, il, nu, ni = _setup(block_chunks=block_chunks or 32)
    lam = 0.05

    state = state_from_numpy(U0, V0, dtype=jnp.float64)
    dul = device_layout(ul, jnp.float64)
    dil = device_layout(il, jnp.float64)
    Uo, Vo = U0.copy(), V0.copy()
    for _ in range(3):
        state = als_epoch(state, dul, dil, lam)
        Uo, Vo = om.als_wr_epoch(Uo, Vo, tu, ti, tr, lam)
    Ud, Vd, *_ = unpad(state)
    # cold entities keep init in oracle; device writes only layout entities too
    np.testing.assert_allclose(Ud, Uo, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Vd, Vo, rtol=1e-9, atol=1e-9)


def test_als_parity_f32_rmse():
    (tu, ti, tr), (su, si, sr), U0, V0, ul, il, nu, ni = _setup(seed=5)
    lam = 0.05
    state = state_from_numpy(U0, V0, dtype=jnp.float32)
    dul = device_layout(ul, jnp.float32)
    dil = device_layout(il, jnp.float32)
    Uo, Vo = U0.copy(), V0.copy()
    pu, pi, pr, n = pad_coo(su, si, sr, nu, ni, 256)
    dpu, dpi, dpr = jnp.asarray(pu), jnp.asarray(pi), jnp.asarray(pr)
    for ep in range(3):
        state = als_epoch(state, dul, dil, lam)
        Uo, Vo = om.als_wr_epoch(Uo, Vo, tu, ti, tr, lam)
        r_dev = float(rmse_padded(state, dpu, dpi, dpr, n))
        r_ora = om.rmse(Uo, Vo, su, si, sr)
        assert abs(r_dev - r_ora) < 1e-3, (ep, r_dev, r_ora)


def test_als_cold_entities_keep_zero_trash_row():
    # users 10..19 have no ratings; trailing trash row must stay zero
    rng = np.random.default_rng(0)
    tu = rng.integers(0, 10, 200).astype(np.int32)
    ti = rng.integers(0, 15, 200).astype(np.int32)
    tr = rng.uniform(1, 5, 200).astype(np.float32)
    nu, ni = 20, 15
    U0 = rng.normal(0, 0.1, (nu, 4))
    V0 = rng.normal(0, 0.1, (ni, 4))
    ul = build_blocked_csr(tu, ti, tr, nu, ni, 8)
    il = build_blocked_csr(ti, tu, tr, ni, nu, 8)
    state = state_from_numpy(U0, V0, dtype=jnp.float64)
    state = als_epoch(state, device_layout(ul, jnp.float64),
                      device_layout(il, jnp.float64), 0.1)
    U = np.asarray(state.U)
    assert np.all(U[-1] == 0), "trash row polluted"
    np.testing.assert_allclose(U[10:20], U0[10:20])  # cold users untouched
    V = np.asarray(state.V)
    assert np.all(V[-1] == 0)

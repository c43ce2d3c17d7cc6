"""Device iALS vs NumPy oracle (SURVEY.md §4 item 1, M4)."""

import jax.numpy as jnp
import numpy as np

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import device_layout, state_from_numpy, unpad
from ycnr_tpu.models.ials import ials_epoch
from ycnr_tpu.ops.layout import build_blocked_csr
from ycnr_tpu.oracle import numpy_mf as om


def test_ials_parity_f64():
    n_users, n_items, k = 50, 35, 5
    u, i, r = synthetic_ratings(n_users, n_items, 1800, true_rank=4, seed=1)
    (tu, ti, tr), _ = train_test_split(u, i, r, 0.1, 1)
    rng = np.random.default_rng(1)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    lam, alpha = 0.1, 10.0

    ul = build_blocked_csr(tu, ti, tr, n_users, n_items, 8, 32)
    il = build_blocked_csr(ti, tu, tr, n_items, n_users, 8, 32)
    state = state_from_numpy(U0, V0, dtype=jnp.float64)
    dul = device_layout(ul, jnp.float64)
    dil = device_layout(il, jnp.float64)

    Uo, Vo = U0.copy(), V0.copy()
    for _ in range(3):
        state = ials_epoch(state, dul, dil, lam, alpha)
        Uo, Vo = om.ials_epoch(Uo, Vo, tu, ti, tr, lam, alpha)
    Ud, Vd, *_ = unpad(state)
    np.testing.assert_allclose(Ud, Uo, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(Vd, Vo, rtol=1e-8, atol=1e-10)
    # trash rows intact
    assert np.all(np.asarray(state.U)[-1] == 0)
    assert np.all(np.asarray(state.V)[-1] == 0)

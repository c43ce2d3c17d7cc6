"""Device batched-SGD vs NumPy oracle with an identical batch schedule.

The two implementations share init, permutation, lr schedule and batch size,
so float64 parity is near-exact (same adds in a different order only inside
scatter-adds). Also: determinism — same seed => bitwise-identical factors
(SURVEY.md §5: determinism tests replace race sanitizers).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import state_from_numpy, unpad
from ycnr_tpu.models.sgd import BiasedSGD, prepare_sgd_data, sgd_epoch
from ycnr_tpu.oracle import numpy_mf as om


def _setup(seed=0, n_users=50, n_items=40, nnz=2000, k=5):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4, seed=seed)
    (tu, ti, tr), _ = train_test_split(u, i, r, 0.1, seed)
    rng = np.random.default_rng(seed)
    U0 = rng.normal(0, 0.1, (n_users, k))
    V0 = rng.normal(0, 0.1, (n_items, k))
    return tu, ti, tr, U0, V0, n_users, n_items


def test_sgd_parity_f64():
    tu, ti, tr, U0, V0, nu, ni = _setup()
    lam, lr, B = 0.02, 0.01, 256
    mu = float(tr.mean())
    n = len(tr)

    data = prepare_sgd_data(tu, ti, tr, B, nu, ni, jnp.float64)
    state = state_from_numpy(U0, V0, mu=mu, dtype=jnp.float64)

    # oracle on the SAME padded stream: append padding entries as no-ops by
    # running it on the real entries with the equivalent permutation order
    n_pad = data.u.shape[0]
    rng = np.random.default_rng(42)
    perm = rng.permutation(n_pad)

    state = sgd_epoch(state, data, jnp.asarray(perm), lam, lr, B)

    # oracle: same batches, padding dropped (it contributes nothing)
    u_pad = np.concatenate([tu, np.full(n_pad - n, nu, np.int64)])
    i_pad = np.concatenate([ti, np.full(n_pad - n, ni, np.int64)])
    r_pad = np.concatenate([tr, np.zeros(n_pad - n, np.float64)])
    Uo = np.zeros((nu + 1, U0.shape[1]))
    Vo = np.zeros((ni + 1, V0.shape[1]))
    Uo[:nu], Vo[:ni] = U0, V0
    buo = np.zeros(nu + 1)
    bio = np.zeros(ni + 1)
    # the oracle applies updates only to valid entries; emulate the device's
    # masking by filtering each batch
    up, ip, rp = u_pad[perm], i_pad[perm], r_pad[perm]
    for s in range(0, n_pad, B):
        sel = up[s:s + B] < nu
        ub, ib, rb = up[s:s + B][sel], ip[s:s + B][sel], rp[s:s + B][sel]
        Uo2, Vo2, buo2, bio2 = om.sgd_epoch_batched(
            Uo[:nu], Vo[:ni], buo[:nu], bio[:ni], mu, ub, ib, rb,
            lam, lr, B, np.arange(len(rb)))
        Uo[:nu], Vo[:ni], buo[:nu], bio[:ni] = Uo2, Vo2, buo2, bio2

    Ud, Vd, bud, bid, _ = unpad(state)
    np.testing.assert_allclose(Ud, Uo[:nu], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(Vd, Vo[:ni], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(bud, buo[:nu], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(bid, bio[:ni], rtol=1e-9, atol=1e-12)


def test_sgd_deterministic():
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=3)
    trainer = BiasedSGD(lam=0.02, lr=0.02, batch_size=128, seed=9)
    data = prepare_sgd_data(tu, ti, tr, 128, nu, ni)

    def run():
        s = state_from_numpy(U0, V0, mu=float(tr.mean()))
        for ep in range(3):
            s = trainer.epoch(s, data, ep)
        return np.asarray(s.U)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_sgd_trash_rows_stay_zero():
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=4)
    trainer = BiasedSGD(batch_size=128)
    data = prepare_sgd_data(tu, ti, tr, 128, nu, ni)
    s = state_from_numpy(U0, V0, mu=float(tr.mean()))
    for ep in range(2):
        s = trainer.epoch(s, data, ep)
    assert np.all(np.asarray(s.U)[-1] == 0)
    assert np.all(np.asarray(s.V)[-1] == 0)
    assert float(s.bu[-1]) == 0 and float(s.bi[-1]) == 0


def test_sgd_learns_on_device():
    tu, ti, tr, U0, V0, nu, ni = _setup(seed=5, nnz=4000)
    from ycnr_tpu.models.base import predict
    trainer = BiasedSGD(lam=0.02, lr=0.05, lr_decay=0.97, batch_size=256)
    data = prepare_sgd_data(tu, ti, tr, 256, nu, ni)
    s = state_from_numpy(U0, V0, mu=float(tr.mean()))

    def train_rmse(s):
        e = np.asarray(predict(s, jnp.asarray(tu), jnp.asarray(ti))) - tr
        return float(np.sqrt((e * e).mean()))

    r0 = train_rmse(s)
    for ep in range(10):
        s = trainer.epoch(s, data, ep)
    assert train_rmse(s) < r0 * 0.85

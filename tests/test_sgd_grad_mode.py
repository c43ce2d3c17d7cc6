"""SGD grad_mode="mean": stable where "sum" diverges on hot entities."""

import jax.numpy as jnp
import numpy as np

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.eval.ranking import hit_rate_at_n
from ycnr_tpu.models.base import state_from_numpy
from ycnr_tpu.models.sgd import BiasedSGD, prepare_sgd_data


def _train(grad_mode, lr, epochs=4):
    nu, ni = 300, 150
    u, i, r = synthetic_ratings(nu, ni, 20000, true_rank=4, seed=7)
    rng = np.random.default_rng(0)
    st = state_from_numpy(rng.normal(0, 0.1, (nu, 16)),
                          rng.normal(0, 0.1, (ni, 16)), mu=float(r.mean()))
    data = prepare_sgd_data(u, i, r, 4096, nu, ni)
    tr = BiasedSGD(lam=0.02, lr=lr, batch_size=4096, grad_mode=grad_mode)
    for ep in range(epochs):
        st = tr.epoch(st, data, ep)
    return st


def test_mean_mode_stable_where_sum_diverges():
    lr = 0.2  # way too hot for summed duplicates on power-law data
    st_sum = _train("sum", lr)
    st_mean = _train("mean", lr)
    assert not np.all(np.isfinite(np.asarray(st_sum.U))) or (
        np.abs(np.asarray(st_sum.U)).max() > 1e3), \
        "expected the sum mode to blow up at this lr (tighten the test)"
    assert np.all(np.isfinite(np.asarray(st_mean.U)))
    assert np.abs(np.asarray(st_mean.U)).max() < 100


def test_mean_mode_learns():
    st = _train("mean", lr=0.1, epochs=8)
    assert np.all(np.isfinite(np.asarray(st.U)))
    # trash rows intact under the scaled updates too
    assert np.all(np.asarray(st.U)[-1] == 0)
    assert float(st.bu[-1]) == 0


def test_hit_rate_metric():
    nu, ni = 100, 60
    u, i, r = synthetic_ratings(nu, ni, 3000, true_rank=3, seed=1)
    rng = np.random.default_rng(0)
    # state that perfectly ranks the held-out items for a sanity bound
    st = state_from_numpy(rng.normal(size=(nu, 4)), rng.normal(size=(ni, 4)))
    hr = hit_rate_at_n(st, u[:2500], i[:2500], u[2500:], i[2500:], n=10)
    assert 0.0 <= hr <= 1.0
    # empty test set
    assert hit_rate_at_n(st, u, i, np.array([]), np.array([]), 10) == 0.0

"""Stream-SGD (models/sgd_stream.py): parity with the reference batched
path, tile-window edge cases, and convergence equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import init_state, rmse_padded, state_from_numpy
from ycnr_tpu.models.sgd import BiasedSGD, prepare_sgd_data, sgd_epoch
from ycnr_tpu.models.sgd_stream import (
    StreamSGD,
    prepare_stream_sgd,
    sgd_stream_epoch,
)
from ycnr_tpu.ops.layout import pad_coo

DT = jnp.float64


def _state(nu, ni, k, seed, mu=0.0):
    rng = np.random.default_rng(seed)
    st = state_from_numpy(rng.normal(0, 0.1, (nu, k)),
                          rng.normal(0, 0.1, (ni, k)), dtype=DT)
    return st._replace(mu=jnp.asarray(mu, DT))


def _clone(st):
    # the epoch fns donate their state argument; tests reuse the start state
    return jax.tree.map(jnp.copy, st)


def _stream_once(st, sdata, lam=0.02, lr=0.01):
    nb = sdata.ul.shape[0]
    return sgd_stream_epoch(_clone(st), sdata.ul, sdata.ib, sdata.rb,
                            sdata.wu, sdata.wi, sdata.u_lo,
                            jnp.arange(nb), lam, lr, sdata.tile)


def _replay_sgd_data(order, u, i, r, nu, ni, B, dtype):
    """Materialize the stream order as explicit SGDData for sgd_epoch
    (order entries of -1 are prep-inserted pass padding -> trash ids)."""
    from ycnr_tpu.models.sgd import SGDData

    n = len(r)
    npad0 = -(-n // B) * B
    bu_ = np.full(npad0, nu, np.int64)
    bi_ = np.full(npad0, ni, np.int64)
    br_ = np.zeros(npad0, np.float32)
    bu_[:n], bi_[:n], br_[:n] = u, i, r
    order = np.asarray(order)
    uu = np.full(len(order), nu, np.int64)
    ii = np.full(len(order), ni, np.int64)
    rr = np.zeros(len(order), np.float32)
    real = order >= 0
    uu[real] = bu_[order[real]]
    ii[real] = bi_[order[real]]
    rr[real] = br_[order[real]]
    return SGDData(jnp.asarray(uu.astype(np.int32)),
                   jnp.asarray(ii.astype(np.int32)),
                   jnp.asarray(rr, dtype), n)


@pytest.mark.parametrize("grad_mode", ["sum", "mean"])
def test_stream_parity_with_batched_reference(grad_mode):
    """Stream epoch == sgd_epoch run with the stream order as its perm
    (same batch contents, same math; only the access pattern differs).
    Also pins bias handling: biases ride as an extra factor column in the
    stream path and must update identically."""
    nu, ni, k, B = 80, 40, 5, 64
    u, i, r = synthetic_ratings(nu, ni, 900, true_rank=3, seed=2)
    st0 = _state(nu, ni, k, 0, mu=float(r.mean()))

    sdata, order = prepare_stream_sgd(u, i, r, B, nu, ni, seed=5, dtype=DT,
                                      grad_mode=grad_mode)
    rdata = _replay_sgd_data(order, u, i, r, nu, ni, B, DT)
    ref = sgd_epoch(_clone(st0), rdata, jnp.arange(len(rdata.u)), 0.02,
                    0.01, B, grad_mode)
    got = _stream_once(st0, sdata)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_stream_sparse_users_wide_tile():
    """Adversarial span: many single-rating users spread over a wide id
    range forces the tile window toward B; updates must still match."""
    nu, ni, k, B = 4000, 30, 4, 128
    rng = np.random.default_rng(0)
    u = rng.choice(nu, 700, replace=False)  # 700 users, 1 rating each
    i = rng.integers(0, ni, 700)
    r = rng.uniform(1, 5, 700).astype(np.float32)
    st0 = _state(nu, ni, k, 1)
    sdata, order = prepare_stream_sgd(u, i, r, B, nu, ni, seed=3, dtype=DT,
                                      grad_mode="sum")
    rdata = _replay_sgd_data(order, u, i, r, nu, ni, B, DT)
    ref = sgd_epoch(_clone(st0), rdata, jnp.arange(len(rdata.u)), 0.02,
                    0.01, B, "sum")
    got = _stream_once(st0, sdata)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.V), np.asarray(ref.V),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.bu), np.asarray(ref.bu),
                               rtol=1e-12, atol=1e-12)


def test_stream_batch_order_determinism_and_shuffling():
    """Same seed => bitwise identical; different epoch => different order
    actually changes the result (the reshuffle is real)."""
    nu, ni, k, B = 60, 30, 4, 64
    u, i, r = synthetic_ratings(nu, ni, 700, true_rank=2, seed=4)
    st0 = _state(nu, ni, k, 2)
    data, _ = prepare_stream_sgd(u, i, r, B, nu, ni, seed=1, dtype=DT)
    tr = StreamSGD(lam=0.02, lr=0.02, seed=9)
    a = tr.epoch(_clone(st0), data, 0)
    b = tr.epoch(_clone(st0), data, 0)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    c = tr.epoch(_clone(st0), data, 1)
    assert not np.array_equal(np.asarray(a.U), np.asarray(c.U))


def test_stream_grad_mode_mismatch_is_loud():
    u, i, r = synthetic_ratings(30, 20, 200, true_rank=2, seed=0)
    data, _ = prepare_stream_sgd(u, i, r, 64, 30, 20, grad_mode="sum")
    with pytest.raises(ValueError, match="grad_mode"):
        StreamSGD(grad_mode="mean").epoch(_state(30, 20, 4, 0), data, 0)


def test_stream_convergence_matches_shuffled_reference():
    """The stream default (capped weights + pass striping) must track the
    uniformly-shuffled reference in ITS default "sum" mode — i.e. the
    fast path converges like the oracle-semantics path, not merely "also
    moves". The band is tight: measured delta is ~0.003 RMSE after 8
    epochs; plain "mean" (one averaged step per hot entity per epoch)
    misses this band by ~0.1."""
    nu, ni, k, B = 1200, 400, 8, 2048
    u, i, r = synthetic_ratings(nu, ni, 60_000, true_rank=6, seed=11)
    (tu, ti, tr_), (su, si, sr) = train_test_split(u, i, r, 0.1, seed=11)
    mu = float(tr_.mean())
    pu, pi, pr, n = pad_coo(su, si, sr, nu, ni, 256)
    dpu, dpi, dpr = jnp.asarray(pu), jnp.asarray(pi), jnp.asarray(pr)

    def final_rmse_stream():
        st = init_state(nu, ni, k, seed=0, mu=mu, dtype=jnp.float32)
        data, _ = prepare_stream_sgd(tu, ti, tr_, B, nu, ni, seed=0)
        t = StreamSGD(lam=0.02, lr=0.03, lr_decay=0.95, seed=0)
        for ep in range(8):
            st = t.epoch(st, data, ep)
        return float(rmse_padded(st, dpu, dpi, dpr, n))

    def final_rmse_ref():
        st = init_state(nu, ni, k, seed=0, mu=mu, dtype=jnp.float32)
        data = prepare_sgd_data(tu, ti, tr_, B, nu, ni)
        t = BiasedSGD(lam=0.02, lr=0.03, lr_decay=0.95, batch_size=B,
                      seed=0, grad_mode="sum")
        for ep in range(8):
            st = t.epoch(st, data, ep)
        return float(rmse_padded(st, dpu, dpi, dpr, n))

    a, b = final_rmse_stream(), final_rmse_ref()
    # both genuinely learned, and the trajectories agree closely
    assert a < 0.55 and b < 0.55, (a, b)
    assert abs(a - b) < 0.02, (a, b)


def test_stream_ooc_epoch_bitwise_parity():
    """The out-of-core epoch (host-resident stream, chunked device_put,
    shared _epoch_scan body) must reproduce the resident epoch BITWISE
    in float64 for the same batch order — including a permuted order,
    a chunk size that forces a padded final chunk, and multiple epochs
    chained through donation."""
    from ycnr_tpu.models.sgd_stream import sgd_stream_epoch_ooc

    nu, ni, k, B = 300, 80, 8, 64
    u, i, r = synthetic_ratings(nu, ni, 4000, true_rank=3, seed=7)
    st0 = _state(nu, ni, k, 5, mu=float(np.mean(r)))
    dev, _ = prepare_stream_sgd(u, i, r, B, nu, ni, seed=2, dtype=DT)
    host, _ = prepare_stream_sgd(u, i, r, B, nu, ni, seed=2, dtype=DT,
                                 device=False)
    assert isinstance(host.ul, np.ndarray) and host.tile == dev.tile
    nb = dev.ul.shape[0]
    order = np.random.default_rng(11).permutation(nb).astype(np.int32)

    ref, got = _clone(st0), _clone(st0)
    for ep in range(2):
        lr = 0.01 * 0.9**ep
        ref = sgd_stream_epoch(ref, dev.ul, dev.ib, dev.rb, dev.wu,
                               dev.wi, dev.u_lo, jnp.asarray(order),
                               0.02, lr, dev.tile)
        # chunk_batches=3 with nb % 5 != 0 exercises the no-op padding
        got = sgd_stream_epoch_ooc(got, host, order, 0.02, lr,
                                   chunk_batches=3)
    assert nb % 3 != 0
    for f in ("U", "V", "bu", "bi"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f)),
                                      np.asarray(getattr(ref, f)))


def test_stream_ooc_trainer_dispatch():
    """StreamSGD.epoch routes host-resident data through the OOC epoch
    and keeps determinism (same seed+epoch => bitwise same result)."""
    nu, ni, k, B = 60, 30, 4, 64
    u, i, r = synthetic_ratings(nu, ni, 700, true_rank=2, seed=4)
    st0 = _state(nu, ni, k, 2)
    data, _ = prepare_stream_sgd(u, i, r, B, nu, ni, seed=1, dtype=DT,
                                 device=False)
    tr = StreamSGD(lam=0.02, lr=0.02, seed=9)
    a = tr.epoch(_clone(st0), data, 0)
    b = tr.epoch(_clone(st0), data, 0)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))

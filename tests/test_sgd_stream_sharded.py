"""Sharded stream-SGD (parallel/sgd_stream.py): union-batch parity with
the single-chip batched path, learning, determinism, and the train-loop
integration."""

import jax
import jax.numpy as jnp
import numpy as np

from ycnr_tpu.config import DataConfig, MeshConfig, RunConfig, SGDConfig
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import state_from_numpy
from ycnr_tpu.models.sgd import SGDData, sgd_epoch
from ycnr_tpu.parallel import build_sharded_data, gather_state, scatter_state
from ycnr_tpu.parallel.mesh import make_mesh
from ycnr_tpu.parallel.sgd_stream import (
    build_sharded_stream_sgd,
    sharded_sgd_stream_epoch,
)
from ycnr_tpu.train.loop import train

DT = jnp.float64


def _setup(D, nu=90, ni=40, nnz=1100, k=5, B=64, grad_mode="sum"):
    u, i, r = synthetic_ratings(nu, ni, nnz, true_rank=3, seed=3)
    rng = np.random.default_rng(1)
    gstate = state_from_numpy(rng.normal(0, 0.1, (nu, k)),
                              rng.normal(0, 0.1, (ni, k)), dtype=DT)
    gstate = gstate._replace(mu=jnp.asarray(float(r.mean()), DT))
    mesh = make_mesh(D)
    data, meta = build_sharded_data(u, i, r, nu, ni, D, chunk_len=8,
                                    dtype=DT, mesh=mesh, algo="stream-sgd")
    sdata, orders = build_sharded_stream_sgd(u, i, r, meta, B * D,
                                             seed=7, dtype=DT,
                                             grad_mode=grad_mode, mesh=mesh)
    return (u, i, r), gstate, mesh, meta, sdata, orders


def test_union_batch_parity_with_batched_reference():
    """Global step t = union of the D local batches at batch-start params:
    in 'sum' mode the sharded stream epoch must equal models/sgd.sgd_epoch
    run on the concatenated per-shard streams (f64, 1e-11)."""
    D, B, nu, ni = 4, 64, 90, 40
    (u, i, r), gstate, mesh, meta, sdata, orders = _setup(
        D, nu=nu, ni=ni, B=B, grad_mode="sum")
    upd = meta.upd
    shard_of = meta.user_local[np.asarray(u)] // upd
    nb = sdata.ul.shape[1]

    # assemble the union stream in GLOBAL ids: per global batch t, the D
    # local slices back to back (padding entries -> trash ids)
    uu = np.full((nb, D, B), nu, np.int64)
    ii = np.full((nb, D, B), ni, np.int64)
    rr = np.zeros((nb, D, B), np.float32)
    for d in range(D):
        p = np.nonzero(shard_of == d)[0]
        od = orders[d]  # stream position -> padded per-shard COO position
        n_d = len(p)
        real = (od >= 0) & (od < n_d)  # -1 = prep-inserted pass padding
        gu = np.full(len(od), nu, np.int64)
        gi = np.full(len(od), ni, np.int64)
        gr = np.zeros(len(od), np.float32)
        gu[real] = u[p[od[real]]]
        gi[real] = i[p[od[real]]]
        gr[real] = r[p[od[real]]]
        nbd = len(od) // B
        uu[:nbd, d] = gu.reshape(nbd, B)
        ii[:nbd, d] = gi.reshape(nbd, B)
        rr[:nbd, d] = gr.reshape(nbd, B)
    union = SGDData(jnp.asarray(uu.reshape(-1).astype(np.int32)),
                    jnp.asarray(ii.reshape(-1).astype(np.int32)),
                    jnp.asarray(rr.reshape(-1), DT), len(r))
    ref = sgd_epoch(jax.tree.map(jnp.copy, gstate), union,
                    jnp.arange(nb * D * B), 0.02, 0.01, D * B, "sum")

    st = scatter_state(gstate, meta, mesh)
    st = _epoch_identity_order(mesh, st, sdata)
    got = gather_state(st, meta)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-11)


def _epoch_identity_order(mesh, st, sdata):
    from ycnr_tpu.parallel.sgd_stream import _stream_epoch_fn

    nb = sdata.ul.shape[1]
    return _stream_epoch_fn(mesh, 0.02, sdata.tile)(
        st, sdata.ul, sdata.ib, sdata.rb, sdata.wu, sdata.wi, sdata.u_lo,
        jnp.arange(nb), jnp.asarray(0.01, st.V.dtype))


def test_sharded_stream_learns_and_is_deterministic():
    D = 4
    _, gstate, mesh, meta, sdata, _ = _setup(D, grad_mode="mean")

    def run():
        # clone: the epoch donates its state and scatter_state passes V/bi
        # through by reference
        st = scatter_state(jax.tree.map(jnp.copy, gstate), meta, mesh)
        key = jax.random.key(0)
        for ep in range(4):
            st = sharded_sgd_stream_epoch(mesh, st, sdata, 0.02, 0.03,
                                          jax.random.fold_in(key, ep))
        return gather_state(st, meta)

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    np.testing.assert_array_equal(np.asarray(a.V), np.asarray(b.V))


def test_train_loop_sharded_stream_e2e(tmp_path):
    # same shapes as tests/test_sgd_convergence.py (measured to learn
    # clearly at this lr/batch within 6 epochs)
    cfg = RunConfig(
        name="shstream", algorithm="sgd",
        data=DataConfig(source="synthetic", n_users=1200, n_items=400,
                        n_ratings=60_000, true_rank=6, seed=11),
        sgd=SGDConfig(rank=8, lr=0.03, epochs=6, batch_size=2048,
                      method="stream"),
        mesh=MeshConfig(n_shards=8),
        out_dir=str(tmp_path), checkpoint_every=0, log_train_rmse=False)
    res = train(cfg)
    h = res.rmse_history
    assert len(h) == 6 and h[-1] < h[0], h
    # single-chip stream run of the same config converges comparably
    res1 = train(cfg.replace(mesh=MeshConfig(n_shards=1)),
                 out_dir=str(tmp_path / "d1"))
    assert abs(res1.rmse_history[-1] - h[-1]) < 0.05, (
        res1.rmse_history, h)

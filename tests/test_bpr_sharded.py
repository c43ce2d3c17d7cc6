"""Sharded BPR on the fake 8-device mesh (parallel/shard.sharded_bpr_epoch):
DP over the user-sharded positive stream, per-device negative draws, V/b_i
delta psum per batch; collision bits sharded per device."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.parallel import (
    build_bpr_bits,
    build_sharded_data,
    gather_state,
    make_mesh,
    scatter_state,
    sharded_bpr_epoch,
)


def _setup(seed=0, n_users=70, n_items=50, nnz=3000):
    u, i, r = synthetic_ratings(n_users, n_items, nnz, true_rank=4,
                                seed=seed)
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed)
    return (tu, ti, tr), (su, si, sr), n_users, n_items


def _auc(state, tu, ti, n_users, n_items, seed=0):
    U, V, bi = (np.asarray(state.U), np.asarray(state.V),
                np.asarray(state.bi))
    pos = np.einsum("nk,nk->n", U[tu], V[ti]) + bi[ti]
    rated = set(zip(tu.tolist(), ti.tolist()))
    rng = np.random.default_rng(seed)
    nu_, ni_ = [], []
    while len(nu_) < len(tu):
        a = int(rng.integers(0, n_users))
        b = int(rng.integers(0, n_items))
        if (a, b) not in rated:
            nu_.append(a)
            ni_.append(b)
    neg = np.einsum("nk,nk->n", U[nu_], V[ni_]) + bi[np.asarray(ni_)]
    return float(np.mean(pos[:, None] > neg[None, :]))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_sharded_bpr_learns_and_deterministic(n_shards):
    import jax

    (tu, ti, tr), (su, si, sr), nu, ni = _setup()
    mesh = make_mesh(n_shards)
    data, meta = build_sharded_data(tu, ti, tr, nu, ni, n_shards,
                                    test_u=su, test_i=si, test_r=sr,
                                    sgd_batch=512, mesh=mesh, algo="bpr")
    bits = build_bpr_bits(tu, ti, meta, batch_size=512, mesh=mesh)
    from ycnr_tpu.models.base import init_state

    key = jax.random.key(3)
    st = scatter_state(init_state(nu, ni, 6, seed=7), meta, mesh)
    st2 = scatter_state(init_state(nu, ni, 6, seed=7), meta, mesh)
    for e in range(35):
        lr = 0.15 * 0.99**e
        st = sharded_bpr_epoch(mesh, st, data, bits, 0.01, lr,
                               jax.random.fold_in(key, e), 512)
        st2 = sharded_bpr_epoch(mesh, st2, data, bits, 0.01, lr,
                                jax.random.fold_in(key, e), 512)
    g = gather_state(st, meta)
    g2 = gather_state(st2, meta)
    np.testing.assert_array_equal(np.asarray(g.U), np.asarray(g2.U))
    np.testing.assert_array_equal(np.asarray(g.V), np.asarray(g2.V))
    auc = _auc(g, tu, ti, nu, ni)
    # D=1 runs 4x larger effective batches (fewer V updates per epoch),
    # so it trails D>1 at equal epoch count — the bar covers all shard counts
    assert auc > 0.77, (n_shards, auc)
    # bu / mu untouched, trash rows zero
    assert np.all(np.asarray(g.bu) == 0)
    assert np.all(np.asarray(g.U)[-1] == 0)


def test_bpr_bits_match_single_chip_table():
    """The per-shard bits tables are exactly the single-chip table's rows
    remapped through the user partition."""
    (tu, ti, tr), _, nu, ni = _setup(seed=5)
    from ycnr_tpu.models.bpr import pack_rated_bits

    _, meta = build_sharded_data(tu, ti, tr, nu, ni, 4, sgd_batch=256,
                                 algo="bpr")
    bits = np.asarray(build_bpr_bits(tu, ti, meta, batch_size=256).bits)
    ref = pack_rated_bits(tu, ti, nu, ni)
    for d in range(4):
        for j, gu in enumerate(meta.user_map[d]):
            if gu < nu:
                np.testing.assert_array_equal(bits[d, j], ref[gu],
                                              err_msg=f"d={d} local={j}")
        assert np.all(bits[d, meta.upd] == 0)  # trash row


def test_sharded_bpr_train_e2e(tmp_path):
    """cfg.mesh.n_shards>1 + algorithm='bpr' through train(): hit-rate
    metrics, checkpoint, and a served recommendation."""
    from ycnr_tpu.config import BPRConfig, DataConfig, MeshConfig, RunConfig
    from ycnr_tpu.train.loop import train

    cfg = RunConfig(
        name="bpr-sharded", algorithm="bpr",
        data=DataConfig(source="synthetic", n_users=96, n_items=48,
                        n_ratings=1800, chunk_len=8),
        bpr=BPRConfig(rank=6, lam=0.01, lr=0.1, epochs=3, batch_size=512),
        mesh=MeshConfig(n_shards=4), out_dir=str(tmp_path))
    res = train(cfg)
    assert len(res.rmse_history) == 3  # 1 - hit_rate per epoch
    assert all(0.0 <= x <= 1.0 for x in res.rmse_history)
    import json
    import os

    with open(os.path.join(res.out_dir, "metrics.jsonl")) as fh:
        recs = [json.loads(line) for line in fh]
    ep = [r for r in recs if r.get("algo") == "bpr" and "epoch" in r]
    assert len(ep) == 3 and all(r["shards"] == 4 for r in ep)
    assert all("rmse_test" not in r for r in ep)

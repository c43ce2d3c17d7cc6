"""Cold-entity semantics: every train mode must agree that deg==0 entities
solve to exactly zero (the solver guard contract), so single-chip and
sharded runs produce the same factors and the same serving scores even when
some users/items have no training ratings."""

import numpy as np

from ycnr_tpu.config import ALSConfig, DataConfig, MeshConfig, RunConfig
from ycnr_tpu.train.loop import train


def _cold_cfg(shards, tmp_path, name):
    return RunConfig(
        name=name, algorithm="als",
        # small dense-ish synthetic, then we blank entities below
        data=DataConfig(source="synthetic", n_users=48, n_items=24,
                        n_ratings=700, chunk_len=8, seed=3),
        als=ALSConfig(rank=4, epochs=3, lam=0.05),
        mesh=MeshConfig(n_shards=shards),
        out_dir=str(tmp_path), checkpoint_every=0, log_train_rmse=False)


def _dataset_with_cold(n_users=48, n_items=24):
    from ycnr_tpu.data.dataset import Dataset
    from ycnr_tpu.data.split import train_test_split
    from ycnr_tpu.data.synthetic import synthetic_ratings

    u, i, r = synthetic_ratings(n_users, n_items, 700, true_rank=3, seed=3)
    # blank users 5..9 and items 20..23 from TRAINING (cold); keep a couple
    # in the test split so evaluation sees them too
    hot = ~(np.isin(u, [5, 6, 7, 8, 9]) | np.isin(i, [20, 21, 22, 23]))
    u, i, r = u[hot], i[hot], r[hot]
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, 0)
    return Dataset(n_users=n_users, n_items=n_items, train_u=tu, train_i=ti,
                   train_r=tr, test_u=su, test_i=si, test_r=sr,
                   mu=float(tr.mean()), chunk_len=8, rank_hint=4)


def test_cold_rows_are_zero_in_every_mode(tmp_path):
    ds = _dataset_with_cold()
    cold_u = [u for u in range(48) if u not in np.asarray(ds.train_u)]
    cold_i = [i for i in range(24) if i not in np.asarray(ds.train_i)]
    assert cold_u and cold_i  # the construction really made cold entities

    states = {}
    for shards, name in ((1, "single"), (4, "sharded")):
        res = train(_cold_cfg(shards, tmp_path, f"cold-{name}"), dataset=ds)
        states[name] = res.state
        U = np.asarray(res.state.U)
        V = np.asarray(res.state.V)
        np.testing.assert_array_equal(U[cold_u], 0.0, err_msg=name)
        np.testing.assert_array_equal(V[cold_i], 0.0, err_msg=name)

    # and the modes agree on the hot factors too (1e-5 RMSE-class parity)
    np.testing.assert_allclose(np.asarray(states["single"].U),
                               np.asarray(states["sharded"].U),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(states["single"].V),
                               np.asarray(states["sharded"].V),
                               rtol=1e-4, atol=1e-6)

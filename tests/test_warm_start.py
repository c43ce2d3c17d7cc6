"""Warm-start lifecycle: grow a trained model onto a larger catalog.

The reference retrains from its database, implicitly picking up rows for
users/items that appeared since the last run (SURVEY.md C7 streaming
ingest + call stack 3.1). The device-resident rebuild makes that explicit:
`models/base.grow_state` extends a checkpointed state with fresh-init rows
for the new entities, and `train(warm_start=ckpt)` begins a NEW run from
those factors (vs `resume`, which continues the SAME run).
"""

import numpy as np
import pytest

from ycnr_tpu.config import ALSConfig, DataConfig, MeshConfig, RunConfig
from ycnr_tpu.data.dataset import Dataset
from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import grow_state, init_state
from ycnr_tpu.train.loop import train

OLD_U, OLD_I = 500, 250
NEW_U, NEW_I = 600, 300


def _make_dataset(u, i, r, n_users, n_items):
    (tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed=5)
    return Dataset(n_users=n_users, n_items=n_items, train_u=tu, train_i=ti,
                   train_r=tr, test_u=su, test_i=si, test_r=sr,
                   mu=float(tr.mean()), chunk_len=8, rank_hint=10)


@pytest.fixture(scope="module")
def grown_pair():
    """(old_ds, new_ds): the same planted model, the old dataset restricted
    to the first OLD_U/OLD_I entities — i.e. the new catalog strictly grew."""
    u, i, r = synthetic_ratings(NEW_U, NEW_I, 30_000, true_rank=4, seed=11)
    old = (u < OLD_U) & (i < OLD_I)
    return (_make_dataset(u[old], i[old], r[old], OLD_U, OLD_I),
            _make_dataset(u, i, r, NEW_U, NEW_I))


def _cfg(epochs, shards=1, rank=10, out_dir=""):
    return RunConfig(
        name="warm", algorithm="als",
        data=DataConfig(source="synthetic", chunk_len=8),
        als=ALSConfig(rank=rank, lam=0.05, epochs=epochs),
        mesh=MeshConfig(n_shards=shards),
        out_dir=out_dir, seed=3, checkpoint_every=1)


# ---------------------------------------------------------------- grow_state

def test_grow_preserves_and_inits():
    st = init_state(40, 20, 6, seed=1)
    g = grow_state(st, 55, 26, seed=2)
    assert g.n_users == 55 and g.n_items == 26 and g.rank == 6
    np.testing.assert_array_equal(np.asarray(g.U[:40]), np.asarray(st.U[:40]))
    np.testing.assert_array_equal(np.asarray(g.V[:20]), np.asarray(st.V[:20]))
    np.testing.assert_array_equal(np.asarray(g.bu[:40]),
                                  np.asarray(st.bu[:40]))
    # new rows: fresh random init (nonzero), trailing padding row stays zero
    assert np.abs(np.asarray(g.U[40:55])).min() > 0
    assert np.abs(np.asarray(g.V[20:26])).min() > 0
    np.testing.assert_array_equal(np.asarray(g.U[55]), 0)
    np.testing.assert_array_equal(np.asarray(g.V[26]), 0)
    assert float(g.mu) == float(st.mu)
    # deterministic: same seed -> same growth
    g2 = grow_state(st, 55, 26, seed=2)
    np.testing.assert_array_equal(np.asarray(g.U), np.asarray(g2.U))


def test_grow_refuses_shrink_and_passes_noop():
    st = init_state(10, 8, 4)
    with pytest.raises(ValueError, match="shrink"):
        grow_state(st, 9, 8)
    with pytest.raises(ValueError, match="shrink"):
        grow_state(st, 10, 7)
    assert grow_state(st, 10, 8) is st


# ------------------------------------------------------------------- e2e

def test_warm_start_trains_and_beats_cold(tmp_path, grown_pair):
    old_ds, new_ds = grown_pair
    base = train(_cfg(3), dataset=old_ds, out_dir=str(tmp_path / "old"))
    ckpt = str(tmp_path / "old" / "ckpt")

    warm = train(_cfg(1), dataset=new_ds, warm_start=ckpt, out_dir=None)
    cold = train(_cfg(1), dataset=new_ds, out_dir=None)
    assert warm.state.n_users == NEW_U and warm.state.n_items == NEW_I
    # three prior epochs on ~the whole catalog must not hurt: after one
    # epoch on the grown data the warm run is at least as good as cold
    assert warm.rmse_history[-1] <= cold.rmse_history[-1] + 1e-3, (
        warm.rmse_history, cold.rmse_history)
    assert len(warm.rmse_history) == 1  # a NEW run: epoch counter restarted
    assert base.rmse_history  # sanity: the base run actually trained


def test_warm_start_sharded_matches_single(tmp_path, grown_pair):
    old_ds, new_ds = grown_pair
    train(_cfg(2), dataset=old_ds, out_dir=str(tmp_path / "old"))
    ckpt = str(tmp_path / "old" / "ckpt")

    single = train(_cfg(1), dataset=new_ds, warm_start=ckpt, out_dir=None)
    sharded = train(_cfg(1, shards=4), dataset=new_ds, warm_start=ckpt,
                    out_dir=None)
    assert abs(single.rmse_history[-1] - sharded.rmse_history[-1]) < 1e-3


def test_warm_start_guards(tmp_path, grown_pair):
    old_ds, _ = grown_pair
    train(_cfg(1), dataset=old_ds, out_dir=str(tmp_path / "old"))
    ckpt = str(tmp_path / "old" / "ckpt")
    with pytest.raises(ValueError, match="rank"):
        train(_cfg(1, rank=12), dataset=old_ds, warm_start=ckpt,
              out_dir=None)
    with pytest.raises(ValueError, match="exclusive"):
        train(_cfg(1), dataset=old_ds, warm_start=ckpt, resume=ckpt,
              out_dir=None)

"""Sharded-SGD convergence quality: D=1 vs D=8 trajectory band.

SURVEY.md §7 "SGD semantics": the data-parallel epoch runs LOCAL per-device
batches with per-batch V-delta psum, which is not the same sample ordering
as the single-chip batched stream — this pins that the semantics delta is a
numerical footnote, not a convergence change. Full-scale evidence (ml1m-sgd
preset shapes, 1M ratings, 8 epochs) is recorded in docs/SCALING.md:
max per-epoch |D=8 - D=1| RMSE delta 2.2e-4. This scaled-down version runs
the same comparison in CI.
"""

import numpy as np

from ycnr_tpu.config import DataConfig, MeshConfig, RunConfig, SGDConfig
from ycnr_tpu.train.loop import train


def _cfg(D: int) -> RunConfig:
    return RunConfig(
        name=f"conv{D}", algorithm="sgd",
        data=DataConfig(source="synthetic", n_users=1200, n_items=400,
                        n_ratings=60_000, true_rank=6, seed=11),
        sgd=SGDConfig(rank=8, lam=0.02, lr=0.03, epochs=6, batch_size=2048),
        mesh=MeshConfig(n_shards=D),
        checkpoint_every=0, log_train_rmse=False, out_dir=None)


def test_sharded_sgd_convergence_band():
    h1 = np.asarray(train(_cfg(1), out_dir=None).rmse_history)
    h8 = np.asarray(train(_cfg(8), out_dir=None).rmse_history)
    assert len(h1) == len(h8) == 6
    # both learn
    assert h1[-1] < h1[0] and h8[-1] < h8[0]
    # the trajectories agree within a tight band at every epoch — the
    # local-batch + per-batch-psum semantics is convergence-equivalent
    delta = np.abs(h1 - h8)
    assert float(delta.max()) < 5e-3, (h1.tolist(), h8.tolist())
    # and the endpoints are near-identical
    assert float(delta[-1]) < 2e-3, (h1[-1], h8[-1])

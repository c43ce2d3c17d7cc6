"""Sharded (multi-chip) training through the library API, runnable anywhere
by faking an 8-device mesh on CPU. On a real slice, drop the env overrides
and the same code runs over the chips (docs/SCALING.md).

Run: python examples/sharded_train.py
"""

import os
import sys

# fake 8 devices BEFORE any backend initializes (remove on a real slice).
# JAX may already be imported by a site hook, so set the platform through
# jax.config, not just env vars (see tests/conftest.py).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import init_state
from ycnr_tpu.parallel import (
    build_sharded_data,
    gather_state,
    make_mesh,
    scatter_state,
    sharded_als_epoch,
    sharded_recommend_all,
    sharded_rmse,
)

n_users, n_items = 1_000, 400
u, i, r = synthetic_ratings(n_users, n_items, 40_000, true_rank=6, seed=0)
(tu, ti, tr), (su, si, sr) = train_test_split(u, i, r, 0.1, seed=0)

mesh = make_mesh(8)  # 1-D mesh over every visible device
data, meta = build_sharded_data(tu, ti, tr, n_users, n_items, n_shards=8,
                                chunk_len=16, rank_hint=8, mesh=mesh,
                                test_u=su, test_i=si, test_r=sr)
st = scatter_state(init_state(n_users, n_items, rank=8, seed=0), meta, mesh)

for epoch in range(4):
    st = sharded_als_epoch(mesh, st, data, lam=0.05)
    print(f"epoch {epoch + 1}: rmse="
          f"{sharded_rmse(mesh, st, data, meta.test_n):.4f}")

# top-N for every user, computed ON the mesh (V replicated in this mode)
users, items, scores = sharded_recommend_all(mesh, st, data, meta, n=5)
print("first user:", users[0], "items:", items[0], )

# back to a plain single-chip MFState (e.g. for checkpointing / serving)
state = gather_state(st, meta)
print("gathered factors:", state.U.shape, state.V.shape)

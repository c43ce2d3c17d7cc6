"""Checkpoint / resume (SURVEY.md §5).

The reference persists trained factors to disk/PG tables so recommendation
can run without retraining; a dead worker means rerunning the epoch. Here
every epoch can durably snapshot {U, V, b_u, b_i, mu, epoch, config} as an
npz + JSON manifest, making jobs trivially resumable mid-training (fixed-mesh
SPMD needs no elastic membership). Writes are atomic (tmp + rename).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ycnr_tpu.models.base import MFState

_MANIFEST = "manifest.json"
_ARRAYS = "state.npz"


def save_checkpoint(path: str, state: MFState, epoch: int,
                    config: Optional[dict] = None, extra: Optional[dict] = None):
    """Snapshot state into directory `path` (atomic via tmp+rename)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, _ARRAYS + ".tmp.npz")
    np.savez(
        tmp,
        U=np.asarray(state.U), V=np.asarray(state.V),
        bu=np.asarray(state.bu), bi=np.asarray(state.bi),
        mu=np.asarray(state.mu),
    )
    os.replace(tmp, os.path.join(path, _ARRAYS))
    manifest = {
        "epoch": int(epoch),
        "rank": int(state.U.shape[1]),
        "n_users": int(state.U.shape[0] - 1),
        "n_items": int(state.V.shape[0] - 1),
        "dtype": str(state.U.dtype),
        "config": config or {},
        "extra": extra or {},
        "format": 1,
    }
    mtmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mtmp, os.path.join(path, _MANIFEST))


def load_checkpoint(path: str) -> Tuple[MFState, dict]:
    """Restore (state, manifest) from a checkpoint directory."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    z = np.load(os.path.join(path, _ARRAYS))
    state = MFState(jnp.asarray(z["U"]), jnp.asarray(z["V"]),
                    jnp.asarray(z["bu"]), jnp.asarray(z["bi"]),
                    jnp.asarray(z["mu"]))
    return state, manifest


def config_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)

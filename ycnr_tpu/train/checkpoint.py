"""Checkpoint / resume (SURVEY.md §5).

The reference persists trained factors to disk/PG tables so recommendation
can run without retraining; a dead worker means rerunning the epoch. Here
every epoch can durably snapshot {U, V, b_u, b_i, mu, epoch, config},
making jobs trivially resumable mid-training (fixed-mesh SPMD needs no
elastic membership). Writes are atomic (tmp + rename).

Two array backends behind one manifest format:

* ``npz`` (default) — single-file NumPy archive; zero extra deps, ideal for
  host-side serving fleets loading factors.
* ``orbax`` — ``orbax.checkpoint.StandardCheckpointer`` over the state
  pytree; the JAX-ecosystem standard (TensorStore/OCDBT storage). Use when
  checkpoints should interop with other JAX tooling.

``load_checkpoint`` dispatches on the manifest, so readers never care which
backend wrote a checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ycnr_tpu.models.base import MFState

_MANIFEST = "manifest.json"
_ARRAYS = "state.npz"
_ORBAX_DIR = "state.orbax"


def _np_savable(x: np.ndarray) -> np.ndarray:
    # np.savez writes ml_dtypes arrays (bfloat16 etc.) as raw void dtype
    # ('|V2') with no error, which can never be loaded back into JAX.
    # Store them widened to float32; load_checkpoint casts back per the
    # manifest dtype (bf16 -> f32 is lossless).
    x = np.asarray(x)
    if x.dtype.kind == "V" or not isinstance(x.dtype.type(),
                                             (np.number, np.bool_)):
        return x.astype(np.float32)
    return x


def _save_arrays_npz(path: str, state: MFState):
    tmp = os.path.join(path, _ARRAYS + ".tmp.npz")
    np.savez(
        tmp,
        U=_np_savable(state.U), V=_np_savable(state.V),
        bu=_np_savable(state.bu), bi=_np_savable(state.bi),
        mu=_np_savable(state.mu),
    )
    os.replace(tmp, os.path.join(path, _ARRAYS))


def _save_arrays_orbax(path: str, state: MFState):
    import orbax.checkpoint as ocp

    target = os.path.join(path, _ORBAX_DIR)
    # write to a fresh scratch dir, then swap into place: deleting the old
    # checkpoint before the new save completes would break the atomicity
    # contract (a crash mid-save must leave the previous epoch loadable)
    tmp = target + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(tmp), dict(state._asdict()))
    ckptr.wait_until_finished()
    old = target + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target):
        os.replace(target, old)
    os.replace(tmp, target)
    if os.path.exists(old):
        shutil.rmtree(old)


def save_checkpoint(path: str, state: MFState, epoch: int,
                    config: Optional[dict] = None,
                    extra: Optional[dict] = None, backend: str = "npz"):
    """Snapshot state into directory `path` (atomic: the manifest naming the
    arrays is renamed into place last)."""
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        _save_arrays_orbax(path, state)
    elif backend == "npz":
        _save_arrays_npz(path, state)
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    manifest = {
        "epoch": int(epoch),
        "rank": int(state.U.shape[1]),
        "n_users": int(state.U.shape[0] - 1),
        "n_items": int(state.V.shape[0] - 1),
        "dtype": str(state.U.dtype),
        "config": config or {},
        "extra": extra or {},
        "backend": backend,
        "format": 2,
    }
    mtmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mtmp, os.path.join(path, _MANIFEST))


def _load_arrays_orbax(path: str) -> MFState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(os.path.join(path, _ORBAX_DIR)))
    return MFState(**{k: jnp.asarray(v) for k, v in tree.items()})


def load_checkpoint(path: str) -> Tuple[MFState, dict]:
    """Restore (state, manifest) from a checkpoint directory (either
    backend; dispatches on the manifest)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("backend", "npz") == "orbax":
        return _load_arrays_orbax(path), manifest
    z = np.load(os.path.join(path, _ARRAYS))
    # non-numpy state dtypes (bfloat16) are stored widened to float32;
    # cast back to the manifest's recorded dtype
    dt = jnp.dtype(manifest.get("dtype", "float32"))
    state = MFState(jnp.asarray(z["U"], dt), jnp.asarray(z["V"], dt),
                    jnp.asarray(z["bu"], dt), jnp.asarray(z["bi"], dt),
                    jnp.asarray(z["mu"], dt))
    return state, manifest


def config_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)

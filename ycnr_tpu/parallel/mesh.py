"""Device mesh construction (SURVEY.md §2 distributed-communication table).

The reference's control plane is Node `cluster` fork + IPC messages; its data
plane is SysV shared memory (C4/C6c). Both collapse into the single-controller
JAX runtime: a 1-D mesh over however many chips are visible, shardings for the
data plane, XLA collectives (psum over ICI) for the reductions the reference
did via in-place shm writes + epoch barriers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_shards: int | None = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the first n_shards visible devices (None = all).

    The workload's scaling dimensions are users/items/nnz (SURVEY.md §5 —
    there is no pipeline/expert/sequence dimension in an MF engine), so a 1-D
    mesh is the faithful topology; rank never needs sharding at k<=256.
    """
    devs = jax.devices()
    n = n_shards or len(devs)
    if n > len(devs):
        raise ValueError(f"asked for {n} shards, only {len(devs)} devices")
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str = AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

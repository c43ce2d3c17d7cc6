"""Per-process backend wall warm-up (the first-epoch wall, round 5).

Measured facts (runs/probes/upload_warm.json, runs/probes/progsize_16g.json,
docs/KERNELS.md "first-epoch wall"):

* The first scan-ladder program executed in a process through the remote
  axon tunnel pays a one-time ~150-650 s wall (large session-to-session
  variance). Every later program — including ones 7x larger — first-
  executes in single-digit seconds.
* The wall is NOT proportional to executable size (the round-3 model):
  a 5.9 MB 1-group program paid 443.7 s, after which 39-42 MB programs
  ran in 2-4 s.
* Plain jits (init_state, matmuls, device_puts) do NOT absorb it.

Consequently the right move for every TPU entry point (train, bench,
tune, OOC bench) is: start a background thread at process start that
executes a tiny wall-triggering program, so the wall overlaps ALL
host-side work (data gen/load, layout pack, wire build) instead of
landing after it. The real epoch program then compiles (seconds, or a
persistent-cache hit) and first-executes in seconds.

``level`` picks the trigger program (see tools/probe_wall_trigger.py for
the bracketing probe):

  "solve"   just the Pallas batched-Cholesky jit (~1 s compile) — the
            DEFAULT: measured sufficient (runs/probes/wall_trigger_A.json:
            the [16, 64, 64] solve paid the whole 329 s wall, after which
            a 23 MB 8-group epoch first-executed in 1.25 s).
  "ladder"  a 1-group bucketed ALS mini-epoch WITH the Pallas solve —
            the first program measured to absorb the wall
            (runs/probes/upload_warm.json "tiny"); ~13 s compile.
            Kept as the belt-and-suspenders fallback level.

No-op off-TPU (CPU tests, --smoke runs) and when YCNR_NO_WALL_WARM=1.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional


class WarmHandle:
    """Join-able handle; .wall_s / .err filled when the thread finishes."""

    def __init__(self):
        self.thread: Optional[threading.Thread] = None
        self.t0 = time.time()
        self.wall_s: Optional[float] = None
        self.err: Optional[Exception] = None
        self.skipped = True

    def join(self, timeout: Optional[float] = None):
        if self.thread is not None:
            self.thread.join(timeout)
        return self


def _run_ladder(rank: int):
    """1-group bucketed mini-epoch (the measured wall absorber)."""
    import jax
    import numpy as np

    from ycnr_tpu.models.base import init_state
    from ycnr_tpu.models.bucketed_phase import (als_epoch_bucketed,
                                                device_bucketed)
    from ycnr_tpu.ops.bucketed import BucketGroup

    NB, NE, R = 2, 64, 32
    n_e, n_o = NB * NE, 512

    def grp(n_entities, n_other, seed):
        rng = np.random.default_rng(seed)
        return (BucketGroup(
            rng.integers(0, n_other, (NB, NE, R), dtype=np.int32),
            (rng.random((NB, NE, R), np.float32) * 4 + 1),
            (np.arange(NB * NE, dtype=np.int32) % n_entities
             ).reshape(NB, NE),
            np.full((NB, NE), R, np.float32)),)

    ug = device_bucketed(grp(n_e, n_o, 0))
    ig = device_bucketed(grp(n_o, n_e, 1))
    st = init_state(n_e, n_o, rank, seed=0)
    out = als_epoch_bucketed(st, ug, ig, lam=0.05, gather_bf16=True)
    float(jax.device_get(out.U[0, 0]))  # scalar readback = real sync here


def _run_solve(rank: int):
    """Pallas batched-Cholesky only (cheapest candidate trigger)."""
    import jax
    import jax.numpy as jnp

    from ycnr_tpu.ops.gram import guarded_batched_solve

    f = jax.jit(lambda A, b, r: guarded_batched_solve(A, b, r))
    A = jnp.tile(jnp.eye(rank, dtype=jnp.float32)[None] * 2.0, (16, 1, 1))
    out = f(A, jnp.ones((16, rank), jnp.float32),
            jnp.ones((16,), jnp.float32))
    float(jax.device_get(out[0, 0]))


def start_wall_warm(level: str = "solve", rank: int = 64) -> WarmHandle:
    """Fire-and-forget wall absorber. Call FIRST THING in a TPU entry
    point — before data gen/load — so the per-process wall runs under the
    host-side prep. Returns immediately; callers may .join() before
    timing anything (bench does) or just let the first real dispatch
    queue behind it (train does).

    Importing jax (and thereby initializing the backend) happens in the
    thread, so the caller's startup cost is zero."""
    handle = WarmHandle()
    if os.environ.get("YCNR_NO_WALL_WARM") == "1":
        return handle

    def run():
        try:
            import jax

            if jax.default_backend() != "tpu":
                return  # CPU/GPU: no tunnel, no wall
            handle.skipped = False
            {"ladder": _run_ladder, "solve": _run_solve}[level](rank)
            handle.wall_s = round(time.time() - handle.t0, 1)
        except Exception as e:  # best-effort: a failed warm costs nothing
            handle.err = e

    t = threading.Thread(target=run, name="ycnr-wall-warm", daemon=True)
    handle.thread = t
    t.start()
    return handle

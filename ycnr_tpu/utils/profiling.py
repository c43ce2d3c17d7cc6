"""Tracing / profiling hooks (SURVEY.md §5).

The reference logs epoch wall-clock to the console; the rebuild exposes
(a) `jax.profiler` traces viewable in TensorBoard/Perfetto and (b) a
device-synchronized phase timer that works around this environment's
unreliable `block_until_ready` (a scalar readback is the only dependable
sync through the axon tunnel — see memory/tpu-env-facts).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


def device_sync(x) -> float:
    """Force completion of everything producing x; returns a checksum."""
    return float(jax.device_get(jnp.sum(x)))


@contextlib.contextmanager
def phase_timer(name: str, result_holder: Optional[dict] = None,
                sync_on=None, echo: bool = True):
    """Wall-clock a phase with a real device sync at exit.

    with phase_timer("u_phase", stats, sync_on=lambda: state.U):
        state = u_phase(state, ...)
    """
    t0 = time.time()
    yield
    if sync_on is not None:
        device_sync(sync_on() if callable(sync_on) else sync_on)
    dt = time.time() - t0
    if result_holder is not None:
        result_holder[name] = dt
    if echo:
        import sys

        print(f"[phase] {name}: {dt * 1000:.1f} ms", file=sys.stderr)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard/Perfetto). No-op on failure
    (the profiler may be unavailable through experimental PJRT plugins)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

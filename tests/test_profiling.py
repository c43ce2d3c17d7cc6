"""Tracing/profiling hooks (SURVEY.md §5 aux subsystem)."""

import jax.numpy as jnp

from ycnr_tpu.utils.profiling import device_sync, phase_timer, trace


def test_phase_timer_records_and_syncs(capsys):
    stats = {}
    x = jnp.arange(8.0)
    with phase_timer("p1", stats, sync_on=lambda: x, echo=False):
        y = x * 2
    assert "p1" in stats and stats["p1"] >= 0.0
    with phase_timer("p2", stats, sync_on=y):
        pass
    assert "p2" in stats
    assert "[phase] p2" in capsys.readouterr().err


def test_device_sync_returns_checksum():
    assert device_sync(jnp.ones(4)) == 4.0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        device_sync(jnp.ones(16) @ jnp.ones((16, 4)))
    # on CPU the profiler works; a trace dir with content must exist
    import os
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no profiler output written"


def test_trace_no_op_on_bad_dir():
    # unwritable dir: trace must swallow the failure, not raise
    with trace("/proc/definitely/not/writable"):
        device_sync(jnp.ones(2))

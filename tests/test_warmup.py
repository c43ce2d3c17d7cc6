"""utils/warmup: the per-process wall absorber must be a clean no-op
off-TPU (CPU tests, smoke runs) and respect the opt-out env var. The
actual wall absorption is TPU-only and measured in
runs/probes/wall_trigger_A.json — not testable on CPU."""

import ycnr_tpu.utils.warmup as wu


def test_cpu_noop():
    h = wu.start_wall_warm().join(timeout=60)
    assert h.err is None
    assert h.skipped  # CPU backend: thread exits without running a program


def test_env_optout(monkeypatch):
    monkeypatch.setenv("YCNR_NO_WALL_WARM", "1")
    h = wu.start_wall_warm()
    assert h.thread is None
    assert h.join() is h


def test_ladder_level_runs_on_cpu_when_forced(monkeypatch):
    # force the trigger bodies through their math on CPU by calling the
    # stage functions directly — they must compute without error so a
    # TPU session can trust them blind
    wu._run_solve(16)
    wu._run_ladder(16)

"""Failure recovery, exercised for real: SIGKILL a trainer mid-run, resume.

SURVEY.md §5 (failure detection/recovery): the reference has none — a dead
worker stalls the epoch barrier and restart means rerun. The rebuild's
contract is that per-epoch atomic checkpoints make a hard-killed run
resumable with NO loss of reproducibility: resume must land on the exact
trajectory the uninterrupted run takes (ALS epochs are deterministic
functions of state + data, and checkpoints round-trip f32 exactly).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

ARGS = ["--preset", "ml100k-als", "--source", "synthetic", "--platform",
        "cpu", "--users", "4000", "--items", "1200", "--ratings", "240000",
        "--rank", "12", "--epochs", "40", "--seed", "9"]


def _run(out, extra=(), wait=True):
    p = subprocess.Popen(
        [sys.executable, "-m", "ycnr_tpu", "train", *ARGS, "--out", out,
         *extra],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if wait:
        assert p.wait(timeout=600) == 0
    return p


def _manifest(out):
    try:
        with open(os.path.join(out, "ml100k-als", "ckpt", "manifest.json")) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _arrays(out):
    ckpt = os.path.join(out, "ml100k-als", "ckpt")
    z = np.load(os.path.join(ckpt, _manifest(out)["arrays"]))
    return {k: z[k] for k in z.files}


@pytest.mark.slow
def test_sigkill_resume_matches_uninterrupted(tmp_path):
    crashed = str(tmp_path / "crashed")
    straight = str(tmp_path / "straight")

    # start the victim; hard-kill it once it has checkpointed >= 3 epochs
    p = _run(crashed, wait=False)
    deadline = time.time() + 300
    while time.time() < deadline:
        m = _manifest(crashed)
        if m and m["epoch"] >= 3:
            break
        if p.poll() is not None:
            raise AssertionError("trainer exited before it could be killed")
        time.sleep(0.01)
    else:
        raise AssertionError("no checkpoint appeared within the deadline")
    os.kill(p.pid, signal.SIGKILL)
    p.wait(timeout=60)
    killed_at = _manifest(crashed)["epoch"]
    assert 3 <= killed_at < 40, killed_at  # genuinely interrupted mid-run

    # resume the crashed run to completion; run the control uninterrupted
    _run(crashed, extra=["--resume", os.path.join(crashed, "ml100k-als",
                                                  "ckpt")])
    _run(straight)

    mc, ms = _manifest(crashed), _manifest(straight)
    assert mc["epoch"] == ms["epoch"] == 40
    # the whole RMSE trajectory (carried in the manifest) must agree — the
    # resumed run re-traced the uninterrupted one, not a similar one
    assert mc["extra"]["rmse_history"] == ms["extra"]["rmse_history"]
    ac, as_ = _arrays(crashed), _arrays(straight)
    for k in ("U", "V", "bu", "bi", "mu"):
        np.testing.assert_array_equal(ac[k], as_[k], err_msg=k)
    # superseded epoch files (and any kill-interrupted tmp write) were GC'd
    stale = [e for e in os.listdir(os.path.join(crashed, "ml100k-als",
                                                "ckpt"))
             if e.startswith("state-") and e != mc["arrays"]]
    assert stale == [], stale

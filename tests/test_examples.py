"""Every examples/ script must stay runnable (they are documentation)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ)
    # examples force CPU themselves (--cpu / in-script config), but keep the
    # fake-device flag out of the way of the script's own handling
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True, text=True, timeout=420, env=env)


@pytest.mark.parametrize("script,args,marker", [
    ("train_custom_data.py", ("--cpu",), "rmse per epoch"),
    ("serve_embedded.py", ("--cpu",), "cold user top-5"),
    ("sharded_train.py", (), "gathered factors"),
    ("stream_sgd_and_serving.py", ("--cpu",), "p99"),
    ("model_lifecycle.py", ("--cpu",), "served grown-catalog cohort OK"),
    ("tune_and_similar.py", ("--cpu",), "cache hits OK"),
    ("bpr_ranking.py", ("--cpu",), "pairwise lift"),
])
def test_example_runs(script, args, marker):
    p = _run(script, *args)
    assert p.returncode == 0, p.stderr[-2000:]
    assert marker in p.stdout, p.stdout

"""Real multi-host (DCN) smoke test: 2 processes, one jax.distributed
rendezvous, cross-process collectives, parity vs single-process.

This is the SURVEY.md §5 "distributed communication backend" capability
actually executing (reference C4's TCP multi-machine analog): two local
processes with 4 fake CPU devices each form one 8-device global mesh and run
every sharded training path (ALS gram_psum, ALS item_sharded, DP SGD)
through the UNCHANGED parallel/ code. Assertions:

* the rendezvous really happened (process_count == 2 in both workers),
* both processes compute identical RMSE histories and identical gathered
  factor bytes (the collectives are deterministic and agree),
* the 2-process run matches a single-process 8-device run of the same
  config (DCN boundary changes nothing about the math).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "dcn_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dcn_results(tmp_path_factory):
    """Run the 2-process job once; all tests below share the artifacts."""
    tmp = tmp_path_factory.mktemp("dcn")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    repo = os.path.dirname(HERE)  # ycnr_tpu is run from source, not installed
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"result_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--process-id", str(pid),
             "--num-processes", "2", "--coordinator", f"127.0.0.1:{port}",
             "--local-devices", "4", "--out", str(out),
             "--workdir", str(tmp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process DCN job timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(o.read_text()) for o in outs], tmp


def test_rendezvous_really_happened(dcn_results):
    results, _ = dcn_results
    for r in results:
        assert r["process_count"] == 2
        assert r["n_global_devices"] == 8
    assert {r["process_id"] for r in results} == {0, 1}


@pytest.mark.parametrize("mode", ["als", "als_dual", "sgd", "bpr"])
def test_processes_agree(dcn_results, mode):
    """Both hosts see identical RMSE histories and identical factor bytes
    (every collective resolved identically on both sides of the DCN)."""
    results, _ = dcn_results
    a, b = (r[mode] for r in results)
    assert a["rmse"] == b["rmse"]
    assert a["state_sha"] == b["state_sha"]
    assert len(a["rmse"]) == 2 and all(np.isfinite(a["rmse"]))


def _load_worker_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location("dcn_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ooc_per_host_streaming(dcn_results):
    """Streamed OOC x mesh across the DCN boundary (SURVEY.md §3.2: every
    worker streams its own portions). The workers poisoned every NON-local
    [D]-axis wire row before feeding (NaN floats, saturated ints), so these
    assertions prove per-host transport locality: had any path read another
    host's rows, the streamed factors could not match the pinned tier."""
    results, _ = dcn_results
    a, b = (r["ooc"] for r in results)
    # both hosts agree bitwise (collectives resolved identically)
    assert a["state_sha"] == b["state_sha"]
    assert a["streamed_sha"] == b["streamed_sha"]
    # streamed-from-poisoned-feed == pinned, bitwise
    assert a["streamed_sha"] == a["state_sha"]
    assert a["rmse_streamed"] == a["rmse"]
    assert all(np.isfinite(a["rmse"]))


def test_ooc_parity_vs_single_chip(dcn_results):
    """The 2-process sharded OOC trajectory matches a single-chip OOC run
    of the same config to f64 reduction-order tightness (the single-chip
    epoch accumulates in a different order, so bitwise is not expected)."""
    from ycnr_tpu.data.synthetic import synthetic_ratings
    from ycnr_tpu.models.base import init_state, zero_cold_entities
    from ycnr_tpu.models.ooc import als_epoch_ooc
    from ycnr_tpu.ops.packed import build_packed

    import jax.numpy as jnp

    w = _load_worker_module()
    results, _ = dcn_results
    NU, NI, NR = w.OOC_SHAPE
    u, i, r = synthetic_ratings(NU, NI, NR, true_rank=4, noise=0.2, seed=3)
    upk = build_packed(u, i, r, NU, NI, rank_hint=8, max_groups=4)
    ipk = build_packed(i, u, r, NI, NU, rank_hint=8, max_groups=4)
    st = init_state(NU, NI, 8, seed=0, dtype=jnp.float64)
    st = zero_cold_entities(st, u, i)
    ref = []
    for _ in range(w.OOC_EPOCHS):
        st = als_epoch_ooc(st, upk, ipk, w.OOC_LAM)
        ref.append(w.host_rmse(st, u, i, r))
    np.testing.assert_allclose(results[0]["ooc"]["rmse"], ref,
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("mode", ["als", "als_dual", "sgd", "bpr"])
def test_parity_vs_single_process(dcn_results, mode):
    """The same config on a single-process 8-device mesh produces the same
    training trajectory. Tolerances are loose enough only for collective
    reduction-order differences (Gloo cross-process vs in-process XLA);
    any semantic divergence is orders of magnitude larger."""
    from ycnr_tpu.train.checkpoint import load_checkpoint
    from ycnr_tpu.train.loop import train

    results, tmp = dcn_results
    ref = train(_load_worker_module().configs(8)[mode],
                out_dir=str(tmp / "ref" / mode))
    got = results[0][mode]["rmse"]
    np.testing.assert_allclose(got, ref.rmse_history, rtol=0, atol=1e-5)
    # the workers checkpointed their (collectively gathered) final state
    wstate, _ = load_checkpoint(str(tmp / "p0" / mode / "ckpt"))
    for a, b in zip(wstate, ref.state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)

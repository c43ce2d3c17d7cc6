"""init_distributed plumbing (multi-host hook; SURVEY.md C4 TCP-mode analog).

A real multi-host init needs multiple hosts; here we pin the argument
contract against jax.distributed.initialize via monkeypatch, both for the
library call and for the CLI flags.
"""

import json

import jax
import pytest

from ycnr_tpu.parallel import init_distributed


@pytest.fixture
def captured(monkeypatch):
    calls = {}

    def fake_initialize(**kw):
        calls.update(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    return calls


def test_explicit_args(captured):
    assert init_distributed("10.0.0.1:1234", 4, 2) == 0
    assert captured == {"coordinator_address": "10.0.0.1:1234",
                        "num_processes": 4, "process_id": 2}


def test_env_coordinated(captured):
    init_distributed()
    assert captured == {}  # cluster-env autodetection path


def test_cli_flags(captured, tmp_path, capsys):
    from ycnr_tpu.cli import main

    with pytest.raises(BaseException):
        # train will fail later (synthetic run needs no store, so force an
        # unknown preset AFTER the distributed init to stop early)
        main(["train", "--coordinator", "h:99", "--num-processes", "2",
              "--process-id", "1", "--preset", "nope"])
    assert captured["coordinator_address"] == "h:99"
    assert captured["num_processes"] == 2
    assert captured["process_id"] == 1
    event = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert event == {"event": "distributed", "process_id": 0}

"""Hyperparameter sweep (train/tune.py + CLI `tune`): the whole grid runs
inside ONE compiled device program, so each config's trajectory must match a
standalone train() run of the same (lam, seed) — same ops, same order."""

import dataclasses
import json

import numpy as np
import pytest

from ycnr_tpu import get_preset
from ycnr_tpu.cli import main
from ycnr_tpu.train.loop import train
from ycnr_tpu.train.tune import tune


def _cfg(algo="als", **data_kw):
    base = {"als": "ml100k-als", "ials": "ml20m-ials"}[algo]
    cfg = get_preset(base)
    dkw = dict(source="synthetic", n_users=150, n_items=300,
               n_ratings=6000, chunk_len=16)
    dkw.update(data_kw)
    return dataclasses.replace(
        cfg, out_dir=None,
        data=dataclasses.replace(cfg.data, **dkw))


def test_tune_matches_standalone_train():
    cfg = _cfg("als")
    res = tune(cfg, lams=[0.02, 0.05, 0.2], seeds=[0, 1], epochs=3)
    assert len(res.leaderboard) == 6
    # sorted ascending by final RMSE, best == min
    finals = [e["rmse_final"] for e in res.leaderboard]
    assert finals == sorted(finals)
    assert res.best == res.leaderboard[0]

    # every config's trajectory must reproduce a standalone train() run
    for entry in (res.leaderboard[0], res.leaderboard[-1]):
        solo = train(dataclasses.replace(
            cfg, seed=entry["seed"],
            als=dataclasses.replace(cfg.als, lam=entry["lam"], epochs=3)),
            dataset=res.dataset)
        np.testing.assert_allclose(entry["rmse"],
                                   [round(x, 6) for x in solo.rmse_history],
                                   rtol=0, atol=2e-5)


def test_tune_ials_ranks_by_hit_rate():
    cfg = dataclasses.replace(_cfg("ials"), topn=5)
    res = tune(cfg, lams=[0.05, 0.5], alphas=[10.0, 40.0], seeds=[0],
               epochs=2)
    assert len(res.leaderboard) == 4
    hits = [e["hit_rate"] for e in res.leaderboard]
    assert hits == sorted(hits, reverse=True)
    assert all("alpha" in e and len(e["rmse"]) == 2
               for e in res.leaderboard)
    assert res.best_state.U.shape[0] == cfg.data.n_users + 1


def test_tune_sgd_matches_standalone_stream_train():
    cfg = get_preset("ml1m-sgd")
    cfg = dataclasses.replace(
        cfg, out_dir=None,
        data=dataclasses.replace(cfg.data, source="synthetic", n_users=150,
                                 n_items=300, n_ratings=6000),
        sgd=dataclasses.replace(cfg.sgd, batch_size=512, method="stream"))
    res = tune(cfg, lams=[0.02, 0.1], lrs=[0.005, 0.02],
               seeds=[cfg.seed], epochs=3)
    assert len(res.leaderboard) == 4
    assert all("lr" in e for e in res.leaderboard)
    finals = [e["rmse_final"] for e in res.leaderboard]
    assert finals == sorted(finals)

    best = res.best
    solo = train(dataclasses.replace(
        cfg, sgd=dataclasses.replace(cfg.sgd, lam=best["lam"],
                                     lr=best["lr"], epochs=3)),
        dataset=res.dataset)
    np.testing.assert_allclose(best["rmse"],
                               [round(x, 6) for x in solo.rmse_history],
                               rtol=0, atol=2e-5)


def test_tune_sharded_matches_single_chip():
    """Mesh-parallel sweep (configs sharded over devices) must reproduce
    the single-chip sweep exactly — including a grid that does not divide
    the mesh (pad rows recompute the last config and are dropped)."""
    cfg = _cfg("als")
    r1 = tune(cfg, lams=[0.02, 0.05, 0.2], seeds=[0], epochs=3)
    cfg4 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, n_shards=4))
    r2 = tune(cfg4, lams=[0.02, 0.05, 0.2], seeds=[0], epochs=3,
              dataset=r1.dataset)
    assert [e["rmse"] for e in r1.leaderboard] == \
        [e["rmse"] for e in r2.leaderboard]
    np.testing.assert_allclose(np.asarray(r1.best_state.U),
                               np.asarray(r2.best_state.U), atol=1e-6)


def test_tune_sharded_sgd_matches_single_chip():
    cfg = get_preset("ml1m-sgd")
    cfg = dataclasses.replace(
        cfg, out_dir=None,
        data=dataclasses.replace(cfg.data, source="synthetic", n_users=120,
                                 n_items=240, n_ratings=5000),
        sgd=dataclasses.replace(cfg.sgd, batch_size=512, method="stream"))
    r1 = tune(cfg, lams=[0.02, 0.1], lrs=[0.005, 0.02],
              seeds=[cfg.seed], epochs=2)
    cfg2 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, n_shards=2))
    r2 = tune(cfg2, lams=[0.02, 0.1], lrs=[0.005, 0.02],
              seeds=[cfg.seed], epochs=2, dataset=r1.dataset)
    assert [e["rmse"] for e in r1.leaderboard] == \
        [e["rmse"] for e in r2.leaderboard]


def test_tune_bpr_matches_standalone_train():
    """BPR sweep: trajectories per (lam, lr, seed) must reproduce a
    standalone `train --algorithm bpr` run (same key formula per epoch),
    entries carry auc + hit_rate, ranking is by hit_rate descending."""
    cfg = dataclasses.replace(_cfg("als"), algorithm="bpr", topn=5)
    cfg = dataclasses.replace(
        cfg, bpr=dataclasses.replace(cfg.bpr, rank=6, batch_size=512))
    res = tune(cfg, lams=[0.005, 0.05], lrs=[0.05, 0.15], seeds=[0, 3],
               epochs=3)
    assert len(res.leaderboard) == 8
    hits = [e["hit_rate"] for e in res.leaderboard]
    assert hits == sorted(hits, reverse=True)
    assert all(len(e["auc"]) == 3 and 0.0 <= e["auc_final"] <= 1.0
               for e in res.leaderboard)
    # the winner's final state equals a standalone train() at its config
    best = res.best
    solo = train(dataclasses.replace(
        cfg, seed=best["seed"],
        bpr=dataclasses.replace(cfg.bpr, lam=best["lam"], lr=best["lr"],
                                epochs=3)), dataset=res.dataset)
    np.testing.assert_allclose(np.asarray(res.best_state.U),
                               np.asarray(solo.state.U), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.best_state.bi),
                               np.asarray(solo.state.bi), atol=1e-5)
    # EVERY entry reproduces its saved config, including seeds other than
    # cfg.seed (draws are keyed per-model, not on the sweep's cfg.seed)
    for entry in res.leaderboard:
        if entry["seed"] == 3 and entry is not best:
            s3 = train(dataclasses.replace(
                cfg, seed=3,
                bpr=dataclasses.replace(cfg.bpr, lam=entry["lam"],
                                        lr=entry["lr"], epochs=3)),
                dataset=res.dataset)
            # train records 1 - hit_rate@topn per epoch (512 users), the
            # same metric the sweep's entries carry
            assert entry["hit_rate"] == round(1.0 - s3.rmse_history[-1], 4)
            break
    else:
        raise AssertionError("no non-winning seed-3 entry to check")


def test_tune_sharded_bpr_matches_single_chip():
    cfg = dataclasses.replace(_cfg("als"), algorithm="bpr", topn=5)
    cfg = dataclasses.replace(
        cfg, bpr=dataclasses.replace(cfg.bpr, rank=6, batch_size=512))
    r1 = tune(cfg, lams=[0.005, 0.05], lrs=[0.05, 0.15], seeds=[0],
              epochs=2)
    cfg2 = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, n_shards=4))
    r2 = tune(cfg2, lams=[0.005, 0.05], lrs=[0.05, 0.15], seeds=[0],
              epochs=2, dataset=r1.dataset)
    assert [e["auc"] for e in r1.leaderboard] == \
        [e["auc"] for e in r2.leaderboard]


def test_tune_rejects_bad_grids():
    with pytest.raises(ValueError, match="at least one lambda"):
        tune(_cfg("als"), lams=[])
    with pytest.raises(ValueError, match="alphas only"):
        tune(_cfg("als"), lams=[0.05], alphas=[10.0])
    with pytest.raises(ValueError, match="lrs only"):
        tune(_cfg("als"), lams=[0.05], lrs=[0.01])
    sgd = dataclasses.replace(_cfg("als"), algorithm="sgd")
    with pytest.raises(ValueError, match="seed axis"):
        tune(sgd, lams=[0.05], seeds=[1, 2])


def test_cli_tune_ials_alphas(tmp_path, capsys):
    main(["tune", "--algorithm", "ials", "--source", "synthetic",
          "--users", "80", "--items", "160", "--ratings", "3000",
          "--epochs", "2", "--rank", "5", "--lams", "0.1",
          "--alphas", "10,40", "--out", str(tmp_path)])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    best = lines[-1]
    assert best["event"] == "best" and best["alpha"] in (10.0, 40.0)
    hits = [e["hit_rate"] for e in lines[:-1]]
    assert hits == sorted(hits, reverse=True)
    man = json.load(open(f"{best['out_dir']}/ckpt/manifest.json"))
    assert man["config"]["ials"]["alpha"] == best["alpha"]


def test_cli_tune_rank_axis(tmp_path, capsys):
    main(["tune", "--source", "synthetic", "--users", "80", "--items",
          "160", "--ratings", "3000", "--epochs", "2", "--lams", "0.05",
          "--ranks", "4,6", "--out", str(tmp_path)])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    best = lines[-1]
    assert best["event"] == "best" and best["rank"] in (4, 6)
    assert {e["rank"] for e in lines[:-1]} == {4, 6}
    assert best["rmse_final"] == min(e["rmse_final"] for e in lines[:-1])
    man = json.load(open(f"{best['out_dir']}/ckpt/manifest.json"))
    assert man["rank"] == best["rank"]
    assert man["config"]["als"]["rank"] == best["rank"]


def test_cli_tune_saves_best_checkpoint(tmp_path, capsys):
    main(["tune", "--source", "synthetic", "--users", "100", "--items",
          "200", "--ratings", "4000", "--epochs", "2", "--rank", "6",
          "--lams", "0.05,0.3", "--seeds", "0", "--out", str(tmp_path)])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    best = lines[-1]
    assert best["event"] == "best"
    assert best["rmse_final"] == min(x["rmse_final"] for x in lines[:-1])

    # the winner is a normal checkpoint: manifest carries its hyperparams,
    # and the sweep artifacts sit next to it
    man = json.load(open(f"{best['out_dir']}/ckpt/manifest.json"))
    assert man["config"]["als"]["lam"] == best["lam"]
    assert man["config"]["seed"] == best["seed"]
    board = [json.loads(x)
             for x in open(f"{best['out_dir']}/tune.jsonl")]
    assert len(board) == 2

    # and recommend can serve straight from it
    main(["prepare", "--source", "synthetic", "--store",
          str(tmp_path / "s"), "--users", "100", "--items", "200",
          "--ratings", "4000"])
    main(["recommend", "--ckpt", f"{best['out_dir']}/ckpt", "--store",
          str(tmp_path / "s"), "--user", "3", "-n", "4"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rec["items"]) == 4

"""End-to-end CLI coverage (the reference's entry scripts, SURVEY.md C15):
prepare -> train -> validate -> recommend (trained / cold / shm) -> publish
-> presets, all in-process on the CPU test backend."""

import json

import numpy as np
import pytest

from ycnr_tpu.cli import main
from ycnr_tpu.serve.shm import shm_available


def _out_lines(capsys):
    return [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One store + trained checkpoint shared by the serving tests."""
    root = tmp_path_factory.mktemp("cli")
    store = str(root / "store")
    main(["prepare", "--source", "synthetic", "--store", store,
          "--users", "120", "--items", "60", "--ratings", "3000"])
    main(["train", "--preset", "ml100k-als", "--store", store,
          "--epochs", "3", "--rank", "6", "--out", str(root / "runs")])
    return store, str(root / "runs" / "ml100k-als" / "ckpt")


def test_empty_store_is_loud(tmp_path):
    # a missing/unprepared store must not silently train on zero ratings,
    # and a typo'd path must not be entrenched by a makedirs side effect
    with pytest.raises(SystemExit, match="does not exist"):
        main(["train", "--preset", "ml100k-als", "--store",
              str(tmp_path / "nowhere"), "--out", str(tmp_path / "o")])
    assert not (tmp_path / "nowhere").exists()
    empty = tmp_path / "prepared_but_empty"
    empty.mkdir()
    with pytest.raises(SystemExit, match="is empty"):
        main(["train", "--preset", "ml100k-als", "--store", str(empty),
              "--out", str(tmp_path / "o")])


def test_prepare_reports_shape(tmp_path, capsys):
    main(["prepare", "--source", "synthetic", "--store",
          str(tmp_path / "s"), "--users", "50", "--items", "20",
          "--ratings", "400"])
    rec = _out_lines(capsys)[-1]
    assert rec["n_users"] == 50 and rec["rows"] > 0


def test_train_and_metrics(trained, capsys):
    store, ckpt = trained
    rmse = [json.loads(line) for line in
            open(f"{ckpt.rsplit('/', 1)[0]}/metrics.jsonl")
            if "rmse_test" in line]
    assert len(rmse) == 3
    assert rmse[-1]["rmse_test"] < rmse[0]["rmse_test"]  # training works


def test_train_ooc_matches_resident(trained, tmp_path, capsys):
    """--ooc streams blocks host->device but is the SAME math: the
    per-epoch RMSE trajectory must match the resident run bitwise-at-f32
    (models/ooc.py shares bucket_solve_rows with the resident path)."""
    store, ckpt = trained
    main(["train", "--preset", "ml100k-als", "--store", store, "--ooc",
          "--epochs", "3", "--rank", "6", "--out", str(tmp_path / "o")])
    capsys.readouterr()
    res = [json.loads(line) for line in
           open(f"{ckpt.rsplit('/', 1)[0]}/metrics.jsonl")
           if "rmse_test" in line]
    ooc = [json.loads(line) for line in
           open(tmp_path / "o" / "ml100k-als" / "metrics.jsonl")
           if "rmse_test" in line]
    assert [r["rmse_test"] for r in ooc] == [r["rmse_test"] for r in res]


def test_train_ooc_rejects_sgd(trained, tmp_path):
    store, _ = trained
    with pytest.raises(ValueError, match="als/ials"):
        main(["train", "--preset", "ml1m-sgd", "--store", store, "--ooc",
              "--epochs", "1", "--out", str(tmp_path / "o2")])


def test_train_ooc_sharded_matches_resident(trained, tmp_path):
    """--ooc --shards D (parallel/ooc_mesh.py mode-A wire sharding) on the
    fake mesh: the per-epoch RMSE trajectory must match the resident
    single-chip run at f32 print precision (the sharded psum reassociates
    the item-Gram sum; rounded to 6 decimals they coincide on this tiny
    dataset, as the resident sharded suite also relies on)."""
    store, ckpt = trained
    main(["train", "--preset", "ml100k-als", "--store", store, "--ooc",
          "--shards", "4", "--epochs", "3", "--rank", "6",
          "--out", str(tmp_path / "osh")])
    res = [json.loads(line) for line in
           open(f"{ckpt.rsplit('/', 1)[0]}/metrics.jsonl")
           if "rmse_test" in line]
    ooc = [json.loads(line) for line in
           open(tmp_path / "osh" / "ml100k-als" / "metrics.jsonl")
           if "rmse_test" in line]
    assert all(r.get("shards") == 4 and r.get("ooc") for r in ooc)
    got = [r["rmse_test"] for r in ooc]
    want = [r["rmse_test"] for r in res]
    assert got == pytest.approx(want, abs=2e-4)


def test_validate_ranking(trained, capsys):
    store, ckpt = trained
    main(["validate", "--ckpt", ckpt, "--store", store, "--ranking"])
    rec = _out_lines(capsys)[-1]
    assert rec["epoch"] == 3 and "rmse_test" in rec
    assert set(rec["ranking"]) >= {"hit_rate", "precision", "recall",
                                   "ndcg", "map"}


def test_recommend_trained_and_cold(trained, capsys):
    store, ckpt = trained
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--user", "0", "3", "-n", "5"])
    recs = _out_lines(capsys)
    assert [r["user"] for r in recs] == [0, 3]
    assert all(len(r["items"]) == 5 for r in recs)
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--rated", "2:5.0,7:4.0", "-n", "5"])
    cold = _out_lines(capsys)[-1]
    assert cold["user"] == "cold" and len(cold["items"]) == 5
    assert not {2, 7} & set(cold["items"])  # own ratings masked


def test_recommend_requires_source(trained):
    store, _ = trained
    with pytest.raises(SystemExit):
        main(["recommend", "--store", store, "--user", "0"])


def test_train_bpr_e2e(tmp_path, capsys):
    """BPR end-to-end: train logs hit_rate (not rmse), the final ranking
    suite runs, and the checkpoint serves top-N."""
    store = str(tmp_path / "s")
    main(["prepare", "--source", "synthetic", "--store", store,
          "--users", "80", "--items", "50", "--ratings", "2000"])
    capsys.readouterr()
    main(["train", "--preset", "ml100k-als", "--algorithm", "bpr",
          "--store", store, "--epochs", "4", "--rank", "6",
          "--platform", "cpu", "--out", str(tmp_path / "runs")])
    assert "final_hit_rate" in _out_lines(capsys)[-1]
    recs = [json.loads(line) for line in
            open(tmp_path / "runs" / "ml100k-als" / "metrics.jsonl")]
    epochs = [o for o in recs if "hit_rate" in o and "epoch" in o]
    assert len(epochs) == 4 and all("rmse_test" not in o for o in epochs)
    assert any(o.get("event") == "ranking" for o in recs)
    ckpt = str(tmp_path / "runs" / "ml100k-als" / "ckpt")
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--user", "1", "-n", "4", "--platform", "cpu"])
    rec = _out_lines(capsys)[-1]
    # a hot user on the small synthetic catalog can have <4 unrated items
    assert 1 <= len(rec["items"]) <= 4


def test_recommend_predict(trained, capsys):
    store, ckpt = trained
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--user", "3", "7", "--predict", "1,2,5", "--platform", "cpu"])
    outs = _out_lines(capsys)
    assert [o["user"] for o in outs] == [3, 7]
    for o in outs:
        assert o["items"] == [1, 2, 5] and len(o["scores"]) == 3
        assert all(np.isfinite(s) for s in o["scores"])
    with pytest.raises(SystemExit):  # --predict needs --user
        main(["recommend", "--ckpt", ckpt, "--store", store,
              "--predict", "1,2", "--platform", "cpu"])


def test_export_embeddings(trained, tmp_path, capsys):
    store, ckpt = trained
    out = str(tmp_path / "emb.npz")
    main(["export", "--ckpt", ckpt, "--store", store, "--out", out])
    rec = _out_lines(capsys)[-1]
    z = np.load(out)
    assert z["U"].shape == (rec["users"], rec["rank"])
    assert z["V"].shape == (rec["items"], rec["rank"])
    assert len(z["user_ids"]) == rec["users"]
    # synthetic store has no maps -> dense id space
    assert rec["id_space"] == "dense"
    np.testing.assert_array_equal(z["user_ids"],
                                  np.arange(rec["users"]))


def test_recommend_exclude(trained, capsys):
    store, ckpt = trained
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--user", "3", "-n", "5", "--platform", "cpu"])
    base = _out_lines(capsys)[-1]["items"]
    main(["recommend", "--ckpt", ckpt, "--store", store, "--user", "3",
          "-n", "5", "--exclude", f"{base[0]},{base[1]}",
          "--platform", "cpu"])
    out = _out_lines(capsys)[-1]["items"]
    assert base[0] not in out and base[1] not in out
    assert len(out) == 5  # exact: over-fetch then filter
    with pytest.raises(SystemExit):  # unknown catalog id is loud
        main(["recommend", "--ckpt", ckpt, "--store", store, "--user",
              "3", "--exclude", "99999", "--platform", "cpu"])
    with pytest.raises(SystemExit):  # unsupported combination is loud
        main(["recommend", "--ckpt", ckpt, "--store", store,
              "--popular", "--exclude", "1", "--platform", "cpu"])


def test_recommend_all_exclude(trained, tmp_path, capsys):
    """--all --exclude: the bulk JSONL export filters the blocked items
    from every user's list and still fills to n when possible."""
    store, ckpt = trained
    out = str(tmp_path / "r.jsonl")
    main(["recommend", "--ckpt", ckpt, "--store", store, "--all",
          "-n", "5", "--exclude", "0,1,2", "--save", out,
          "--platform", "cpu"])
    rows = [json.loads(line) for line in open(out)]
    assert len(rows) > 50
    for r in rows:
        assert not {0, 1, 2} & set(r["items"])
        assert len(r["items"]) <= 5
    assert sum(len(r["items"]) == 5 for r in rows) > len(rows) * 0.8


def test_recommend_popular_needs_no_factors(trained, capsys):
    # the popularity fallback only counts store rows — no --ckpt/--shm
    store, _ = trained
    main(["recommend", "--store", store, "--popular", "-n", "5"])
    out = _out_lines(capsys)[-1]
    assert len(out["popular"]) == 5


@pytest.mark.skipif(not shm_available(), reason="no native shm library")
def test_publish_and_shm_serving(trained, capsys):
    import uuid

    store, ckpt = trained
    name = f"/ycnr_cli_{uuid.uuid4().hex[:10]}"
    try:
        main(["publish", "--ckpt", ckpt, "--shm", name])
        assert _out_lines(capsys)[-1]["epoch"] == 3
        main(["recommend", "--shm", name, "--store", store,
              "--user", "1", "-n", "4"])
        via_shm = _out_lines(capsys)[-1]
        main(["recommend", "--ckpt", ckpt, "--store", store,
              "--user", "1", "-n", "4"])
        via_ckpt = _out_lines(capsys)[-1]
        assert via_shm == via_ckpt
        # point predictions read through the shm reader too
        main(["recommend", "--shm", name, "--store", store,
              "--user", "1", "--predict", "2,5"])
        shm_pred = _out_lines(capsys)[-1]
        main(["recommend", "--ckpt", ckpt, "--store", store,
              "--user", "1", "--predict", "2,5"])
        assert shm_pred == _out_lines(capsys)[-1]
        # exclusions delegate through the shm recommender as well
        main(["recommend", "--shm", name, "--store", store,
              "--user", "1", "-n", "4",
              "--exclude", str(via_shm["items"][0])])
        assert via_shm["items"][0] not in _out_lines(capsys)[-1]["items"]
        # stats over shm reports the published epoch
        import io
        import sys as _sys

        old_stdin = _sys.stdin
        _sys.stdin = io.StringIO("stats\n")
        try:
            main(["serve", "--shm", name, "--store", store, "-n", "4"])
        finally:
            _sys.stdin = old_stdin
        stats = _out_lines(capsys)[-1]
        assert stats["event"] == "stats" and stats["epoch"] == 3 \
            and stats["source"] == "shm"
    finally:
        from ycnr_tpu.native import get_shm_lib

        get_shm_lib().ycnr_shm_unlink(name.encode())


def test_serve_tcp(trained):
    """serve --listen: the same line protocol over a TCP socket."""
    import socket
    import subprocess
    import sys as _sys

    store, ckpt = trained
    proc = subprocess.Popen(
        [_sys.executable, "-m", "ycnr_tpu", "serve", "--ckpt", ckpt,
         "--store", store, "-n", "4", "--platform", "cpu",
         "--listen", "127.0.0.1:0"],
        stdout=subprocess.PIPE, text=True)
    try:
        ready = json.loads(proc.stdout.readline())
        port = int(ready["listen"].rsplit(":", 1)[1])
        with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
            s.sendall(b"1\nnonsense\n")
            s.shutdown(socket.SHUT_WR)
            lines = [json.loads(x) for x in s.makefile().read().splitlines()]
        assert lines[0]["user"] == 1 and len(lines[0]["items"]) == 4
        assert "error" in lines[1]
    finally:
        proc.kill()
        proc.wait()


def test_serve_loop(trained, capsys, monkeypatch):
    """serve: line-per-request loop — stats, trained user, cold fold-in,
    bad input error, then EOF ends the loop."""
    import io

    store, ckpt = trained
    monkeypatch.setattr("sys.stdin",
                        io.StringIO("stats\n1\ncold:2:5.0,7:4.0\nnonsense\n"))
    main(["serve", "--ckpt", ckpt, "--store", store, "-n", "4"])
    recs = _out_lines(capsys)
    assert recs[0]["event"] == "ready"
    assert recs[1]["event"] == "stats" and recs[1]["source"] == "ckpt" \
        and recs[1]["epoch"] == 3
    recs = recs[1:]
    assert recs[1]["user"] == 1 and len(recs[1]["items"]) == 4
    assert recs[2]["user"] == "cold" and not {2, 7} & set(recs[2]["items"])
    assert "error" in recs[3]
    # serve matches one-shot recommend for the same user
    main(["recommend", "--ckpt", ckpt, "--store", store, "--user", "1",
          "-n", "4"])
    assert _out_lines(capsys)[-1]["items"] == recs[1]["items"]


def test_serve_shared_cache(trained, capsys, monkeypatch):
    """serve --shm-cache: two serve invocations share computed lists
    through the cross-process shm cache (reference C8/Redis role)."""
    import io
    import uuid

    from ycnr_tpu.serve.cache import ShmRecCache, shm_cache_available

    if not shm_cache_available():
        pytest.skip("native shm cache unavailable")
    store, ckpt = trained
    name = f"/ycnr_testcli_{uuid.uuid4().hex[:10]}"
    try:
        monkeypatch.setattr("sys.stdin", io.StringIO("1\n"))
        main(["serve", "--ckpt", ckpt, "--store", store, "-n", "4",
              "--shm-cache", name])
        first = _out_lines(capsys)[-1]
        # second server (fresh process in production) hits the shared entry
        with ShmRecCache(name) as c:
            hit = c.get((1, 4))
            assert hit is not None and hit.tolist() == first["items"]
        monkeypatch.setattr("sys.stdin", io.StringIO("1\n"))
        main(["serve", "--ckpt", ckpt, "--store", store, "-n", "4",
              "--shm-cache", name])
        assert _out_lines(capsys)[-1]["items"] == first["items"]
    finally:
        from ycnr_tpu.native import get_cache_lib

        get_cache_lib().ycnr_cache_unlink(name.encode())


def test_presets_list(capsys):
    main(["presets"])
    out = capsys.readouterr().out
    for name in ("ml100k-als", "ml1m-sgd", "ml20m-als", "ml20m-ials",
                 "netflix-sharded"):
        assert name in out


def test_config_file_layering(tmp_path, capsys):
    """--config JSON layers over the preset; explicit flags still win."""
    import dataclasses

    from ycnr_tpu.config import config_from_dict, get_preset

    cfgfile = tmp_path / "c.json"
    cfgfile.write_text(json.dumps({
        "algorithm": "als",
        "als": {"rank": 7, "lam": 0.09},
        "data": {"source": "synthetic", "n_users": 60, "n_items": 30,
                 "n_ratings": 700, "chunk_len": 8},
    }))
    main(["train", "--preset", "ml100k-als", "--config", str(cfgfile),
          "--epochs", "2", "--out", str(tmp_path / "runs")])
    rec = _out_lines(capsys)[-1]
    assert rec["epochs"] == 2  # flag won over preset epochs
    ck = json.load(open(tmp_path / "runs/ml100k-als/ckpt/manifest.json"))
    assert ck["rank"] == 7 and ck["n_users"] == 60  # file keys applied

    with pytest.raises(KeyError, match="unknown config key"):
        config_from_dict({"nope": 1})
    base = config_from_dict({"preset": "ml1m-sgd", "sgd": {"lr": 0.123}})
    assert base.algorithm == "sgd" and base.sgd.lr == 0.123
    assert dataclasses.asdict(get_preset("ml1m-sgd"))["sgd"]["lr"] != 0.123


def test_recommend_all_jsonl(trained, tmp_path, capsys):
    """--all: batch top-N for every rated user; masked, id-complete."""
    store, ckpt = trained
    main(["recommend", "--ckpt", ckpt, "--store", store, "--all", "-n", "3",
          "--save", str(tmp_path / "recs.jsonl")])
    assert _out_lines(capsys)[-1]["event"] == "recommend_all"
    rows = [json.loads(x) for x in open(tmp_path / "recs.jsonl")]
    from ycnr_tpu.data.store import RatingsStore

    st = RatingsStore(store)
    u, i, _ = st.read_all()
    n_items = int(st.meta["n_items"])
    assert rows
    for r in rows:
        rated = set(i[u == r["user"]].tolist())
        # rows are ragged: users with fewer than 3 unrated items get the
        # NEG_INF-masked tail dropped instead of padded/rated indices
        assert len(r["items"]) == min(3, n_items - len(rated))
        assert not (set(r["items"]) & rated)


def test_config_file_preset_and_out_dir_honored(tmp_path, capsys):
    """Without an explicit --preset/--out, the config file's own 'preset'
    and 'out_dir' keys must win (they used to be silently ignored /
    clobbered by argparse defaults)."""
    cfgfile = tmp_path / "c.json"
    cfgfile.write_text(json.dumps({
        "preset": "ml1m-sgd",
        "out_dir": str(tmp_path / "from_file"),
        "sgd": {"epochs": 2, "rank": 4},
        "data": {"source": "synthetic", "n_users": 40, "n_items": 20,
                 "n_ratings": 300, "chunk_len": 8},
    }))
    main(["train", "--config", str(cfgfile)])
    rec = _out_lines(capsys)[-1]
    assert rec["algorithm"] == "sgd"  # file's preset selected the base
    assert rec["out_dir"].startswith(str(tmp_path / "from_file"))


def test_unsupported_source_extension_is_loud(tmp_path):
    with pytest.raises(SystemExit, match="unsupported extension"):
        main(["train", "--source", str(tmp_path / "x.tsv"),
              "--out", str(tmp_path / "o")])


def test_movielens_import_roundtrip(tmp_path, capsys):
    """Original (sparse) dataset ids survive prepare -> recommend."""
    csv = tmp_path / "r.csv"
    rows = ["userId,movieId,rating,timestamp"]
    rng = np.random.default_rng(0)
    for u in range(10, 40):
        for i in rng.choice([100, 205, 333, 410, 555, 608, 777], 4,
                            replace=False):
            rows.append(f"{u},{i},{rng.integers(1, 6)}.0,1")
    csv.write_text("\n".join(rows) + "\n")
    store = str(tmp_path / "s")
    main(["prepare", "--source", str(csv), "--store", store])
    assert _out_lines(capsys)[-1]["id_maps"]
    main(["train", "--preset", "ml100k-als", "--store", store,
          "--epochs", "2", "--rank", "4", "--out", str(tmp_path / "runs")])
    capsys.readouterr()
    main(["recommend", "--ckpt", str(tmp_path / "runs/ml100k-als/ckpt"),
          "--store", store, "--user", "12", "-n", "3"])
    rec = _out_lines(capsys)[-1]
    assert rec["user"] == 12
    assert set(rec["items"]) <= {100, 205, 333, 410, 555, 608, 777}

"""Timestamp column + temporal split protocols (data/split.py, store ts
round-trip, 4-column parsers, CLI --split)."""

import json

import numpy as np
import pytest

from ycnr_tpu.data.split import leave_last_out, split_coo, time_split


def _coo(n=200, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 20, n).astype(np.int32)
    i = rng.integers(0, 50, n).astype(np.int32)
    r = rng.uniform(1, 5, n).astype(np.float32)
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    return u, i, r, ts


def test_time_split_holds_out_the_future():
    u, i, r, ts = _coo()
    (tu, ti, tr), (su, si, sr) = time_split(u, i, r, ts, 0.25)
    assert len(sr) == 50 and len(tr) == 150
    # every test row is strictly no older than every train row
    order = np.argsort(ts, kind="stable")
    cut = ts[order[150]]
    # reconstruct test timestamps by matching row identity via a key
    key = u.astype(np.int64) * 10**10 + i.astype(np.int64)
    t_by_key = {(int(k), float(x)): int(t)
                for k, x, t in zip(key, r, ts)}
    skey = su.astype(np.int64) * 10**10 + si.astype(np.int64)
    assert all(t_by_key[(int(k), float(x))] >= cut
               for k, x in zip(skey, sr))


def test_leave_last_out_per_user():
    u = np.asarray([0, 0, 0, 1, 1, 2], np.int32)
    i = np.asarray([10, 11, 12, 13, 14, 15], np.int32)
    r = np.ones(6, np.float32)
    ts = np.asarray([5, 1, 9, 2, 7, 3], np.int64)
    (tu, ti, tr), (su, si, sr) = leave_last_out(u, i, r, ts, k=1)
    # user 0's latest is item 12 (ts 9); user 1's is 14 (ts 7); user 2 has
    # only one rating -> stays fully in train
    assert sorted(si.tolist()) == [12, 14]
    assert sorted(ti.tolist()) == [10, 11, 13, 15]
    # k=2: user 0 keeps its oldest (11), users 1/2 too small
    (_, ti2, _), (_, si2, _) = leave_last_out(u, i, r, ts, k=2)
    assert sorted(si2.tolist()) == [10, 12]
    assert sorted(ti2.tolist()) == [11, 13, 14, 15]


def test_split_coo_dispatch_and_guards():
    u, i, r, ts = _coo()
    (a, _, _), _ = split_coo(u, i, r, None, method="random")
    assert len(a) == 180
    with pytest.raises(ValueError, match="timestamp column"):
        split_coo(u, i, r, None, method="time")
    with pytest.raises(ValueError, match="unknown split"):
        split_coo(u, i, r, ts, method="chronological")


def test_store_ts_roundtrip(tmp_path):
    from ycnr_tpu.data.store import RatingsStore

    u, i, r, ts = _coo(100)
    st = RatingsStore(str(tmp_path / "s"))
    st.append(u[:60], i[:60], r[:60], ts=ts[:60])
    st.append(u[60:], i[60:], r[60:], ts=ts[60:])
    np.testing.assert_array_equal(st.read_ts(), ts)
    with pytest.raises(ValueError, match="every append or for none"):
        st.append(u[:5], i[:5], r[:5])  # partial ts column refused

    st2 = RatingsStore(str(tmp_path / "s2"))
    st2.append(u, i, r)
    assert st2.read_ts() is None
    with pytest.raises(ValueError, match="every append or for none"):
        st2.append(u[:5], i[:5], r[:5], ts=ts[:5])


def test_parsers_return_ts(tmp_path):
    from ycnr_tpu.data.movielens import _parse_python, load_movielens

    path = str(tmp_path / "u.data")
    with open(path, "w") as f:
        f.write("1\t10\t4.0\t881250949\n2\t20\t3.5\t881250950\n"
                "1\t30\t5.0\t881250899\n")
    u, i, r, nu, ni, ts = load_movielens(path, return_ts=True)
    np.testing.assert_array_equal(ts, [881250949, 881250950, 881250899])
    # python fallback parses the same column
    pu, pi, pr, pts = _parse_python(path, "\t", want_ts=True)
    np.testing.assert_array_equal(pts, ts)
    # a 3-column file stores 0s but keeps the rows
    path3 = str(tmp_path / "v.data")
    with open(path3, "w") as f:
        f.write("1\t10\t4.0\n2\t20\t3.5\n")
    u3, i3, r3, _, _, ts3 = load_movielens(path3, return_ts=True)
    assert len(u3) == 2 and (np.asarray(ts3) == 0).all()


def test_python_parser_tolerates_malformed_ts(tmp_path):
    """A non-numeric 4th field stores ts=0 and keeps the row — matching
    the native parser, so the same file imports on every host."""
    from ycnr_tpu.data.movielens import _parse_python

    path = str(tmp_path / "u.data")
    with open(path, "w") as f:
        f.write("1\t10\t4.0\tabc\n2\t20\t3.5\t881250950\n")
    u, i, r, ts = _parse_python(path, "\t", want_ts=True)
    assert len(u) == 2
    np.testing.assert_array_equal(ts, [0, 881250950])


def test_prepare_appends_match_store_ts_schema(tmp_path, capsys):
    """prepare onto a pre-timestamp store drops ts (with a warning) rather
    than hard-failing the incremental import; re-preparing a synthetic
    store continues ts from the existing row count so later batches stay
    strictly later in time."""
    from ycnr_tpu.cli import main
    from ycnr_tpu.data.store import RatingsStore

    # (a) legacy store without a ts column accepts more appends
    legacy = str(tmp_path / "legacy")
    st = RatingsStore(legacy)
    u, i, r, _ = _coo(50)
    st.append(u, i, r)  # no ts -> has_ts stays False
    main(["prepare", "--source", "synthetic", "--store", legacy,
          "--users", "20", "--items", "50", "--ratings", "100"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == 150 and rec["timestamps"] is False

    # (b) synthetic re-prepare: second batch's ts continue after the first
    fresh = str(tmp_path / "fresh")
    main(["prepare", "--source", "synthetic", "--store", fresh,
          "--users", "20", "--items", "50", "--ratings", "100"])
    main(["prepare", "--source", "synthetic", "--store", fresh,
          "--users", "20", "--items", "50", "--ratings", "80",
          "--seed", "7"])
    ts = RatingsStore(fresh).read_ts()
    np.testing.assert_array_equal(ts, np.arange(180))


def test_cli_time_split_e2e(tmp_path, capsys):
    from ycnr_tpu.cli import main

    store = str(tmp_path / "s")
    main(["prepare", "--source", "synthetic", "--store", store,
          "--users", "100", "--items", "60", "--ratings", "3000"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["timestamps"] is True
    main(["train", "--preset", "ml100k-als", "--store", store,
          "--epochs", "2", "--rank", "5", "--split", "time",
          "--out", str(tmp_path / "runs")])
    ckpt = str(tmp_path / "runs" / "ml100k-als" / "ckpt")
    capsys.readouterr()
    main(["validate", "--ckpt", ckpt, "--store", store, "--split", "time"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["rmse_test"]) and out["n_test"] > 0
    # last-out protocol end-to-end as well
    main(["validate", "--ckpt", ckpt, "--store", store, "--split",
          "last-out", "--last-k", "2"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out2["rmse_test"]) and out2["n_test"] > 0

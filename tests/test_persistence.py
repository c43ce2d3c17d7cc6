"""Checkpoint/resume, RatingsStore streaming, RecCache (SURVEY.md §5, C7, C8)."""

import numpy as np
import pytest

from ycnr_tpu.data.store import RatingsStore
from ycnr_tpu.models.base import state_from_numpy
from ycnr_tpu.serve.cache import RecCache
from ycnr_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    st = state_from_numpy(rng.normal(size=(10, 4)), rng.normal(size=(8, 4)),
                          bu=rng.normal(size=10), bi=rng.normal(size=8),
                          mu=3.1)
    save_checkpoint(str(tmp_path / "ck"), st, epoch=5, config={"algo": "sgd"})
    st2, man = load_checkpoint(str(tmp_path / "ck"))
    assert man["epoch"] == 5 and man["config"]["algo"] == "sgd"
    assert man["n_users"] == 10 and man["rank"] == 4
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # overwrite with later epoch (atomic replace path)
    save_checkpoint(str(tmp_path / "ck"), st2, epoch=6)
    _, man2 = load_checkpoint(str(tmp_path / "ck"))
    assert man2["epoch"] == 6


def test_checkpoint_orbax_backend(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    rng = np.random.default_rng(2)
    st = state_from_numpy(rng.normal(size=(6, 3)), rng.normal(size=(5, 3)),
                          mu=1.5)
    save_checkpoint(str(tmp_path / "ck"), st, epoch=2, backend="orbax")
    st2, man = load_checkpoint(str(tmp_path / "ck"))
    assert man["backend"] == "orbax" and man["epoch"] == 2
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # overwrite with a later epoch (orbax refuses overwrites; we clear)
    save_checkpoint(str(tmp_path / "ck"), st2, epoch=3, backend="orbax")
    _, man2 = load_checkpoint(str(tmp_path / "ck"))
    assert man2["epoch"] == 3
    with pytest.raises(ValueError, match="backend"):
        save_checkpoint(str(tmp_path / "ck"), st, epoch=4, backend="zarr")


def test_train_resume_from_orbax(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ycnr_tpu.config import ALSConfig, DataConfig, RunConfig
    from ycnr_tpu.train.loop import train

    cfg = RunConfig(
        name="orb", algorithm="als",
        data=DataConfig(source="synthetic", n_users=40, n_items=20,
                        n_ratings=500, chunk_len=8),
        als=ALSConfig(rank=4, epochs=2), out_dir=str(tmp_path),
        log_train_rmse=False, checkpoint_backend="orbax")
    r1 = train(cfg)
    ck = f"{r1.out_dir}/ckpt"
    _, man = load_checkpoint(ck)
    assert man["backend"] == "orbax" and man["epoch"] == 2
    r2 = train(cfg.replace(als=ALSConfig(rank=4, epochs=4)), resume=ck)
    # resumed history spans the whole trajectory (manifest extra)
    assert len(r2.rmse_history) == 4
    assert r2.rmse_history[:2] == [round(x, 6) for x in r1.rmse_history]


def test_store_stream_portions(tmp_path):
    store = RatingsStore(str(tmp_path / "s"))
    rng = np.random.default_rng(1)
    total_u, total_r = [], []
    for _ in range(3):
        u = rng.integers(0, 50, 700).astype(np.int32)
        i = rng.integers(0, 30, 700).astype(np.int32)
        r = rng.uniform(1, 5, 700).astype(np.float32)
        store.append(u, i, r)
        total_u.append(u)
        total_r.append(r)
    assert store.n_rows == 2100
    # portions smaller than, equal to, and crossing segment boundaries
    for portion in (256, 700, 1000, 5000):
        got = list(store.stream(portion))
        assert sum(len(x[0]) for x in got) == 2100
        assert all(len(x[0]) <= portion for x in got)
        np.testing.assert_array_equal(np.concatenate([x[0] for x in got]),
                                      np.concatenate(total_u))
    # reopen from disk
    store2 = RatingsStore(str(tmp_path / "s"))
    u_all, i_all, r_all = store2.read_all()
    np.testing.assert_allclose(r_all, np.concatenate(total_r))


def test_store_rejects_ragged(tmp_path):
    store = RatingsStore(str(tmp_path / "s2"))
    with pytest.raises(ValueError):
        store.append([1, 2], [1], [3.0])


def test_rec_cache_lru_and_invalidate():
    c = RecCache(capacity=3)
    for k in range(4):
        c.put(k, [k])
    assert c.get(0) is None  # evicted (LRU)
    assert c.get(3) == [3]
    c.get(1)  # touch 1
    c.put(9, [9])  # evicts 2 (least recent), not 1
    assert c.get(2) is None and c.get(1) == [1]
    c.invalidate()
    assert len(c) == 0
    assert c.hits == 3 and c.misses == 2


def test_rec_cache_ttl(monkeypatch):
    import ycnr_tpu.serve.cache as m

    now = [100.0]
    monkeypatch.setattr(m.time, "time", lambda: now[0])
    c = RecCache(ttl_s=10)
    c.put("a", 1)
    assert c.get("a") == 1
    now[0] += 11
    assert c.get("a") is None


def test_metrics_append_on_resume(tmp_path):
    from ycnr_tpu.train.metrics import MetricsLogger

    p = str(tmp_path / "m.jsonl")
    m1 = MetricsLogger(p, echo=False)
    m1.log(epoch=1)
    m2 = MetricsLogger(p, echo=False, append=True)  # resume
    m2.log(epoch=2)
    recs = m2.read()
    assert [r["epoch"] for r in recs] == [1, 2]
    m3 = MetricsLogger(p, echo=False)  # fresh run truncates
    assert m3.read() == []


def test_cache_invalidate_by_user():
    c = RecCache()
    c.put((7, 10), "a")
    c.put((7, 5), "b")
    c.put((8, 10), "c")
    c.invalidate(7)
    assert c.get((7, 10)) is None and c.get((7, 5)) is None
    assert c.get((8, 10)) == "c"


def test_checkpoint_bfloat16_roundtrip(tmp_path):
    """bf16 states used to serialize as void '|V2' npz arrays that could
    never be loaded back; they are stored widened and cast back per the
    manifest dtype."""
    import jax.numpy as jnp

    from ycnr_tpu.models.base import init_state

    st = init_state(12, 7, 4, seed=3, dtype=jnp.bfloat16)
    save_checkpoint(str(tmp_path / "bk"), st, epoch=2)
    st2, man = load_checkpoint(str(tmp_path / "bk"))
    assert man["dtype"] == "bfloat16"
    assert st2.U.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(st.U, np.float32),
                                  np.asarray(st2.U, np.float32))

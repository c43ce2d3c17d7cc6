"""Item-item similarity serving (eval/similar.py, engine.similar, the
`similar:` request, `recommend --similar`)."""

import json

import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.eval.recommend import NEG_INF
from ycnr_tpu.eval.similar import similar_items
from ycnr_tpu.models.base import init_state
from ycnr_tpu.serve.engine import Recommender


def _state_with_cold(n_items=40, rank=6, cold=(7, 20)):
    st = init_state(30, n_items, rank, seed=3)
    V = np.array(st.V)  # writable copy
    V[list(cold)] = 0.0  # cold items: zero factor rows
    import jax.numpy as jnp

    return st._replace(V=jnp.asarray(V))


def _oracle_cosine(V, q, n):
    norms = np.linalg.norm(V, axis=1)
    live = norms > 0
    Vn = np.where(live[:, None], V / np.maximum(norms, 1e-12)[:, None], 0)
    s = Vn @ Vn[q]
    s[~live] = -np.inf
    s[q] = -np.inf
    order = np.argsort(-s, kind="stable")
    return order[:n], s


def test_similar_matches_oracle_and_masks():
    st = _state_with_cold()
    V = np.asarray(st.V, np.float64)
    for q in (0, 5, 33):
        items, scores = similar_items(st, [q], n=8)
        oi, os_ = _oracle_cosine(V, q, 8)
        # same similarity values in the same order (ties can swap ids)
        np.testing.assert_allclose(scores[0], os_[oi], atol=1e-5)
        assert q not in items[0]
        assert 7 not in items[0] and 20 not in items[0]  # cold masked
        assert st.n_items not in items[0]  # trash row masked


def test_similar_dot_vs_cosine_differ():
    st = init_state(10, 30, 4, seed=1)
    a, _ = similar_items(st, [3], n=10, metric="cosine")
    b, _ = similar_items(st, [3], n=10, metric="dot")
    assert not np.array_equal(a, b)  # random factors: orders disagree
    with pytest.raises(ValueError, match="metric"):
        similar_items(st, [3], n=5, metric="euclid")


def test_engine_similar_caches_and_survives_user_updates():
    u, i, r = synthetic_ratings(30, 40, 500, seed=0)
    st = _state_with_cold()
    rec = Recommender(st, u, i, train_r=r)
    first = rec.similar(2, n=5)
    assert rec.cache.get(("sim", 2, 5, "cosine")) is not None
    # an online rating update refits only the user's U row: similarity
    # entries must survive the per-user invalidation
    rec.add_ratings(4, [1], [5.0])
    assert rec.cache.get(("sim", 2, 5, "cosine")) is not None
    np.testing.assert_array_equal(rec.similar(2, n=5), first)
    # a factor republish flushes them
    rec.update_state(_state_with_cold(cold=(3,)))
    assert rec.cache.get(("sim", 2, 5, "cosine")) is None
    out_of_range = st.n_items + 5
    with pytest.raises(IndexError):
        rec.similar(out_of_range)
    # invalid metric raises BEFORE the cache probe (the shm cache key
    # namespaces only cosine/dot — a typo must not alias a dot entry)
    rec.similar(2, n=5, metric="dot")
    with pytest.raises(ValueError, match="metric"):
        rec.similar(2, n=5, metric="euclid")


def test_similar_cold_query_returns_empty():
    u, i, r = synthetic_ratings(30, 40, 500, seed=0)
    st = _state_with_cold(cold=(7, 20))
    items, scores = similar_items(st, [7], n=5)
    assert (scores[0] < NEG_INF / 2).all()  # whole row masked
    rec = Recommender(st, u, i, train_r=r)
    assert len(rec.similar(7, n=5)) == 0  # empty list, not zero-score junk


def test_precompute_similar_fills_cache():
    u, i, r = synthetic_ratings(30, 40, 500, seed=0)
    st = _state_with_cold(cold=(7, 20))
    rec = Recommender(st, u, i, train_r=r)
    count = rec.precompute_similar(n=5, chunk=16)  # forces a padded tail
    assert count == st.n_items - 2  # cold items skipped
    assert rec.cache.get(("sim", 7, 5, "cosine")) is None
    # a subsequent similar() must be a pure cache hit: poison the scorer
    import ycnr_tpu.eval.similar as sim

    orig = sim.similar_items
    sim.similar_items = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("scorer called despite precompute"))
    try:
        for q in (0, 5, 33):
            assert len(rec.similar(q, n=5)) == 5
    finally:
        sim.similar_items = orig


def test_popular_fallback():
    u = np.asarray([0, 1, 2, 3, 0, 1, 2, 0, 1, 0], np.int32)
    i = np.asarray([5, 5, 5, 5, 3, 3, 3, 7, 7, 9], np.int32)
    r = np.ones(10, np.float32)
    st = init_state(4, 12, 3, seed=0)
    rec = Recommender(st, u, i, train_r=r)
    top = rec.popular(3)
    assert top.tolist() == [5, 3, 7]  # by rating count, ties stable
    # never-rated items are excluded even when n exceeds the rated set
    assert rec.popular(12).tolist() == [5, 3, 7, 9]
    # cached; flushed by a state swap
    assert rec.cache.get(("pop", 0, 3, "count")) is not None
    rec.update_state(init_state(4, 12, 3, seed=1))
    assert rec.cache.get(("pop", 0, 3, "count")) is None


def test_popular_invalidated_by_compaction():
    """Compaction changes the base item counts, which per-user cache
    invalidation cannot reach — compact() must flush the pop namespace."""
    u = np.asarray([0, 1, 2, 3, 0, 1, 2, 0, 1, 0], np.int32)
    i = np.asarray([5, 5, 5, 5, 3, 3, 3, 7, 7, 9], np.int32)
    r = np.ones(10, np.float32)
    st = init_state(4, 12, 3, seed=0)
    rec = Recommender(st, u, i, train_r=r, compact_threshold=1)
    assert rec.popular(3).tolist() == [5, 3, 7]
    # three more ratings of item 9 (compacted immediately: threshold 1)
    # lift its count to 4, above item 3's 3 and item 7's 2
    for uid in (1, 2, 3):
        rec.add_ratings(uid, [9], [5.0])
    assert rec.pending_count() == 0  # compaction actually ran
    top = rec.popular(3).tolist()  # ties (5 vs 9, both 4) order-free
    assert 9 in top and 7 not in top


def test_serving_app_similar_request(tmp_path):
    from ycnr_tpu.serve.server import ServingApp

    u, i, r = synthetic_ratings(30, 40, 500, seed=0)
    st = _state_with_cold()
    rec = Recommender(st, u, i, train_r=r)
    app = ServingApp(rec, store_meta={"n_users": 30, "n_items": 40},
                     n=5, max_batch=0)
    try:
        out = json.loads(app.handle("similar:2"))
        assert out["item"] == 2 and len(out["similar"]) == 5
        assert json.loads(app.handle("similar:2:dot"))["similar"]
        assert "error" in json.loads(app.handle("similar:999"))
        assert len(json.loads(app.handle("popular"))["popular"]) == 5
    finally:
        app.close()


def test_cli_recommend_similar(tmp_path, capsys):
    from ycnr_tpu.cli import main

    store = str(tmp_path / "s")
    main(["prepare", "--source", "synthetic", "--store", store,
          "--users", "60", "--items", "40", "--ratings", "1500"])
    main(["train", "--preset", "ml100k-als", "--store", store,
          "--epochs", "2", "--rank", "5", "--out", str(tmp_path / "r")])
    capsys.readouterr()
    ckpt = str(tmp_path / "r" / "ml100k-als" / "ckpt")
    main(["recommend", "--ckpt", ckpt, "--store", store,
          "--similar", "3", "8", "-n", "6"])
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [x["item"] for x in lines] == [3, 8]
    assert all(len(x["similar"]) == 6 for x in lines)
    assert 3 not in lines[0]["similar"]


@pytest.mark.skipif(
    not __import__("ycnr_tpu.serve.cache", fromlist=["x"]
                   ).shm_cache_available(),
    reason="native shm cache unavailable")
def test_shm_cache_sim_namespace():
    """("sim", item, n, metric) keys must round-trip through the shared
    cache without colliding with (user, n) keys."""
    from ycnr_tpu.serve.cache import ShmRecCache

    name = f"/ycnr_test_sim_{np.random.randint(1 << 30)}"
    c = ShmRecCache(name, capacity=1 << 10)
    try:
        c.put((7, 5), np.arange(5, dtype=np.int32))
        c.put(("sim", 7, 5, "cosine"), np.arange(10, 15, dtype=np.int32))
        c.put(("sim", 7, 5, "dot"), np.arange(20, 25, dtype=np.int32))
        np.testing.assert_array_equal(c.get((7, 5)), np.arange(5))
        np.testing.assert_array_equal(c.get(("sim", 7, 5, "cosine")),
                                      np.arange(10, 15))
        np.testing.assert_array_equal(c.get(("sim", 7, 5, "dot")),
                                      np.arange(20, 25))
        # per-user tombstones must not touch the similarity namespace
        c.invalidate(7)
        assert c.get((7, 5)) is None
        assert c.get(("sim", 7, 5, "cosine")) is not None
        # uncacheable widths report dropped, not stored (precompute counts)
        assert c.put_if(("sim", 7, c.N_MAX + 1, "cosine"),
                        np.arange(c.N_MAX + 1, dtype=np.int32),
                        lambda: True) is False
        assert c.put((7, c.N_MAX + 1),
                     np.arange(c.N_MAX + 1, dtype=np.int32)) is False
    finally:
        c.unlink()
        c.close()

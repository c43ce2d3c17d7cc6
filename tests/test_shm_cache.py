"""Cross-process shared recommendation cache (reference C8/Redis role):
native/shm_cache.cc + serve/cache.ShmRecCache.

Covers: put/get roundtrip, epoch-keyed invalidation (full-cache and
fleet-wide per-user tombstones), sharing across a REAL second process,
engine integration (one process computes, another hits), and a
concurrent hammer."""

import json
import os
import subprocess
import sys
import threading
import uuid

import numpy as np
import pytest

from ycnr_tpu.serve.cache import ShmRecCache, shm_cache_available

pytestmark = pytest.mark.skipif(
    not shm_cache_available(),
    reason="native shm cache unavailable (no g++?)")


@pytest.fixture
def cache_name():
    name = f"/ycnr_testc_{uuid.uuid4().hex[:12]}"
    yield name
    from ycnr_tpu.native import get_cache_lib

    get_cache_lib().ycnr_cache_unlink(name.encode())


def test_roundtrip_and_epoch_invalidation(cache_name):
    with ShmRecCache(cache_name, 1 << 10, epoch=3) as c:
        assert c.get((7, 10)) is None
        c.put((7, 10), np.arange(10))
        np.testing.assert_array_equal(c.get((7, 10)), np.arange(10))
        # same user, different n = different entry
        assert c.get((7, 5)) is None
        # full invalidate: local epoch bump -> everything misses
        c.invalidate()
        assert c.get((7, 10)) is None
        # a republished factor epoch starts a fresh shared key space
        c.put((7, 10), [1, 2])
        c.set_epoch(4)
        assert c.get((7, 10)) is None


def test_per_user_tombstone_is_fleet_wide(cache_name):
    with ShmRecCache(cache_name, 1 << 10, epoch=2) as a, \
            ShmRecCache(cache_name, 1 << 10, epoch=2) as b:
        a.put((5, 10), [9, 8, 7])
        np.testing.assert_array_equal(b.get((5, 10)), [9, 8, 7])
        a.invalidate(5)  # after an online update for user 5
        assert a.get((5, 10)) is None
        assert b.get((5, 10)) is None  # other processes miss too


def test_popular_tombstone_is_fleet_wide(cache_name):
    with ShmRecCache(cache_name, 1 << 10, epoch=2) as a, \
            ShmRecCache(cache_name, 1 << 10, epoch=2) as b:
        a.put(("pop", 0, 10, "count"), [3, 1, 2])
        np.testing.assert_array_equal(b.get(("pop", 0, 10, "count")),
                                      [3, 1, 2])
        a.invalidate_popular()  # after a compaction changed base counts
        assert a.get(("pop", 0, 10, "count")) is None
        assert b.get(("pop", 0, 10, "count")) is None
        # user entries survive the namespace flush
        a.put((5, 10), [9])
        a.invalidate_popular()
        np.testing.assert_array_equal(a.get((5, 10)), [9])


def test_wide_requests_bypass(cache_name):
    with ShmRecCache(cache_name, 1 << 10) as c:
        c.put((1, ShmRecCache.N_MAX + 10), np.arange(70))
        assert c.get((1, ShmRecCache.N_MAX + 10)) is None


def test_cross_process_sharing(cache_name):
    with ShmRecCache(cache_name, 1 << 10, epoch=5) as c:
        c.put((42, 10), [3, 1, 4, 1, 5])
        child = subprocess.run(
            [sys.executable, "-c", f"""
import json, numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from ycnr_tpu.serve.cache import ShmRecCache
c = ShmRecCache({cache_name!r}, 1 << 10, epoch=5)
got = c.get((42, 10))
c.put((99, 10), [7, 7, 7])
print(json.dumps({{"got": None if got is None else got.tolist()}}))
c.close()
"""],
            capture_output=True, text=True, timeout=120,
            env={**os.environ, "PYTHONPATH": os.pathsep.join(
                [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 os.environ.get("PYTHONPATH", "")])})
        assert child.returncode == 0, child.stderr[-2000:]
        out = json.loads(child.stdout.strip().splitlines()[-1])
        assert out["got"] == [3, 1, 4, 1, 5]
        # the child's write is visible here
        np.testing.assert_array_equal(c.get((99, 10)), [7, 7, 7])


def test_engine_shares_computed_lists(cache_name):
    """Two engines (distinct processes in production) with one shared
    cache: the second serves the first's computed list without scoring."""
    from ycnr_tpu.data.synthetic import synthetic_ratings
    from ycnr_tpu.models.base import init_state
    from ycnr_tpu.serve.engine import Recommender

    u, i, r = synthetic_ratings(40, 30, 500, true_rank=3, seed=1)
    state = init_state(40, 30, 4, seed=0)
    with ShmRecCache(cache_name, 1 << 10) as ca, \
            ShmRecCache(cache_name, 1 << 10) as cb:
        a = Recommender(state, u, i, cache=ca)
        b = Recommender(state, u, i, cache=cb)
        top = a.recommend(3, 10)
        hit = cb.get((3, 10))
        assert hit is not None
        np.testing.assert_array_equal(hit, top)
        np.testing.assert_array_equal(b.recommend(3, 10), top)
        assert cb.hits >= 2


def test_concurrent_hammer(cache_name):
    """Concurrent writers/readers on colliding keys: every get returns
    None or a COMPLETE value some writer stored (no torn reads)."""
    with ShmRecCache(cache_name, 1 << 4) as c:  # tiny: force collisions
        stop = threading.Event()
        bad = []

        def writer(uid):
            k = 0
            while not stop.is_set():
                c.put((uid, 10), np.full(10, uid * 1000 + (k % 7)))
                k += 1

        def reader():
            while not stop.is_set():
                for uid in range(6):
                    got = c.get((uid, 10))
                    if got is None:
                        continue
                    if not (len(got) == 10 and len(set(got.tolist())) == 1
                            and got[0] // 1000 == uid):
                        bad.append(got.tolist())

        threads = [threading.Thread(target=writer, args=(uid,))
                   for uid in range(6)] + [threading.Thread(target=reader)
                                           for _ in range(3)]
        for t in threads:
            t.start()
        import time

        time.sleep(1.5)
        stop.set()
        for t in threads:
            t.join(timeout=10)
        assert not bad, bad[:3]

"""Recommendation cache (the reference's Redis role, SURVEY.md C8).

The reference keeps a Redis client, most plausibly caching computed
recommendations / job state. Stand-in: a process-local LRU with optional
TTL — same contract (get/put/invalidate by user), no external service.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict
from typing import Hashable, Optional


class RecCache:
    """Thread-safe: every operation holds an internal lock, so concurrent
    serving threads (serve/server.py) can share one cache."""

    def __init__(self, capacity: int = 100_000, ttl_s: Optional[float] = None):
        self.capacity = capacity
        self.ttl_s = ttl_s
        self._d: OrderedDict[Hashable, tuple] = OrderedDict()
        self._lock = threading.RLock()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        with self._lock:
            item = self._d.get(key)
            if item is None:
                self.misses += 1
                return None
            value, ts = item
            if self.ttl_s is not None and time.time() - ts > self.ttl_s:
                del self._d[key]
                self.misses += 1
                return None
            self._d.move_to_end(key)
            self.hits += 1
            return value

    def put(self, key, value):
        with self._lock:
            self._d[key] = (value, time.time())
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)

    def put_if(self, key, value, cond) -> bool:
        """Insert only if ``cond()`` still holds, atomically with respect
        to every other cache operation — the check-then-put used by
        concurrent readers to avoid caching a result computed against a
        superseded state (serve/engine.py version guard)."""
        with self._lock:
            if not cond():
                return False
            self._d[key] = (value, time.time())
            self._d.move_to_end(key)
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)
            return True

    def invalidate(self, key=None):
        """Drop everything (key=None), one exact key, or — when key matches
        the first element of tuple keys — every entry for that user (the
        engine keys entries as (user_id, n))."""
        with self._lock:
            if key is None:
                self._d.clear()
                return
            self._d.pop(key, None)
            for k in [k for k in self._d
                      if isinstance(k, tuple) and k and k[0] == key]:
                del self._d[k]

    def __len__(self):
        return len(self._d)

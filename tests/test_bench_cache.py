"""bench.py host-side artifact cache: layout flatten/unflatten round-trip.

The cache stores the packed layouts (BucketedCSR / BlockedCSR) as flat npz
keys; a silent mismatch here would feed wrong ratings to every cached bench
run, so the round-trip must be exact.
"""

import io
import os
import sys

import numpy as np

# bench.py lives at the repo root, not in the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.ops.bucketed import build_bucketed
from ycnr_tpu.ops.layout import build_blocked_csr


def _roundtrip(prefix, lay):
    blob = {}
    bench._flatten_layout(prefix, lay, blob)
    buf = io.BytesIO()
    np.savez(buf, **blob)
    buf.seek(0)
    return bench._unflatten_layout(prefix, np.load(buf))


def test_bucketed_roundtrip():
    u, i, r = synthetic_ratings(60, 40, 900, seed=5)
    lay = build_bucketed(u, i, r, 60, 40, chunk_len=8, rank_hint=8)
    back = _roundtrip("ul", lay)
    assert len(back) == len(lay)
    for g0, g1 in zip(lay, back):
        for f in g0._fields:
            np.testing.assert_array_equal(getattr(g0, f), getattr(g1, f))


def test_blocked_roundtrip():
    u, i, r = synthetic_ratings(60, 40, 900, seed=5)
    lay = build_blocked_csr(u, i, r, 60, 40, 8, rank_hint=8)
    back = _roundtrip("il", lay)
    assert type(back).__name__ == "BlockedCSR"
    for f in lay._fields:
        np.testing.assert_array_equal(getattr(lay, f), getattr(back, f))

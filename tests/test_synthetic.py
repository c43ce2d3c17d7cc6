"""Properties of the synthetic ratings generator (ycnr_tpu/data/synthetic.py).

The generator is the primary data source in this no-network environment
(SURVEY.md §7), so its invariants — exact dedup, determinism, target count,
rating range — are load-bearing for every downstream test and bench.
"""

import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings


def _keys(u, i, n_items):
    return u.astype(np.int64) * n_items + i


@pytest.mark.parametrize("power_law", [0.0, 0.6, 1.0])
def test_no_duplicates_and_exact_count(power_law):
    u, i, r = synthetic_ratings(500, 300, 30_000, seed=11,
                                power_law=power_law)
    keys = _keys(u, i, 300)
    assert len(np.unique(keys)) == len(keys)
    # sparse regime (20% density): the adaptive oversampler must hit the
    # requested count exactly
    assert len(r) == 30_000


def test_deterministic():
    a = synthetic_ratings(200, 100, 5_000, seed=3)
    b = synthetic_ratings(200, 100, 5_000, seed=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = synthetic_ratings(200, 100, 5_000, seed=4)
    assert not np.array_equal(a[0], c[0]) or not np.array_equal(a[1], c[1])


def test_rating_range_and_levels():
    u, i, r = synthetic_ratings(300, 200, 10_000, seed=0)
    assert r.min() >= 0.5 and r.max() <= 5.0
    # half-star levels
    np.testing.assert_array_equal(r * 2, np.round(r * 2))
    uf, if_, rf = synthetic_ratings(300, 200, 10_000, seed=0,
                                    rating_levels=False)
    assert rf.dtype == np.float32


def test_indices_in_range():
    u, i, r = synthetic_ratings(123, 45, 2_000, seed=9)
    assert u.min() >= 0 and int(u.max()) < 123
    assert i.min() >= 0 and int(i.max()) < 45
    assert u.dtype == np.int32 and i.dtype == np.int32


def test_nearly_full_grid_caps_gracefully():
    # request more ratings than the grid holds: generator must stop at the
    # ~98% density cap instead of looping forever
    u, i, r = synthetic_ratings(40, 30, 40 * 30 + 500, seed=2)
    assert len(r) <= 40 * 30
    keys = _keys(u, i, 30)
    assert len(np.unique(keys)) == len(keys)


def test_power_law_skews_popularity():
    u, i, r = synthetic_ratings(2_000, 1_000, 60_000, seed=5, power_law=1.0)
    counts = np.bincount(i, minlength=1_000)
    top = np.sort(counts)[-20:].sum()
    # with a zipf-ish law the top-2% of items hold far more than 2% of mass
    assert top > 0.10 * len(r)

"""Layout property tests (SURVEY.md §4 item 4: pack->unpack == identity)."""

import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.ops.layout import (
    BlockedCSR,
    build_blocked_csr,
    layout_stats,
    pad_coo,
    unpack_blocked_csr,
)


def _coo(n_users=50, n_items=30, nnz=400, seed=1):
    return synthetic_ratings(n_users, n_items, nnz, seed=seed), n_users, n_items


@pytest.mark.parametrize("chunk_len", [4, 8, 32])
@pytest.mark.parametrize("block_chunks", [None, 16, 64])
def test_roundtrip(chunk_len, block_chunks):
    (u, i, r), n_users, n_items = _coo()
    layout = build_blocked_csr(u, i, r, n_users, n_items, chunk_len,
                               block_chunks)
    e2, o2, r2 = unpack_blocked_csr(layout, n_users, n_items)
    order = np.lexsort((i, u))
    np.testing.assert_array_equal(e2, u[order])
    np.testing.assert_array_equal(o2, i[order])
    np.testing.assert_allclose(r2, r[order])


def test_transposed_view_roundtrip():
    (u, i, r), n_users, n_items = _coo(seed=3)
    layout = build_blocked_csr(i, u, r, n_items, n_users, 8, 32)
    e2, o2, r2 = unpack_blocked_csr(layout, n_items, n_users)
    order = np.lexsort((u, i))
    np.testing.assert_array_equal(e2, i[order])
    np.testing.assert_array_equal(o2, u[order])


def test_padding_conventions():
    (u, i, r), n_users, n_items = _coo()
    L, CB = 8, 32
    lay = build_blocked_csr(u, i, r, n_users, n_items, L, CB)
    # padding other-indices point at the zero row n_items
    pad_mask = lay.rating == 0.0
    assert np.all(lay.other_idx[pad_mask] == n_items)
    # real MovieLens-style ratings are never 0, so pad <-> rating==0
    assert np.all(lay.other_idx[~pad_mask] < n_items)
    # padding chunks -> segment U_B; padding slots -> entity n_users, count 0
    UB = lay.block_entities
    assert UB <= CB
    empty_chunks = np.all(lay.rating == 0.0, axis=2)
    assert np.all(lay.chunk_seg[empty_chunks & (lay.chunk_seg == UB)] == UB)
    assert np.all(lay.chunk_seg <= UB)
    assert np.all(lay.entity_ids[lay.entity_cnt == 0] == n_users)
    # entity counts match bincount
    cnt = np.bincount(u, minlength=n_users)
    for b in range(lay.n_blocks):
        for s in range(UB):
            e = lay.entity_ids[b, s]
            if e < n_users:
                assert lay.entity_cnt[b, s] == cnt[e]


def test_entity_never_splits_blocks():
    (u, i, r), n_users, n_items = _coo(nnz=600, seed=7)
    lay = build_blocked_csr(u, i, r, n_users, n_items, 4, 16)
    seen = set()
    for b in range(lay.n_blocks):
        ents = set(int(e) for e in lay.entity_ids[b] if e < n_users)
        assert not (ents & seen), "entity split across blocks"
        seen |= ents


def test_mega_entity_fits():
    # one user with more ratings than any reasonable block budget
    u = np.zeros(100, np.int32)
    i = np.arange(100, dtype=np.int32)
    r = np.ones(100, np.float32)
    lay = build_blocked_csr(u, i, r, 1, 100, chunk_len=4, block_chunks=8)
    # C_B must have been raised to fit ceil(100/4)=25 chunks
    assert lay.block_chunks >= 25
    e2, o2, r2 = unpack_blocked_csr(lay, 1, 100)
    assert len(e2) == 100


def test_stats_and_pad_coo():
    (u, i, r), n_users, n_items = _coo()
    lay = build_blocked_csr(u, i, r, n_users, n_items, 8)
    st = layout_stats(lay, len(r))
    assert 0 < st["fill"] <= 1.0
    pu, pi, pr, n = pad_coo(u[:10], i[:10], r[:10], n_users, n_items, 16)
    assert len(pu) == 16 and n == 10
    assert np.all(pu[10:] == n_users) and np.all(pr[10:] == 0)

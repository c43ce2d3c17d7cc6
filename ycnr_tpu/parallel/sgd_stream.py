"""Data-parallel stream-SGD over the mesh (P3 with the stream layout).

parallel/shard.py's sharded_sgd_epoch is the uniformly-shuffled P3 path:
local scatter-adds for the U side plus a zeros+scatter+psum per batch for
the V side — all bound by the ~9 ns/row per-row-op cost the stream layout
was built to avoid (models/sgd_stream.py). This module shards the STREAM:
each device holds its users' ratings as a user-sorted, per-batch
item-sorted stream; per global step every device processes one local batch
(U-tile dynamic slice + segment-sums, scatter-free) and the dense
[n_items+1, k+1] V-delta is `psum`'d — the same per-batch collective
semantics as the shuffled path (SURVEY.md P3), at stream cost.

Semantics: one global batch = the union of the D local batches, updated at
batch-start parameters. In "sum" mode this is EXACTLY models/sgd.sgd_epoch
run on the concatenated stream (U rows are shard-disjoint, the V psum is
the union sum) — pinned in float64 in tests/test_sgd_stream_sharded.py.
In "mean" mode multiplicities are per LOCAL batch (a hot item rated on
several shards in one step takes each shard's mean update summed), the
documented analog of the shuffled path's per-batch semantics delta.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ycnr_tpu.parallel.mesh import AXIS
from ycnr_tpu.parallel.shard import ShardedMeta, ShardedState


class ShardedStreamSGD(NamedTuple):
    """Per-shard streams stacked on the mesh axis ([D, NB, B] leaves)."""

    ul: jnp.ndarray  # [D, NB, B] int32 LOCAL user row within the tile
    ib: jnp.ndarray  # [D, NB, B] int32 global item id, sorted per batch
    rb: jnp.ndarray  # [D, NB, B]
    wu: jnp.ndarray  # [D, NB, B] per-row user-side weight (pad -> 0)
    wi: jnp.ndarray  # [D, NB, B] per-row item-side weight
    u_lo: jnp.ndarray  # [D, NB] int32 tile starts (local row space)
    tile: int
    grad_mode: str


def build_sharded_stream_sgd(train_u, train_i, train_r, meta: ShardedMeta,
                             batch_size: int, seed: int = 0,
                             dtype=jnp.float32, grad_mode: str = "mean",
                             mesh: Mesh | None = None):
    """Split the COO by meta's user partition and build one stream per
    shard (models/sgd_stream.prepare_stream_sgd per shard, common tile,
    batch count padded to the max shard).

    Returns (ShardedStreamSGD, orders) where orders[d] maps shard d's
    stream position -> index into that shard's COO subset (for tests).
    """
    from ycnr_tpu.models.sgd_stream import prepare_stream_sgd

    D, upd = meta.n_shards, meta.upd
    train_u = np.asarray(train_u)
    train_i = np.asarray(train_i)
    train_r = np.asarray(train_r, np.float32)
    shard_of = meta.user_local[train_u] // upd
    local_of = meta.user_local[train_u] % upd
    b_local = max(1, batch_size // D)

    datas, orders = [], []
    for d in range(D):
        p = np.nonzero(shard_of == d)[0]
        sd, od = prepare_stream_sgd(local_of[p], train_i[p], train_r[p],
                                    b_local, upd, meta.n_items,
                                    seed=seed + d, dtype=dtype,
                                    grad_mode=grad_mode)
        datas.append(sd)
        orders.append(od)
    tile = max(sd.tile for sd in datas)
    nb = max(sd.ul.shape[0] for sd in datas)
    # re-derive each shard's (u_lo, ul) for the COMMON tile arithmetically
    # (us = ul + u_lo per batch) instead of re-running the whole prepare
    for d, sd in enumerate(datas):
        ul = np.asarray(sd.ul)
        lo = np.asarray(sd.u_lo)
        us = ul.astype(np.int64) + lo.astype(np.int64)[:, None]
        first = us.min(axis=1)
        lo2 = np.minimum(first, upd + 1 - tile).astype(np.int32)
        ul2 = (us - lo2[:, None].astype(np.int64)).astype(np.int32)
        datas[d] = sd._replace(ul=jnp.asarray(ul2), u_lo=jnp.asarray(lo2),
                               tile=tile)

    def stack(field, pad_value, dt):
        out = np.full((D, nb, b_local), pad_value, dt)
        for d, sd in enumerate(datas):
            a = np.asarray(getattr(sd, field))
            out[d, : a.shape[0]] = a
        return out

    lo = np.zeros((D, nb), np.int32)
    for d, sd in enumerate(datas):
        a = np.asarray(sd.u_lo)
        lo[d, : len(a)] = a
    data = ShardedStreamSGD(
        ul=jnp.asarray(stack("ul", 0, np.int32)),
        ib=jnp.asarray(stack("ib", meta.n_items, np.int32)),
        rb=jnp.asarray(stack("rb", 0.0, np.float64), dtype),
        wu=jnp.asarray(stack("wu", 0.0, np.float64), dtype),
        wi=jnp.asarray(stack("wi", 0.0, np.float64), dtype),
        u_lo=jnp.asarray(lo), tile=tile, grad_mode=grad_mode)
    if mesh is not None:
        sh = NamedSharding(mesh, P(AXIS))
        data = ShardedStreamSGD(
            *(jax.device_put(x, sh) for x in data[:6]),
            tile=tile, grad_mode=grad_mode)
    return data, orders


@lru_cache(maxsize=16)
def _stream_epoch_fn(mesh: Mesh, lam: float, tile: int):
    def local(U, bu, V, bi, mu, ul, ib, rb, wu, wi, u_lo, order, lr):
        Ul, bul = U[0], bu[0]
        k = Ul.shape[1]
        n_items = V.shape[0] - 1
        lam_ = jnp.asarray(lam, Ul.dtype)
        Ue = jnp.concatenate([Ul, bul[:, None]], axis=1)
        Ve = jnp.concatenate([V, bi[:, None]], axis=1)
        one_col = (lax.broadcasted_iota(jnp.int32, (1, k + 1), 1)
                   == k).astype(Ue.dtype)
        xs = (ul[0][order], ib[0][order], rb[0][order], wu[0][order],
              wi[0][order], u_lo[0][order])

        def body(carry, xs_b):
            Ue, Ve = carry
            ulb, ibb, rbb, wub, wib, lo = xs_b
            zero = jnp.zeros((), lo.dtype)
            Ut = lax.dynamic_slice(Ue, (lo, zero), (tile, k + 1))
            ue = Ut[ulb]
            ve = Ve[ibb]
            pred = (mu + ue[:, k] + ve[:, k]
                    + jnp.einsum("nk,nk->n", ue[:, :k], ve[:, :k]))
            e = rbb - pred  # weights carry the padding mask
            ve1 = ve * (1 - one_col) + one_col
            ue1 = ue * (1 - one_col) + one_col
            gu = (lr * wub)[:, None] * (e[:, None] * ve1 - lam_ * ue)
            gv = (lr * wib)[:, None] * (e[:, None] * ue1 - lam_ * ve)
            dU = jax.ops.segment_sum(gu, ulb, num_segments=tile)
            dV = jax.ops.segment_sum(gv, ibb, num_segments=n_items + 1,
                                     indices_are_sorted=True)
            Ue = lax.dynamic_update_slice(Ue, Ut + dU, (lo, zero))
            # V / b_i deltas cross user shards: psum per batch (P3)
            Ve = Ve + lax.psum(dV, AXIS)
            return (Ue, Ve), None

        (Ue, Ve), _ = lax.scan(body, (Ue, Ve), xs)
        return (Ue[None, :, :k], Ue[None, :, k], Ve[:, :k], Ve[:, k])

    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P(), P()))

    def epoch(st: ShardedState, ul, ib, rb, wu, wi, u_lo, order,
              lr) -> ShardedState:
        U, bu, V, bi = shmapped(st.U, st.bu, st.V, st.bi, st.mu,
                                ul, ib, rb, wu, wi, u_lo, order, lr)
        return ShardedState(U, V, bu, bi, st.mu)

    return jax.jit(epoch, donate_argnums=(0,))


def sharded_sgd_stream_epoch(mesh: Mesh, st: ShardedState,
                             data: ShardedStreamSGD, lam: float, lr,
                             key) -> ShardedState:
    """One stream epoch on the mesh; batch ORDER reshuffles from ``key``
    (same order on every shard — contents already differ per shard)."""
    nb = data.ul.shape[1]
    order = jax.random.permutation(key, nb)
    return _stream_epoch_fn(mesh, float(lam), data.tile)(
        st, data.ul, data.ib, data.rb, data.wu, data.wi, data.u_lo,
        order, jnp.asarray(lr, st.V.dtype))

"""Stream-SGD: the SGD epoch restructured for TPU memory behavior.

models/sgd.py processes uniformly-shuffled batches, so BOTH factor tables
see random-row gathers + scatter-adds; measured on v5e those cost 20-50
ns/row in XLA regardless of table size, sortedness, or hints
(docs/KERNELS.md "SGD epoch perf model"), putting the Netflix epoch at
~14.6 s. This module keeps the exact per-batch update MATH (gradients at
batch-start parameters, duplicate handling per grad_mode) but fixes the
ACCESS PATTERN, the reference being the hogwild stream of SURVEY.md call
stack 3.3:

* The rating stream is sorted by user once at prepare time (items shuffled
  within each user), and batches are consecutive stream segments. The user
  rows a batch touches then live in ONE contiguous index window, so the
  U-side becomes dynamic_slice (sequential HBM read) + sorted segment-sum
  + dynamic_update_slice (sequential write) — no random access at all.
* The item side has NO scatters either: each batch carries a precomputed
  within-batch item-sort permutation, so V/bi deltas are permuted (row
  gather, ~2 ns/row), segment-summed with sorted indices into a dense
  [n_items+1, k] delta, and added densely — the item table is small
  enough (ML-20M 6.8 MB, Netflix 4.5 MB f32) that the dense add is
  bandwidth-trivial (~11 us/batch at Netflix scale).
* Per-epoch stochasticity comes from permuting the BATCH ORDER every
  epoch (classic incremental-gradient reordering; the convergence band
  vs the uniformly-shuffled reference path is pinned in
  tests/test_sgd_stream.py).

"sum" mode is numerically equivalent to models/sgd.sgd_epoch run with the
stream order as its permutation (the segment sums accumulate the same
terms); parity is pinned in float64 in tests/test_sgd_stream.py. NOTE the
stream order CONCENTRATES a hot user's ratings into one batch, which is
exactly the case "sum" handles badly (models/sgd.py docstring) — "mean"
is the stream default.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.models.base import MFState


class StreamSGDData(NamedTuple):
    """User-sorted rating stream cut into [n_batches, B] device arrays.

    Padding rows carry item id n_items (the zero trash row) and mask out of
    every update. ``ul`` is the LOCAL user row within the batch's U-tile
    (global user id - u_lo); ``u_lo`` is each batch's tile start, already
    clamped so a full [tile, k] dynamic_slice stays in bounds.
    """

    ul: jnp.ndarray  # [NB, B] int32 local user row in the batch tile
    ib: jnp.ndarray  # [NB, B] int32 global item id (pad -> n_items)
    rb: jnp.ndarray  # [NB, B] float rating (pad -> 0)
    ip: jnp.ndarray  # [NB, B] int32 within-batch item-sort permutation
    u_lo: jnp.ndarray  # [NB] int32 tile start row
    n_real: int
    tile: int  # static tile height (max user span over batches, padded)


def prepare_stream_sgd(train_u, train_i, train_r, batch_size: int,
                       n_users: int, n_items: int, seed: int = 0,
                       dtype=jnp.float32):
    """Build the user-sorted stream (host, once per dataset).

    Returns (StreamSGDData, order) where ``order`` maps stream position ->
    original padded-COO position (exposed so tests can replay the exact
    stream through models/sgd.sgd_epoch for parity).
    """
    n = len(train_r)
    nb = -(-n // batch_size)
    n_pad = nb * batch_size
    u = np.full(n_pad, n_users, np.int64)
    i = np.full(n_pad, n_items, np.int64)
    r = np.zeros(n_pad, np.float32)
    u[:n], i[:n], r[:n] = train_u, train_i, train_r
    rng = np.random.default_rng(seed)
    shuf = rng.permutation(n_pad)  # shuffles items within users after sort
    order = shuf[np.argsort(u[shuf], kind="stable")]
    us, is_, rs = u[order], i[order], r[order]

    first = us[::batch_size]  # [NB]
    last = us[batch_size - 1 :: batch_size]
    tile = int((last - first).max(initial=0)) + 1
    tile = min(-(-tile // 8) * 8, n_users + 1)  # pad to sublane multiple
    u_lo = np.minimum(first, n_users + 1 - tile).astype(np.int32)
    ul = (us - np.repeat(u_lo.astype(np.int64), batch_size)).astype(np.int32)
    ib2 = is_.reshape(nb, batch_size)
    ip = np.argsort(ib2, axis=1, kind="stable").astype(np.int32)
    data = StreamSGDData(
        ul=jnp.asarray(ul.reshape(nb, batch_size)),
        ib=jnp.asarray(ib2.astype(np.int32)),
        rb=jnp.asarray(rs.reshape(nb, batch_size), dtype),
        ip=jnp.asarray(ip),
        u_lo=jnp.asarray(u_lo),
        n_real=n, tile=tile)
    return data, order


@partial(jax.jit, static_argnames=("lam", "tile", "grad_mode"),
         donate_argnums=(0,))
def sgd_stream_epoch(state: MFState, ul, ib, rb, ip, u_lo, order,
                     lam: float, lr, tile: int,
                     grad_mode: str = "mean") -> MFState:
    """One epoch over the stream in batch order ``order`` ([NB] int32
    permutation — reshuffled per epoch for stochasticity).

    Per batch: U-tile in/out via dynamic slices (sequential), user updates
    via SORTED segment-sum into the tile; V/bi deltas are permuted into
    item order (``ip``), segment-summed densely over the item table, and
    added — no scatter anywhere. Gradients are evaluated at batch-start
    parameters, exactly like models/sgd.sgd_epoch.
    """
    n_users = state.n_users
    n_items = state.n_items
    k = state.U.shape[1]
    lr = jnp.asarray(lr, state.U.dtype)
    # materialize the epoch's batch order once (leading-axis gather)
    xs = (ul[order], ib[order], rb[order], ip[order], u_lo[order])

    def body(carry, xs_b):
        U, V, bu, bi = carry
        ulb, ibb, rbb, ipb, lo = xs_b
        zero = jnp.zeros((), lo.dtype)  # match index dtypes (x64 tests)
        Ut = lax.dynamic_slice(U, (lo, zero), (tile, k))
        but = lax.dynamic_slice(bu, (lo,), (tile,))
        Uu = Ut[ulb]  # [B, k] gather from the VMEM-sized tile
        Vi = V[ibb]
        buu = but[ulb]
        bii = bi[ibb]
        pred = state.mu + buu + bii + jnp.einsum("nk,nk->n", Uu, Vi)
        m = (ibb < n_items).astype(U.dtype)  # padding mask
        e = (rbb - pred) * m
        ib_sorted = ibb[ipb]

        def item_dense(rows, vec):
            """Permute per-row deltas into item order and segment-sum into
            a dense [n_items+1(, k)] delta (sorted fast path)."""
            dV = jax.ops.segment_sum(rows[ipb], ib_sorted,
                                     num_segments=n_items + 1,
                                     indices_are_sorted=True)
            db = jax.ops.segment_sum(vec[ipb], ib_sorted,
                                     num_segments=n_items + 1,
                                     indices_are_sorted=True)
            return dV, db

        if grad_mode == "mean":
            cu = jax.ops.segment_sum(m, ulb, num_segments=tile,
                                     indices_are_sorted=True)
            ci = jax.ops.segment_sum(m[ipb], ib_sorted,
                                     num_segments=n_items + 1,
                                     indices_are_sorted=True)
            wu = m / jnp.maximum(cu[ulb], 1.0)
            wi = m / jnp.maximum(ci[ibb], 1.0)
        else:
            wu = wi = m
        gU = lr * wu[:, None] * (e[:, None] * Vi - lam * Uu)
        gbu = lr * wu * (e - lam * buu)
        # ulb is sorted (user-major stream) -> fast sorted segment path
        dU = jax.ops.segment_sum(gU, ulb, num_segments=tile,
                                 indices_are_sorted=True)
        dbu = jax.ops.segment_sum(gbu, ulb, num_segments=tile,
                                  indices_are_sorted=True)
        U = lax.dynamic_update_slice(U, Ut + dU, (lo, zero))
        bu = lax.dynamic_update_slice(bu, but + dbu, (lo,))
        gV = lr * wi[:, None] * (e[:, None] * Uu - lam * Vi)
        gbi = lr * wi * (e - lam * bii)
        dV, dbi = item_dense(gV, gbi)
        V = V + dV
        bi = bi + dbi
        return (U, V, bu, bi), None

    (U, V, bu, bi), _ = lax.scan(
        body, (state.U, state.V, state.bu, state.bi), xs)
    return state._replace(U=U, V=V, bu=bu, bi=bi)


class StreamSGD:
    """Engine-facing stream-SGD trainer (drop-in for models/sgd.BiasedSGD
    where the dataset was prepared with prepare_stream_sgd)."""

    def __init__(self, lam: float = 0.02, lr: float = 0.01,
                 lr_decay: float = 0.95, seed: int = 0,
                 grad_mode: str = "mean"):
        self.lam = float(lam)
        self.lr0 = float(lr)
        self.lr_decay = float(lr_decay)
        self.seed = seed
        self.grad_mode = grad_mode

    def lr_at(self, epoch: int) -> float:
        return self.lr0 * self.lr_decay**epoch

    def epoch(self, state: MFState, data: StreamSGDData,
              epoch_idx: int) -> MFState:
        nb = data.ul.shape[0]
        key = jax.random.key(self.seed + 7919 * epoch_idx)
        order = jax.random.permutation(key, nb)
        return sgd_stream_epoch(state, data.ul, data.ib, data.rb, data.ip,
                                data.u_lo, order, self.lam,
                                self.lr_at(epoch_idx), data.tile,
                                self.grad_mode)

"""BPR-MF on device: pairwise ranking for implicit feedback (Rendle 2009).

Beyond-parity capability: the reference engine (SURVEY.md C9-C11) trains
pointwise models only (ALS-WR / biased SGD / iALS). Users coming from the
wider MF ecosystem expect a pairwise ranking trainer for implicit data, so
this adds BPR on the same deterministic mini-batch machinery as
models/sgd.py: per batch, gradients are computed at batch-start parameters
and scatter-added (duplicates accumulate — `np.add.at` semantics, matching
oracle/numpy_mf.bpr_epoch_batched exactly).

TPU-idiomatic negative sampling: per epoch, one uniformly-drawn negative
item per observed (user, item) positive — drawn ON DEVICE with
`jax.random`, validated against a packed rated-bits table ([n_users+1,
ceil(n_items/32)] uint32, the same bitfield trick as the serving mask,
eval/recommend.build_rated_bits). A collision (the "negative" is actually
rated) zero-weights that triple instead of resampling: static shapes, no
data-dependent control flow, and with power-law catalogs the loss is a few
percent of samples for the hottest users. Same seed => bitwise-same
factors (SURVEY.md §5 determinism contract).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.models.base import MFState


class BPRData(NamedTuple):
    """Positive pairs padded to whole batches + the rated-bits table.
    Padding points at the trash rows (u = n_users, i = n_items) and is
    masked out of every update."""

    u: jnp.ndarray      # [n_pad] int32
    i: jnp.ndarray      # [n_pad] int32
    bits: jnp.ndarray   # [n_users + 1, ceil(n_items/32)] uint32
    n_real: int


def pack_rated_bits(train_u, train_i, n_users: int, n_items: int):
    """Packed rated-set bitfield (host side, one pass over nnz). C++ fast
    path (native/ingest.cc ycnr_pack_bits — ~10x over np.bitwise_or.at at
    20M rows) with the NumPy fallback when no toolchain exists."""
    from ycnr_tpu.native import pack_bits_native

    out = pack_bits_native(train_u, train_i, n_users, n_items)
    if out is not None:
        return out
    W = (int(n_items) + 31) // 32
    bits = np.zeros((int(n_users) + 1, W), np.uint32)
    u = np.asarray(train_u)
    i = np.asarray(train_i)
    np.bitwise_or.at(bits, (u, i // 32),
                     (np.uint32(1) << (i % 32).astype(np.uint32)))
    return bits


def prepare_bpr_data(train_u, train_i, batch_size: int, n_users: int,
                     n_items: int) -> BPRData:
    n = len(train_u)
    n_pad = int(-(-n // batch_size) * batch_size)
    u = np.full(n_pad, n_users, np.int32)
    i = np.full(n_pad, n_items, np.int32)
    u[:n], i[:n] = train_u, train_i
    bits = pack_rated_bits(train_u, train_i, n_users, n_items)
    return BPRData(jnp.asarray(u), jnp.asarray(i), jnp.asarray(bits), n)


def bpr_epoch_core(U, V, bi, u, i, j, bits, lam, lr, grad_mode: str):
    """Batched-triple scan with TRACED lam/lr (so the hyperparameter sweep
    can map over them as per-model data, train/tune.py). u/i/j are already
    permuted + reshaped to [n_batches, B]. Returns (U, V, bi).

    The item bias rides as an extra factor column for the epoch (the
    stream-SGD trick, models/sgd_stream.py): with Vf = [V | bi] and
    Uf = [U | 1], x = Uf[u].(Vf[i]-Vf[j]) and the joint Vf update's last
    column IS the bi update (s - lam*bi), element for element — so the
    four separate per-row bias ops (2 gathers + 2 scatter-adds per
    triple) vanish. 10 -> 6 random per-row ops per triple ("sum" mode);
    measured 3.21 -> 2.4 s/epoch at ML-20M scale (docs/KERNELS.md "BPR
    epoch perf model"). Uf's ones-column must not drift: the U-side
    delta is zeroed on the last column.
    """
    n_users = U.shape[0] - 1
    k = U.shape[1]
    lr = jnp.asarray(lr, U.dtype)
    Uf = jnp.concatenate([U, jnp.ones((U.shape[0], 1), U.dtype)], axis=1)
    Vf = jnp.concatenate([V, bi[:, None].astype(U.dtype)], axis=1)

    def body(carry, batch):
        Uf, Vf = carry
        ub, ib, jb = batch
        du, dvi, dvj = bpr_batch_deltas(Uf, Vf, bits, ub, ib, jb,
                                        n_users, lam, lr, grad_mode)
        Uf = Uf.at[ub].add(du)
        Vf = Vf.at[ib].add(dvi).at[jb].add(dvj)
        return (Uf, Vf), None

    (Uf, Vf), _ = lax.scan(body, (Uf, Vf), (u, i, j))
    return Uf[:, :k], Vf[:, :k], Vf[:, k].astype(bi.dtype)


def bpr_batch_deltas(Uf, Vf, bits, ub, ib, jb, pad_row, lam, lr,
                     grad_mode: str):
    """One batch's per-row update terms over the FUSED arrays — the single
    copy of the BPR math shared by the single-chip scan above and the
    sharded body (parallel/shard._bpr_epoch_fn, which psums the scattered
    V deltas per batch). Returns (du [B,k+1], dvi [B,k+1], dvj [B,k+1]);
    callers scatter du at ub, dvi at ib, dvj at jb. ``pad_row`` is the
    first padding user index (n_users single-chip, upd per shard)."""
    k = Uf.shape[1] - 1
    colmask = jnp.concatenate([jnp.ones(k, Uf.dtype),
                               jnp.zeros(1, Uf.dtype)])
    pad = ub < pad_row
    # collision test: is j in u's rated set? (padding rows of `bits` are
    # all-zero, so padded samples read bit 0 — the pad mask kills them)
    word = bits[jnp.minimum(ub, bits.shape[0] - 1), jb // 32]
    hit = (word >> (jb % 32).astype(jnp.uint32)) & jnp.uint32(1)
    m = (pad & (hit == 0)).astype(Uf.dtype)
    Uu = Uf[ub]
    Vi = Vf[ib]
    Vj = Vf[jb]
    x = jnp.einsum("nk,nk->n", Uu, Vi - Vj)
    s = m * jax.nn.sigmoid(-x)
    if grad_mode == "mean":
        cu = jnp.zeros(Uf.shape[0], Uf.dtype).at[ub].add(m)
        ci = jnp.zeros(Vf.shape[0], Uf.dtype).at[ib].add(m).at[jb].add(m)
        wu = m / jnp.maximum(cu[ub], 1.0)
        wi = m / jnp.maximum(ci[ib], 1.0)
        wj = m / jnp.maximum(ci[jb], 1.0)
    else:
        wu = wi = wj = m
    du = colmask * (lr * wu[:, None] * (s[:, None] * (Vi - Vj) - lam * Uu))
    dvi = lr * wi[:, None] * (s[:, None] * Uu - lam * Vi)
    dvj = lr * wj[:, None] * (-s[:, None] * Uu - lam * Vj)
    return du, dvi, dvj


@partial(jax.jit, static_argnames=("lam", "batch_size", "grad_mode"),
         donate_argnums=(0,))
def bpr_epoch(state: MFState, data: BPRData, perm: jnp.ndarray,
              negs: jnp.ndarray, lam: float, lr, batch_size: int,
              grad_mode: str = "sum") -> MFState:
    """One epoch over all batches in the order given by ``perm`` with the
    per-triple negatives ``negs`` (same length as the padded positives —
    pass the same arrays to the oracle for parity runs).

    Math per oracle/numpy_mf.bpr_epoch_batched:
        x = U[u].(V[i]-V[j]) + bi[i] - bi[j];  s = sigmoid(-x)
    with collision-masked, grad_mode-weighted scatter-added updates. bu and
    mu stay untouched (BPR scores are per-user-invariant in them; the item
    bias captures popularity).
    """
    u = data.u[perm].reshape(-1, batch_size)
    i = data.i[perm].reshape(-1, batch_size)
    j = negs.reshape(-1, batch_size)
    U, V, bi = bpr_epoch_core(state.U, state.V, state.bi, u, i, j,
                              data.bits, lam, lr, grad_mode)
    return state._replace(U=U, V=V, bi=bi)


class BPRTrainer:
    """Engine-facing BPR trainer: per-epoch shuffle + fresh on-device
    negative draws, lr decay at the epoch barrier (mirrors BiasedSGD)."""

    def __init__(self, lam: float = 0.01, lr: float = 0.05,
                 lr_decay: float = 0.98, batch_size: int = 8192,
                 seed: int = 0, grad_mode: str = "sum"):
        self.lam = float(lam)
        self.lr0 = float(lr)
        self.lr_decay = float(lr_decay)
        self.batch_size = int(batch_size)
        self.seed = seed
        self.grad_mode = grad_mode

    def lr_at(self, epoch: int) -> float:
        return self.lr0 * self.lr_decay**epoch

    def epoch(self, state: MFState, data: BPRData, epoch_idx: int,
              perm=None, negs=None) -> MFState:
        n_pad = data.u.shape[0]
        if (perm is None) != (negs is None):
            raise ValueError("pass perm AND negs together (parity runs) "
                             "or neither (fresh per-epoch draws)")
        if perm is None:
            key = jax.random.key(self.seed + 7919 * epoch_idx)
            kp, kn = jax.random.split(key)
            perm = jax.random.permutation(kp, n_pad)
            negs = jax.random.randint(kn, (n_pad,), 0, state.n_items,
                                      jnp.int32)
        return bpr_epoch(state, data, perm, negs, self.lam,
                         self.lr_at(epoch_idx), self.batch_size,
                         self.grad_mode)

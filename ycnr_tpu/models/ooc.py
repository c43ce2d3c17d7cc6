"""Out-of-core (host-streamed) ALS-WR / iALS epochs.

The resident paths (models/bucketed_phase.py) keep the whole rating layout
in HBM — at ~8 bytes/slot x 2 views / ~0.62 fill a 16 GB v5e chip tops out
around ~600M ratings. This module removes that bound: the factors stay
device-resident, and the rating blocks stream host->HBM through every
epoch in the packed wire format of ops/packed.py, double-buffered so the
next block's transfer overlaps the current block's compute. Trainable nnz
is then limited by host RAM/disk — the TPU-native equivalent of the
reference's "stream ratings from PostgreSQL in portions" (SURVEY.md §1
L1->L5, §5 long-context, C7 [B:5]).

Parity: a decoded wire block is bitwise the resident BucketedCSR block
(ops/packed.py), and the per-block solve is the SAME function
(bucketed_phase.bucket_solve_rows), so an OOC epoch equals a resident
epoch exactly in float64 (pinned in tests/test_ooc.py).

Performance model (measured round 3, this v5e tunnel): the wire moves
~44-130 MB/s depending on entropy, so the epoch is TRANSFER-bound — the
packed format costs ~35 ns/rating (u16 deltas) + ~18 ns (i8 ratings) per
view, and on-device decode (~10 ns/slot) plus the solve hide entirely
under the next block's transfer. On local-PCIe hosts (8-32 GB/s) the same
path is compute-bound and matches the resident epoch. See docs/KERNELS.md
"Out-of-core streaming".
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.models.base import MFState
from ycnr_tpu.models.bucketed_phase import bucket_solve_rows
from ycnr_tpu.ops.packed import PackedCSR


def decode_block(lo, hi_pos, hi_val, rat, cnt, R: int, n_other: int,
                 dtype):
    """Wire block -> the resident layout's (oi [NE,R], rr [NE,R]).

    Reconstruction: scatter the sparse high bits into the u16 delta
    stream, unpack packed rows to the padded rectangle (gather by
    row-start + column), then a row-wise cumsum rebuilds absolute ids
    (the first element of each row is stored absolute). Padding columns
    read delta 0 (hold the last id) and are masked to n_other / rating 0
    — the zero-row trick's contract (ops/layout.py).
    """
    delta = lo.astype(jnp.int32).at[hi_pos].add(hi_val * (1 << 16))
    NE = cnt.shape[0]
    starts = jnp.cumsum(cnt) - cnt
    col = lax.broadcasted_iota(jnp.int32, (NE, R), 1)
    valid = col < cnt[:, None]
    src = jnp.where(valid, starts[:, None] + col, 0)
    d2 = jnp.where(valid, delta[src], 0)
    oi = jnp.where(valid, jnp.cumsum(d2, axis=1), n_other)
    rv = rat[src]
    if rat.dtype == jnp.int8:
        rr = rv.astype(dtype) * jnp.asarray(0.5, dtype)
    else:
        rr = rv.astype(dtype)
    rr = jnp.where(valid, rr, 0)
    return oi, rr


@partial(jax.jit,
         static_argnames=("R", "n_other", "lam", "alpha", "gather_bf16"),
         donate_argnums=(0,))
def _ooc_block_step(E, F_g, lo, hi_pos, hi_val, rat, cnt, eid,
                    base_gram, R: int, n_other: int, lam: float,
                    alpha: Optional[float], gather_bf16: bool):
    """decode -> gather -> Gram -> guarded solve -> scatter, one wire
    block. E is donated (updated in place); the wire buffers cannot alias
    any output (dtype/shape mismatch) but die with their last Python
    reference when the step retires, so the HBM watermark stays bounded
    by factors + the in-flight blocks + the gathered tensor."""
    oi, rr = decode_block(lo, hi_pos, hi_val, rat, cnt, R, n_other,
                          E.dtype)
    Fg = F_g[oi]  # [NE, R, k]
    cntf = cnt.astype(E.dtype)
    rows = bucket_solve_rows(Fg, rr, cntf, lam, alpha, base_gram,
                             E.dtype, gather_bf16)
    return E.at[eid].set(rows.astype(E.dtype))


@partial(jax.jit, static_argnames=("bf16",))
def _cast_gather(F, bf16: bool):
    return F.astype(jnp.bfloat16) if bf16 else F


@jax.jit
def _global_gram(F):
    return jnp.einsum("nk,nm->km", F, F, preferred_element_type=F.dtype)


def _put_block(g, b):
    """Queue one wire block's host->device transfers (async)."""
    return (jax.device_put(g.lo[b]), jax.device_put(g.hi_pos[b]),
            jax.device_put(g.hi_val[b]), jax.device_put(g.rat[b]),
            jax.device_put(g.cnt[b]), jax.device_put(g.eid[b]))


def phase_packed(E: jnp.ndarray, F: jnp.ndarray, groups: PackedCSR,
                 lam: float, alpha: Optional[float] = None,
                 base_gram=None, gather_bf16: bool = False,
                 prefetch: int = 2) -> jnp.ndarray:
    """Re-solve all entity rows of E against F, streaming wire blocks.

    ``prefetch`` blocks are kept in flight: jax.device_put is async, so
    block b+1 (and b+2) move over the wire while block b's program runs.
    E is consumed (donated); use the returned array.
    """
    F_g = _cast_gather(F, gather_bf16)
    for g in groups:
        nb = g.n_blocks
        q = {b: _put_block(g, b) for b in range(min(prefetch, nb))}
        for b in range(nb):
            blk = q.pop(b)
            if b + prefetch < nb:
                q[b + prefetch] = _put_block(g, b + prefetch)
            E = _ooc_block_step(E, F_g, *blk, base_gram, g.R, g.n_other,
                                lam, alpha, gather_bf16)
    return E


def als_epoch_ooc(state: MFState, user_groups: PackedCSR,
                  item_groups: PackedCSR, lam: float,
                  gather_bf16: bool = False, prefetch: int = 2) -> MFState:
    """One ALS-WR sweep with both rating views streamed from host.

    Same math as models/bucketed_phase.als_epoch_bucketed (shared block
    body); state is consumed (donated factor buffers)."""
    U = phase_packed(state.U, state.V, user_groups, lam,
                     gather_bf16=gather_bf16, prefetch=prefetch)
    V = phase_packed(state.V, U, item_groups, lam,
                     gather_bf16=gather_bf16, prefetch=prefetch)
    return state._replace(U=U, V=V)


def ials_epoch_ooc(state: MFState, user_groups: PackedCSR,
                   item_groups: PackedCSR, lam: float, alpha: float,
                   gather_bf16: bool = False,
                   prefetch: int = 2) -> MFState:
    """One iALS sweep, streamed; the global base Grams are computed on
    device per phase (resident factors), exactly as the resident path."""
    GV = _global_gram(state.V)
    U = phase_packed(state.U, state.V, user_groups, lam, alpha, GV,
                     gather_bf16=gather_bf16, prefetch=prefetch)
    GU = _global_gram(U)
    V = phase_packed(state.V, U, item_groups, lam, alpha, GU,
                     gather_bf16=gather_bf16, prefetch=prefetch)
    return state._replace(U=U, V=V)


def device_hbm_stats() -> dict:
    """Best-effort HBM usage snapshot (bytes). Used by the OOC bench to
    document the bounded-watermark claim; CPU test devices report {}."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(v) for k, v in stats.items() if k in keep}

"""Bucketed (segsum-free) solve phases for ALS-WR and iALS.

Same math as ops/gram.solve_block, but per-entity Grams come straight from a
batched einsum over each bucket's uniform row count — no chunk segmentation,
no scatter-add (see ops/bucketed.py for why). Used on the single-chip fast
path; results are bit-comparable to the blocked path up to fp reduction
order (parity-tested in float64).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ycnr_tpu.models.base import MFState
from ycnr_tpu.ops.bucketed import BucketedCSR, BucketGroup
from ycnr_tpu.ops.gram import guarded_batched_solve


def device_bucketed(groups, dtype=jnp.float32) -> BucketedCSR:
    return tuple(
        BucketGroup(jnp.asarray(g.other_idx), jnp.asarray(g.rating, dtype),
                    jnp.asarray(g.entity_ids), jnp.asarray(g.entity_cnt, dtype))
        for g in groups)


def phase_bucketed(E: jnp.ndarray, F: jnp.ndarray, groups: BucketedCSR,
                   lam: float, alpha: Optional[float] = None,
                   base_gram: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Re-solve all entity rows of E against F, one bucket group at a time."""
    for g in groups:

        def body(Ec, blk, R=g.rows):
            oi, rr, eid, cnt = blk
            Fg = F[oi]  # [NE_b, R, k]
            if alpha is None:
                A = jnp.einsum("urk,urm->ukm", Fg, Fg,
                               preferred_element_type=Fg.dtype)
                b = jnp.einsum("urk,ur->uk", Fg, rr,
                               preferred_element_type=Fg.dtype)
                reg = lam * cnt + (cnt == 0)
            else:
                w = alpha * rr
                A = jnp.einsum("urk,ur,urm->ukm", Fg, w, Fg,
                               preferred_element_type=Fg.dtype)
                A = A + base_gram[None]
                b = jnp.einsum("urk,ur->uk", Fg, 1.0 + w,
                               preferred_element_type=Fg.dtype)
                # padding rows gather the zero factor row, so the +1 in the
                # rhs weight contributes nothing there
                reg = jnp.full_like(cnt, lam)
            rows = guarded_batched_solve(A, b, reg)
            return Ec.at[eid].set(rows.astype(Ec.dtype)), None

        E, _ = lax.scan(body, E, tuple(g))
    return E


@partial(jax.jit, static_argnames=("lam",), donate_argnums=(0,))
def als_epoch_bucketed(state: MFState, user_groups: BucketedCSR,
                       item_groups: BucketedCSR, lam: float) -> MFState:
    U = phase_bucketed(state.U, state.V, user_groups, lam)
    V = phase_bucketed(state.V, U, item_groups, lam)
    return state._replace(U=U, V=V)


@partial(jax.jit, static_argnames=("lam", "alpha"), donate_argnums=(0,))
def ials_epoch_bucketed(state: MFState, user_groups: BucketedCSR,
                        item_groups: BucketedCSR, lam: float,
                        alpha: float) -> MFState:
    GV = jnp.einsum("nk,nm->km", state.V, state.V,
                    preferred_element_type=state.V.dtype)
    U = phase_bucketed(state.U, state.V, user_groups, lam, alpha, GV)
    GU = jnp.einsum("nk,nm->km", U, U, preferred_element_type=U.dtype)
    V = phase_bucketed(state.V, U, item_groups, lam, alpha, GU)
    return state._replace(U=U, V=V)

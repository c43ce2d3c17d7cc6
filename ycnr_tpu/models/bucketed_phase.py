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
                   base_gram: Optional[jnp.ndarray] = None,
                   gather_bf16: bool = False) -> jnp.ndarray:
    """Re-solve all entity rows of E against F, one bucket group at a time.

    gather_bf16: gather the other factor in bfloat16 (half the HBM gather
    bytes, native MXU bf16 Grams with float32 accumulation). Costs ~1e-3
    relative accuracy on the normal equations — acceptable for the 1e-3
    RMSE class, off by default for exact-parity runs.
    """
    F_g = F.astype(jnp.bfloat16) if gather_bf16 else F
    for g in groups:

        def body(Ec, blk):
            oi, rr, eid, cnt = blk
            Fg = F_g[oi]  # [NE_b, R, k]
            if gather_bf16:
                rr = rr.astype(jnp.bfloat16)
            acc_t = E.dtype  # accumulate in the factor dtype (f32/f64)
            if alpha is None:
                A = jnp.einsum("urk,urm->ukm", Fg, Fg,
                               preferred_element_type=acc_t)
                b = jnp.einsum("urk,ur->uk", Fg, rr,
                               preferred_element_type=acc_t)
                reg = lam * cnt + (cnt == 0)
            else:
                w = alpha * rr
                A = jnp.einsum("urk,ur,urm->ukm", Fg, w, Fg,
                               preferred_element_type=acc_t)
                A = A + base_gram[None]
                b = jnp.einsum("urk,ur->uk", Fg, (1.0 + w).astype(Fg.dtype),
                               preferred_element_type=acc_t)
                # padding rows gather the zero factor row, so the +1 in the
                # rhs weight contributes nothing there
                reg = jnp.full_like(cnt, lam)
            rows = guarded_batched_solve(A, b, reg)
            return Ec.at[eid].set(rows.astype(Ec.dtype)), None

        E, _ = lax.scan(body, E, tuple(g))
    return E


@partial(jax.jit, static_argnames=("lam", "gather_bf16"),
         donate_argnums=(0,))
def als_epoch_bucketed(state: MFState, user_groups: BucketedCSR,
                       item_groups: BucketedCSR, lam: float,
                       gather_bf16: bool = False) -> MFState:
    U = phase_bucketed(state.U, state.V, user_groups, lam,
                       gather_bf16=gather_bf16)
    V = phase_bucketed(state.V, U, item_groups, lam, gather_bf16=gather_bf16)
    return state._replace(U=U, V=V)


@partial(jax.jit, static_argnames=("lam", "alpha", "gather_bf16"),
         donate_argnums=(0,))
def ials_epoch_bucketed(state: MFState, user_groups: BucketedCSR,
                        item_groups: BucketedCSR, lam: float, alpha: float,
                        gather_bf16: bool = False) -> MFState:
    GV = jnp.einsum("nk,nm->km", state.V, state.V,
                    preferred_element_type=state.V.dtype)
    U = phase_bucketed(state.U, state.V, user_groups, lam, alpha, GV,
                       gather_bf16=gather_bf16)
    GU = jnp.einsum("nk,nm->km", U, U, preferred_element_type=U.dtype)
    V = phase_bucketed(state.V, U, item_groups, lam, alpha, GU,
                       gather_bf16=gather_bf16)
    return state._replace(U=U, V=V)

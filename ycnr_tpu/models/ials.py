"""Implicit weighted ALS on device (SURVEY.md C11/M4, Appendix A:
Hu/Koren/Volinsky).

Preferences p = 1 on observed pairs, confidence c = 1 + alpha * r. Per-entity
system (F^T F + F^T (C_e - I) F + lam I) x = F^T C_e p: the global Gram
F^T F is computed once per half-sweep (later psum'd across shards —
SURVEY.md M6), and each block adds only the observed-entry correction
sum alpha*r v v^T via the same chunk machinery as explicit ALS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ycnr_tpu.models.base import MFState
from ycnr_tpu.ops.gram import BlockData, solve_block
from ycnr_tpu.ops.layout import BlockedCSR


def _phase(E_pad: jnp.ndarray, F_pad: jnp.ndarray, layout: BlockedCSR,
           lam: float, alpha: float) -> jnp.ndarray:
    # global Gram once per half-sweep; the zero trailing row adds nothing
    G = jnp.einsum("nk,nm->km", F_pad, F_pad,
                   preferred_element_type=F_pad.dtype)

    def body(E, blk_arrays):
        blk = BlockData(*blk_arrays)
        eid, rows = solve_block(F_pad, blk, lam, gram_weight_alpha=alpha,
                                base_gram=G, base_reg=lam)
        return E.at[eid].set(rows.astype(E.dtype)), None

    E_pad, _ = lax.scan(body, E_pad, tuple(layout))
    return E_pad


@partial(jax.jit, static_argnames=("lam", "alpha"), donate_argnums=(0,))
def ials_epoch(state: MFState, user_layout: BlockedCSR,
               item_layout: BlockedCSR, lam: float, alpha: float) -> MFState:
    U = _phase(state.U, state.V, user_layout, lam, alpha)
    V = _phase(state.V, U, item_layout, lam, alpha)
    return state._replace(U=U, V=V)


class ImplicitALS:
    """Engine-facing iALS trainer (BASELINE.json:10 capability)."""

    def __init__(self, lam: float = 0.1, alpha: float = 40.0):
        self.lam = float(lam)
        self.alpha = float(alpha)

    def epoch(self, state: MFState, user_layout: BlockedCSR,
              item_layout: BlockedCSR) -> MFState:
        return ials_epoch(state, user_layout, item_layout, self.lam,
                          self.alpha)

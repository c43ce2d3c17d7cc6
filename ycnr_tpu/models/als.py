"""ALS-WR on device (SURVEY.md C9, call stack 3.2, Appendix A: Zhou et al.).

One epoch = U-phase then V-phase, exactly the reference's epoch-barrier
schedule (P4): the phases are separate XLA programs whose data dependence IS
the barrier. Each phase scans over layout blocks; within a block the
reference's per-user JS loop becomes one batched gather/einsum/Cholesky.
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
           lam: float) -> jnp.ndarray:
    """Re-solve every entity row of E against fixed F (one ALS half-sweep)."""

    def body(E, blk_arrays):
        blk = BlockData(*blk_arrays)
        eid, rows = solve_block(F_pad, blk, lam)
        return E.at[eid].set(rows.astype(E.dtype)), None

    E_pad, _ = lax.scan(body, E_pad, tuple(layout))
    return E_pad


@partial(jax.jit, static_argnames=("lam",), donate_argnums=(0,))
def als_epoch(state: MFState, user_layout: BlockedCSR,
              item_layout: BlockedCSR, lam: float) -> MFState:
    """One full ALS-WR epoch: solve U against V, then V against new U."""
    U = _phase(state.U, state.V, user_layout, lam)
    V = _phase(state.V, U, item_layout, lam)
    return state._replace(U=U, V=V)


class ALSWR:
    """Engine-facing ALS-WR trainer (the reference EmfMaster.train(ALS) role,
    minus processes: the worker fan-out is the batched block solve)."""

    def __init__(self, lam: float = 0.05):
        self.lam = float(lam)

    def epoch(self, state: MFState, user_layout: BlockedCSR,
              item_layout: BlockedCSR) -> MFState:
        return als_epoch(state, user_layout, item_layout, self.lam)

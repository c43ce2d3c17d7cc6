"""Gather -> Gram-accumulate -> batched-solve: the hot loop of ALS.

This is the rebuild of the reference's hottest path (SURVEY.md call stack 3.2:
per-entity `A = sum v v^T` at O(nnz * k^2), then `solve A u = b`), which the
reference runs per-user in JS with nblas/nlapack C++ BLAS (C6a/C6b). Here the
whole phase is one XLA program per block:

    gather rows of the other factor        (HBM bandwidth-bound)
    chunk Grams via batched MXU einsum     [C_B, L, k] -> [C_B, k, k]
    segment_sum chunk->entity slot         (entities may own many chunks)
    guarded batched Cholesky solve         [C_B, k, k] (XLA LAPACK equivalent)
    scatter solved rows into the factor

Padding needs no masks anywhere: padding gathers the all-zero row (layout.py's
zero-row trick), so its Gram/RHS contribution is exactly 0, and padding slots
solve the guarded identity system to exactly 0, keeping the trash row zero.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class BlockData(NamedTuple):
    """One block of a BlockedCSR as device arrays (leading axis = blocks when
    used as lax.scan xs)."""

    other_idx: jnp.ndarray  # [C_B, L] int32
    rating: jnp.ndarray  # [C_B, L] float
    chunk_seg: jnp.ndarray  # [C_B] int32
    entity_ids: jnp.ndarray  # [C_B] int32
    entity_cnt: jnp.ndarray  # [C_B] float


def chunk_gram_rhs(F_gathered: jnp.ndarray, rating: jnp.ndarray,
                   weight: Optional[jnp.ndarray] = None,
                   rhs_weight: Optional[jnp.ndarray] = None,
                   acc_dtype=None):
    """Per-chunk Gram matrices and right-hand sides.

    F_gathered: [C_B, L, k] rows of the other factor for each rating slot.
    weight:     optional per-rating Gram weight w (iALS: alpha*r, giving
                sum w v v^T); None = unweighted ALS Gram.
    rhs_weight: optional per-rating RHS weight (iALS: c = 1 + alpha*r applied
                to p=1); None = the rating itself (explicit ALS RHS).
    Returns (G [C_B, k, k], b [C_B, k]).
    """
    acc = acc_dtype or F_gathered.dtype
    lhs = F_gathered if weight is None else (
        F_gathered * weight.astype(F_gathered.dtype)[..., None])
    G = jnp.einsum("clk,clm->ckm", lhs, F_gathered,
                   preferred_element_type=acc)
    rv = rating if rhs_weight is None else rhs_weight
    b = jnp.einsum("clk,cl->ck", F_gathered, rv.astype(F_gathered.dtype),
                   preferred_element_type=acc)
    return G, b


def segment_reduce_block(G: jnp.ndarray, b: jnp.ndarray,
                         chunk_seg: jnp.ndarray, n_slots: int):
    """Sum chunk Grams/RHS into per-entity slots. chunk_seg is sorted within
    a block (builder packs sequentially; padding -> n_slots, dropped)."""
    A = jax.ops.segment_sum(G, chunk_seg, num_segments=n_slots + 1,
                            indices_are_sorted=True)[:n_slots]
    r = jax.ops.segment_sum(b, chunk_seg, num_segments=n_slots + 1,
                            indices_are_sorted=True)[:n_slots]
    return A, r


def guarded_batched_solve(A: jnp.ndarray, b: jnp.ndarray, reg: jnp.ndarray,
                          method: str = "auto") -> jnp.ndarray:
    """Solve (A + diag-broadcast reg * I) x = b per batch element
    (the reference's nlapack `gesv`/`potrf`-class per-user solves,
    SURVEY.md C6b).

    reg: [B] per-entity ridge; callers pass lam*n_e + (n_e==0) so empty
    slots solve I x = 0 -> exactly 0 (SURVEY.md §7 hard part: cold-entity
    singularity guard).

    method: "auto" picks the Pallas batch-vectorized Cholesky kernel on TPU
    for float32 (XLA's batched small-matrix cholesky/triangular_solve eats
    ~90% of the ALS phase on v5e, see ops/pallas_solve.py); "xla" forces
    the lax.linalg path (used for float64 parity runs and CPU tests).
    """
    k = A.shape[-1]
    eye = jnp.eye(k, dtype=A.dtype)
    A = A + reg[:, None, None] * eye
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))  # enforce symmetry

    if method == "auto":
        use_pallas = (A.dtype == jnp.float32
                      and jax.default_backend() == "tpu" and k <= 256)
    else:
        use_pallas = method == "pallas"
    if use_pallas:
        from ycnr_tpu.ops.pallas_solve import pallas_spd_solve

        return pallas_spd_solve(A, b)

    chol = lax.linalg.cholesky(A)
    y = lax.linalg.triangular_solve(chol, b[..., None], left_side=True,
                                    lower=True)
    x = lax.linalg.triangular_solve(chol, y, left_side=True, lower=True,
                                    transpose_a=True)
    return x[..., 0]


def solve_block(F_pad: jnp.ndarray, blk: BlockData, lam: float,
                gram_weight_alpha: Optional[float] = None,
                base_gram: Optional[jnp.ndarray] = None,
                base_reg: float = 0.0, gather_bf16: bool = False):
    """Solve one block's entities against the (padded) other factor.

    Explicit ALS-WR:  lam weighting = lam * n_e; no base Gram.
    Implicit iALS:    gram_weight_alpha=alpha (w = alpha*r), base_gram=F^T F,
                      base_reg=lam (constant, not count-weighted), RHS weight
                      c = 1 + alpha*r on p=1.
    gather_bf16: gather F in bfloat16 (half the HBM bytes), accumulate in
    F_pad's dtype.
    Returns (entity_ids, new_rows [C_B, k]).
    """
    acc_dtype = F_pad.dtype
    F_src = F_pad.astype(jnp.bfloat16) if gather_bf16 else F_pad
    Fg = F_src[blk.other_idx]  # [C_B, L, k] gather
    n_slots = blk.entity_ids.shape[0]  # U_B
    if gram_weight_alpha is None:
        G, b = chunk_gram_rhs(Fg, blk.rating, acc_dtype=acc_dtype)
        A, rhs = segment_reduce_block(G, b, blk.chunk_seg, n_slots)
        reg = lam * blk.entity_cnt + (blk.entity_cnt == 0)
    else:
        w = gram_weight_alpha * blk.rating
        G, b = chunk_gram_rhs(Fg, blk.rating, weight=w, rhs_weight=1.0 + w,
                              acc_dtype=acc_dtype)
        A, rhs = segment_reduce_block(G, b, blk.chunk_seg, n_slots)
        A = A + base_gram[None]
        reg = jnp.full_like(blk.entity_cnt, base_reg)
    # Padding slots: explicit path solves I x = 0, implicit path solves
    # (G + lam I) x = 0 — both exactly 0, keeping the trash row zero.
    rows = guarded_batched_solve(A, rhs, reg)
    return blk.entity_ids, rows

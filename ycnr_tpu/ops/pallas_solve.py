"""Pallas TPU kernel: batched small-matrix Cholesky solve.

Why: the ALS normal equations need ~10^5 solves of k x k SPD systems per
epoch (k = 10..128). XLA's `lax.linalg.cholesky` + `triangular_solve` on
TPU lower to loopy code built for big matrices; measured on v5e they eat
~90% of the ALS phase (492 ms of 543 ms at quarter-ML-20M scale). This
kernel vectorizes the textbook algorithms across the *batch* dimension
instead: every step is a [B_t, n] or [B_t, n, n] dense VPU op with static
indices (the column loop is a Python range over the static n), so the whole
solve is straight-line vector code — no dynamic control flow, no per-matrix
loops.

Cost model: full-matrix rank-1 updates do n^3 FMA per matrix (3x the
triangular minimum) but at VPU rates that is ~1-2 ms per 10^5 matrices of
n=64 — a ~30x win over the XLA path.

The guarded contract matches ops.gram.guarded_batched_solve: callers add the
ridge (and the empty-slot identity guard) to A beforehand; padding systems
are exactly I x = 0 and solve to 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(a_ref, b_ref, x_ref, s_ref, l_ref, invd_ref, n: int):
    """One batch tile: factorize A = L L^T, then two substitutions.

    a_ref:  [B_t, n, n] VMEM in    (SPD, ridge already added)
    b_ref:  [B_t, n]    VMEM in
    x_ref:  [B_t, n]    VMEM out
    s_ref:  [B_t, n, n] VMEM scratch (working copy of A)
    l_ref:  [B_t, n, n] VMEM scratch (L)
    invd_ref: [B_t, n]  VMEM scratch (1/diag(L))
    """
    s_ref[:] = a_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # [1, n]

    # --- Cholesky, right-looking, vectorized over batch ---
    for j in range(n):
        c = s_ref[:, :, j]  # [B_t, n] column j of the working matrix
        pj = c[:, j : j + 1]  # [B_t, 1]
        inv = jax.lax.rsqrt(pj)
        c = c * inv  # scaled column
        c = jnp.where(row >= j, c, 0.0)  # zero the strictly-upper part
        l_ref[:, :, j] = c
        invd_ref[:, j : j + 1] = inv
        # trailing update: S[:, :, m] -= c_r c_m for m > j (mask via c itself:
        # entries with row < j are already 0; mask columns <= j)
        cm = jnp.where(row > j, c, 0.0)  # [B_t, n] used as the column axis
        s_ref[:] = s_ref[:] - c[:, :, None] * cm[:, None, :]

    # --- forward substitution: L y = b ---
    acc = b_ref[:]  # [B_t, n]
    for j in range(n):
        yj = acc[:, j : j + 1] * invd_ref[:, j : j + 1]  # [B_t, 1]
        lcol = jnp.where(row > j, l_ref[:, :, j], 0.0)
        acc = acc - lcol * yj
        # store y_j in place of acc_j (acc_j no longer read)
        acc = jnp.where(row == j, yj, acc)

    # --- back substitution: L^T x = y ---
    for j in range(n - 1, -1, -1):
        xj = acc[:, j : j + 1] * invd_ref[:, j : j + 1]
        lrow = jnp.where(row < j, l_ref[:, j, :], 0.0)  # L[j, r] for r < j
        acc = acc - lrow * xj
        acc = jnp.where(row == j, xj, acc)
    x_ref[:] = acc


def _substitute_batchfirst(a_ref, lt_ref, b0, invd, n: int, row):
    """Forward + back substitution shared by the batch-first kernels
    (looped/panel): L y = b walking L's stored columns in a_ref, then
    L^T x = y walking lt_ref's columns (rows of L). Returns x [B, n]."""

    def fwd_step(j, acc):
        lcol = a_ref[:, j, :]
        ij = jnp.sum(jnp.where(row == j, invd, 0.0), axis=1, keepdims=True)
        yj = jnp.sum(jnp.where(row == j, acc, 0.0), axis=1,
                     keepdims=True) * ij
        acc = acc - jnp.where(row > j, lcol, 0.0) * yj
        return jnp.where(row == j, yj, acc)

    acc = jax.lax.fori_loop(0, n, fwd_step, b0)

    def bwd_step(t, acc):
        j = n - 1 - t
        lrow = lt_ref[:, j, :]  # [B, n] row j of L
        ij = jnp.sum(jnp.where(row == j, invd, 0.0), axis=1, keepdims=True)
        xj = jnp.sum(jnp.where(row == j, acc, 0.0), axis=1,
                     keepdims=True) * ij
        acc = acc - jnp.where(row < j, lrow, 0.0) * xj
        return jnp.where(row == j, xj, acc)

    return jax.lax.fori_loop(0, n, bwd_step, acc)


def _solve_kernel_looped(a_ref, b_ref, x_ref, lt_ref, n: int):
    """fori_loop variant: one compiled body instead of 3n unrolled steps.

    Works column-major in place: A is symmetric, so a_ref IS the column-major
    working copy; at step j the finished L column overwrites column j (the
    trailing rank-1 update masks columns <= j, so stored columns are never
    touched again). After factorization one explicit transpose materializes
    L^T so back-substitution also reads columns via (cheap, supported)
    sublane dynamic slices; 1/diag(L) is carried functionally to avoid
    dynamic lane writes. All lane extractions are masked reductions on
    [B, n] tiles only.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # [1, n]

    def chol_step(j, invd):
        c = a_ref[:, j, :]  # [B, n] column j (sublane dynamic index)
        pj = jnp.sum(jnp.where(row == j, c, 0.0), axis=1, keepdims=True)
        inv = jax.lax.rsqrt(pj)
        c = jnp.where(row >= j, c * inv, 0.0)
        a_ref[:, j, :] = c  # store L column in place
        cm = jnp.where(row > j, c, 0.0)
        # trailing update on columns > j only (cm masks the column axis, so
        # already-stored L columns and column j stay intact)
        a_ref[:] = a_ref[:] - cm[:, :, None] * c[:, None, :]
        return jnp.where(row == j, inv, invd)

    invd = jax.lax.fori_loop(
        0, n, chol_step, jnp.zeros_like(b_ref[:]))  # [B, n] 1/diag(L)

    lt_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)  # L^T, column-major
    x_ref[:] = _substitute_batchfirst(a_ref, lt_ref, b_ref[:], invd, n, row)


def _solve_kernel_panel(a_ref, b_ref, x_ref, lt_ref, n: int, panel: int = 16):
    """Panel-blocked variant: the looped kernel is VMEM-bandwidth-bound on
    its per-column full-matrix rank-1 updates (read+write of [B, n, n] per
    column). Here columns are factored in panels of `panel`; within a panel
    only [B, n] column updates run, and the full-matrix trailing update is
    applied ONCE per panel as a fused sum of `panel` outer products —
    n/panel full-matrix passes instead of n (~16x less VMEM traffic at
    n=64, panel=16). Statically unrolled: n + n/panel steps of small IR.
    """
    assert n % panel == 0, "panel variant needs panel | n"
    row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # [1, n]

    def panel_step(pi, invd):
        jp = pi * panel

        def col_step(jj, invd):
            j = jp + jj
            c = a_ref[:, j, :]
            pj = jnp.sum(jnp.where(row == j, c, 0.0), axis=1, keepdims=True)
            inv = jax.lax.rsqrt(pj)
            c = jnp.where(row >= j, c * inv, 0.0)
            a_ref[:, j, :] = c

            # update the remaining columns of this panel ([B, n] ops)
            def inner(m, _):
                cm = jnp.sum(jnp.where(row == m, c, 0.0), axis=1,
                             keepdims=True)
                a_ref[:, m, :] = a_ref[:, m, :] - cm * c
                return 0

            jax.lax.fori_loop(j + 1, jp + panel, inner, 0)
            return jnp.where(row == j, inv, invd)

        invd = jax.lax.fori_loop(0, panel, col_step, invd)

        # one trailing update per panel: T = C^T C over the panel axis on the
        # MXU (C = panel columns of L, trailing columns masked on one side)
        C = a_ref[:, pl.ds(jp, panel), :]  # [B, panel, n]
        Cm = jnp.where(row[:, None, :] > jp + panel - 1, C, 0.0)
        T = jax.lax.dot_general(Cm, C, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=C.dtype,
                                precision=jax.lax.Precision.HIGHEST)
        a_ref[:] = a_ref[:] - T
        return invd

    invd = jax.lax.fori_loop(0, n // panel, panel_step,
                             jnp.zeros_like(b_ref[:]))

    lt_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)
    x_ref[:] = _substitute_batchfirst(a_ref, lt_ref, b_ref[:], invd, n, row)


def _solve_kernel_lanes(a_ref, b_ref, x_ref, invd_ref, n: int,
                        panel: int = 16):
    """Batch-on-lanes variant: blocks come in TRANSPOSED as [n, n, B_t]
    (A[c, r, b]; symmetric, so row/col order is moot) and b as [n, B_t].

    With the batch on the lane axis every per-column quantity is an [n, B]
    or [B] tile: pivots are direct ref reads a_ref[j, j, :] (no masked lane
    reductions), columns are a_ref[j], and the panel trailing update is a
    fused sum of `panel` rank-1 outer products broadcast across lanes —
    full-width VPU work. All traced-index reads go through refs (Mosaic has
    no value-level dynamic_slice); x_ref doubles as the substitution
    accumulator.
    """
    assert n % panel == 0
    rowv = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # [n, 1] sublanes

    def panel_step(pi, _):
        jp = pi * panel

        def col_step(jj, _):
            j = jp + jj
            c = a_ref[j, :, :]  # [n, B] column j
            inv = jax.lax.rsqrt(a_ref[j, j, :])  # [B] direct pivot read
            c = jnp.where(rowv >= j, c * inv[None, :], 0.0)
            a_ref[j, :, :] = c  # store L column in place
            invd_ref[j, :] = inv

            # update remaining panel columns; c_m read back through the ref
            def inner(m, _):
                a_ref[m, :, :] = (a_ref[m, :, :]
                                  - a_ref[j, m, :][None, :] * c)
                return 0

            jax.lax.fori_loop(j + 1, jp + panel, inner, 0)
            return 0

        jax.lax.fori_loop(0, panel, col_step, 0)

        # fused trailing update for all columns beyond this panel:
        # S[m, r, b] -= sum_p C[p][m] * C[p][r] for m > jp+panel-1
        C = a_ref[pl.ds(jp, panel), :, :]  # [panel, n, B] (ref slice)
        last = jp + panel - 1
        upd = None
        for p in range(panel):
            cp = C[p]  # [n, B] (static index into a value)
            cpm = jnp.where(rowv > last, cp, 0.0)  # mask target columns
            term = cpm[:, None, :] * cp[None, :, :]  # [n(m), n(r), B]
            upd = term if upd is None else upd + term
        a_ref[:] = a_ref[:] - upd
        return 0

    jax.lax.fori_loop(0, n // panel, panel_step, 0)

    # forward substitution: L y = b (accumulator lives in x_ref)
    x_ref[:] = b_ref[:]

    def fwd_step(j, _):
        lcol = a_ref[j, :, :]  # [n, B] column j of L
        yj = x_ref[j, :] * invd_ref[j, :]  # [B]
        x_ref[:] = x_ref[:] - jnp.where(rowv > j, lcol, 0.0) * yj[None, :]
        x_ref[j, :] = yj
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    # back substitution: L^T x = y; row j of L = a_ref[:, j, :]
    def bwd_step(t, _):
        j = n - 1 - t
        lrow = a_ref[:, j, :]  # [n(m=col), B]: L[j, m] entries
        xj = x_ref[j, :] * invd_ref[j, :]
        x_ref[:] = x_ref[:] - jnp.where(rowv < j, lrow, 0.0) * xj[None, :]
        x_ref[j, :] = xj
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)


def _solve_kernel_static(a_ref, b_ref, x_ref, n: int, panel: int = 16,
                         mchunk: int | None = None):
    """Fully static batch-on-lanes variant (layout as _solve_kernel_lanes).

    Measurement showed the lanes kernel dominated by fori_loop iteration
    overhead (hundreds of cycles per step for tiny [n, B] ops), not math.
    Here EVERY index is a Python int: the panel factorization, panel-column
    updates and both substitutions are straight-line unrolled vector code
    (~700 small [n, B] ops), and only n/panel big trailing updates touch
    [*, n, B] — restricted to the statically-known remaining columns.

    ``mchunk`` bounds the trailing update's [rest, n, B] temporaries to
    [mchunk, n, B] slabs (needed at n=128 where a full-rest slab is ~7 MB
    of VMEM temporaries; per-element accumulation order is unchanged, so
    chunking is numerically identical).
    """
    assert n % panel == 0
    rowv = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # [n, 1]
    invs = []  # [B] per column, consumed by static index later

    for jp in range(0, n, panel):
        # panel columns as values; updated in registers, stored once
        pcols = [a_ref[jp + jj, :, :] for jj in range(panel)]
        for jj in range(panel):
            c = pcols[jj]
            inv = jax.lax.rsqrt(c[jp + jj, :])  # static-index pivot [B]
            c = jnp.where(rowv >= jp + jj, c * inv[None, :], 0.0)
            pcols[jj] = c
            invs.append(inv)
            for mm in range(jj + 1, panel):
                pcols[mm] = pcols[mm] - c[jp + mm, :][None, :] * c
        for jj in range(panel):
            a_ref[jp + jj, :, :] = pcols[jj]
        rest = n - jp - panel
        if rest == 0:
            break
        # trailing update only on the statically-known remaining columns,
        # in slabs of mchunk target columns
        mc = rest if mchunk is None else mchunk
        for m0 in range(jp + panel, n, mc):
            m1 = min(m0 + mc, n)
            upd = None
            for jj in range(panel):
                c = pcols[jj]
                term = c[m0:m1, :][:, None, :] * c[None, :, :]
                upd = term if upd is None else upd + term
            a_ref[m0:m1, :, :] = a_ref[m0:m1, :, :] - upd

    # forward substitution: L y = b (all static steps)
    acc = b_ref[:]
    for j in range(n):
        yj = acc[j, :] * invs[j]  # [B]
        lcol = a_ref[j, :, :]
        acc = acc - jnp.where(rowv > j, lcol, 0.0) * yj[None, :]
        acc = jnp.where(rowv == j, yj[None, :], acc)

    # back substitution: L^T x = y
    for j in range(n - 1, -1, -1):
        xj = acc[j, :] * invs[j]
        lrow = a_ref[:, j, :]  # static lane index is fine on a ref read
        acc = acc - jnp.where(rowv < j, lrow, 0.0) * xj[None, :]
        acc = jnp.where(rowv == j, xj[None, :], acc)
    x_ref[:] = acc


def _solve_kernel_static_hbm(a_hbm, b_ref, x_ref, a_vmem, sem, n: int,
                             panel: int, tile: int, mchunk: int):
    """Static kernel with a manually-DMA'd SINGLE-buffered A block.

    At n=128 the lanes layout's [n, n, 128] A block is 8 MB — the normal
    Pallas input pipeline double-buffers it (16 MB) and cannot fit VMEM,
    which is why rank 128 fell back to the ~2x-less-efficient batch-first
    panel kernel (measured 4.8 us/system vs static's 0.3 us at n=64;
    rank-128 ALS is 79% solves — tools/attrib_als.py 128). Keeping A in
    HBM (memory_space=ANY) and issuing one explicit HBM->VMEM copy per
    grid step single-buffers it: the ~10 us transfer per 128 systems is
    noise against the ~300 us factorization, so no pipelining is needed.
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * tile, tile)], a_vmem, sem)
    cp.start()
    cp.wait()
    _solve_kernel_static(a_vmem, b_ref, x_ref, n=n, panel=panel,
                         mchunk=mchunk)


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "interpret", "variant"))
def pallas_spd_solve(A: jnp.ndarray, b: jnp.ndarray, batch_tile: int = 128,
                     interpret: bool = False,
                     variant: str = "static") -> jnp.ndarray:
    """Solve A x = b for a batch of SPD systems. A: [B, n, n], b: [B, n].

    B is padded to a multiple of batch_tile internally (identity systems).
    float32 only (TPU VPU native); use the XLA path for float64 parity runs.
    """
    B, n, _ = A.shape
    if variant in ("panel", "lanes", "static") and not (
            n % 16 == 0 or n % 8 == 0):
        variant = "looped"  # panel width must divide n
    # VMEM guard: the [n, n, tile] (or [tile, n, n]) block plus pipeline
    # double-buffering must stay well under the ~16 MB budget at any rank
    vmem_tile = max(8, (5 * 2**20) // (n * n * 4))
    if variant in ("lanes", "static"):
        # batch rides the lane axis -> the tile must be a multiple of 128
        if vmem_tile < 128:
            if variant == "static" and n * n * 4 * 128 <= 9 * 2**20:
                # n=128 class: the A block fits VMEM single-buffered but
                # not through the double-buffering input pipeline — keep A
                # in HBM and DMA it explicitly (_solve_kernel_static_hbm)
                variant = "static_hbm"
                batch_tile = 128
            else:
                variant = "panel"  # batch-first tiling fits at large n
        else:
            batch_tile = max(128, min(batch_tile, vmem_tile) // 128 * 128)
    if variant not in ("lanes", "static", "static_hbm"):
        batch_tile = min(batch_tile, 128, int(vmem_tile // 8 * 8) or 8)

    Bp = -(-B // batch_tile) * batch_tile
    if Bp != B:
        padA = jnp.tile(jnp.eye(n, dtype=A.dtype)[None], (Bp - B, 1, 1))
        A = jnp.concatenate([A, padA], axis=0)
        b = jnp.concatenate([b, jnp.zeros((Bp - B, n), b.dtype)], axis=0)
    if variant == "static_hbm":
        At = jnp.transpose(A, (1, 2, 0))  # [n, n, B] (A symmetric)
        bt = b.T  # [n, B]
        panel = 16 if n % 16 == 0 else 8
        # slab the trailing update so its temporaries stay ~2 MB
        mchunk = max(panel, (2 * 2**20) // (n * batch_tile * 4))
        kernel = functools.partial(_solve_kernel_static_hbm, n=n,
                                   panel=panel, tile=batch_tile,
                                   mchunk=mchunk)
        xt = pl.pallas_call(
            kernel,
            grid=(Bp // batch_tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # [n, n, Bp] in HBM
                pl.BlockSpec((n, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, batch_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Bp), A.dtype),
            scratch_shapes=[pltpu.VMEM((n, n, batch_tile), A.dtype),
                            pltpu.SemaphoreType.DMA(())],
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * n * n * n,
                bytes_accessed=Bp * (n * n + 2 * n) * 4,
                transcendentals=Bp * n,
            ),
            interpret=interpret,
        )(At, bt)
        return xt.T[:B]
    if variant in ("lanes", "static"):
        # batch on the lane axis: transpose in, run, transpose out
        At = jnp.transpose(A, (1, 2, 0))  # [n, n, B] (A symmetric)
        bt = b.T  # [n, B]
        panel = 16 if n % 16 == 0 else 8
        if variant == "static":
            kernel = functools.partial(_solve_kernel_static, n=n, panel=panel)
            scratch = []
        else:
            kernel = functools.partial(_solve_kernel_lanes, n=n, panel=panel)
            scratch = [pltpu.VMEM((n, batch_tile), A.dtype)]
        xt = pl.pallas_call(
            kernel,
            grid=(Bp // batch_tile,),
            in_specs=[
                pl.BlockSpec((n, n, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, batch_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Bp), A.dtype),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * n * n * n,
                bytes_accessed=Bp * (n * n + 2 * n) * 4,
                transcendentals=Bp * n,
            ),
            interpret=interpret,
        )(At, bt)
        return xt.T[:B]
    if variant == "panel":
        kernel = functools.partial(_solve_kernel_panel, n=n,
                                   panel=16 if n % 16 == 0 else 8)
        scratch = [
            pltpu.VMEM((batch_tile, n, n), A.dtype),  # L^T (column-major)
        ]
    elif variant == "looped":
        kernel = functools.partial(_solve_kernel_looped, n=n)
        scratch = [
            pltpu.VMEM((batch_tile, n, n), A.dtype),  # L^T (column-major)
        ]
    else:
        kernel = functools.partial(_solve_kernel, n=n)
        scratch = [
            pltpu.VMEM((batch_tile, n, n), A.dtype),
            pltpu.VMEM((batch_tile, n, n), A.dtype),
            pltpu.VMEM((batch_tile, n), A.dtype),
        ]
    x = pl.pallas_call(
        kernel,
        grid=(Bp // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), A.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * n * n * n,
            bytes_accessed=Bp * (n * n + 2 * n) * 4,
            transcendentals=Bp * n,
        ),
        interpret=interpret,
    )(A, b)
    return x[:B]

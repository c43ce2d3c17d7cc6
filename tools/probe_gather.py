"""Settle the gather question with kernels, not assertions (round 4).

docs/KERNELS.md "Gather economics" carried two contradictory tables:
round 1's single-dispatch method showed width-128 f32 gathers ~free per
row vs width 64, round 2's scan-of-200 method showed 2.9x — and the
"no Pallas gather win hiding here" consequence was argued from the width
table, never tested with an actual kernel, while gathers are 63% of the
rank-64 ALS epoch. This probe runs EVERYTHING in one session:

  xla_single   single dispatch minus dispatch floor (round-1 method)
  xla_scan     carry-rotated scan of STEPS gathers  (round-2 method)
  pallas_loop  table VMEM-resident, per-row dynamic-slice copy loop
               (the hypothesized "VMEM-resident Pallas gather")
  pallas_take  whole-tile jnp.take inside the kernel (Mosaic dynamic
               gather, if the lowering supports it)
  pallas_gram  fused gather->Gram in one kernel (never materializes the
               gathered [NE,R,k] tensor in HBM) vs the XLA two-step

at widths 64/128, bf16/f32, same table/index distribution as the ALS
epoch's U-phase (items table, ML-20M shape). Emits one JSON line.

Run on the TPU host: python tools/probe_gather.py [--m 23] [--gram]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax

from ycnr_tpu.utils.profiling import device_sync


def best_of(fn, iters=5):
    device_sync(fn())  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        device_sync(fn())
        best = min(best, time.time() - t0)
    return best


# ---------------------------------------------------------------- XLA --

def xla_single(table, idx):
    """One gather dispatch; caller subtracts the dispatch floor."""
    @jax.jit
    def run(t, i):
        return jnp.sum(t[i].astype(jnp.float32))

    return lambda: run(table, idx)


def xla_floor():
    """Dispatch + tiny-reduce floor (the constant part of xla_single)."""
    z = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def run(z):
        return jnp.sum(z)

    return lambda: run(z)


def xla_scan(table, idx, steps):
    """Carry-rotated scan: idx + k mod n defeats hoisting (round-2
    method; measures steady-state issue rate with dispatch amortized)."""
    n = table.shape[0]

    @jax.jit
    def run(t, i):
        def body(c, k):
            acc, i = c
            g = t[(i + k) % n]
            return (acc + jnp.sum(g.astype(jnp.float32)), i), None

        (acc, _), _ = lax.scan(body, (jnp.float32(0), i),
                               jnp.arange(steps))
        return acc

    return lambda: run(table, idx)


# ------------------------------------------------------------- Pallas --

def pallas_loop_gather(table, idx, tile=512):
    """Table fully VMEM-resident; per-row dynamic-slice copy loop.

    Grid over index tiles; the tile's indices ride in SMEM (scalars for
    addressing), each row is one VMEM->VMEM dynamic-slice copy. This is
    the literal "VMEM-resident Pallas gather" the round-1 doc assumed
    would pay similar per-row cycles — measured here instead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    n, w = table.shape
    assert m % tile == 0

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        lax.fori_loop(0, tile, body, 0)

    gather = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
    )

    @jax.jit
    def run(t, i):
        return jnp.sum(gather(i, t).astype(jnp.float32))

    return lambda: run(table, idx)


def pallas_take_gather(table, idx, tile=2048):
    """Whole-tile jnp.take inside the kernel — exercises Mosaic's
    vectorized dynamic-gather lowering (sublane gather), if present."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    n, w = table.shape
    assert m % tile == 0

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    gather = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
    )

    @jax.jit
    def run(t, i):
        return jnp.sum(gather(i, t).astype(jnp.float32))

    return lambda: run(table, idx)


def pallas_taa_gather(table, idx, tile=2048):
    """take_along_axis with row-broadcast 2-D indices — the other gather
    form Mosaic might vectorize (measured round 4: rejected at lowering
    with a bare AssertionError on this jax/libtpu)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    n, w = table.shape
    assert m % tile == 0

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            table_ref[:], idx_ref[:].astype(jnp.int32), axis=0)

    gather = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, w), table.dtype),
    )

    @jax.jit
    def run(t, i):
        i2 = jnp.broadcast_to(i[:, None], (m, w))
        return jnp.sum(gather(i2, t).astype(jnp.float32))

    return lambda: run(table, idx)


def pallas_fused_gram(table, idx, rat, R=32, tile_ne=256):
    """Fused gather->Gram: one kernel gathers a [tile_ne, R] slot tile's
    rows and accumulates per-entity A = sum v v^T + rhs, never writing
    the gathered tensor to HBM. Compare against xla_gram (gather then
    einsum, XLA may or may not fuse)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = idx.shape[0]
    n, w = table.shape
    ne = m // R
    assert ne % tile_ne == 0

    def kernel(idx_ref, table_ref, rat_ref, A_ref, b_ref, rows_ref):
        # gather this tile's R*tile_ne rows into scratch, then batched
        # per-entity Gram on the MXU
        def body(i, _):
            rows_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        lax.fori_loop(0, tile_ne * R, body, 0)
        F = rows_ref[:].reshape(tile_ne, R, w)
        A_ref[:] = jax.lax.dot_general(
            F, F, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        b_ref[:] = jax.lax.dot_general(
            F, rat_ref[:].reshape(tile_ne, R),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(ne // tile_ne,),
        in_specs=[
            pl.BlockSpec((tile_ne * R,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_ne * R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_ne, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_ne, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ne, w, w), jnp.float32),
            jax.ShapeDtypeStruct((ne, w), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((tile_ne * R, w), table.dtype)],
    )

    @jax.jit
    def run(t, i, r):
        A, b = call(i, t, r)
        return jnp.sum(A) + jnp.sum(b)

    return lambda: run(table, idx, rat)


def xla_gram(table, idx, rat, R=32):
    """The status-quo block body: gather then Gram einsum."""
    m = idx.shape[0]
    ne = m // R

    @jax.jit
    def run(t, i, r):
        F = t[i].reshape(ne, R, t.shape[1])
        A = jnp.einsum("urk,urm->ukm", F, F,
                       preferred_element_type=jnp.float32)
        b = jnp.einsum("urk,ur->uk", F, r.reshape(ne, R),
                       preferred_element_type=jnp.float32)
        return jnp.sum(A) + jnp.sum(b)

    return lambda: run(table, idx, rat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=23,
                    help="log2 of gathered rows per dispatch")
    ap.add_argument("--n", type=int, default=26752,
                    help="table rows (default: ML-20M items, padded)")
    ap.add_argument("--steps", type=int, default=50,
                    help="scan length for the scan method")
    ap.add_argument("--gram", action="store_true",
                    help="also probe the fused gather->Gram kernel")
    ap.add_argument("--tile", type=int, default=512)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    M = 1 << args.m
    idx = jnp.asarray(rng.integers(0, args.n, M), jnp.int32)
    out = {"m_rows": M, "n_table": args.n, "steps": args.steps}

    floor_s = best_of(xla_floor())
    out["dispatch_floor_ms"] = round(floor_s * 1e3, 3)

    for w in (64, 128):
        for dname, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            table = jnp.asarray(rng.normal(0, 1, (args.n, w)), dt)
            key = f"w{w}_{dname}"

            t1 = best_of(xla_single(table, idx))
            out[f"xla_single_{key}_ns_row"] = round(
                max(t1 - floor_s, 0) / M * 1e9, 2)

            ts = best_of(xla_scan(table, idx, args.steps))
            out[f"xla_scan_{key}_ns_row"] = round(
                ts / (M * args.steps) * 1e9, 2)

            for name, builder in (("pallas_loop", pallas_loop_gather),
                                  ("pallas_take", pallas_take_gather),
                                  ("pallas_taa", pallas_taa_gather)):
                try:
                    fn = builder(table, idx, args.tile) \
                        if name == "pallas_loop" else builder(table, idx)
                    tp = best_of(fn)
                    out[f"{name}_{key}_ns_row"] = round(
                        max(tp - floor_s, 0) / M * 1e9, 2)
                except Exception as e:  # lowering may be unsupported
                    out[f"{name}_{key}_error"] = type(e).__name__ \
                        + ": " + str(e).split("\n")[0][:160]
            print(f"{key}: " + ", ".join(
                f"{k.rsplit('_', 3)[0]}={v}" for k, v in out.items()
                if key in k), file=sys.stderr)

    if args.gram:
        R = 32
        table = jnp.asarray(rng.normal(0, 1, (args.n, 64)), jnp.bfloat16)
        rat = jnp.asarray(rng.normal(0, 1, (M,)), jnp.bfloat16)
        tx = best_of(xla_gram(table, idx, rat, R))
        out["xla_gram_w64_bf16_ns_row"] = round(
            max(tx - floor_s, 0) / M * 1e9, 2)
        try:
            tf = best_of(pallas_fused_gram(table, idx, rat, R))
            out["pallas_gram_w64_bf16_ns_row"] = round(
                max(tf - floor_s, 0) / M * 1e9, 2)
        except Exception as e:
            out["pallas_gram_w64_bf16_error"] = type(e).__name__ \
                + ": " + str(e).split("\n")[0][:160]

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Pallas gather kernels vs XLA gather — the measurement VERDICT round-3
item 3 demands (docs/KERNELS.md "Gather economics": the 'no Pallas win
hiding here' consequence was an assertion from a width table, never
tested with an actual kernel, while gathers are 63% of the rank-64 ALS
epoch and ~38% of rank-128).

One session, hoist-proof (indices are rotated through the scan carry so
nothing folds), all variants gather B rows per step from an [n, w] factor
table — exactly the epoch's inner access pattern (SURVEY.md §3.2 hot
loop):

  xla_g{64,128,256}   XLA `table[idx]` — the status quo, re-measured
                      here to settle the round-1 (width-128 free) vs
                      round-2 (2.9x) contradiction in one sitting.
  vmem_slice_w{64,128} Pallas: table VMEM-resident, per-row
                      `out[i] = table[idx[i]]` dynamic-slice copy loop.
                      Feasible for the item table (17.8k-26.7k rows
                      x 128 f32 = 9-14 MB); the user table (138k-480k
                      rows) can never ride this path.
  vmem_take_w{64,128}  Pallas: same residency, one `jnp.take(table, idx)`
                      per tile — measures Mosaic's vectorized gather
                      lowering if it exists (reported 'unsupported'
                      otherwise).
  hbm_dma_w{64,128}    Pallas: table stays in HBM, per-row async DMA into
                      the output tile, K=8 descriptors in flight —
                      measures the DMA-descriptor-rate ceiling for
                      scattered row fetches (the only Pallas shape that
                      could serve the BIG user table).

Run on the TPU host:
    python tools/bench_pallas_gather.py [--dtype bf16] [--steps 100]
Prints one JSON object; diagnostics to stderr.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ycnr_tpu.utils.profiling import device_sync

B = 1 << 16          # rows gathered per step (one epoch block's order)
TILE = 512           # rows per pallas grid program
N_SMALL = 26_744     # ML-20M item table — the VMEM-resident candidate
N_BIG = 480_189      # Netflix user table — HBM-only


def timeit(fn, iters=3):
    device_sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        device_sync(fn())
        best = min(best, time.time() - t0)
    return best


# ---------------------------------------------------------------- XLA --

def xla_gather(table, idx, steps):
    n = table.shape[0]

    @jax.jit
    def run(table, idx):
        def body(c, k):
            acc, idx = c
            g = table[(idx + k) % n]
            return (acc + jnp.sum(g.astype(jnp.float32)), idx), None

        (acc, _), _ = lax.scan(body, (jnp.zeros((), jnp.float32), idx),
                               jnp.arange(steps))
        return acc

    return run(table, idx)


# ------------------------------------------------- Pallas: VMEM table --

def _vmem_slice_kernel(idx_ref, table_ref, out_ref):
    t = pl.program_id(0)
    base = t * TILE

    def body(i, carry):
        r = idx_ref[base + i]
        out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
        return carry

    lax.fori_loop(0, TILE, body, 0)


def _vmem_take_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0,
                          indices_are_sorted=False, unique_indices=False)


def pallas_vmem_gather(table, idx, steps, take=False):
    """table VMEM-resident; gather B rows per scan step."""
    n, w = table.shape
    if take:
        grid_spec = pl.GridSpec(
            grid=(B // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda t: (t,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, w), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
        )
        kern = _vmem_take_kernel
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // TILE,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, w), lambda t, idx_ref: (t, 0),
                                   memory_space=pltpu.VMEM),
        )
        kern = _vmem_slice_kernel

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, w), table.dtype),
    )

    @jax.jit
    def run(table, idx):
        def body(c, k):
            acc, idx = c
            g = call((idx + k) % n, table)
            return (acc + jnp.sum(g.astype(jnp.float32)), idx), None

        (acc, _), _ = lax.scan(body, (jnp.zeros((), jnp.float32), idx),
                               jnp.arange(steps))
        return acc

    return run(table, idx)


# -------------------------------------------------- Pallas: HBM + DMA --

_DMA_K = 8  # outstanding row descriptors


def _hbm_dma_kernel(idx_ref, table_ref, out_ref, sems):
    t = pl.program_id(0)
    base = t * TILE

    def row_copy(i):
        r = idx_ref[base + i]
        return pltpu.make_async_copy(table_ref.at[pl.ds(r, 1), :],
                                     out_ref.at[pl.ds(i, 1), :],
                                     sems.at[i % _DMA_K])

    def warm(i, carry):
        row_copy(i).start()
        return carry

    lax.fori_loop(0, _DMA_K, warm, 0)

    def body(i, carry):
        row_copy(i).wait()

        @pl.when(i + _DMA_K < TILE)
        def _():
            row_copy(i + _DMA_K).start()

        return carry

    lax.fori_loop(0, TILE, body, 0)


def pallas_hbm_dma_gather(table, idx, steps):
    n, w = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, w), lambda t, idx_ref: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_K,))],
    )
    call = pl.pallas_call(
        _hbm_dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, w), table.dtype),
    )

    @jax.jit
    def run(table, idx):
        def body(c, k):
            acc, idx = c
            g = call((idx + k) % n, table)
            return (acc + jnp.sum(g.astype(jnp.float32)), idx), None

        (acc, _), _ = lax.scan(body, (jnp.zeros((), jnp.float32), idx),
                               jnp.arange(steps))
        return acc

    return run(table, idx)


# --------------------------------------------------------------- main --

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--check", action="store_true",
                    help="also assert kernel outputs == XLA gather")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    rows = B * args.steps
    out = {"dtype": args.dtype, "B": B, "steps": args.steps,
           "tile": TILE, "dma_k": _DMA_K}

    if args.check:
        # one-shot correctness: each kernel row == table[idx] row
        tbl = jnp.asarray(rng.normal(0, 1, (N_SMALL, 128)), dt)
        idx = jnp.asarray(rng.integers(0, N_SMALL, B), jnp.int32)
        want = np.asarray(tbl[idx])
        got = np.asarray(pl.pallas_call(
            _vmem_slice_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B // TILE,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TILE, 128),
                                       lambda t, i: (t, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((B, 128), dt))(idx, tbl))
        assert (got == want).all(), "vmem_slice mismatch"
        got = np.asarray(pl.pallas_call(
            _hbm_dma_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B // TILE,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((TILE, 128),
                                       lambda t, i: (t, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_K,))]),
            out_shape=jax.ShapeDtypeStruct((B, 128), dt))(idx, tbl))
        assert (got == want).all(), "hbm_dma mismatch"
        print("check: kernel outputs match XLA gather", file=sys.stderr)

    for w in (64, 128):
        for name, n_table, fn in (
            (f"xla_small_w{w}", N_SMALL, xla_gather),
            (f"xla_big_w{w}", N_BIG, xla_gather),
            (f"vmem_slice_w{w}", N_SMALL, pallas_vmem_gather),
            (f"vmem_take_w{w}", N_SMALL,
             functools.partial(pallas_vmem_gather, take=True)),
            (f"hbm_dma_w{w}", N_BIG, pallas_hbm_dma_gather),
        ):
            tbl = jnp.asarray(rng.normal(0, 1, (n_table, w)), dt)
            idx = jnp.asarray(rng.integers(0, n_table, B), jnp.int32)
            try:
                dt_s = timeit(lambda: fn(tbl, idx, args.steps))
            except Exception as e:
                out[name] = f"unsupported: {type(e).__name__}"
                print(f"{name}: unsupported ({str(e)[:160]})",
                      file=sys.stderr)
                continue
            out[name + "_ns_row"] = round(dt_s / rows * 1e9, 2)
            print(f"{name}: {dt_s:.3f}s = {out[name + '_ns_row']} ns/row",
                  file=sys.stderr)

    # width-256 XLA rung reconciles the round-1 table's tail
    tbl = jnp.asarray(rng.normal(0, 1, (N_SMALL, 256)), dt)
    idx = jnp.asarray(rng.integers(0, N_SMALL, B), jnp.int32)
    dt_s = timeit(lambda: xla_gather(tbl, idx, args.steps))
    out["xla_small_w256_ns_row"] = round(dt_s / rows * 1e9, 2)
    print(f"xla_small_w256: {out['xla_small_w256_ns_row']} ns/row",
          file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

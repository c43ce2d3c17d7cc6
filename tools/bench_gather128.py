"""Width-128 gather attack (VERDICT round-2 item 4, docs/KERNELS.md
"Gather economics").

Round-2 measured width-128 gathers at ~2.9x the per-row cost of width-64
(same session, bf16), which is most of rank-128 ALS's 3.6x epoch-time
ratio. Candidates measured here, hoist-proof (the gathered table is the
scan carry so nothing hoists), all same-session:

  g64      [n, 64]  gather           (the rank-64 baseline cost)
  g128     [n, 128] gather           (the rank-128 status quo)
  g2x64    two [n, 64] gathers from separate half tables (same idx)
  g128pair [n/2, 256] gather of row PAIRS (adjacent rows share a fetch;
           only a control — real ALS indices are not pairable)
  gram128  full block body at width 128: gather -> Gram einsum
  gram2x64 block body with split halves: 2 gathers -> 3 block Grams
           (A11, A12, A22) + rhs halves — the drop-in candidate for
           models/bucketed_phase at rank 128

Run on the TPU host: python tools/bench_gather128.py [--dtype bf16]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from functools import partial
from jax import lax

from ycnr_tpu.utils.profiling import device_sync


def timeit(fn, *args, iters=3):
    device_sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        device_sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


N_TABLE = 480_189
B = 1 << 16
STEPS = 200


def scan_gather(tables, idx, widths):
    """Sum of gathers of `widths` columns from each table, STEPS times,
    idx rotated per step so nothing hoists."""

    @jax.jit
    def run(tables, idx):
        def body(c, k):
            acc, idx = c
            s = jnp.zeros((), jnp.float32)
            for t in tables:
                g = t[(idx + k) % t.shape[0]]
                s = s + jnp.sum(g.astype(jnp.float32))
            return (acc + s, idx), None

        (acc, _), _ = lax.scan(body, (jnp.zeros((), jnp.float32), idx),
                               jnp.arange(STEPS))
        return acc

    return run(tables, idx)


def scan_gram(tables, idx, R=32):
    """Block body shape: gather [NE, R, k] + Gram einsum per step.
    tables = [full] (width 128) or [lo, hi] (2 x width 64 -> 3 Grams)."""
    NE = B // R

    @jax.jit
    def run(tables, idx):
        def body(c, k):
            acc, idx = c
            j = ((idx + k) % N_TABLE).reshape(NE, R)
            gs = [t[j] for t in tables]  # [NE, R, w]
            s = jnp.zeros((), jnp.float32)
            if len(gs) == 1:
                A = jnp.einsum("urk,urm->ukm", gs[0], gs[0],
                               preferred_element_type=jnp.float32)
                s = s + jnp.sum(A)
            else:
                lo, hi = gs
                A11 = jnp.einsum("urk,urm->ukm", lo, lo,
                                 preferred_element_type=jnp.float32)
                A12 = jnp.einsum("urk,urm->ukm", lo, hi,
                                 preferred_element_type=jnp.float32)
                A22 = jnp.einsum("urk,urm->ukm", hi, hi,
                                 preferred_element_type=jnp.float32)
                s = s + jnp.sum(A11) + 2 * jnp.sum(A12) + jnp.sum(A22)
            return (acc + s, idx), None

        (acc, _), _ = lax.scan(body, (jnp.zeros((), jnp.float32), idx),
                               jnp.arange(STEPS))
        return acc

    return run(tables, idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    F128 = jnp.asarray(rng.normal(0, 1, (N_TABLE, 128)), dt)
    F64a = F128[:, :64]
    F64b = F128[:, 64:]
    F256p = jnp.asarray(rng.normal(0, 1, (N_TABLE // 2, 256)), dt)
    idx = jnp.asarray(rng.integers(0, N_TABLE, B), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, N_TABLE // 2, B // 2), jnp.int32)

    rows = B * STEPS
    out = {"dtype": args.dtype, "B": B, "steps": STEPS}
    for name, fn in (
        ("g64", lambda: scan_gather([F64a], idx, 64)),
        ("g128", lambda: scan_gather([F128], idx, 128)),
        ("g2x64", lambda: scan_gather([F64a, F64b], idx, 64)),
        ("g128pair", lambda: scan_gather([F256p], idx2, 256)),
        ("gram128", lambda: scan_gram([F128], idx)),
        ("gram2x64", lambda: scan_gram([F64a, F64b], idx)),
    ):
        r = rows // 2 if name == "g128pair" else rows
        dt_s = timeit(lambda _=None: fn())
        out[name + "_ns_row"] = round(dt_s / r * 1e9, 2)
        print(f"{name}: {dt_s:.3f}s = {out[name + '_ns_row']} ns/row",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""AOT footprint sweep for the OOC assemble at beyond-HBM shapes.

The assemble (models/ooc._assemble) turns the wire-ordered solve table
Ep back into the entity-ordered factor E once per phase. At the 1e9
scale both tables are ~2.6 GB and the phase runs beside ~4-5 GB of
pinned wire, so the assemble's TOTAL footprint (arguments + temps)
decides whether the b1 run fits the 15 GB chip. Round-5 findings that
motivated this probe (all AOT memory_analysis, no execution):

* row-major pins (round-4 design) lane-pad k=64 to the 128 tile:
  arguments double to 10.54 GB (temps 0.54) — the round-5 b1 OOM.
* transposed-compact pins keep arguments at 5.29 GB but XLA inserts
  ~6.45 GB of internal layout-change temps in the chunked loop.

This probe compiles every {impl} x {layout} combination at b1 and
Netflix shapes and prints argument/temp/output bytes — the shipped
implementation is whichever minimizes args+temps at b1 while staying
sane at Netflix. Results: runs/probes/b1_assemble_layouts.json.

Usage: python tools/probe_assemble_layout.py [--rank 64]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def impl_chunked(E, Ep, inv, sent):
    from ycnr_tpu.models.ooc import _assemble_impl

    return _assemble_impl(E, Ep, inv, sent)


def impl_single(E, Ep, inv, sent):
    """One whole-table gather + where (no chunk loop)."""
    return jnp.where((inv == sent)[:, None], E, Ep[inv])


def fmt(dev, order):
    from jax.experimental import layout as XL
    from jax.sharding import SingleDeviceSharding

    return XL.Format(XL.Layout(order), SingleDeviceSharding(dev))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=64)
    args = ap.parse_args()
    k = args.rank
    dev = jax.devices()[0]
    shapes = {"b1": (10_000_001, 10_500_000),
              "netflix": (480_190, 500_000)}
    layouts = {"rm": (0, 1), "cm": (1, 0), "auto": None}
    impls = {"chunked": impl_chunked, "single": impl_single}
    out = {"rank": k, "platform": dev.platform, "variants": {}}
    for sname, (ne, nep) in shapes.items():
        E = jax.ShapeDtypeStruct((ne, k), jnp.float32)
        Ep = jax.ShapeDtypeStruct((nep, k), jnp.float32)
        inv = jax.ShapeDtypeStruct((ne,), jnp.int32)
        sent = jax.ShapeDtypeStruct((), jnp.int32)
        for iname, f in impls.items():
            for lname, order in layouts.items():
                key = f"{sname}/{iname}/{lname}"
                try:
                    if order is None:
                        j = jax.jit(f, donate_argnums=(0,))
                    else:
                        ft = fmt(dev, order)
                        j = jax.jit(f, donate_argnums=(0,),
                                    in_shardings=(ft, ft, None, None),
                                    out_shardings=ft)
                    ma = j.lower(E, Ep, inv, sent).compile() \
                        .memory_analysis()
                    rec = {n: int(getattr(ma, n, 0)) for n in
                           ("argument_size_in_bytes", "temp_size_in_bytes",
                            "output_size_in_bytes", "alias_size_in_bytes")}
                    rec["footprint_gb"] = round(
                        (rec["argument_size_in_bytes"]
                         + rec["temp_size_in_bytes"]
                         + rec["output_size_in_bytes"]
                         - rec["alias_size_in_bytes"]) / 1e9, 2)
                except Exception as e:
                    rec = {"error": f"{type(e).__name__}: {e}"}
                out["variants"][key] = rec
                print(f"{key}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

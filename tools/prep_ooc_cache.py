"""Host-side cache pre-build for tools/bench_ooc.py (CPU-only process).

The TPU is an exclusive per-process lock on this host, and bench_ooc's
data generation + wire packing are pure host work that can take tens of
minutes on the 1-vCPU bench host (docs/KERNELS.md "Host-side build
notes"). Running them in a JAX_PLATFORMS=cpu process keeps the chip free
for other measurements; bench_ooc then starts against warm caches and
holds the TPU only for the epochs it actually times.

Usage (cache tags match bench_ooc/bench.py exactly):
    JAX_PLATFORMS=cpu python tools/prep_ooc_cache.py --scale netflix --compare
    JAX_PLATFORMS=cpu python tools/prep_ooc_cache.py --scale b1
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from bench import _cache_path, _code_hash, _load_npz, _save_npz, log
from tools.bench_ooc import (SCALES, _packed_dir, b1_portions, get_coo,
                             load_packed, save_packed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=list(SCALES), default="netflix")
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--target-mb", type=int, default=192)
    ap.add_argument("--compare", action="store_true",
                    help="also pre-build the resident bucketed layouts")
    args = ap.parse_args()

    from ycnr_tpu.ops.packed import (build_packed, build_packed_stream,
                                     packed_stats)
    import ycnr_tpu.ops.packed as _packed_mod

    nu, ni, nr = SCALES[args.scale]
    kw = dict(rank_hint=args.rank,
              target_bytes=args.target_mb * 2**20, max_groups=args.groups)

    if args.scale == "b1":
        tag = (f"b1_{nu}x{ni}x{nr}_g{args.groups}_t{args.target_mb}"
               f"_{_code_hash(_packed_mod)}")
        d_u, d_i = _packed_dir(tag + "_u"), _packed_dir(tag + "_i")
        for view, d in (("entity", d_u), ("other", d_i)):
            if load_packed(d)[0] is not None:
                log(f"{view} wire cache hit {d}")
                continue
            t0 = time.time()
            n_e, n_o = (nu, ni) if view == "entity" else (ni, nu)
            g = build_packed_stream(
                b1_portions(nu, ni, nr), n_e, n_o,
                portions2=b1_portions(nu, ni, nr),
                out_dir=os.path.join(d, "wire"), view=view, **kw)
            save_packed(g, d, nr)
            log(f"{view} wire built in {time.time() - t0:.0f}s: "
                f"{packed_stats(g, nr)}")
            del g
            import shutil
            shutil.rmtree(os.path.join(d, "wire"), ignore_errors=True)
        return

    tu, ti, tr, nu, ni = get_coo(args.scale)
    nnz = len(tr)
    tag = (f"{args.scale}_{nnz}_g{args.groups}_t{args.target_mb}"
           f"_{_code_hash(_packed_mod)}")
    d_u, d_i = _packed_dir(tag + "_u"), _packed_dir(tag + "_i")
    if load_packed(d_u)[0] is None or load_packed(d_i)[0] is None:
        t0 = time.time()
        ug = build_packed(tu, ti, tr, nu, ni, **kw)
        ig = build_packed(ti, tu, tr, ni, nu, **kw)
        log(f"wire built in {time.time() - t0:.0f}s")
        save_packed(ug, d_u, nnz)
        save_packed(ig, d_i, nnz)
        log(f"user wire: {packed_stats(ug, nnz)}")
    else:
        log("wire caches hit")

    if args.compare:
        from ycnr_tpu.ops.bucketed import build_bucketed
        import ycnr_tpu.data.split as _split_mod
        import ycnr_tpu.data.synthetic as _synth_mod
        import ycnr_tpu.ops.bucketed as _bucketed_mod

        lp = _cache_path(
            f"lay_{nu}x{ni}x{SCALES[args.scale][2]}_s0"
            f"_{_code_hash(_synth_mod, _split_mod)}"
            f"_c32_r{args.rank}_bucketed_g{args.groups}"
            f"_{_code_hash(_bucketed_mod)}")
        if _load_npz(lp) is None:
            t0 = time.time()
            ul = build_bucketed(tu, ti, tr, nu, ni, 32, args.rank,
                                max_groups=args.groups)
            il = build_bucketed(ti, tu, tr, ni, nu, 32, args.rank,
                                max_groups=args.groups)
            log(f"resident layouts: {time.time() - t0:.0f}s")
            blob = {}
            bench._flatten_layout("ul", ul, blob)
            bench._flatten_layout("il", il, blob)
            _save_npz(lp, blob)
        else:
            log(f"resident layout cache hit {lp}")


if __name__ == "__main__":
    main()

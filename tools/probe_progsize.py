"""Executable-size probe for the first-epoch upload wall (VERDICT r4 #7).

The round-3 refutation established that the first-epoch wall is program
UPLOAD through the axon tunnel, roughly proportional to executable size
(docs/KERNELS.md "first-epoch wall"), and that the 16-group ALS epoch is
an 18.8 MB executable. The remaining question: what sets the size — the
NUMBER of scan bodies (one per bucket group, each shape-specialized), or
total work? Three AOT-compiled variants of the same epoch answer it:

  distinct : G groups, G distinct (NE, R) block shapes  — the status quo
  uniform  : G groups, all sharing ONE (NE, R) block shape — same number
             of lax.scan loops, identical bodies (does XLA dedupe them?)
  merged   : 1 group holding all blocks at the shared shape — one scan

If merged << distinct and uniform ~ distinct, the upload lever is
merging scans (requires shape-uniform layouts), not hoping the compiler
CSEs identical loop bodies. Sizes come from compiled.memory_analysis()
.generated_code_size_in_bytes — no execution, so the probe is cheap and
does not pay the upload it measures; optional --execute times the first
execution of each variant to tie code size back to wall seconds.

Usage: python tools/probe_progsize.py [--groups 16] [--rank 64] [--execute]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def make_groups(G: int, NB: int, NE: int, R: int, n_entities: int,
                n_other: int, uniform_R: bool, seed: int):
    """G synthetic BucketGroups. uniform_R=False grows R by ~1.6x per
    group (the DP-ladder pattern); True keeps one (NE, R) for all."""
    from ycnr_tpu.ops.bucketed import BucketGroup

    rng = np.random.default_rng(seed)
    out = []
    eid_base = 0
    for g in range(G):
        # distinct rungs span R/8 .. 4R (ML-20M's real 16-group DP ladder
        # spans ~8..1024 at R=64-class data; an unbounded 1.6^g ladder
        # compiled for tens of minutes and told us nothing extra)
        Rg = (R if uniform_R else
              int(np.clip(round(R * 1.6 ** (g - G // 2)), R // 8, 4 * R)))
        oi = rng.integers(0, n_other, (NB, NE, Rg), dtype=np.int32)
        rat = rng.random((NB, NE, Rg), np.float32) * 4 + 1
        eids = (eid_base + np.arange(NB * NE, dtype=np.int32)
                ).reshape(NB, NE) % n_entities
        cnt = np.full((NB, NE), Rg, np.float32)
        out.append(BucketGroup(oi, rat, eids, cnt))
        eid_base += NB * NE
    return tuple(out)


def merge_uniform(groups):
    """Concatenate shape-identical groups along the block axis: ONE scan."""
    from ycnr_tpu.ops.bucketed import BucketGroup

    assert len({(g.other_idx.shape[1:], ) for g in groups}) == 1
    return (BucketGroup(
        np.concatenate([g.other_idx for g in groups]),
        np.concatenate([g.rating for g in groups]),
        np.concatenate([g.entity_ids for g in groups]),
        np.concatenate([g.entity_cnt for g in groups])),)


def compile_epoch(ug, ig, n_users, n_items, rank, lam=0.05):
    import jax

    from ycnr_tpu.models.base import init_state
    from ycnr_tpu.models.bucketed_phase import (als_epoch_bucketed,
                                                device_bucketed)

    st = init_state(n_users, n_items, rank, seed=0)
    ugd = device_bucketed(ug)
    igd = device_bucketed(ig)
    # layouts ride as ARGUMENTS: closing them over the jit inlines them as
    # HLO constants, which wedges the remote AOT compile helper
    # (docs/KERNELS.md round-2 attribution note) — the same rule
    # tools/attrib_als.py follows
    t0 = time.time()
    compiled = als_epoch_bucketed.lower(st, ugd, igd, lam=lam,
                                        gather_bf16=True).compile()
    t_compile = time.time() - t0
    ma = compiled.memory_analysis()
    size = getattr(ma, "generated_code_size_in_bytes", None)
    return compiled, (st, ugd, igd), {
        "compile_s": round(t_compile, 2),
        "code_bytes": int(size) if size else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--nb", type=int, default=12, help="blocks per group")
    ap.add_argument("--ne", type=int, default=256, help="entities per block")
    ap.add_argument("--R", type=int, default=64, help="uniform rung height")
    ap.add_argument("--execute", action="store_true",
                    help="also time first execution (pays the upload)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    G, NB, NE = args.groups, args.nb, args.ne
    n_entities = G * NB * NE
    n_other = 4096
    result = {"groups": G, "rank": args.rank, "nb": NB, "ne": NE,
              "R": args.R, "platform": jax.devices()[0].platform}

    variants = {}
    distinct = make_groups(G, NB, NE, args.R, n_entities, n_other,
                           uniform_R=False, seed=0)
    uniform = make_groups(G, NB, NE, args.R, n_entities, n_other,
                          uniform_R=True, seed=0)
    merged = merge_uniform(uniform)
    # the other-side layout is held fixed (small, uniform) so the probe
    # isolates the user-phase group structure
    other = make_groups(2, 4, 128, args.R, n_other, n_entities,
                        uniform_R=True, seed=1)
    for name, ug in (("distinct", distinct), ("uniform", uniform),
                     ("merged", merged)):
        compiled, cargs, info = compile_epoch(ug, other, n_entities,
                                              n_other, args.rank)
        if args.execute:
            st, ugd, igd = cargs
            t0 = time.time()
            out = compiled(st, ugd, igd)
            float(jax.device_get(out.U[0, 0]))  # scalar-readback sync
            info["first_exec_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            out = compiled(out, ugd, igd)
            float(jax.device_get(out.U[0, 0]))
            info["second_exec_s"] = round(time.time() - t0, 3)
        variants[name] = info
        print(f"{name}: {info}", file=sys.stderr)
    result["variants"] = variants
    d, u, m = (variants[k].get("code_bytes") for k in
               ("distinct", "uniform", "merged"))
    if d and m:
        result["merged_vs_distinct"] = round(m / d, 3)
        result["uniform_vs_distinct"] = round(u / d, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

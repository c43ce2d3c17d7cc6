"""Upload-warm probe: is the first-program wall exploitable? (round 5).

tools/probe_progsize.py measured (runs/probes/progsize_16g.json): the
FIRST large executable in a process took 574 s to first-execute, while a
DIFFERENT 37 MB program immediately after ran in 1.8 s — the upload wall
through the axon tunnel is a per-process first-big-program cost, not a
per-byte cost paid by every program. Small programs (init_state etc.)
do NOT absorb it: train/ sessions execute plenty of small jits before
the epoch and still measured a 279-647 s 16-group wall.

Open question this probe answers: how big must the warm-up program be?
Sequence, all in ONE process, each a DISTINCT synthetic scan-ladder
epoch (shapes differ, so no compile/program cache can alias them):

  tiny   (1 group)  -> medium (4 groups) -> large (16 groups)
  -> large2 (16 groups, different shapes)

If large is fast after medium, a cheap dummy upload at process start
(overlapped with data load + layout pack) turns the 351 s ML-20M
train-start -> epoch-1 wall into ~pack time. If only large warms large,
the wall is irreducible and the 8-group default stays the answer.

Usage: python tools/probe_upload_warm.py [--skip tiny,medium]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from probe_progsize import compile_epoch, make_groups  # noqa: E402


def run_variant(label, G, nb, ne, R, rank, seed):
    import jax

    n_entities = G * nb * ne
    n_other = 4096
    ug = make_groups(G, nb, ne, R, n_entities, n_other, uniform_R=False,
                     seed=seed)
    other = make_groups(2, 4, 128, R, n_other, n_entities, uniform_R=True,
                        seed=seed + 100)
    compiled, (st, ugd, igd), info = compile_epoch(
        ug, other, n_entities, n_other, rank)
    t0 = time.time()
    out = compiled(st, ugd, igd)
    float(jax.device_get(out.U[0, 0]))  # scalar-readback sync
    info["first_exec_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    out = compiled(out, ugd, igd)
    float(jax.device_get(out.U[0, 0]))
    info["second_exec_s"] = round(time.time() - t0, 3)
    info["label"] = label
    print(f"{label}: {info}", file=sys.stderr, flush=True)
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--skip", default="",
                    help="comma list of stages to skip (e.g. 'tiny,medium' "
                         "probes whether large-warms-large alone)")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    stages = [
        # (label, G, nb, ne, R, seed) — seeds differ so every program is
        # a distinct executable (different shapes via make_groups' ladder)
        ("tiny", 1, 2, 64, 32, 0),
        ("medium", 4, 4, 128, 48, 1),
        ("large", 16, 12, 256, 64, 2),
        ("large2", 16, 12, 248, 64, 3),  # ne differs -> distinct program
    ]
    out = []
    for label, G, nb, ne, R, seed in stages:
        if label in skip:
            continue
        out.append(run_variant(label, G, nb, ne, R, args.rank, seed))
    print(json.dumps({"rank": args.rank, "stages": out}))


if __name__ == "__main__":
    main()

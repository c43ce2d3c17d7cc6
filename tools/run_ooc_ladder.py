"""Run several bench_ooc measurements in ONE process (round 5).

The per-process first-Pallas-program wall (docs/KERNELS.md "first-epoch
wall") is 150-650 s on this tunnel; invoking tools/bench_ooc.py once per
tier pays it once per tier. This driver calls bench_ooc.main() for each
configured tier inside one process — one wall for the whole ladder — and
tees each run's stdout JSON to its own file under --out-dir.

Usage:
    python tools/run_ooc_ladder.py --out-dir runs/ooc \
        "als_netflix_rect_pinned:--scale netflix --residency auto --rmse" \
        "als_netflix_packed_pinned:--scale netflix --residency device --pin-format keep"

Each positional argument is "<name>:<bench_ooc argv>"; the run's stdout
JSON lands in <out-dir>/<name>.json (bench_ooc prints exactly one JSON
object per run). A failing tier is recorded and the ladder continues.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="runs/ooc")
    ap.add_argument("runs", nargs="+",
                    help='each "<name>:<space-separated bench_ooc args>"')
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from tools import bench_ooc

    summary = []
    for spec in args.runs:
        name, _, rest = spec.partition(":")
        argv = rest.split()
        out_path = os.path.join(args.out_dir, f"{name}.json")
        print(f"=== {name}: bench_ooc {' '.join(argv)}", file=sys.stderr,
              flush=True)
        t0 = time.time()
        buf = io.StringIO()
        old_argv = sys.argv
        try:
            sys.argv = ["bench_ooc.py"] + argv
            with contextlib.redirect_stdout(buf):
                bench_ooc.main()
            payload = buf.getvalue().strip()
            # keep only the last JSON line (prep paths may print interim)
            line = payload.splitlines()[-1] if payload else "{}"
            with open(out_path, "w") as f:
                f.write(line + "\n")
            summary.append({"name": name, "ok": True,
                            "wall_s": round(time.time() - t0, 1),
                            "out": out_path})
        except SystemExit as e:  # bench_ooc argument errors
            summary.append({"name": name, "ok": False, "error": str(e)})
        except Exception as e:
            summary.append({"name": name, "ok": False,
                            "error": f"{type(e).__name__}: {e}"})
        finally:
            sys.argv = old_argv
        print(f"=== {name}: {summary[-1]}", file=sys.stderr, flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

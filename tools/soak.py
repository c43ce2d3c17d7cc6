#!/usr/bin/env python
"""Sustained serving soak measurement — the docs/SERVING.md numbers.

Same shape as tests/test_serve_soak.py (16+ concurrent mixed-request TCP
clients against a ServingApp in shm hot-reload mode with the cross-process
cache, trainer republishing every --republish seconds) but at serving
scale and instrumented for latency: per-request wall times are bucketed
client-side into two phases — STORM (within --storm-window s after a
republish) and CALM — so the p50/p99 cost of hot-reload + cache
invalidation churn is measured directly. Prints one JSON line.

    python tools/soak.py --users 138493 --items 26744 --rank 64 \
        --duration 60 --clients 16 --republish 2
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def pctl(xs, p):
    return float(np.percentile(np.asarray(xs), p) * 1000) if xs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=138_493)
    ap.add_argument("--items", type=int, default=26_744)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--ratings", type=int, default=2_000_000)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--republish", type=float, default=2.0)
    ap.add_argument("--storm-window", type=float, default=0.5,
                    help="seconds after a republish counted as 'storm'")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from ycnr_tpu.models.base import init_state
    from ycnr_tpu.serve.cache import ShmRecCache
    from ycnr_tpu.serve.server import ServingApp, serve_tcp
    from ycnr_tpu.serve.shm import FactorShmWriter, ShmRecommender

    nu, ni, k = args.users, args.items, args.rank
    rng = np.random.default_rng(0)
    train_u = rng.integers(0, nu, args.ratings).astype(np.int32)
    train_i = rng.integers(0, ni, args.ratings).astype(np.int32)
    shm_name = f"/ycnr_soak_{uuid.uuid4().hex[:10]}"
    cache_name = f"/ycnr_soakc_{uuid.uuid4().hex[:10]}"

    def state(e):
        return init_state(nu, ni, k, seed=e)

    pub_times = []  # republish wall-clock stamps (shared, append-only)
    w = FactorShmWriter(shm_name, nu, ni, k)
    w.publish(state(1), 1)
    cache = ShmRecCache(cache_name, 1 << 16, epoch=1)
    rec = ShmRecommender(shm_name, train_u, train_i, cache=cache)
    app = ServingApp(rec, n=10, shm=True, max_batch=64)
    srv = serve_tcp(app, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = srv.server_address
    print(json.dumps({"event": "ready", "addr": list(addr),
                      "device": str(jax.devices()[0])}), flush=True)

    stop = threading.Event()

    def publisher():
        e = 2
        while not stop.is_set():
            time.sleep(args.republish)
            w.publish(state(e), e)
            pub_times.append(time.time())
            e += 1

    calm, storm, errors = [], [], []
    lock = threading.Lock()

    def client(cid):
        rng = np.random.default_rng(1000 + cid)
        s = socket.create_connection(addr)
        f = s.makefile("rw")
        my_calm, my_storm = [], []
        deadline = time.time() + args.duration
        while time.time() < deadline:
            kind = rng.integers(0, 8)
            u = int(rng.integers(0, nu))
            if kind <= 3:
                line = str(u)
            elif kind == 4:
                line = "batch:" + ",".join(
                    str(int(x)) for x in rng.integers(0, nu, 4))
            elif kind == 5:
                line = f"similar:{int(rng.integers(0, ni))}"
            elif kind == 6:
                line = f"predict:{u}:" + ",".join(
                    str(int(x)) for x in rng.integers(0, ni, 3))
            else:
                line = f"exclude:{u}:{int(rng.integers(0, ni))}"
            t0 = time.time()
            f.write(line + "\n")
            f.flush()
            r = json.loads(f.readline())
            dt = time.time() - t0
            if "error" in r:
                with lock:
                    errors.append(r)
            in_storm = any(t0 - p < args.storm_window for p in
                           pub_times[-3:])
            (my_storm if in_storm else my_calm).append(dt)
        f.close()
        s.close()
        with lock:
            calm.extend(my_calm)
            storm.extend(my_storm)

    threads = [threading.Thread(target=client, args=(c,), daemon=True)
               for c in range(args.clients)]
    t0 = time.time()
    pub = threading.Thread(target=publisher, daemon=True)
    pub.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    wall = time.time() - t0

    s = socket.create_connection(addr)
    f = s.makefile("rw")
    f.write("stats\n")
    f.flush()
    st = json.loads(f.readline())
    f.close()
    s.close()
    total = len(calm) + len(storm)
    print(json.dumps({
        "event": "soak", "duration_s": round(wall, 1),
        "clients": args.clients, "republish_s": args.republish,
        "republishes": len(pub_times), "requests": total,
        "req_per_s": round(total / wall, 1), "errors": len(errors),
        "calm": {"n": len(calm), "p50_ms": round(pctl(calm, 50), 2),
                 "p99_ms": round(pctl(calm, 99), 2)},
        "storm": {"n": len(storm),
                  "p50_ms": round(pctl(storm, 50), 2) if storm else None,
                  "p99_ms": round(pctl(storm, 99), 2) if storm else None},
        "server_epoch": st["epoch"],
        "server_latency": st["latency"]}), flush=True)

    srv.shutdown()
    srv.server_close()
    app.close()
    rec.close()
    cache.close()
    w.close()
    from ycnr_tpu.native import get_cache_lib, get_shm_lib

    get_shm_lib().ycnr_shm_unlink(shm_name.encode())
    get_cache_lib().ycnr_cache_unlink(cache_name.encode())


if __name__ == "__main__":
    main()

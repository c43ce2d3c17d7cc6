"""What is the MINIMAL program that absorbs the per-process upload wall?

tools/probe_upload_warm.py established (runs/probes/upload_warm.json):
the first scan-ladder epoch program in a process pays a ~440 s wall, and
every later program — 7x bigger included — first-executes in seconds.
Round-3 sessions also showed plain jits (init_state, a 2048^2 matmul) do
NOT absorb it. This probe brackets the trigger so the production warm
(ycnr_tpu/utils/warmup.py) can be as cheap as possible:

  solve : jit(guarded_batched_solve) on [16, 64, 64] f32 — the Pallas
          batch-Cholesky custom call and nothing else (~1 s compile)
  scan  : one lax.scan over 2 blocks of gather+Gram+scatter, NO Pallas
  epoch : an 8-group distinct scan-ladder epoch WITH the Pallas solve
          (known wall-payer class)

Run stages in --order; whichever stage first pays hundreds of seconds is
the wall's trigger class, and everything after it measures what a
warmed process looks like. Two informative orders, each a fresh process:

  python tools/probe_wall_trigger.py --order solve,epoch
      epoch fast afterwards => the Pallas custom call is a sufficient
      trigger; warm = one tiny solve.
  python tools/probe_wall_trigger.py --order scan,epoch
      epoch still slow => the trigger is specifically Pallas, not scans.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _sync(x):
    import jax

    return float(jax.device_get(jnp_ravel0(x)))


def jnp_ravel0(x):
    return x.reshape(-1)[0]


def stage_solve(rank: int):
    import jax
    import jax.numpy as jnp

    from ycnr_tpu.ops.gram import guarded_batched_solve

    f = jax.jit(lambda A, b, reg: guarded_batched_solve(A, b, reg))
    A = jnp.eye(rank, dtype=jnp.float32)[None] * 2.0
    A = jnp.tile(A, (16, 1, 1))
    b = jnp.ones((16, rank), jnp.float32)
    reg = jnp.ones((16,), jnp.float32)
    t0 = time.time()
    out = f(A, b, reg)
    _sync(out)
    first = time.time() - t0
    t0 = time.time()
    _sync(f(A, b, reg))
    return {"first_exec_s": round(first, 2),
            "second_exec_s": round(time.time() - t0, 3)}


def stage_scan(rank: int):
    """One scan of gather + Gram einsum + scatter — the epoch's structure
    minus the Pallas solve (plain XLA ops only)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    NB, NE, R = 2, 64, 32
    n_other = 512
    rng = np.random.default_rng(0)
    oi = jnp.asarray(rng.integers(0, n_other, (NB, NE, R), np.int32))
    rr = jnp.asarray(rng.random((NB, NE, R), np.float32))
    eid = jnp.asarray((np.arange(NB * NE) % (NB * NE)).reshape(NB, NE)
                      .astype(np.int32))
    F = jnp.asarray(rng.random((n_other + 1, rank), np.float32))
    E0 = jnp.zeros((NB * NE + 1, rank), jnp.float32)

    @jax.jit
    def f(E, F):
        def body(Ec, blk):
            o, r, e = blk
            Fg = F[o]
            A = jnp.einsum("urk,urm->ukm", Fg, Fg,
                           preferred_element_type=jnp.float32)
            rows = jnp.einsum("urk,ur->uk", Fg, r,
                              preferred_element_type=jnp.float32)
            rows = rows + jnp.sum(A, axis=2) * 1e-30
            return Ec.at[e].set(rows), None

        E, _ = lax.scan(body, E, (oi, rr, eid))
        return E

    t0 = time.time()
    _sync(f(E0, F))
    first = time.time() - t0
    t0 = time.time()
    _sync(f(E0, F))
    return {"first_exec_s": round(first, 2),
            "second_exec_s": round(time.time() - t0, 3)}


def stage_epoch(rank: int):
    from probe_progsize import compile_epoch, make_groups

    G, nb, ne, R = 8, 8, 256, 64
    n_entities = G * nb * ne
    n_other = 4096
    ug = make_groups(G, nb, ne, R, n_entities, n_other, uniform_R=False,
                     seed=7)
    other = make_groups(2, 4, 128, R, n_other, n_entities, uniform_R=True,
                        seed=107)
    compiled, (st, ugd, igd), info = compile_epoch(
        ug, other, n_entities, n_other, rank)
    import jax

    t0 = time.time()
    out = compiled(st, ugd, igd)
    float(jax.device_get(out.U[0, 0]))
    info["first_exec_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    out = compiled(out, ugd, igd)
    float(jax.device_get(out.U[0, 0]))
    info["second_exec_s"] = round(time.time() - t0, 3)
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", default="solve,epoch")
    ap.add_argument("--rank", type=int, default=64)
    args = ap.parse_args()
    stages = {"solve": stage_solve, "scan": stage_scan,
              "epoch": stage_epoch}
    out = []
    for name in args.order.split(","):
        name = name.strip()
        info = stages[name](args.rank)
        info["label"] = name
        print(f"{name}: {info}", file=sys.stderr, flush=True)
        out.append(info)
    print(json.dumps({"order": args.order, "rank": args.rank,
                      "stages": out}))


if __name__ == "__main__":
    main()

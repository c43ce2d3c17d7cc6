"""One-program hyperparameter sweep for ALS-WR / iALS.

The reference is a study engine: exploring rank/lambda/alpha means re-running
`node train` once per config (SURVEY.md §1 L6, C14 config module). A naive
port of that loop is punishing on this hardware — `lam` is a static arg of
the epoch programs, so every config would recompile AND re-upload the epoch
executable through the remote-TPU tunnel (minutes each at ML-20M scale,
docs/KERNELS.md "first-epoch wall").

The TPU-native sweep instead makes the hyperparameters DATA: stack the S
models' states on a leading axis, pass lambda/alpha as traced [S] vectors,
and run `lax.map` over the model axis inside ONE jitted program (sequential
on device, so peak temp memory stays one model's worth; the rating layouts
are shared, traced once). Every config then trains at steady-state epoch
speed with zero per-config compiles, and the per-epoch held-out RMSE
trajectories come back as one [S, E] array.

SGD is excluded: its trainer bakes lr/lam/schedule into a stateful scan and
a sweep there is better served by the stream trainer's cheap epochs.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ycnr_tpu.config import RunConfig
from ycnr_tpu.data.dataset import Dataset, load_dataset
from ycnr_tpu.models.base import MFState, init_state, zero_cold_entities
from ycnr_tpu.models.bucketed_phase import (
    _epochs_fused,
    device_bucketed,
    phase_bucketed,
)
from ycnr_tpu.ops.bucketed import build_bucketed


@dataclass
class TuneResult:
    leaderboard: list  # dicts sorted best-first (see tune() for keys)
    best: dict
    best_state: MFState
    dataset: Dataset


@partial(jax.jit, static_argnames=("n_epochs", "implicit", "gather_bf16"),
         donate_argnums=(0,))
def _sweep_program(states: MFState, lams, alphas, user_groups, item_groups,
                   test_coo, n_epochs: int, implicit: bool,
                   gather_bf16: bool = False):
    """states: MFState pytree with a leading model axis [S, ...]; lams /
    alphas: [S]. Returns (final stacked states, rmse_test [S, n_epochs])."""

    def one(args):
        st, lam, alpha = args
        if implicit:
            def epoch(s):
                GV = jnp.einsum("nk,nm->km", s.V, s.V,
                                preferred_element_type=s.V.dtype)
                U = phase_bucketed(s.U, s.V, user_groups, lam, alpha, GV,
                                   gather_bf16=gather_bf16)
                GU = jnp.einsum("nk,nm->km", U, U,
                                preferred_element_type=U.dtype)
                V = phase_bucketed(s.V, U, item_groups, lam, alpha, GU,
                                   gather_bf16=gather_bf16)
                return s._replace(U=U, V=V)
        else:
            def epoch(s):
                U = phase_bucketed(s.U, s.V, user_groups, lam,
                                   gather_bf16=gather_bf16)
                V = phase_bucketed(s.V, U, item_groups, lam,
                                   gather_bf16=gather_bf16)
                return s._replace(U=U, V=V)

        final, (rmse_t, _) = _epochs_fused(st, n_epochs, epoch, test_coo,
                                           None)
        return final, rmse_t

    return lax.map(one, (states, lams, alphas))


def _stack_states(states: Sequence[MFState]) -> MFState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def _pick_state(stacked: MFState, idx: int) -> MFState:
    return jax.tree.map(lambda x: x[idx], stacked)


def tune(cfg: RunConfig, lams: Sequence[float],
         alphas: Optional[Sequence[float]] = None,
         seeds: Sequence[int] = (0,), epochs: Optional[int] = None,
         dataset: Optional[Dataset] = None) -> TuneResult:
    """Grid sweep over lambda (x alpha for iALS) x init seed in one device
    program. Returns a leaderboard sorted by the selection metric:

    * als: final held-out RMSE, ascending;
    * ials: hit_rate@cfg.topn (host pass on up to 512 sampled test users,
      the same per-epoch metric train() logs), descending — RMSE against raw
      ratings is not meaningful for preference scores; rmse_test is still
      reported per config.

    Leaderboard entries: {lam, alpha?, seed, rmse: [E], rmse_final,
    best_epoch, hit_rate?}. The best config's trained state is returned
    (ready to checkpoint/serve). Memory: all S states stay in HBM —
    S * (n_users + n_items) * rank floats; at ML-20M rank 64 that is
    ~42 MB/model, so double-digit sweeps fit comfortably.
    """
    if cfg.algorithm not in ("als", "ials"):
        raise ValueError(
            f"tune() sweeps als/ials; got algorithm={cfg.algorithm!r} "
            "(SGD epochs bake lr into a stateful scan — sweep it by "
            "looping train() with --sgd-method stream)")
    implicit = cfg.algorithm == "ials"
    params = cfg.ials if implicit else cfg.als
    if implicit and not alphas:
        alphas = [params.alpha]
    if not lams:
        raise ValueError("tune() needs at least one lambda value")
    n_epochs = int(epochs if epochs is not None else params.epochs)
    if n_epochs <= 0:
        raise ValueError(f"epochs must be positive, got {n_epochs}")

    ds = dataset or load_dataset(cfg.data, rank_hint=params.rank)
    dtype = jnp.dtype(params.dtype)
    dul = device_bucketed(build_bucketed(
        ds.train_u, ds.train_i, ds.train_r, ds.n_users, ds.n_items,
        cfg.data.chunk_len, params.rank, max_groups=cfg.data.max_groups),
        dtype)
    dil = device_bucketed(build_bucketed(
        ds.train_i, ds.train_u, ds.train_r, ds.n_items, ds.n_users,
        cfg.data.chunk_len, params.rank, max_groups=cfg.data.max_groups),
        dtype)
    pu, pi, pr, n_test = ds.padded_test()
    test_coo = (jnp.asarray(pu), jnp.asarray(pi), jnp.asarray(pr),
                jnp.asarray(n_test))

    grid = list(itertools.product(
        [float(x) for x in lams],
        [float(a) for a in alphas] if implicit else [0.0],
        [int(s) for s in seeds]))
    states = _stack_states([
        zero_cold_entities(
            init_state(ds.n_users, ds.n_items, params.rank, seed=seed,
                       dtype=dtype),
            ds.train_u, ds.train_i)
        for _, _, seed in grid])
    lam_v = jnp.asarray([g[0] for g in grid], dtype)
    alpha_v = jnp.asarray([g[1] for g in grid], dtype)

    finals, rmse = _sweep_program(states, lam_v, alpha_v, dul, dil,
                                  test_coo, n_epochs, implicit,
                                  params.gather_dtype == "bfloat16")
    rmse = np.asarray(rmse, np.float64)  # [S, E]

    board = []
    for s, (lam, alpha, seed) in enumerate(grid):
        entry = {"lam": lam, "seed": seed,
                 "rmse": [round(float(x), 6) for x in rmse[s]],
                 "rmse_final": round(float(rmse[s, -1]), 6),
                 "best_epoch": int(np.argmin(rmse[s])) + 1}
        if implicit:
            from ycnr_tpu.eval.ranking import hit_rate_at_n

            entry["alpha"] = alpha
            entry["hit_rate"] = round(hit_rate_at_n(
                _pick_state(finals, s), ds.train_u, ds.train_i,
                ds.test_u, ds.test_i, n=cfg.topn, max_users=512), 4)
        board.append(entry)
    board.sort(key=(lambda e: -e["hit_rate"]) if implicit
               else (lambda e: e["rmse_final"]))
    best = board[0]
    pos = next(s for s, (lam, alpha, seed) in enumerate(grid)
               if lam == best["lam"] and seed == best["seed"]
               and (not implicit or alpha == best["alpha"]))
    return TuneResult(leaderboard=board, best=best,
                      best_state=_pick_state(finals, pos), dataset=ds)

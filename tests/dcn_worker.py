"""Worker process for the 2-process DCN (multi-host) smoke test.

Run by tests/test_dcn_2proc.py, once per simulated host: joins a real
`jax.distributed` rendezvous on localhost (the reference's hypothetical TCP
multi-machine mode, SURVEY.md C4 [K-low]; §5 "distributed communication
backend"), with N fake CPU devices per process, then trains over the GLOBAL
mesh via the unchanged sharded paths (parallel/shard.py, parallel/dual.py) —
the collectives really cross the process boundary (Gloo on CPU; DCN on real
pods). Results (per-epoch RMSE + a factor checksum) are written as JSON for
the parent to compare against a single-process run of the same config.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()
    import jax

    # env vars are not enough on this machine (a site hook pins the TPU
    # plugin); the config update must land before any backend init
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from ycnr_tpu.parallel import init_distributed

    pid = init_distributed(args.coordinator, args.num_processes,
                           args.process_id)
    n_global = len(jax.devices())
    assert jax.process_count() == args.num_processes, jax.process_count()

    import numpy as np

    from ycnr_tpu.train.loop import train

    result = {"process_id": pid, "process_count": jax.process_count(),
              "n_global_devices": n_global}
    for mode, cfg in sorted(configs(n_global).items()):
        r = train(cfg, out_dir=os.path.join(args.workdir, f"p{pid}", mode))
        gs = r.state
        digest = hashlib.sha256()
        for a in (gs.U, gs.V, gs.bu, gs.bi):
            digest.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        result[mode] = {"rmse": [round(float(x), 10) for x in r.rmse_history],
                        "state_sha": digest.hexdigest()}
    with open(args.out, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


def configs(n_shards: int):
    """Tiny-but-real configs, one per sharded code path. Must be identical
    in the workers and in the parent's single-process reference run."""
    from ycnr_tpu.config import (
        ALSConfig,
        BPRConfig,
        DataConfig,
        MeshConfig,
        RunConfig,
        SGDConfig,
    )

    data = DataConfig(n_users=400, n_items=120, n_ratings=6000, seed=3)
    return {
        # P1/P2: user-sharded U-step + item-Gram psum over the mesh
        "als": RunConfig(
            name="dcn-als", algorithm="als", data=data,
            als=ALSConfig(rank=8, lam=0.05, epochs=2),
            mesh=MeshConfig(n_shards=n_shards)),
        # M6 alternative: both factor axes sharded, all-gather V
        "als_dual": RunConfig(
            name="dcn-als-dual", algorithm="als", data=data,
            als=ALSConfig(rank=8, lam=0.05, epochs=2),
            mesh=MeshConfig(n_shards=n_shards, vstep_mode="item_sharded")),
        # P3: DP SGD with per-batch V-delta psum
        "sgd": RunConfig(
            name="dcn-sgd", algorithm="sgd", data=data,
            sgd=SGDConfig(rank=8, epochs=2, batch_size=512),
            mesh=MeshConfig(n_shards=n_shards)),
        # DP pairwise ranking: per-device negative draws, fused Vf psum
        "bpr": RunConfig(
            name="dcn-bpr", algorithm="bpr", data=data,
            bpr=BPRConfig(rank=8, epochs=2, batch_size=512),
            mesh=MeshConfig(n_shards=n_shards)),
    }


if __name__ == "__main__":
    sys.exit(main())

"""Test env: force JAX onto CPU with 8 fake devices BEFORE jax imports.

SURVEY.md §4 item 3: `--xla_force_host_platform_device_count=8` runs real
shard_map collectives on CPU — the JAX analog of a fake distributed backend.
Real-TPU performance is exercised by bench.py, not the unit suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

"""Test env: force JAX onto CPU with 8 fake devices BEFORE backends init.

SURVEY.md §4 item 3: `--xla_force_host_platform_device_count=8` runs real
shard_map collectives on CPU — the JAX analog of a fake distributed backend.
Real-TPU performance is exercised by bench.py, not the unit suite.

Env vars alone are not enough: pytest plugins may import jax before this
conftest, so the config is also set through jax.config (safe as long as no
backend has been initialized yet, which plugins don't do).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# x64 so parity tests can run the device path in float64 against the float64
# oracle (SURVEY.md §4 item 1); production code uses explicit float32 dtypes.
jax.config.update("jax_enable_x64", True)

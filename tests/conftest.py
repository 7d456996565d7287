"""Test harness config: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4(f));
real-TPU execution is exercised by bench.py / the driver.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

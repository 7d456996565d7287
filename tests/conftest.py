"""Test harness config: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4(f));
real-TPU execution is exercised by bench.py / the driver.
"""

import os

# Force, don't setdefault: the session environment may carry
# JAX_PLATFORMS=axon (the real-TPU tunnel), and running the suite over the
# tunnel is both slow and non-hermetic. The suite is designed for the
# virtual 8-device CPU mesh; bench.py / the driver exercise the real TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment variables above are snapshotted at the FIRST jax import —
# which a sitecustomize (e.g. the axon TPU-tunnel site) may have done before
# this file ran. config.update takes effect as long as no backend is
# initialized yet, so force the platform here too.
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

jax.config.update("jax_default_matmul_precision", "highest")

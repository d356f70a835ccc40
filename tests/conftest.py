"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's strategy of re-running the suite under mpiexec
(SURVEY.md section 4): multi-chip k-point sharding is validated on a virtual
8-device CPU mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU tunnel is set
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
# Belt and braces: a TPU-tunnel jax plugin can override JAX_PLATFORMS at
# import time; the config update below wins over that.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

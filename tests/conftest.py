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

import pathlib  # noqa: E402

import pytest  # noqa: E402

# ---- 'minimal' fast tier (reference :minimal payload) -----------------------
# tests/minimal_tier.txt lists the node IDs of a <10-minute broad smoke
# subset; run it with `pytest -m minimal`.  Regenerate the list with
# tools/make_minimal_tier.py from a --durations=0 full run.
_here = pathlib.Path(__file__).resolve().parent
_MINIMAL = {
    line.strip() for line in (_here / "minimal_tier.txt").read_text().split("\n")
    if line.strip() and not line.startswith("#")
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid
        if nodeid in _MINIMAL:
            item.add_marker(pytest.mark.minimal)

"""Test configuration: force an 8-device CPU platform so sharding/collective
paths are exercised without TPU hardware (SURVEY §4: multi-host behavior is
testable via xla_force_host_platform_device_count).

Note: this environment's sitecustomize registers a remote TPU backend and
forces jax_platforms='axon,cpu' at interpreter boot, so the env var alone is
not enough — we re-update the jax config before any backend is touched.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# Fast core-correctness tier (VERDICT r4 #9): `pytest -m smoke` covers the
# gate math, compress/export equivalence, loss numerics, and the torch
# parity checks in a few minutes; the full suite stays the merge gate.
_SMOKE_MODULES = {
    "test_search_space",
    "test_export",
    "test_loss_numerics",
    "test_torch_parity",
    "test_resilience",
    "test_run_status",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)

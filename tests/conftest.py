"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

The axon sitecustomize imports jax at interpreter startup (before pytest
loads this conftest), so env vars alone are too late — we must override via
jax.config before any backend initializes. Multi-device tests emulate a TPU
v5e-8 mesh with 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # for any subprocesses

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not marked ``full`` is ``smoke``.

    ``pytest -m smoke`` must stay fast (<~3 min on the throttled CI host);
    compile-heavy model/e2e/interop files carry a module-level ``full``
    mark. ``pytest`` with no -m runs both tiers.
    """
    for item in items:
        if "full" not in item.keywords:
            item.add_marker(pytest.mark.smoke)

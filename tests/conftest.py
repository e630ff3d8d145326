"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

The axon sitecustomize imports jax at interpreter startup (before pytest
loads this conftest), so env vars alone are too late — we must override via
jax.config before any backend initializes. Multi-device tests emulate a TPU
v5e-8 mesh with 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

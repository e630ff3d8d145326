"""Test configuration: run JAX on CPU with an 8-device virtual mesh.

Must set the env before jax initializes its backends, so this lives in the
root conftest (imported before any test module). Multi-device tests emulate
a TPU v5e-8 mesh via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

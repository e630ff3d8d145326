"""Device-mesh and sharding utilities — the framework's parallelism layer.

The reference's only parallelism is single-process torch DataParallel
scatter/gather (reference: core/scripts/train.py:22-27,112-115) plus an
unused torch.distributed volume sampler. TPU-native equivalent: a
``jax.sharding.Mesh`` over all chips with a ``data`` axis; batches are
sharded on axis 0, parameters are replicated, and XLA/GSPMD inserts the
gradient and batch-stat all-reduces over ICI automatically. The same mesh
drives distributed calibration (per-device loss shards, psum'd risk).

Everything here works identically on one real chip, a v5e-8 pod slice, or
an ``--xla_force_host_platform_device_count`` virtual CPU mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "pad_to_multiple",
]

DATA_AXIS = "data"


def data_parallel_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over (the first ``num_devices``) available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every array in ``batch`` with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k

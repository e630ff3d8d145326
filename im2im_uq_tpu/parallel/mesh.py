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

import logging
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ROUNDING_WARNED: set = set()

__all__ = [
    "data_parallel_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "pad_to_multiple",
    "mesh_batch_size",
    "put_batch",
    "fetch",
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


def mesh_batch_size(batch_size: int, mesh: Optional[Mesh]) -> int:
    """Smallest multiple of the mesh's data-axis size ≥ ``batch_size``.

    GSPMD requires the sharded batch axis to divide evenly across the
    'data' axis; batches are padded to a fixed size with a validity mask
    anyway (data.core.pad_batch), so rounding the program's batch shape up
    costs only masked padding rows — a config batch_size of 78 on an
    8-device mesh runs as 80 with 2 masked slots, instead of crashing.
    """
    if mesh is None or DATA_AXIS not in mesh.shape:
        return batch_size
    n = mesh.shape[DATA_AXIS]
    rounded = -(-batch_size // n) * n
    if rounded != batch_size and (batch_size, n) not in _ROUNDING_WARNED:
        # visible, once per (batch, mesh) pair: full batches carry more real
        # examples per step than configured — a quiet hyperparameter change
        # vs the reference's training dynamics unless surfaced
        _ROUNDING_WARNED.add((batch_size, n))
        logging.getLogger(__name__).warning(
            "batch_size %d rounded up to %d (next multiple of the %d-device "
            "data axis); final shapes are padded+masked, but full batches "
            "will contain %d real examples per step",
            batch_size, rounded, n, rounded,
        )
    return rounded


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every array in ``batch`` with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated on the mesh.

    Multi-process: committed single-device arrays can't be re-put onto a
    global sharding directly, but host numpy with a replicated sharding is
    allowed (every process holds the identical value) — so round-trip
    through numpy there.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), sharding), tree
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k


def put_batch(mesh: Optional[Mesh], *arrays: Any) -> tuple:
    """Prepare host batch arrays for a (possibly multi-process) mesh feed.

    Single process (or no mesh): pass-through — jit's ``in_shardings``
    device-puts numpy directly, no extra copy. Multi-process: jit rejects
    numpy with non-trivial shardings, so build global ``jax.Array``s via
    ``make_array_from_callback``; every process holds the identical full
    batch (the pipelines seed all processes identically) and each device
    reads only its own slice.
    """
    import jax

    if mesh is None or jax.process_count() == 1:
        return arrays
    sh = batch_sharding(mesh)
    return tuple(
        jax.make_array_from_callback(
            np.shape(a), sh, lambda idx, a=a: np.asarray(a)[idx]
        )
        for a in arrays
    )


def fetch(tree: Any) -> Any:
    """``jax.device_get`` that also works on multi-process (global) arrays.

    Single process: plain device_get. Multi-process: batch-sharded outputs
    live partly on other hosts' devices, so device_get would raise — fully
    replicated arrays read the local replica, everything else goes through
    ``multihost_utils.process_allgather`` (a collective: every process must
    call fetch on the same values in the same order, which the pipeline
    loops guarantee since all processes iterate identical batch streams).
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            if a.is_fully_replicated:
                return np.asarray(a)
            return np.asarray(multihost_utils.process_allgather(a, tiled=True))
        return jax.device_get(a)

    return jax.tree.map(get, tree)

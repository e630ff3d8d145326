"""Multi-host (multi-process) initialization and cross-host utilities.

The reference has no distributed backend at all (SURVEY.md §2 #21: its only
cross-GPU traffic is single-process DataParallel scatter/gather). The
TPU-native story: one JAX process per host, ``jax.distributed.initialize``
over DCN, then a global mesh whose ``data`` axis spans every chip on every
host; GSPMD emits all collectives (gradients/batch stats over ICI within a
slice, DCN across slices). Input pipelines shard per host with
``VolumeShardSampler`` (volume locality) or plain index striding.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["init_distributed", "process_shard_info", "global_mesh"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX (no-op for a single process).

    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU multi-process testing.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:  # already initialized / single host
        print(f"jax.distributed.initialize skipped: {e}")


def process_shard_info() -> tuple[int, int]:
    """(process_index, process_count) for host-side data sharding."""
    import jax

    return jax.process_index(), jax.process_count()


def global_mesh(axis_name: str = "data"):
    """1-D mesh over every chip across all hosts (data parallel)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))

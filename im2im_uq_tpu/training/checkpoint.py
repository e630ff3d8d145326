"""Checkpoint save/restore with the reference's filename contract.

The reference pickles the whole nn.Module per epoch as
``CP_epoch{e}_{dataset}_{uq}_{bs}_{lr}_{innorm}_{outnorm}.pth`` and resumes
by probing the final epoch then scanning downward (reference:
core/scripts/train.py:80-98,183-195). Whole-module pickling has no JAX
equivalent; instead we serialize an explicit (params, batch_stats,
opt_state, lhat, epoch) tree, keeping the same config-keyed filename
scheme and the same resume scan.

Two interchangeable backends (config key ``checkpoint_backend``):

- ``flax`` (default): one msgpack file per checkpoint — simple, portable,
  single-host.
- ``orbax``: an Orbax StandardCheckpointer directory per checkpoint —
  sharding-aware multi-host saves (each host writes its shards; restore
  re-shards to the live mesh) and optional async writes that overlap the
  next training epoch (``save_checkpoint(..., backend="orbax",
  async_save=True)``).

``find_resume_checkpoint`` and ``restore_checkpoint`` accept either layout
transparently (a ``.msgpack`` file or an Orbax directory at the same stem).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import serialization

__all__ = [
    "checkpoint_key",
    "checkpoint_path",
    "calibrated_checkpoint_path",
    "save_checkpoint",
    "restore_checkpoint",
    "find_resume_checkpoint",
    "wait_for_async_saves",
    "midepoch_checkpoint_path",
    "save_midepoch_checkpoint",
    "restore_midepoch_checkpoint",
]


def checkpoint_key(config: dict) -> str:
    """Config-keyed filename stem (same fields as reference train.py:81)."""
    return "_".join(
        [
            str(config["dataset"]),
            str(config["uncertainty_type"]),
            str(config["batch_size"]),
            str(config["lr"]),
            str(config["input_normalization"]),
            str(config["output_normalization"]).replace(".", "_"),
        ]
    )


def _suffix(backend: str) -> str:
    return ".orbax" if backend == "orbax" else ".msgpack"


def checkpoint_path(
    checkpoint_dir: str, epoch: int, config: dict, backend: Optional[str] = None
) -> str:
    backend = backend or config.get("checkpoint_backend", "flax")
    return os.path.join(
        checkpoint_dir, f"CP_epoch{epoch}_{checkpoint_key(config)}{_suffix(backend)}"
    )


def calibrated_checkpoint_path(
    checkpoint_dir: str, config: dict, backend: Optional[str] = None
) -> str:
    """Post-calibration artifact carrying λ̂ — the serving entry point.

    The reference has no such artifact (λ̂ only lives on the in-memory
    module after calibrate_model, add_uncertainty.py:48-49); scripts.infer
    consumes this one.
    """
    backend = backend or config.get("checkpoint_backend", "flax")
    return os.path.join(
        checkpoint_dir, f"CP_calibrated_{checkpoint_key(config)}{_suffix(backend)}"
    )


def save_calibrated_checkpoint(uq_state, config: dict, checkpoint_dir: str) -> str:
    """Write the λ̂-bearing serving artifact for a calibrated UQState.

    Single source of truth for the serving-artifact layout (a TrainState
    with a fresh optimizer state, tagged with the config's epoch count) —
    used by both the router and the calibrate-only CLI. Honors
    ``checkpoint_backend`` (orbax saves take the live, possibly sharded,
    arrays; msgpack fetches to host first).
    """
    import jax
    import optax

    from im2im_uq_tpu.training.train import TrainState

    params = uq_state.variables["params"]
    ts = TrainState(
        params=params,
        batch_stats=uq_state.variables.get("batch_stats", {}),
        opt_state=optax.adam(float(config.get("lr", 1e-3))).init(params),
        step=jnp.zeros((), jnp.int32),
    )
    path = calibrated_checkpoint_path(checkpoint_dir, config)
    if not path.endswith(".orbax"):
        ts = jax.device_get(ts)
    save_checkpoint(path, ts, uq_state.lhat, int(config.get("epochs", 0)))
    return path


def _pack(train_state, lhat: Optional[float], epoch: int) -> dict:
    return {
        "params": train_state.params,
        "batch_stats": train_state.batch_stats,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "lhat": np.asarray(math.nan if lhat is None else lhat, np.float64),
        "epoch": np.asarray(epoch, np.int64),
    }


_async_checkpointer = None  # lazily built; reused so saves can overlap epochs


def _orbax_checkpointer(async_save: bool):
    global _async_checkpointer
    import orbax.checkpoint as ocp

    if not async_save:
        return ocp.StandardCheckpointer()
    if _async_checkpointer is None:
        _async_checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_checkpointer


def wait_for_async_saves() -> None:
    """Block until every in-flight orbax async save has committed."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def save_checkpoint(
    path: str,
    train_state,
    lhat: Optional[float],
    epoch: int,
    async_save: bool = False,
) -> None:
    """Write a checkpoint; the backend is inferred from the path suffix.

    ``.orbax`` paths save through Orbax (sharding-aware; pass
    ``async_save=True`` to overlap the write with compute — call
    ``wait_for_async_saves()`` before reading it back). Everything else
    writes the single-file flax msgpack layout.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tree = _pack(train_state, lhat, epoch)
    if path.endswith(".orbax"):
        ckptr = _orbax_checkpointer(async_save)
        ckptr.save(os.path.abspath(path), tree, force=True)
        if not async_save:
            ckptr.wait_until_finished()
        return
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, train_state) -> tuple[Any, Optional[float], int]:
    """Restore into the structure of ``train_state``; returns (state, lhat, epoch).

    Accepts either backend layout: an Orbax directory or a msgpack file.
    """
    target = _pack(train_state, None, 0)
    # an in-flight async save only renames its tmp dir to `path` on commit —
    # wait BEFORE probing the path or a pending orbax save looks absent
    wait_for_async_saves()
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), target)
    else:
        with open(path, "rb") as fh:
            restored = serialization.from_bytes(target, fh.read())
    new_state = train_state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )
    lhat = float(restored["lhat"])
    return new_state, (None if math.isnan(lhat) else lhat), int(restored["epoch"])


def midepoch_checkpoint_path(checkpoint_dir: str, config: dict) -> str:
    """Rolling mid-epoch checkpoint (always msgpack — carries host-side
    input-pipeline state alongside the model tree, no sharded arrays)."""
    return os.path.join(
        checkpoint_dir, f"CP_midepoch_{checkpoint_key(config)}.msgpack"
    )


def save_midepoch_checkpoint(
    path: str,
    train_state,
    lhat: Optional[float],
    epoch: int,
    data_state: dict,
    progress: dict,
) -> None:
    """Write a mid-epoch checkpoint: model tree + input-pipeline state.

    ``data_state`` is the grain iterator's JSON-serializable ``get_state()``
    dict; ``progress`` carries the epoch-loss accounting accumulated so far
    (sum_loss, num_examples, steps) so a resumed epoch reports the same
    train_loss it would have uninterrupted. The reference has no mid-epoch
    resume at all (its resume granularity is whole epochs,
    core/scripts/train.py:80-98); this is the preemption-safe extension.
    """
    import json

    tree = _pack(train_state, lhat, epoch)
    tree["data_state"] = np.frombuffer(
        json.dumps(data_state).encode(), dtype=np.uint8
    ).copy()
    tree["progress"] = np.frombuffer(
        json.dumps(progress).encode(), dtype=np.uint8
    ).copy()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def restore_midepoch_checkpoint(
    path: str, train_state
) -> tuple[Any, Optional[float], int, dict, dict]:
    """Restore a mid-epoch checkpoint → (state, lhat, epoch, data_state, progress)."""
    import json

    target = _pack(train_state, None, 0)
    target["data_state"] = np.zeros((0,), np.uint8)
    target["progress"] = np.zeros((0,), np.uint8)
    with open(path, "rb") as fh:
        restored = serialization.from_bytes(target, fh.read())
    new_state = train_state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )
    lhat = float(restored["lhat"])
    data_state = json.loads(np.asarray(restored["data_state"]).tobytes().decode())
    progress = json.loads(np.asarray(restored["progress"]).tobytes().decode())
    return (
        new_state,
        (None if math.isnan(lhat) else lhat),
        int(restored["epoch"]),
        data_state,
        progress,
    )


def find_resume_checkpoint(
    checkpoint_dir: str, epochs: int, config: dict
) -> tuple[Optional[str], int]:
    """(path, starting_epoch): final-epoch checkpoint first, else scan downward.

    Mirrors the reference's resume probe order (train.py:80-98): the final
    checkpoint resumes with starting_epoch == epochs (training is a no-op);
    an intermediate CP_epoch{e} resumes from epoch e. Both backend layouts
    are probed (configured backend first).
    """
    first = config.get("checkpoint_backend", "flax")
    backends = (first,) + (("orbax",) if first != "orbax" else ("flax",))
    for b in backends:
        final = checkpoint_path(checkpoint_dir, epochs, config, backend=b)
        if os.path.exists(final):
            return final, epochs
    for e in reversed(range(epochs)):
        for b in backends:
            p = checkpoint_path(checkpoint_dir, e, config, backend=b)
            if os.path.exists(p):
                return p, e
    return None, 0

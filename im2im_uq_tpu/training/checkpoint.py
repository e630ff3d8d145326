"""Checkpoint save/restore with the reference's filename contract.

The reference pickles the whole nn.Module per epoch as
``CP_epoch{e}_{dataset}_{uq}_{bs}_{lr}_{innorm}_{outnorm}.pth`` and resumes
by probing the final epoch then scanning downward (reference:
core/scripts/train.py:80-98,183-195). Whole-module pickling has no JAX
equivalent; instead we serialize an explicit (params, batch_stats,
opt_state, lhat, epoch) tree as a single msgpack file, keeping the same
config-keyed filename scheme and the same resume scan.
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


def checkpoint_path(checkpoint_dir: str, epoch: int, config: dict) -> str:
    return os.path.join(
        checkpoint_dir, f"CP_epoch{epoch}_{checkpoint_key(config)}.msgpack"
    )


def calibrated_checkpoint_path(checkpoint_dir: str, config: dict) -> str:
    """Post-calibration artifact carrying λ̂ — the serving entry point.

    The reference has no such artifact (λ̂ only lives on the in-memory
    module after calibrate_model, add_uncertainty.py:48-49); scripts.infer
    consumes this one.
    """
    return os.path.join(
        checkpoint_dir, f"CP_calibrated_{checkpoint_key(config)}.msgpack"
    )


def _pack(train_state, lhat: Optional[float], epoch: int) -> dict:
    return {
        "params": train_state.params,
        "batch_stats": train_state.batch_stats,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
        "lhat": np.float64(math.nan if lhat is None else lhat),
        "epoch": np.int64(epoch),
    }


def save_checkpoint(path: str, train_state, lhat: Optional[float], epoch: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.to_bytes(_pack(train_state, lhat, epoch))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, train_state) -> tuple[Any, Optional[float], int]:
    """Restore into the structure of ``train_state``; returns (state, lhat, epoch)."""
    with open(path, "rb") as fh:
        restored = serialization.from_bytes(_pack(train_state, None, 0), fh.read())
    new_state = train_state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]),
    )
    lhat = float(restored["lhat"])
    return new_state, (None if math.isnan(lhat) else lhat), int(restored["epoch"])


def find_resume_checkpoint(
    checkpoint_dir: str, epochs: int, config: dict
) -> tuple[Optional[str], int]:
    """(path, starting_epoch): final-epoch checkpoint first, else scan downward.

    Mirrors the reference's resume probe order (train.py:80-98): the final
    checkpoint resumes with starting_epoch == epochs (training is a no-op);
    an intermediate CP_epoch{e} resumes from epoch e.
    """
    final = checkpoint_path(checkpoint_dir, epochs, config)
    if os.path.exists(final):
        return final, epochs
    for e in reversed(range(epochs)):
        p = checkpoint_path(checkpoint_dir, e, config)
        if os.path.exists(p):
            return p, e
    return None, 0

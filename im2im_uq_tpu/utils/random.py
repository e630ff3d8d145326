"""Deterministic seeding across every RNG the pipeline touches.

Counterpart of the reference's fix_randomness (reference: core/utils.py:15-19,
which seeds numpy/torch/cuda/random). In JAX the device-side randomness is
explicit (keys), so this seeds the host RNGs used by data splitting/shuffling
and returns a root jax PRNG key for parameter init.
"""

from __future__ import annotations

import random

import jax
import numpy as np

__all__ = ["fix_randomness"]


def fix_randomness(seed: int = 0) -> jax.Array:
    """Seed numpy + python RNGs; return the root jax key for model init."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)

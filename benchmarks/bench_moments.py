"""Microbench: per-channel moments (BN statistics) — XLA vs Pallas.

The train-step profile shows per-channel reduction fusions (BN stats +
dgamma/dbeta) at ~25% of device time, running well below HBM streaming
speed. This probes whether a Pallas accumulation kernel closes the gap.
Run on the real chip: PYTHONPATH=... python benchmarks/bench_moments.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from im2im_uq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 32, 320, 320, 64
ROWS_PER_STEP = 8  # (B*H*W) rows of C channels per grid step, x128 lanes


def xla_moments(x):
    x32 = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s = jnp.sum(x32, axis=(0, 1, 2))
    ss = jnp.sum(x32 * x32, axis=(0, 1, 2))
    return s / n, ss / n - (s / n) ** 2


def _moments_kernel(x_ref, sum_ref, sq_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(x, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(x * x, axis=0, keepdims=True)


def pallas_moments(x, tile_rows=2048):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    c = x.shape[-1]
    flat = x.reshape(n, c)
    pad = (-n) % tile_rows
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    grid = (flat.shape[0] // tile_rows,)
    s, ss = pl.pallas_call(
        _moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
    )(flat)
    mean = s[0] / n
    return mean, ss[0] / n - mean * mean


def timeit(fn, x, label):
    f = jax.jit(fn)
    out = f(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 10)
    gb = x.size * x.dtype.itemsize / 1e9
    print(f"{label:24s} {best*1e3:8.3f} ms   {gb/best:7.1f} GB/s effective")
    return out


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            np.random.RandomState(0).randn(B, H, W, C), dtype
        )
        print(f"--- {dtype.__name__} ({B}x{H}x{W}x{C}) ---")
        m1 = timeit(xla_moments, x, "xla sum/sumsq")
        m2 = timeit(pallas_moments, x, "pallas accumulate")
        np.testing.assert_allclose(
            np.asarray(m1[0]), np.asarray(m2[0]), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(m1[1]), np.asarray(m2[1]), rtol=1e-2, atol=1e-3
        )


if __name__ == "__main__":
    main()

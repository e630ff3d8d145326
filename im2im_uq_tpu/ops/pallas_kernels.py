"""Pallas TPU kernels for the calibration hot path.

The RCPS loss table is the framework's hottest non-conv computation: for N
examples × P pixels × L lambdas, count the pixels outside the λ-scaled
interval. The XLA 'direct' path (ops/sets.py) scans λ and re-reads the four
per-pixel maps from HBM once per λ — O(L) HBM passes (~52 GB for the
FastMRI-scale benchmark). This kernel tiles pixels into VMEM once per
λ-block and sweeps the λ grid on the VPU, reducing HBM traffic to
O(L / LAM_BLOCK) passes while preserving the direct method's exact
comparison semantics (strict inequalities, 1e-6 collapse guards —
reference core/calibration/calibrate_model.py:76-80 composed with
core/models/add_uncertainty.py:33-38).

Grid layout: (example tiles, λ blocks, pixel tiles) with pixels innermost,
so the (Bt, Lt) output block stays resident in VMEM across the pixel sweep
and the per-pixel maps stream through double-buffered DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from im2im_uq_tpu.ops.sets import COLLAPSE_EPS, IntervalParams

__all__ = ["loss_table_pallas"]

EXAMPLE_TILE = 8  # sublane-aligned examples per grid cell
LAM_BLOCK = 128  # λ columns per grid cell (statically unrolled; lane-aligned)
PIXEL_TILE = 2048  # pixels streamed through VMEM per step


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def _loss_table_kernel(
    lam_ref,  # (1, L_pad) SMEM — the full λ grid (indexed by block offset)
    pred_ref,  # (EXAMPLE_TILE, PIXEL_TILE) VMEM
    label_ref,  # (EXAMPLE_TILE, PIXEL_TILE) VMEM
    dl_ref,  # (EXAMPLE_TILE, PIXEL_TILE) VMEM
    du_ref,  # (EXAMPLE_TILE, PIXEL_TILE) VMEM
    out_ref,  # (EXAMPLE_TILE, LAM_BLOCK) VMEM — miss counts
):
    p = pl.program_id(2)
    lam_offset = pl.program_id(1) * LAM_BLOCK

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pred = pred_ref[:]
    a = pred - label_ref[:]  # >0 where the label is below the prediction
    b = -a
    dl = dl_ref[:]
    du = du_ref[:]
    miss_lo_possible = a > COLLAPSE_EPS
    miss_hi_possible = b > COLLAPSE_EPS

    # static unroll over the λ block — Pallas TPU has no scatter, so build the
    # (EXAMPLE_TILE, LAM_BLOCK) count tile as a stack of per-λ row reductions
    counts = []
    for i in range(LAM_BLOCK):
        lam = lam_ref[0, lam_offset + i]
        # missed ⟺ max(λ·slope, eps) < residual, split into the two guards
        miss = (miss_lo_possible & (lam * dl < a)) | (
            miss_hi_possible & (lam * du < b)
        )
        counts.append(jnp.sum(miss.astype(jnp.float32), axis=1))
    out_ref[:] += jnp.stack(counts, axis=1)


def _pad_to(x: jax.Array, axis: int, multiple: int, value=0.0) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _loss_table_padded(pred, label, dl, du, lam, interpret=False):
    n_pad, p_pad = pred.shape
    l_pad = lam.shape[0]
    grid = (n_pad // EXAMPLE_TILE, l_pad // LAM_BLOCK, p_pad // PIXEL_TILE)
    pixel_spec = pl.BlockSpec(
        (EXAMPLE_TILE, PIXEL_TILE),
        lambda nb, lb, pb: (nb, pb),
        memory_space=pltpu.VMEM,
    )
    counts = pl.pallas_call(
        _loss_table_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l_pad), lambda nb, lb, pb: (0, 0), memory_space=pltpu.SMEM),
            pixel_spec,
            pixel_spec,
            pixel_spec,
            pixel_spec,
        ],
        out_specs=pl.BlockSpec(
            (EXAMPLE_TILE, LAM_BLOCK),
            lambda nb, lb, pb: (nb, lb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, l_pad), jnp.float32),
        interpret=interpret,
    )(lam[None, :], pred, label, dl, du)
    return counts


def loss_table_pallas(
    params: IntervalParams,
    labels: jax.Array,
    lam_grid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """(N, L) fraction-missed table — Pallas single-HBM-pass implementation.

    Matches ops.sets.rcps_loss_table(method='direct') (same strict
    comparisons; on real hardware FMA contraction can flip an exact
    λ·slope == residual tie for ~1 pixel in 1e5) with ~L/LAM_BLOCK× less
    HBM traffic. Measured on v5e at B=32, 320², L=1000: 13.7 ms vs 102 ms
    XLA direct, with a ~4 s compile vs minutes. ``interpret=True`` runs the
    kernel in the Pallas interpreter; off-TPU backends interpret
    automatically so the kernel is callable anywhere (e.g. under a virtual
    CPU mesh in the multi-device tests).
    """
    interpret = interpret or not _on_tpu()
    n = labels.shape[0]
    num_px = int(np.prod(labels.shape[1:]))
    flat = lambda x: x.reshape(n, -1).astype(jnp.float32)
    pred, label, dl, du = (
        flat(params.pred),
        flat(labels),
        flat(params.dl),
        flat(params.du),
    )
    # pad pixels with pred == label (never missed), examples and λ get sliced off
    pred, label, dl, du = (
        _pad_to(_pad_to(x, 1, PIXEL_TILE), 0, EXAMPLE_TILE) for x in (pred, label, dl, du)
    )
    lam = _pad_to(jnp.asarray(lam_grid, jnp.float32), 0, LAM_BLOCK)
    counts = _loss_table_padded(pred, label, dl, du, lam, interpret=interpret)
    return counts[:n, : lam_grid.shape[0]] / num_px

"""Production Pallas 3×3 convolution for the UNet hot path (TPU).

The UNet trunk is conv-dominated (reference: core/models/trunks/
unet_parts.py:8-25 — every block is conv3x3 → BN → ReLU ×2). XLA's conv on
v5e runs at only ~104–179 GB/s effective HBM bandwidth at these shapes
(benchmarks/bench_pallas_conv.py), far off the ~800 GB/s roofline; the
double-buffered Pallas kernel here beats it at every aligned UNet level
(160²×128: 2.05 vs 2.34 ms; 80²×256 par; 40²×512 −6%).

Kernel design (per benchmarks/bench_pallas_conv.py, promoted to production):
  - NHWC, stride 1, same-padding; input pre-padded by 1 row/col of zeros.
  - Grid (batch, row-tiles). Each cell DMAs a (tile_h+2, Wp, C) slab of
    rows from HBM into a VMEM scratch buffer — double-buffered so tile
    t+1's rows stream in while tile t computes.
  - The 3×3 conv is 9 shifted (tile_h·W, Cin) @ (Cin, Cout) MXU matmuls
    accumulated in f32; bias is added in-register before the single store.
  - Weights live in VMEM once (blocked over the whole grid).

Eligibility: Cin a multiple of 128 (the TPU lane width — Mosaic's sliced
DMA constraint), H divisible by the row tile. The UNet's C=64 levels are
handled by zero-padding channels to 128 (2× input traffic but still ~2×
faster than XLA's conv at those shapes); everything else falls back to
``lax.conv_general_dilated``.

Differentiation: ``conv3x3`` carries a custom VJP.
  - dx is itself a 3×3 same-padding conv of the cotangent with the
    spatially-flipped, transposed kernel — it reuses THIS kernel.
  - dw is the standard wgrad-as-conv contraction over (B, H, W), left to
    XLA (a single large matmul-like conv, MXU-bound, which XLA handles
    well).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_pallas_raw", "pallas_conv_eligible"]

LANE = 128  # TPU lane width: minor-dim alignment for Mosaic sliced DMA


def _pick_row_tile(h: int) -> Optional[int]:
    """Largest row tile ≤16 that divides H (8 preferred; benchmarked)."""
    for th in (8, 10, 16, 5, 4):
        if h % th == 0:
            return th
    return None


def pallas_conv_eligible(shape, cin: int, dtype) -> bool:
    """Can conv3x3 run the Pallas kernel for this (padded) input?"""
    _, h, w, _ = shape
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if cin % LANE != 0:
        return False
    return _pick_row_tile(h) is not None


def _conv_kernel_db(
    x_hbm, w_ref, b_ref, out_ref, scratch, sems, *, th, w, cin, cout, n_tiles
):
    """Double-buffered 3×3 conv tile kernel (see module docstring)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    def copy(tile, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(tile * th, th + 2)], scratch.at[slot], sems.at[slot]
        )

    @pl.when(t == 0)
    def _():
        copy(0, 0).start()

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t + 1 < n_tiles)
    def _():
        copy(t + 1, nxt).start()

    copy(t, slot).wait()
    x = scratch[slot]
    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x[dh : dh + th, dw : dw + w, :].reshape(th * w, cin)
            acc += jax.lax.dot_general(
                xs,
                w_ref[dh, dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[0].astype(jnp.float32)
    out_ref[:] = acc.reshape(1, th, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pallas_raw(x, kernel, bias, interpret=False):
    """NHWC 3×3 same-padding conv + bias via the double-buffered kernel.

    Requires ``pallas_conv_eligible(x.shape, x.shape[-1], x.dtype)``.
    """
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_row_tile(h)
    assert th is not None and cin % LANE == 0, (x.shape, kernel.shape)
    # Mosaic DMA slices need the W dim 8-aligned; over-pad the right edge
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    kfn = functools.partial(
        _conv_kernel_db, th=th, w=w, cin=cin, cout=cout, n_tiles=h // th
    )
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 3, cin, cout), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, kernel, bias.reshape(1, cout).astype(kernel.dtype))


def _conv3x3_xla(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def _pad_channels(x, kernel, cin: int):
    """Zero-pad Cin up to the lane width (extra channels contribute 0).

    Only worth it when the pad factor is ≤2 (i.e. Cin ≥ 64, the UNet's
    level-1 channel count): padded input traffic doubles but the Pallas
    kernel still beats XLA's ~8 ms conv at 320²×64. Tiny Cin (the
    1-channel stem) stays on XLA.
    """
    if cin % LANE == 0 or cin < LANE // 2:
        return x, kernel
    pad = -(-cin // LANE) * LANE - cin
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, kernel


def _on_tpu() -> bool:
    """True when the default backend compiles Mosaic kernels natively
    (real TPU, incl. the tunneled 'axon' platform)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _conv3x3_fwd_impl(x, kernel, bias, interpret):
    cin = x.shape[-1]
    xp, kp = _pad_channels(x, kernel, cin)
    if pallas_conv_eligible(xp.shape, xp.shape[-1], xp.dtype):
        # off-TPU (CPU-mesh tests, dryrun) the kernel runs interpreted —
        # same numerics, no Mosaic compile
        return conv3x3_pallas_raw(xp, kp, bias, interpret=interpret or not _on_tpu())
    return _conv3x3_xla(x, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, kernel, bias, interpret=False):
    """3×3 same-padding NHWC conv + bias; Pallas when eligible, XLA else.

    Drop-in compute for flax ``nn.Conv(features, (3,3), padding=1)`` with
    a custom VJP: dgrad reuses the Pallas kernel (a 3×3 conv with the
    flipped/transposed weights), wgrad is XLA's standard contraction.
    """
    return _conv3x3_fwd_impl(x, kernel, bias, interpret)


def _conv3x3_fwd(x, kernel, bias, interpret):
    return _conv3x3_fwd_impl(x, kernel, bias, interpret), (x, kernel)


def _conv3x3_bwd(interpret, res, g):
    x, kernel = res
    # dL/dx: conv of g with the spatially-flipped kernel, cin/cout swapped —
    # routed through the same impl, so it rides the Pallas kernel too
    wt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    zero = jnp.zeros((wt.shape[-1],), wt.dtype)
    dx = _conv3x3_fwd_impl(g, wt, zero, interpret).astype(x.dtype)
    # dL/dw: wgrad as a conv contracting over (B, H, W). Dimension-number
    # strings relabel the physical NHWC tensors in place (Cin as the lhs
    # batch dim, B as its feature dim; B as the rhs input-feature dim) so
    # no physical transpose is materialized; output spatial dims collapse
    # to the 3×3 taps.
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xpad,  # physically (B, H+2, W+2, Cin), read as C H W N
        g,  # physically (B, H, W, Cout), read as I H W O
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # (Cin, 3, 3, Cout)
    dw = dw.transpose(1, 2, 0, 3).astype(kernel.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)

"""Production Pallas 3×3 convolution for the UNet hot path (TPU).

The UNet trunk is conv-dominated (reference: core/models/trunks/
unet_parts.py:8-25 — every block is conv3x3 → BN → ReLU ×2). XLA's conv on
v5e runs at only ~104–179 GB/s effective HBM bandwidth at these shapes
(benchmarks/bench_pallas_conv.py), far off the ~800 GB/s roofline; the
double-buffered Pallas kernel here beats it at every aligned UNet level
(160²×128: 2.05 vs 2.34 ms; 80²×256 par; 40²×512 −6%).

IN-CONTEXT CAVEAT (measured, STATUS.md round 2): inside the full UNet
program XLA fuses the surrounding elementwise work into fewer passes than
a pallas_call boundary allows, and end-to-end the XLA backend still wins
(eval fwd 62.6 ms xla vs 67.2 pallas vs 96.9 pallas_fused at bf16 batch
32 320²) — so ``conv_backend: auto`` resolves to xla and these kernels
are opt-in, shape-gated infrastructure.

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

Differentiation: ``conv3x3`` carries a custom VJP with BOTH gradients on
XLA-native-shaped convs — dx as a conv of the cotangent with the
spatially-flipped transposed kernel, dw as the wgrad contraction via
dimension-number relabeling. Measured (benchmarks/bench_conv_levels.py):
routing PLAIN dgrad through the forward Pallas kernel is ~1.5 ms/conv
SLOWER than XLA's native backward (the jnp.pad copy dominates), so
``conv3x3``'s backward stays on XLA. The FUSED op ``conv3x3_bn_act`` is
different: its backward carries fused BN/ReLU edges and per-channel
reductions that XLA runs as separate full-res passes, so when shapes are
eligible it routes through the dedicated wgrad/dgrad kernels in
ops/pallas_conv_bwd.py (see _fused_bwd_pallas).
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


def _conv_kernel_fused(
    x_hbm, w_ref, b_ref, ps_ref, out_ref, stats_ref, scratch, sems,
    *, th, w, h, wp, cin, cout, n_tiles, prologue, stats,
):
    """Fused variant: [BN-apply + ReLU prologue] → 3×3 conv → [per-channel
    sum/sumsq epilogue].

    The prologue applies the PREVIOUS BatchNorm's folded affine + ReLU to
    the input tile in VMEM (the normalized activation tensor never exists
    in HBM); a border mask keeps the conv's zero padding zero. The epilogue
    accumulates this conv's per-(batch, channel) output sums and
    sum-of-squares into a small revisited block — the input of the NEXT
    BatchNorm — so the full-tensor stats reduction pass disappears.
    """
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
    x = scratch[slot]  # (th+2, wp, cin), rows t*th .. t*th+th+1 of padded
    if prologue:
        scale = ps_ref[0].astype(jnp.float32)
        shift = ps_ref[1].astype(jnp.float32)
        u = jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0)
        # the padded frame must stay zero after the affine (+shift ≠ 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 0) + t * th
        cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wp, 1), 1)
        border = (rows >= 1) & (rows <= h) & (cols >= 1) & (cols <= w)
        x = jnp.where(border, u, 0.0).astype(x.dtype)
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
    ob = acc.astype(out_ref.dtype)
    out_ref[:] = ob.reshape(1, th, w, cout)
    if stats:
        of = ob.astype(jnp.float32)  # stats over the values actually stored

        @pl.when(t == 0)
        def _():
            stats_ref[0, 0] = jnp.sum(of, axis=0)
            stats_ref[0, 1] = jnp.sum(of * of, axis=0)

        @pl.when(t != 0)
        def _():
            stats_ref[0, 0] += jnp.sum(of, axis=0)
            stats_ref[0, 1] += jnp.sum(of * of, axis=0)


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


@functools.partial(
    jax.jit, static_argnames=("prologue", "stats", "interpret")
)
def _conv3x3_fused_raw(x, kernel, bias, ps, prologue, stats, interpret=False):
    """Pallas call for the fused [BN+ReLU] → conv → [stats] kernel.

    ``ps`` is the (2, cin) folded prologue (scale; shift). Returns
    (y, stats) with stats (B, 2, cout) per-batch partial sums (garbage when
    ``stats`` is False — the caller discards it).
    """
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_row_tile(h)
    assert th is not None and cin % LANE == 0, (x.shape, kernel.shape)
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    kfn = functools.partial(
        _conv_kernel_fused, th=th, w=w, h=h, wp=wp, cin=cin, cout=cout,
        n_tiles=h // th, prologue=prologue, stats=stats,
    )
    y, st = pl.pallas_call(
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
            pl.BlockSpec(
                (2, cin), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, w, cout), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # revisited across t: the per-batch stats block stays in VMEM
            # for a whole batch row of the grid
            pl.BlockSpec(
                (1, 2, cout), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, kernel, bias.reshape(1, cout).astype(kernel.dtype),
      ps.astype(jnp.float32))
    return y, st


def _fused_eligible(x, kernel):
    cin = x.shape[-1]
    if cin % LANE != 0 and cin < LANE // 2:
        return False
    pad_c = -(-cin // LANE) * LANE
    return pallas_conv_eligible(
        (x.shape[0], x.shape[1], x.shape[2], pad_c), pad_c, x.dtype
    )


def _fused_fwd_impl(x, kernel, bias, scale, shift, prologue, stats, interpret):
    """Dispatch: Pallas fused kernel when eligible, XLA composition else."""
    if _fused_eligible(x, kernel):
        cin = x.shape[-1]
        xp, kp = _pad_channels(x, kernel, cin)
        if prologue:
            pad = xp.shape[-1] - cin
            ps = jnp.stack([
                jnp.pad(scale.astype(jnp.float32), (0, pad)),
                jnp.pad(shift.astype(jnp.float32), (0, pad)),
            ])
        else:
            ps = jnp.zeros((2, xp.shape[-1]), jnp.float32)
        y, st = _conv3x3_fused_raw(
            xp, kp, bias, ps, prologue, stats,
            interpret=interpret or not _on_tpu(),
        )
        return y, st
    # XLA fallback: same math, composed ops
    a = x
    if prologue:
        a = jnp.maximum(
            a.astype(jnp.float32) * scale.astype(jnp.float32)
            + shift.astype(jnp.float32),
            0.0,
        ).astype(x.dtype)
    y = _conv3x3_xla(a, kernel, bias)
    if stats:
        yf = y.astype(jnp.float32)
        st = jnp.stack(
            [jnp.sum(yf, axis=(1, 2)), jnp.sum(yf * yf, axis=(1, 2))], axis=1
        )
    else:
        st = jnp.zeros((x.shape[0], 2, kernel.shape[-1]), jnp.float32)
    return y, st


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv3x3_bn_act(
    x, kernel, bias, scale, shift, prologue=True, stats=True, interpret=False
):
    """Fused [BN-apply+ReLU] → conv3x3+bias → [per-channel stats] op.

    The building block of the fused DoubleConv: ``scale``/``shift`` are the
    previous BatchNorm's folded affine (γ/√(σ²+ε), β−μ·γ/√(σ²+ε));
    returns (y, stats) where stats[b, 0] = Σ_hw y[b], stats[b, 1] = Σ_hw y²[b]
    — exactly what the next BatchNorm needs, with no extra HBM pass.
    Differentiable in x, kernel, bias, scale, shift (gradients flow through
    the stats outputs too, preserving true batch-norm training dynamics).
    """
    return _fused_fwd_impl(
        x, kernel, bias, scale, shift, prologue, stats, interpret
    )


def _fused_fwd(x, kernel, bias, scale, shift, prologue, stats, interpret):
    y, st = _fused_fwd_impl(
        x, kernel, bias, scale, shift, prologue, stats, interpret
    )
    return (y, st), (x, kernel, scale, shift, y)


def _fused_bwd(prologue, stats, interpret, res, cts):
    x, kernel, scale, shift, y = res
    gy, gst = cts
    # stats outputs: s_b = Σ_hw y, q_b = Σ_hw y² ⇒ dy += gs_b + 2·y·gq_b
    if stats:
        gs = gst[:, 0][:, None, None, :]
        gq = gst[:, 1][:, None, None, :]
        g_tot = (
            gy.astype(jnp.float32)
            + gs
            + 2.0 * y.astype(jnp.float32) * gq
        ).astype(gy.dtype)
    else:
        g_tot = gy
    pallas_bwd = _fused_bwd_pallas(
        x, kernel, scale, shift, g_tot, prologue, interpret
    )
    if pallas_bwd is not None:
        return pallas_bwd
    # dgrad through the conv — XLA: its native dgrad beats the Pallas
    # kernel at UNet shapes (bench_conv_levels.py; the pad copy dominates)
    wt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    zero = jnp.zeros((wt.shape[-1],), wt.dtype)
    da = _conv3x3_xla(g_tot, wt, zero).astype(jnp.float32)
    if prologue:
        u = (
            x.astype(jnp.float32) * scale.astype(jnp.float32)
            + shift.astype(jnp.float32)
        )
        m = (u > 0).astype(jnp.float32)
        dam = da * m
        dx = (dam * scale.astype(jnp.float32)).astype(x.dtype)
        dscale = jnp.sum(dam * x.astype(jnp.float32), axis=(0, 1, 2)).astype(
            scale.dtype
        )
        dshift = jnp.sum(dam, axis=(0, 1, 2)).astype(shift.dtype)
        a = jnp.maximum(u, 0.0).astype(x.dtype)
    else:
        dx = da.astype(x.dtype)
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
        a = x
    # wgrad over the activated input (dimension-number relabeling, no
    # physical transposes — see _conv3x3_bwd)
    apad = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        apad, g_tot, (1, 1), "VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3).astype(kernel.dtype)
    db = jnp.sum(g_tot.astype(jnp.float32), axis=(0, 1, 2)).astype(kernel.dtype)
    return dx, dw, db, dscale, dshift


def _fused_bwd_pallas(x, kernel, scale, shift, g_tot, prologue, interpret):
    """Pallas backward for conv3x3_bn_act (ops/pallas_conv_bwd.py), or None.

    Absorbs the XLA composition's separate full-resolution passes — the
    BN+ReLU activation recompute feeding wgrad, its pad copy, the
    ReLU-mask × BN-scale product after dgrad, and the dscale/dshift
    reductions — into the two conv passes. The spatial/channel pad of ``x``
    below is expression-identical to the forward's, so inside one jitted
    train step XLA CSEs it away; the only new materialization is the padded
    cotangent, shared by both kernels.
    """
    from im2im_uq_tpu.ops import pallas_conv_bwd as pcb

    if not _fused_eligible(x, kernel):
        return None
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    pad_cin = -(-cin // LANE) * LANE
    if not pcb.bwd_eligible(h, pad_cin, cout, x.dtype):
        return None
    xp, kp = _pad_channels(x, kernel, cin)
    pad = pad_cin - cin
    scale_p = jnp.pad(scale.astype(jnp.float32), (0, pad))
    shift_p = jnp.pad(shift.astype(jnp.float32), (0, pad))
    wp = -(-(w + 2) // 8) * 8
    frame = ((0, 0), (1, 1), (1, wp - w - 1), (0, 0))
    xq = jnp.pad(xp, frame)  # CSEs with the forward's pad
    gq = jnp.pad(g_tot, frame)
    dw, db = pcb.wgrad3x3_pallas_raw(
        xq, gq, scale_p, shift_p, w=w, prologue=prologue,
        out_dtype=jnp.float32, interpret=interpret or not _on_tpu(),
    )
    dx_p, red = pcb.dgrad3x3_pallas_raw(
        gq, xp, kp, scale_p, shift_p, prologue=prologue,
        interpret=interpret or not _on_tpu(),
    )
    dx = dx_p[..., :cin].astype(x.dtype)
    dwk = dw[:, :, :cin, :].astype(kernel.dtype)
    dbk = db.astype(kernel.dtype)
    if prologue:
        dscale = red[0, :cin].astype(scale.dtype)
        dshift = red[1, :cin].astype(shift.dtype)
    else:
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
    return dx, dwk, dbk, dscale, dshift


conv3x3_bn_act.defvjp(_fused_fwd, _fused_bwd)


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


def _plain_profitable(shape, cout: int) -> bool:
    """Measured gate for the PLAIN conv swap (benchmarks/bench_conv_levels,
    v5e bf16 batch 32): Pallas beats XLA's forward conv only at 128-aligned
    channels and 40 ≤ H ≤ 160 (the 20² level and the channel-padded 64-ch
    levels lose; at 320² the jnp.pad copy alone erases the win)."""
    _, h, w, cin = shape
    return cin % LANE == 0 and cout % LANE == 0 and 40 <= h <= 160


def _conv3x3_fwd_impl(x, kernel, bias, interpret):
    cin = x.shape[-1]
    cout = kernel.shape[-1]
    if pallas_conv_eligible(x.shape, cin, x.dtype) and _plain_profitable(
        x.shape, cout
    ):
        # off-TPU (CPU-mesh tests, dryrun) the kernel runs interpreted —
        # same numerics, no Mosaic compile
        return conv3x3_pallas_raw(x, kernel, bias, interpret=interpret or not _on_tpu())
    return _conv3x3_xla(x, kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3(x, kernel, bias, interpret=False):
    """3×3 same-padding NHWC conv + bias; Pallas when eligible, XLA else.

    Drop-in compute for flax ``nn.Conv(features, (3,3), padding=1)`` with
    a custom VJP; both backward convs stay on XLA (measured faster than
    routing them through the Pallas kernel — see module docstring).
    """
    return _conv3x3_fwd_impl(x, kernel, bias, interpret)


def _conv3x3_fwd(x, kernel, bias, interpret):
    return _conv3x3_fwd_impl(x, kernel, bias, interpret), (x, kernel)


def _conv3x3_bwd(interpret, res, g):
    x, kernel = res
    # dL/dx: conv of g with the spatially-flipped kernel, cin/cout swapped.
    # Stays on XLA deliberately: the Pallas kernel's jnp.pad copy makes it
    # ~1.5 ms/conv SLOWER than XLA's native dgrad at UNet shapes
    # (benchmarks/bench_conv_levels.py).
    wt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    zero = jnp.zeros((wt.shape[-1],), wt.dtype)
    dx = _conv3x3_xla(g, wt, zero).astype(x.dtype)
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

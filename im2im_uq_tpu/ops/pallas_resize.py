"""Fused Pallas 2× align-corners bilinear upsample (forward + backward).

Why this kernel exists (measured, v5e, UNet bf16 batch 32 @320²,
benchmarks/bench_component_map.py): the decoder's up-blocks carry ~100 ms
of the 183 ms train step, and a large slice of that is the XLA lowering of
the stack/reshape interleave in ops/resize.py — the 2× upsample costs
multiple full-tensor passes plus physical layout copies of 5-D
[B,H,W,2,C] intermediates (copy.95/copy.103 in the step profile: ~2.3-2.6
ms each at 320²×64, with ~9 ms forward + ~8 ms backward at up4 alone).
Roofline for the op is one read of the input + one write of the 4× larger
output (~1.0 ms at up4's shapes at the chip's measured ~650 GB/s).

Kernel design:
  - NHWC. Forward reads a (th+2, W, C) row window of the 1-row zero-padded
    input (HBM→VMEM, double-buffered), computes the H-axis two-phase lerp
    (even rows j=2m read x[m-1], x[m]; odd rows read x[m], x[m+1] — see
    ops/resize._upsample2x_axis), interleaves rows with a free reshape on
    the untiled row dim, then folds the whole W axis (2-tap lerp +
    interleave) into one MXU matmul per row against a precomputed banded
    (2W, W) weight matrix, storing one (2·th, 2W, C) output block. The
    matmul is forced: Mosaic rejects every elementwise sublane interleave
    (lane-merge reshape, sublane rotate, non-32-bit strided store). Zero
    padding is correct (not just convenient) because the align-corners
    phase weights vanish exactly at the clamped taps (f_even[0]=1,
    f_odd[n-1]=0), so the padded rows always carry weight 0.
  - Backward (the VJP transpose) reads a (2·th+4, 2W, C) window of the
    2-row zero-padded cotangent, splits row pairs with a free reshape on
    the untiled row dim, applies the 4 static row-tap weights, and folds
    the entire W-axis transpose (deinterleave + 2-tap weighting) into one
    MXU matmul per row with a precomputed banded (2W, W) matrix — sublane
    deinterleaving is not expressible as a Mosaic slice, but as a matmul
    it costs <0.5 ms for the whole up4 tensor.

Numerics: the H-axis lerps run in the input dtype in the same order as
the XLA path; the W-axis matmul accumulates in f32 with dtype-matched
weights, so the forward agrees with ops/resize.upsample2x_align_corners
to f32 machine precision (fp32 inputs) / bf16 resolution (bf16 inputs,
where the kernel is the *more* accurate side — the XLA path rounds every
intermediate lerp to bf16). Backward also accumulates in f32. Pinned by
tests/test_pallas_resize.py.

Reference counterpart: torch.nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True) (reference core/models/trunks/unet_parts.py:53).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upsample2x_pallas", "pallas_upsample_eligible"]


def _phase_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Even/odd-phase lerp fractions of the exact-2x align-corners resize.

    Identical math to ops/resize._upsample2x_axis (kept in sync by the
    bit-parity test): even output 2m = x[m-1] + (x[m]-x[m-1])·fe[m],
    odd output 2m+1 = x[m] + (x[m+1]-x[m])·fo[m].
    """
    m = np.arange(n, dtype=np.float64)
    if n == 1:
        return np.ones((1,), np.float32), np.zeros((1,), np.float32)
    scale = (n - 1) / (2 * n - 1)
    f_even = (2 * m * scale - (m - 1)).astype(np.float32)
    f_even[0] = 1.0
    f_odd = ((2 * m + 1) * scale - m).astype(np.float32)
    return f_even, f_odd


@functools.lru_cache(maxsize=64)
def _col_transpose_matrix(w: int) -> np.ndarray:
    """Static (2W, W) f32 matrix M with dx_cols = g_cols @ M (contract 2W).

    M[j, v] is the forward weight with which output column j read input
    column v; the backward W-axis pass (deinterleave + banded 2-tap
    accumulation) is then a single matmul. Edge clamps need no special
    casing: ge[0]=1 and go[W-1]=0 zero the out-of-range taps.
    """
    ge, go = _phase_weights(w)
    mat = np.zeros((2 * w, w), np.float32)
    for v in range(w):
        mat[2 * v, v] += ge[v]
        mat[2 * v + 1, v] += 1.0 - go[v]
        if v + 1 < w:
            mat[2 * v + 2, v] += 1.0 - ge[v + 1]
        if v >= 1:
            mat[2 * v - 1, v] += go[v - 1]
    return mat


def _pick_row_tile(h: int) -> int | None:
    """Largest row tile that divides H with at least two tiles."""
    for th in (16, 10, 8, 5, 4):
        if h % th == 0 and h >= th + 2:
            return th
    return None


def _lane_pad(c: int, dtype) -> int:
    """Channels the kernel runs at: the lane tile (128 for bf16/f32 minor
    dims on v5e) divides every HBM memref slice Mosaic emits — a C=64
    input is REJECTED on hardware ("Slice shape along dimension 3 must be
    aligned to tiling (128), but is 64"), so sub-tile channel counts are
    zero-padded up to 128 inside the raw fns. The pad factor is bounded
    at 2 by the eligibility gate; physically a C=64 bf16 tensor already
    occupies 128 lanes (the lane tax, benchmarks/bench_lane_tax.py), so
    the padded kernel moves the same number of physical bytes."""
    del dtype
    return -(-c // 128) * 128


def pallas_upsample_eligible(shape, dtype) -> bool:
    """(B,H,W,C) eligible for the fused kernel?"""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if w % 8 != 0 or c % 8 != 0 or c < 32:
        return False
    if _lane_pad(c, dtype) > 2 * c:  # pad factor >2: traffic loss beats win
        return False
    return _pick_row_tile(h) is not None


def _fwd_kernel(x_hbm, fe, fo, mrow, out_ref, scratch, sems, *, th, w, c, n_tiles):
    b = pl.program_id(0)
    t = pl.program_id(1)

    def copy(tile, slot):
        # padded input: rows [tile*th, tile*th + th+2) = real rows
        # [tile*th - 1, tile*th + th + 1)
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
    xs = scratch[slot]  # (th+2, W, C)
    xm1 = xs[0:th]
    xc = xs[1 : th + 1]
    xp1 = xs[2 : th + 2]
    # H-axis phases; fe/fo blocks are the (th,1,C) row slices for this tile
    even_r = xm1 + (xc - xm1) * fe[:]
    odd_r = xc + (xp1 - xc) * fo[:]
    # H interleave: the row dim is untiled, so stack+reshape is a free
    # relayout (same trick as the backward's row-pair split)
    rows2 = jnp.stack([even_r, odd_r], axis=1).reshape(2 * th, w, c)
    # W-axis lerp + interleave folded into one MXU matmul per row with the
    # banded (2W, W) forward-weight matrix. An elementwise W pass cannot be
    # stored: Mosaic rejects the lane-merge reshape (2th, w, 2c) ->
    # (2th, 2w, c), sublane-dim rotates (tpu.dynamic_rotate on dim 1 of a
    # 3-D vector), and non-32-bit strided stores ("Strided store with non
    # 32-bit data"), which exhausts the interleave options. The matmul
    # costs ~0.35 ms of otherwise-idle MXU at the largest decoder shape
    # and accumulates in f32 (more accurate than the XLA path's bf16
    # lerp chain, though no longer bit-identical for the W axis).
    for r in range(2 * th):
        row = jax.lax.dot_general(
            mrow[:],
            rows2[r],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2W, C)
        out_ref[r] = row.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upsample2x_fwd_raw(x, interpret=False):
    bsz, h, w, c_in = x.shape
    th = _pick_row_tile(h)
    assert th is not None, x.shape
    c = _lane_pad(c_in, x.dtype)
    # row pad + lane pad in ONE copy; padded channels carry zeros through
    # the whole kernel (lerps and the banded matmul are linear)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, c - c_in)))
    fe, fo = _phase_weights(h)
    # row weights as (H,1,C) blocks sliced per tile; the W-axis weights
    # ride in the banded matmul matrix (dtype-matched: bf16 inputs use
    # bf16 weights on the MXU, like the XLA path's bf16 lerp weights)
    fe_a = jnp.broadcast_to(jnp.asarray(fe, x.dtype)[:, None, None], (h, 1, c))
    fo_a = jnp.broadcast_to(jnp.asarray(fo, x.dtype)[:, None, None], (h, 1, c))
    mrow = jnp.asarray(_col_transpose_matrix(w), x.dtype)
    kfn = functools.partial(_fwd_kernel, th=th, w=w, c=c, n_tiles=h // th)
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((th, 1, c), lambda b, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 1, c), lambda b, t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * w, w), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # rank-3 output (B·2H, 2W, C): Mosaic only legalizes the
            # strided store on a rank-3 ref — a leading unit block dim
            # (even a squeezed one) regenerates a rank-4 memref and fails
            (2 * th, 2 * w, c),
            lambda b, t, n_tiles=h // th: (b * n_tiles + t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * 2 * h, 2 * w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, fe_a, fo_a, mrow).reshape(bsz, 2 * h, 2 * w, c)[..., :c_in]


def _bwd_kernel(g_hbm, a0, a1, a2, a3, mcol, dx_ref, scratch, sems, *, th, w, c, n_tiles):
    b = pl.program_id(0)
    t = pl.program_id(1)

    def copy(tile, slot):
        # 2-row-padded cotangent: rows [2·tile·th, 2·tile·th + 2th+4) =
        # real rows [2·tile·th − 2, ...), i.e. row pairs [tile·th − 1, ...)
        return pltpu.make_async_copy(
            g_hbm.at[b, pl.ds(2 * tile * th, 2 * th + 4)],
            scratch.at[slot],
            sems.at[slot],
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
    win = scratch[slot]  # (2th+4, 2W, C)
    win2 = win.reshape(th + 2, 2, 2 * w, c)  # untiled row-pair split: free
    we = win2[:, 0]  # g[2p] for pair p = t·th − 1 + k
    wo = win2[:, 1]  # g[2p+1]
    even_c = we[1 : th + 1].astype(jnp.float32)   # g[2m]
    even_p1 = we[2 : th + 2].astype(jnp.float32)  # g[2m+2]
    odd_c = wo[1 : th + 1].astype(jnp.float32)    # g[2m+1]
    odd_m1 = wo[0:th].astype(jnp.float32)         # g[2m−1]
    acc = a1[:] * even_c + a3[:] * even_p1 + a2[:] * odd_c + a0[:] * odd_m1
    # W-axis transpose as one banded matmul per row: (2W,)·(2W,W) → (W,)
    for r in range(th):
        dx_r = jax.lax.dot_general(
            mcol[:],
            acc[r],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (W, C)
        dx_ref[r] = dx_r.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _upsample2x_bwd_raw(g, interpret=False):
    """Transpose of _upsample2x_fwd_raw: (B,2H,2W,C) cotangent → (B,H,W,C)."""
    bsz, h2, w2, c_in = g.shape
    h, w = h2 // 2, w2 // 2
    th = _pick_row_tile(h)
    assert th is not None, g.shape
    c = _lane_pad(c_in, g.dtype)
    gp = jnp.pad(g, ((0, 0), (2, 2), (0, 0), (0, c - c_in)))
    fe, fo = _phase_weights(h)
    # row-tap weights: dx[m] = fe[m]·g[2m] + (1−fe[m+1])·g[2m+2]
    #                        + (1−fo[m])·g[2m+1] + fo[m−1]·g[2m−1]
    a0 = np.concatenate([[0.0], fo[:-1]]).astype(np.float32)
    a1 = fe
    a2 = 1.0 - fo
    a3 = np.concatenate([1.0 - fe[1:], [0.0]]).astype(np.float32)

    def row_arr(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.float32)[:, None, None], (h, 1, c))

    mcol = jnp.asarray(_col_transpose_matrix(w))
    kfn = functools.partial(_bwd_kernel, th=th, w=w, c=c, n_tiles=h // th)
    row_spec = pl.BlockSpec((th, 1, c), lambda b, t: (t, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            row_spec,
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((2 * w, w), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th, w, c),
            lambda b, t, n_tiles=h // th: (b * n_tiles + t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz * h, w, c), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 4, 2 * w, c), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gp, row_arr(a0), row_arr(a1), row_arr(a2), row_arr(a3), mcol).reshape(
        bsz, h, w, c
    )[..., :c_in]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x_pallas(x, interpret=False):
    """Fused 2× align-corners bilinear upsample, NHWC, Pallas TPU kernel.

    Bit-identical to ops/resize.upsample2x_align_corners in the forward
    (same per-axis lerp order and dtype); backward accumulates in f32.
    Requires ``pallas_upsample_eligible(x.shape, x.dtype)``.
    """
    return _upsample2x_fwd_raw(x, interpret=interpret or not _on_tpu())


def _up_fwd(x, interpret):
    return upsample2x_pallas(x, interpret), None


def _up_bwd(interpret, _res, g):
    return (_upsample2x_bwd_raw(g, interpret=interpret or not _on_tpu()),)


upsample2x_pallas.defvjp(_up_fwd, _up_bwd)

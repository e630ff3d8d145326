"""Pallas backward kernels for the fused 3×3 conv+BN+ReLU block (TPU).

The train step's backward half is dominated not by the conv contractions
(XLA's wgrad/dgrad custom-calls run near roofline) but by the separate
full-resolution passes around them: ReLU-mask/activation recompute before
wgrad, the pad copy it feeds, the BN-apply cotangent after dgrad, and the
per-channel dscale/dshift reductions (bench_time_buckets.py: ~27 ms of
backward elementwise at bf16 batch 32, 320²). These kernels absorb all of
that into the conv passes themselves:

  ``wgrad3x3_pallas_raw``  — dW (+db) with the upstream BN+ReLU applied to
    the saved PADDED input in-register (the forward's own Pallas call
    already materialized that buffer, so no new pad, no recompute pass).
    Per tap, a (th·Wv, Cin)ᵀ @ (th·Wv, Cout) MXU matmul accumulates into a
    revisited f32 VMEM block across the whole grid.

  ``dgrad3x3_pallas_raw``  — the double-buffered forward-conv structure
    (ops/pallas_conv.py) applied to the PADDED cotangent with the
    flipped/transposed kernel, plus an epilogue multiplying by the
    upstream ReLU mask × folded BN scale (recomputed in-register from the
    raw input) and accumulating dscale/dshift partials in the same pass.

Both contract over the zero-padded frame — zero rows/columns contribute
nothing to dW and db — so every DMA slab is full-width and Mosaic only
sees lane-aligned slices. Reference semantics being differentiated:
conv3x3 → BatchNorm → ReLU per reference core/models/trunks/
unet_parts.py:8-25.

Requires Cin and Cout multiples of 128 and H divisible by the row tile
(same eligibility as the forward kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from im2im_uq_tpu.ops.pallas_conv import LANE, _on_tpu, _pick_row_tile

__all__ = [
    "wgrad3x3_pallas_raw",
    "dgrad3x3_pallas_raw",
    "bwd_eligible",
]


def bwd_eligible(h: int, cin: int, cout: int, dtype) -> bool:
    """Both backward kernels need 128-aligned channels and a row tile."""
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if cin % LANE != 0 or cout % LANE != 0:
        return False
    if dtype == jnp.float32 and max(cin, cout) > 256:
        # f32 at C=512 crashes the remote Mosaic compiler in wgrad (the
        # 9·Cin·Cout f32 accumulator + in-flight partials; bf16 and every
        # other f32 level compile — probed on v5e). f32 falls back to the
        # XLA composition there.
        return False
    return _pick_row_tile(h) is not None


def _wgrad_chunks(wp: int):
    """Width-chunk plan: list of (start, slab_len, interior_len).

    The remote Mosaic compiler crashes (silent exit 1) on this kernel once
    the per-tile working width passes ~310 columns (probed boundary on
    v5e: W=304 compiles, W=312 does not), so wide images are processed in
    column chunks: chunk k DMAs slab cols [start, start+slab) of the
    padded frame and contributes the dW/db terms of interior (output)
    cols [start+1, start+1+interior). Starts are sublane-aligned (%8) and
    chunks partition the interior exactly, so the chunked sum is
    bit-identical in structure to the single pass (same f32 accumulate).
    For wp ≤ 248 this degenerates to one chunk — the original codegen.
    """
    wv = wp - 2
    if wv <= 246:
        return [(0, wp, wv)]
    cw = 160
    out = []
    s = 0
    while s < wv:
        sl = min(wp - s, cw + 8)
        # let the final chunk absorb the remainder (its slab has 2 spare
        # columns of halo) — saves a whole near-empty chunk pass at W=320
        ci = (wv - s) if (wv - s) <= sl - 2 else cw
        out.append((s, sl, ci))
        s += cw if ci == cw else ci
    return out


def _wgrad_kernel(
    xp_hbm, gp_hbm, ps_ref, dw_ref, db_ref, xs, gs_s, xsem, gsem,
    *, th, h, w, wp, cin, cout, n_tiles, prologue, chunks,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_w = len(chunks)

    def xcopy(tile, k, slot):
        s, sl, _ = chunks[k]
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(tile * th, th + 2), pl.ds(s, sl)],
            xs.at[slot, :, pl.ds(0, sl)],
            xsem.at[slot],
        )

    def gcopy(tile, k, slot):
        s, sl, _ = chunks[k]
        return pltpu.make_async_copy(
            gp_hbm.at[b, pl.ds(tile * th + 1, th), pl.ds(s, sl)],
            gs_s.at[slot, :, pl.ds(0, sl)],
            gsem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        xcopy(0, 0, 0).start()
        gcopy(0, 0, 0).start()

    first = (b == 0) & (t == 0)
    acc = [None] * 9
    gsum = None
    for k, (s, sl, ci) in enumerate(chunks):
        slot = jax.lax.rem(t * n_w + k, 2)
        nxt = jax.lax.rem(t * n_w + k + 1, 2)
        if k + 1 < n_w:
            xcopy(t, k + 1, nxt).start()
            gcopy(t, k + 1, nxt).start()
        else:

            @pl.when(t + 1 < n_tiles)
            def _():
                xcopy(t + 1, 0, nxt).start()
                gcopy(t + 1, 0, nxt).start()

        xcopy(t, k, slot).wait()
        gcopy(t, k, slot).wait()
        # (th+2, sl, cin) rows t*th.. , cols s.. of the padded input
        x = xs[slot, :, pl.ds(0, sl)]
        g = gs_s[slot, :, pl.ds(0, sl)]  # (th, sl, cout) rows t*th+1 ..
        if prologue:
            scale = ps_ref[0].astype(jnp.float32)
            shift = ps_ref[1].astype(jnp.float32)
            u = jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0)
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (th + 2, sl, 1), 0)
                + t * th
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (th + 2, sl, 1), 1) + s
            border = (rows >= 1) & (rows <= h) & (cols >= 1) & (cols <= w)
            x = jnp.where(border, u, 0.0).astype(x.dtype)
        # Aligned-dot formulation: dW[dh,dwi] = Σ_{r,j} x[dh+r, j] ·
        # g[r, j+1-dwi] over the chunk interior. Slicing x per tap is a
        # sublane-misaligned slice + relayout copy (6 per chunk — measured
        # 14 ms for one 320²×128 wgrad, ~6× off the MXU roofline), so
        # instead: mask g to the interior once, roll it ±1 column (lazy
        # sublane rotate), and pair with FREE row slices of x — every
        # reshape feeding the MXU is then layout-preserving (sl % 8 == 0).
        cols_g = jax.lax.broadcasted_iota(jnp.int32, (th, sl, 1), 1)
        gm = jnp.where((cols_g >= 1) & (cols_g < 1 + ci), g, 0)
        xr = [
            x[dh : dh + th].reshape(th * sl, cin) for dh in range(3)
        ]
        for dwi in range(3):
            # roll(…, 0) lowers to a zero-width slice Mosaic rejects
            gr = gm if dwi == 1 else jnp.roll(gm, dwi - 1, axis=1)
            gs = gr.reshape(th * sl, cout)
            for dh in range(3):
                p = jax.lax.dot_general(
                    xr[dh],
                    gs,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                i = dh * 3 + dwi
                acc[i] = p if acc[i] is None else acc[i] + p
        gpart = jnp.sum(gm.astype(jnp.float32), axis=(0, 1))
        gsum = gpart if gsum is None else gsum + gpart
    for i in range(9):
        dw_ref[i] = jnp.where(first, acc[i], dw_ref[i] + acc[i])
    db_ref[0] = jnp.where(first, gsum, db_ref[0] + gsum)


@functools.partial(
    jax.jit, static_argnames=("w", "prologue", "out_dtype", "interpret")
)
def wgrad3x3_pallas_raw(
    xp, gp, scale, shift, w=None, prologue=True, out_dtype=jnp.float32,
    interpret=False,
):
    """dW, db of a same-padding 3×3 conv from PADDED input and cotangent.

    ``xp``: (B, H+2, Wp, Cin) — the conv input zero-padded exactly as the
    forward Pallas call consumes it (Wp = W+2 rounded up to 8).
    ``gp``: (B, H+2, Wp, Cout) — the cotangent in the same padded frame.
    ``w`` is the true data width (default H — the UNet's tiles are
    square); it bounds the prologue's border mask, since Wp alone is
    ambiguous. With ``prologue``, the upstream BN's folded affine + ReLU
    (``scale``/``shift``) is applied to xp in-register first, i.e. the
    returned dW is w.r.t. the conv over relu(x·scale+shift).
    """
    bsz, hp, wp, cin = xp.shape
    h = hp - 2
    if w is None:
        w = h
    cout = gp.shape[-1]
    # wgrad prefers a taller tile than the forward's 8: fewer grid steps
    # amortize the per-step rolls/masks (320²×128: 4.24 → 3.93 ms).
    th = 16 if h % 16 == 0 else _pick_row_tile(h)
    assert th is not None and cin % LANE == 0 and cout % LANE == 0, (
        xp.shape, gp.shape,
    )
    chunks = tuple(_wgrad_chunks(wp))
    maxsl = max(sl for _, sl, _ in chunks)
    kfn = functools.partial(
        _wgrad_kernel, th=th, h=h, w=w,
        wp=wp, cin=cin, cout=cout, n_tiles=h // th, prologue=prologue,
        chunks=chunks,
    )
    dw9, db = pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, cin), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (9, cin, cout), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, maxsl, cin), xp.dtype),
            pltpu.VMEM((2, th, maxsl, cout), gp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret or not _on_tpu(),
    )(
        xp,
        gp,
        jnp.stack([
            jnp.asarray(scale, jnp.float32), jnp.asarray(shift, jnp.float32)
        ]),
    )
    return dw9.reshape(3, 3, cin, cout).astype(out_dtype), db[0]


def _dgrad_kernel(
    gp_hbm, wt_ref, x_ref, ps_ref, dx_ref, red_ref, gs, gsem,
    *, th, w, cin, cout, n_tiles, prologue,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    def gcopy(tile, slot):
        return pltpu.make_async_copy(
            gp_hbm.at[b, pl.ds(tile * th, th + 2)], gs.at[slot], gsem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        gcopy(0, 0).start()

    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t + 1 < n_tiles)
    def _():
        gcopy(t + 1, nxt).start()

    gcopy(t, slot).wait()
    g = gs[slot]
    acc = jnp.zeros((th * w, cin), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            gsl = g[dh : dh + th, dw : dw + w, :].reshape(th * w, cout)
            acc += jax.lax.dot_general(
                gsl,
                wt_ref[dh, dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    first = (b == 0) & (t == 0)
    if prologue:
        xb = x_ref[0].astype(jnp.float32)  # (th, w, cin) raw input
        scale = ps_ref[0].astype(jnp.float32)
        shift = ps_ref[1].astype(jnp.float32)
        m = (xb * scale + shift > 0).astype(jnp.float32)
        dam = acc * m.reshape(th * w, cin)
        dx_ref[:] = (
            (dam * scale).reshape(1, th, w, cin).astype(dx_ref.dtype)
        )
        damr = dam.reshape(th, w, cin)
        r0 = jnp.sum(damr * x_ref[0].astype(jnp.float32), axis=(0, 1))
        r1 = jnp.sum(damr, axis=(0, 1))
        red = jnp.stack([r0, r1])
        red_ref[:] = jnp.where(first, red, red_ref[:] + red)
    else:
        dx_ref[:] = acc.reshape(1, th, w, cin).astype(dx_ref.dtype)
        red_ref[:] = jnp.where(first, 0.0, red_ref[:])


@functools.partial(jax.jit, static_argnames=("prologue", "interpret"))
def dgrad3x3_pallas_raw(gp, x, kernel, scale, shift, prologue=True,
                        interpret=False):
    """dx of a same-padding 3×3 conv from the PADDED cotangent.

    ``gp``: (B, H+2, Wp, Cout) padded cotangent; ``x``: (B, H, W, Cin) the
    conv's RAW input (pre-BN/ReLU); ``kernel``: the forward (3,3,Cin,Cout)
    kernel — flipped/transposed internally. With ``prologue``, the output
    is d(raw input) = convᵀ(g) · 1[x·scale+shift>0] · scale, and the
    second return value holds (dscale, dshift) = (Σ dam·x, Σ dam) — the
    upstream BN's parameter-gradient reductions — computed in the same
    pass. Without it, dx is the plain transposed conv and red is zeros.
    """
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = _pick_row_tile(h)
    assert th is not None and cin % LANE == 0 and cout % LANE == 0, (
        x.shape, kernel.shape,
    )
    wt = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)  # (3,3,cout,cin)
    kfn = functools.partial(
        _dgrad_kernel, th=th, w=w, cin=cin, cout=cout, n_tiles=h // th,
        prologue=prologue,
    )
    dx, red = pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 3, cout, cin), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, w, cin), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, cin), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, w, cin), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, cin), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, cin), x.dtype),
            jax.ShapeDtypeStruct((2, cin), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, gp.shape[2], cout), gp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret or not _on_tpu(),
    )(
        gp,
        wt,
        x,
        jnp.stack([
            jnp.asarray(scale, jnp.float32), jnp.asarray(shift, jnp.float32)
        ]),
    )
    return dx, red

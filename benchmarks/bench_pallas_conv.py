"""Probe: can a Pallas 3×3 conv approach XLA's conv on v5e?

Decides whether a fused DoubleConv (conv+BN+ReLU in one kernel, saving the
inter-op HBM round trips) is worth building: the fusion only pays if the
Pallas conv itself is within ~1.3× of XLA's. Forward-only, NHWC, stride 1,
pre-padded input (the kernel reads an (H+2, W+2) image from HBM tile-wise
with halo rows via explicit DMA and runs 9 shifted MXU matmuls with an
f32 accumulator).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_pallas_conv.py [batch] [size] [cin] [cout]
Correctness (CPU interpret mode): JAX_PLATFORMS=cpu ... --check
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8  # output rows per grid cell


def _conv_kernel(x_hbm, w_ref, out_ref, scratch, sem, *, th, w, cin, cout):
    b = pl.program_id(0)
    t = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * th, th + 2)], scratch, sem
    )
    cp.start()
    cp.wait()
    x = scratch[:]  # (th+2, w+2, cin)
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
    out_ref[:] = acc.reshape(1, th, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pallas(x, kernel, interpret=False):
    """NHWC 3×3 same-padding conv; x bf16/f32, kernel (3,3,cin,cout)."""
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % ROW_TILE == 0
    # Mosaic DMA slices need the W dim 8-aligned; over-pad the right edge
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    kfn = functools.partial(_conv_kernel, th=ROW_TILE, w=w, cin=cin, cout=cout)
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // ROW_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 3, cin, cout), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ROW_TILE + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kernel)


def _conv_kernel_db(
    x_hbm, w_ref, out_ref, scratch, sems, *, th, w, cin, cout, n_tiles
):
    """Double-buffered variant: tile t+1's rows stream in while t computes."""
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
    out_ref[:] = acc.reshape(1, th, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pallas_db(x, kernel, interpret=False):
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % ROW_TILE == 0
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    kfn = functools.partial(
        _conv_kernel_db, th=ROW_TILE, w=w, cin=cin, cout=cout,
        n_tiles=h // ROW_TILE,
    )
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // ROW_TILE),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 3, cin, cout), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ROW_TILE, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ROW_TILE + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, kernel)


def _conv_kernel_l1(
    x_hbm, w_ref, out_ref, scratch, sems, *, th, w, wp, cin, cout, n_tiles
):
    """C<128 variant: W and C merged into the minor dim so sliced DMAs meet
    Mosaic's 128-lane alignment; the dw shift becomes a lane-offset slice."""
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
    x2d = scratch[slot]  # (th+2, wp*cin)
    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x2d[dh : dh + th, dw * cin : (dw + w) * cin]
            xs = xs.reshape(th * w, cin)
            acc += jax.lax.dot_general(
                xs,
                w_ref[dh, dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc.reshape(1, th, w, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pallas_l1(x, kernel, interpret=False):
    """Variant for lane-unaligned channel counts (e.g. the UNet's C=64
    level-1 convs): flatten (W, C) into the minor dim. Row tiles are 14
    high so the DMA'd (th+2)=16 rows stay sublane-aligned; H pads to the
    tile grid and the output is cropped back."""
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    th = 14
    h_eff = -(-h // th) * th
    wp = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + h_eff - h), (1, wp - w - 1), (0, 0)))
    xflat = xp.reshape(bsz, h_eff + 2, wp * cin)
    kfn = functools.partial(
        _conv_kernel_l1, th=th, w=w, wp=wp, cin=cin, cout=cout,
        n_tiles=h_eff // th,
    )
    out = pl.pallas_call(
        kfn,
        grid=(bsz, h_eff // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 3, cin, cout), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h_eff, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp * cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xflat, kernel)
    return out[:, :h]


def _conv_kernel_c64(
    x_hbm, m0_ref, m1_ref, b_ref, out_ref, scratch, sems,
    *, th, w, wp, cout, n_tiles,
):
    """Width-pair-packed C=64 kernel: adjacent width columns share a
    128-lane group, so a 64-channel conv runs on full MXU lanes with no
    channel padding and no misaligned slicing.

    Output pair O_k = (out[2k], out[2k+1]) depends only on input pairs
    P_k, P_{k+1} (both 128-lane aligned views):
        O_k = Σ_dh P_k(dh) @ M0(dh) + P_{k+1}(dh) @ M1(dh)
    where M0 = [[W0, 0], [W1, W0]], M1 = [[W2, W1], [0, W2]] are (128,
    2·cout) block matrices built from the (64, cout) taps W0/W1/W2 of row
    dh. FLOPs = 4/3 of the ideal 64-ch conv (vs 2× for channel padding),
    traffic = unpadded.
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
    x3 = scratch[slot]  # (th+2, wp/2, 128): width-pairs on sublanes
    acc = jnp.zeros((th * (w // 2), 2 * cout), jnp.float32)
    for dh in range(3):
        rows = x3[dh : dh + th]  # (th, wp/2, 128) — leading-dim slice only
        p_cur = rows[:, 0 : w // 2, :].reshape(th * (w // 2), 128)
        p_nxt = rows[:, 1 : w // 2 + 1, :].reshape(th * (w // 2), 128)
        dn = (((1,), (0,)), ((), ()))
        acc += jax.lax.dot_general(
            p_cur, m0_ref[dh], dn, preferred_element_type=jnp.float32
        )
        acc += jax.lax.dot_general(
            p_nxt, m1_ref[dh], dn, preferred_element_type=jnp.float32
        )
    acc += b_ref[0].astype(jnp.float32)
    # output stays pair-packed ((w/2, 2*cout) minor) — unpacking to
    # (w, cout) inside the kernel is a lane-splitting cast Mosaic rejects;
    # the host reshape after pallas_call is a free row-major view
    out_ref[:] = acc.reshape(1, th, w // 2, 2 * cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_pallas_c64(x, kernel, interpret=False):
    """NHWC 3×3 conv for Cin=64 via width-pair lane packing (see kernel)."""
    bsz, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert cin == 64 and w % 2 == 0 and h % ROW_TILE == 0
    # wp/2 width-pairs ride the sublane dim of the DMA'd block, so wp/2
    # must be 8-aligned (Mosaic tiling) => wp multiple of 16
    wp = -(-(w + 2) // 16) * 16
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    # width-pair packing: adjacent columns share one 128-lane group; the
    # scratch is DMA'd in this 3D tiling directly so the kernel never
    # needs a sublane-moving reshape (Mosaic rejects those)
    xflat = xp.reshape(bsz, h + 2, wp // 2, 128)
    # block matrices per tap row: M0 = [[W0, 0], [W1, W0]], M1 = [[W2, W1], [0, W2]]
    z = jnp.zeros((64, cout), kernel.dtype)
    m0 = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([kernel[dh, 0], z], axis=1),
                    jnp.concatenate([kernel[dh, 1], kernel[dh, 0]], axis=1),
                ],
                axis=0,
            )
            for dh in range(3)
        ]
    )
    m1 = jnp.stack(
        [
            jnp.concatenate(
                [
                    jnp.concatenate([kernel[dh, 2], kernel[dh, 1]], axis=1),
                    jnp.concatenate([z, kernel[dh, 2]], axis=1),
                ],
                axis=0,
            )
            for dh in range(3)
        ]
    )
    bias2 = jnp.zeros((1, 2 * cout), kernel.dtype)
    th = 16 if h % 16 == 0 else ROW_TILE
    kfn = functools.partial(
        _conv_kernel_c64, th=th, w=w, wp=wp, cout=cout,
        n_tiles=h // th,
    )
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 128, 2 * cout), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 128, 2 * cout), lambda b, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w // 2, 2 * cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w // 2, 2 * cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wp // 2, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xflat, m0, m1, bias2).reshape(bsz, h, w, cout)


@jax.jit
def conv3x3_xla(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if len(args) > 0 else 32
    size = int(args[1]) if len(args) > 1 else 320
    cin = int(args[2]) if len(args) > 2 else 64
    cout = int(args[3]) if len(args) > 3 else 64
    check = "--check" in sys.argv

    rng = np.random.RandomState(0)
    dtype = jnp.float32 if check else jnp.bfloat16
    x = jnp.asarray(rng.randn(2 if check else batch, 32 if check else size,
                              32 if check else size, cin), dtype)
    k = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), dtype)

    if check:
        ref = np.asarray(conv3x3_xla(x, k), np.float32)
        for nm, fn in (
            ("single", conv3x3_pallas),
            ("double-buffered", conv3x3_pallas_db),
            ("l1-merged-minor", conv3x3_pallas_l1),
        ):
            got = np.asarray(fn(x, k, interpret=True), np.float32)
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
            print(f"interpret-mode parity OK ({nm})", got.shape)
        return

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.utils.cache import enable_compilation_cache
    from im2im_uq_tpu.utils.profiling import measure_device_busy

    enable_compilation_cache()
    variants = [("xla", conv3x3_xla)]
    if cin % 128 == 0:
        variants += [("pallas", conv3x3_pallas), ("pallas-db", conv3x3_pallas_db)]
    elif cin == 64:
        variants += [("pallas-c64", conv3x3_pallas_c64)]
    else:
        variants += [("pallas-l1", conv3x3_pallas_l1)]
    for name, fn in variants:
        out = fn(x, k)
        jax.block_until_ready(out)
        stats = measure_device_busy(fn, x, k, steps=5)
        total = stats["total_ms"] if stats else float("nan")
        gb = (x.nbytes + out.nbytes + k.nbytes) / 1e9
        print(f"{name}: {total:.2f} ms/call  (min HBM {gb:.2f} GB → "
              f"{gb / (total / 1e3):.0f} GB/s effective)")


if __name__ == "__main__":
    main()

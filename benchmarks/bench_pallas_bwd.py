"""Pallas backward-conv probes: fused wgrad and dgrad kernels vs XLA.

The bf16 train step's backward is ~60% of device time and, per
bench_time_buckets.py, splits into near-roofline XLA conv fusions PLUS a
long tail of separate elementwise passes (ReLU-mask recompute, BN-apply
cotangent, pad copies, per-channel reductions) that XLA cannot fuse into
its conv custom-calls. These kernels absorb those passes:

  wgrad3x3:  [BN+ReLU prologue on the saved PADDED input] -> 9 per-tap
             (th*Wv, Cin)^T @ (th*Wv, Cout) MXU matmuls accumulated into a
             revisited f32 VMEM block -> dW, plus db = sum(g) in the same
             pass. The conv's forward already materializes the padded
             input for its own Pallas call, so the backward re-reads that
             buffer — no new pad copy, no activation recompute pass.

  dgrad3x3:  the double-buffered forward conv structure applied to the
             PADDED cotangent with the flipped/transposed kernel, with an
             epilogue multiplying by the upstream ReLU mask and folded BN
             scale (recomputed in-register from the saved raw input) and
             accumulating per-channel dscale/dshift partials — the
             upstream BN's backward never exists as separate HBM passes.

Both contract g over the zero-padded frame (zero columns/rows contribute
nothing), so tap slices stay full-width and Mosaic sees only aligned DMAs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_pallas_bwd.py [--parity-only]
"""

from __future__ import annotations

import functools
import sys
import tempfile

import numpy as np


def _busy_ms(fn, *args, steps=20):
    import jax

    from im2im_uq_tpu.utils.profiling import _tpu_op_durations, trace

    y = fn(*args)
    jax.block_until_ready(y)
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            for _ in range(steps):
                y = fn(*args)
            jax.block_until_ready(y)
        ops = _tpu_op_durations(td)
    if not ops:
        return None
    return sum(ops.values()) / steps / 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.ops.pallas_conv_bwd import (
        dgrad3x3_pallas_raw,
        wgrad3x3_pallas_raw,
    )

    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    parity_only = "--parity-only" in sys.argv

    if "--tiny" in sys.argv:
        # interpret-mode parity on a throttled CPU host: small shapes,
        # including a non-square W and both prologue settings
        cases = [
            (2, 16, 16, 128, 128, True),
            (2, 16, 16, 128, 128, False),
            (1, 8, 20, 128, 256, True),
        ]
    else:
        # (batch, H, W, cin, cout, prologue?) at the flagship's hot bwd
        # shapes: packed up4/inc conv1 (16, 320, 128->128), up3/down1
        # conv1 (32, 160, 128->128), up2 conv1 (32, 80, 256->256)
        cases = [
            (16, 320, 320, 128, 128, True),
            (16, 320, 320, 128, 128, False),
            (32, 160, 160, 128, 128, True),
            (32, 80, 80, 256, 256, True),
        ]

    for bsz, h, w, cin, cout, prologue in cases:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((bsz, h, w, cin)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((bsz, h, w, cout)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        scale = jnp.asarray(rng.standard_normal((cin,)), jnp.float32)
        shift = jnp.asarray(rng.standard_normal((cin,)) * 0.1, jnp.float32)
        wp = -(-(w + 2) // 8) * 8
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))

        # ---- XLA reference chains (what the train step does today) ----
        def xla_wgrad(x, g):
            a = x
            if prologue:
                a = jnp.maximum(
                    x.astype(jnp.float32) * scale + shift, 0.0
                ).astype(x.dtype)
            apad = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            dw = jax.lax.conv_general_dilated(
                apad, g, (1, 1), "VALID",
                dimension_numbers=("CHWN", "IHWO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).transpose(1, 2, 0, 3)
            db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
            return dw, db

        def xla_dgrad(g, x):
            wt = jnp.flip(k, (0, 1)).swapaxes(2, 3)
            da = jax.lax.conv_general_dilated(
                g, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            if not prologue:
                return da.astype(x.dtype), jnp.zeros((2, cin), jnp.float32)
            u = x.astype(jnp.float32) * scale + shift
            dam = da * (u > 0)
            dx = (dam * scale).astype(x.dtype)
            red = jnp.stack([
                jnp.sum(dam * x.astype(jnp.float32), axis=(0, 1, 2)),
                jnp.sum(dam, axis=(0, 1, 2)),
            ])
            return dx, red

        wg_p = jax.jit(functools.partial(
            wgrad3x3_pallas_raw, w=w, prologue=prologue, out_dtype=jnp.float32
        ))
        dg_p = jax.jit(functools.partial(dgrad3x3_pallas_raw, prologue=prologue))
        wg_x = jax.jit(xla_wgrad)
        dg_x = jax.jit(xla_dgrad)

        dw_p, db_p = wg_p(xp, gp, scale, shift)
        dw_x, db_x = wg_x(x, g)
        rw = np.linalg.norm(np.asarray(dw_p) - np.asarray(dw_x)) / (
            np.linalg.norm(np.asarray(dw_x)) + 1e-12
        )
        rb = np.linalg.norm(np.asarray(db_p) - np.asarray(db_x)) / (
            np.linalg.norm(np.asarray(db_x)) + 1e-12
        )

        dx_p, red_p = dg_p(gp, x, k, scale, shift)
        dx_x, red_x = dg_x(g, x)
        rd = np.linalg.norm(
            np.asarray(dx_p, np.float32) - np.asarray(dx_x, np.float32)
        ) / (np.linalg.norm(np.asarray(dx_x, np.float32)) + 1e-12)
        rr = np.linalg.norm(np.asarray(red_p) - np.asarray(red_x)) / (
            np.linalg.norm(np.asarray(red_x)) + 1e-12
        )

        tag = f"B{bsz} {h}x{w} {cin}->{cout} prologue={prologue}"
        print(f"{tag}: parity dW {rw:.2e} db {rb:.2e} dx {rd:.2e} red {rr:.2e}")
        if parity_only:
            continue

        tw_p = _busy_ms(wg_p, xp, gp, scale, shift)
        tw_x = _busy_ms(wg_x, x, g)
        td_p = _busy_ms(dg_p, gp, x, k, scale, shift)
        td_x = _busy_ms(dg_x, g, x)
        print(
            f"{tag}: wgrad pallas {tw_p:.2f} ms vs xla {tw_x:.2f} ms | "
            f"dgrad pallas {td_p:.2f} ms vs xla {td_x:.2f} ms"
        )


if __name__ == "__main__":
    main()

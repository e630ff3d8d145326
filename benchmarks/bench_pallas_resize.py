"""On-TPU parity + device-busy timing: Pallas fused upsample vs XLA.

Runs the fused 2x align-corners bilinear upsample (ops/pallas_resize.py)
against the XLA stack/reshape formulation (ops/resize.py) at every
decoder upsample shape of the flagship 320^2 batch-32 UNet, forward and
backward, reporting device-busy ms from profiler traces (the only
trustworthy metric through this tunnel — see STATUS.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_pallas_resize.py
"""

from __future__ import annotations

import sys
import tempfile


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
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.ops import pallas_resize as pr
    from im2im_uq_tpu.ops.resize import resize_bilinear_align_corners

    print(f"backend={jax.default_backend()} devices={jax.device_count()}")

    def xla_up(x):
        _, h, w, _ = x.shape
        return resize_bilinear_align_corners(x, (2 * h, 2 * w))

    # decoder up-block input shapes (batch 32, 320^2 flagship; W of up1 is
    # 20 in the real model — %8-compatible already)
    shapes = [
        ((32, 20, 20, 512), jnp.bfloat16, "up1"),
        ((32, 40, 40, 256), jnp.bfloat16, "up2"),
        ((32, 80, 80, 128), jnp.bfloat16, "up3"),
        ((32, 160, 160, 64), jnp.bfloat16, "up4"),
        ((32, 160, 160, 64), jnp.float32, "up4-f32"),
    ]

    for shape, dtype, name in shapes:
        if not pr.pallas_upsample_eligible(shape, dtype):
            print(f"{name}: NOT ELIGIBLE {shape}")
            continue
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), dtype)
        g_shape = (shape[0], 2 * shape[1], 2 * shape[2], shape[3])
        g = jnp.asarray(rng.standard_normal(g_shape), dtype)

        # parity on the real chip
        y_p = np.asarray(pr.upsample2x_pallas(x), np.float32)
        y_x = np.asarray(jax.jit(xla_up)(x), np.float32)
        rel = np.linalg.norm(y_p - y_x) / (np.linalg.norm(y_x) + 1e-12)

        fwd_p = jax.jit(lambda a: pr.upsample2x_pallas(a))
        fwd_x = jax.jit(xla_up)

        def vjp_call(fn):
            # ct must be an ARGUMENT: a closed-over cotangent becomes an
            # MLIR constant and overflows the tunnel's compile payload
            # (HTTP 413) at the 419 MB up4 shape
            @jax.jit
            def run(a, ct):
                _, vjp = jax.vjp(fn, a)
                return vjp(ct)[0]

            return run

        bwd_p = vjp_call(lambda a: pr.upsample2x_pallas(a))
        bwd_x = vjp_call(xla_up)

        dx_p = np.asarray(bwd_p(x, g), np.float32)
        dx_x = np.asarray(bwd_x(x, g), np.float32)
        brel = np.linalg.norm(dx_p - dx_x) / (np.linalg.norm(dx_x) + 1e-12)

        t_fp = _busy_ms(fwd_p, x)
        t_fx = _busy_ms(fwd_x, x)
        t_bp = _busy_ms(bwd_p, x, g)
        t_bx = _busy_ms(bwd_x, x, g)
        nbytes = x.nbytes + 4 * x.nbytes
        roof_ms = nbytes / 650e9 * 1e3
        print(
            f"{name} {shape} {jnp.dtype(dtype).name}: fwd pallas {t_fp:.3f} ms"
            f" vs xla {t_fx:.3f} ms | bwd pallas {t_bp:.3f} vs xla {t_bx:.3f}"
            f" | rel {rel:.2e}/{brel:.2e} | roofline ~{roof_ms:.2f} ms"
        )


if __name__ == "__main__":
    main()

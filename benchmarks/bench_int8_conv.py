"""int8 PTQ conv probe — the measured case AGAINST quantized serving here.

v5e's MXU advertises 2x int8 throughput vs bf16 (394 vs 197 TOPS), so
post-training-quantized serving (int8 convs + RCPS *re*-calibration to
restore the distribution-free guarantee) looks like the obvious next
serving lever after the 67%-MFU bf16 path (benchmarks/bench_serving.py).

Measured (v5e, device-busy via utils/profiling.measure_device_busy,
steps=5, 2026-08): it is NOT a win at the UNet's serving shapes —

    shape (NHWC -> K)        bf16      int8 raw   int8 +q/dq block
    32x320x320x64  -> 64     8.04 ms   10.48 ms   8.31 ms
    32x160x160x128 -> 128    2.34      2.20       2.12
    32x80x80x256   -> 256    1.64      1.49       1.36

- Level 1 LOSES outright: the int32 accumulator output doubles the
  write traffic of a memory-bound conv (4 B/elt vs bf16's 2), and the
  level-1 conv runs far below MXU speed anyway (~100-180 GB/s effective,
  see STATUS.md), so halving MXU time buys nothing.
- Levels 2-3 win only 9-17% — these shapes are HBM-bound too; the 2x
  MXU int8 rate is unreachable when the roofline is bandwidth.
- Net over the 37.2 ms serving step: ~1-2 ms, before paying the
  quantize/dequantize plumbing, the amax-calibration pass, and a second
  RCPS calibration. Dropped; bf16 stays the serving precision.

Run: PYTHONPATH=/root/repo python benchmarks/bench_int8_conv.py
"""

from __future__ import annotations

from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.utils.profiling import measure_device_busy

    shapes = [
        (32, 320, 320, 64, 64),  # UNet level 1
        (32, 160, 160, 128, 128),  # level 2
        (32, 80, 80, 256, 256),  # level 3
        (32, 40, 40, 512, 512),  # level 4
    ]
    rng = np.random.RandomState(0)
    print("3x3 SAME conv, device-busy ms (steps=5)")
    for B, H, W, C, K in shapes:
        x = rng.randn(B, H, W, C).astype(np.float32)
        w = (rng.randn(3, 3, C, K) * 0.05).astype(np.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

        def conv(xx, ww, acc=None):
            return jax.lax.conv_general_dilated(
                xx, ww, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc,
            )

        xb = jnp.asarray(x, jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        xi = jnp.asarray(np.clip(np.round(x * 10), -127, 127), jnp.int8)
        wi = jnp.asarray(np.clip(np.round(w * 100), -127, 127), jnp.int8)

        # end-to-end PTQ block: bf16 in -> static-scale quantize -> int8
        # conv (int32 accum) -> per-channel dequant + ReLU -> bf16 out
        sx = jnp.float32(0.1)
        swv = jnp.full((K,), 0.01, jnp.float32)

        def qblock(a, wq):
            q = jnp.clip(jnp.round(a.astype(jnp.float32) / sx), -127, 127)
            o = conv(q.astype(jnp.int8), wq, acc=jnp.int32)
            return jnp.maximum(o.astype(jnp.float32) * (sx * swv), 0).astype(
                jnp.bfloat16
            )

        f_bf = jax.jit(lambda a, b: conv(a, b))
        f_i8 = jax.jit(partial(conv, acc=jnp.int32))
        f_q = jax.jit(qblock)
        sb = measure_device_busy(f_bf, xb, wb, steps=5)
        si = measure_device_busy(f_i8, xi, wi, steps=5)
        sq = measure_device_busy(f_q, xb, wi, steps=5)
        row = f"{B}x{H}x{W}x{C}->{K}:"
        if sb and si and sq:
            print(
                f"{row} bf16 {sb['total_ms']:.3f}  int8-raw {si['total_ms']:.3f}"
                f"  int8+q/dq {sq['total_ms']:.3f}"
            )
        else:
            print(f"{row} profiling unavailable on this backend")


if __name__ == "__main__":
    main()

"""Per-UNet-level conv3x3 timings: XLA vs the production Pallas path.

Measures forward AND backward (dgrad+wgrad via jax.grad) device-busy time
at every distinct (H, Cin, Cout) the batch-32 320² UNet runs, bf16. The
results feed the shape gate in ops/pallas_conv.py: Pallas only where it
measures faster than XLA, including the jnp.pad overhead it pays.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_conv_levels.py [batch]
"""

from __future__ import annotations

import sys

import numpy as np


# (H, Cin, Cout) per conv in the batch-32 320^2 UNet (fwd; dgrad mirrors
# with Cin/Cout swapped). Virtual-concat decoder convs appear as their
# split parts.
LEVELS = [
    (320, 64, 64),    # inc conv1, up4 split parts + conv1
    (160, 64, 128),   # down1 conv0 (pad path)
    (160, 128, 128),  # down1 conv1, up3 split parts
    (160, 128, 64),   # up3 conv1
    (80, 128, 256),   # down2 conv0
    (80, 256, 256),   # down2 conv1, up2 split parts
    (80, 256, 128),   # up2 conv1
    (40, 256, 512),   # down3 conv0
    (40, 512, 512),   # down3 conv1, up1 split parts
    (40, 512, 256),   # up1 conv1
    (20, 512, 512),   # down4 conv0+conv1
]


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv
    from im2im_uq_tpu.utils.cache import enable_compilation_cache
    from im2im_uq_tpu.utils.profiling import measure_device_busy

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    def xconv(x, k, b):
        # matches flax nn.Conv's bf16 compute path (no preferred_element_type;
        # the MXU still accumulates f32 internally)
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b

    results = {}
    for h, cin, cout in LEVELS:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(batch, h, h, cin), jnp.bfloat16)
        k = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.randn(cout), jnp.bfloat16)

        row = {}
        for name, fn in (("xla", xconv), ("pallas", pconv)):
            fwd = jax.jit(fn)
            out = fwd(x, k, b)
            jax.block_until_ready(out)
            st = measure_device_busy(fwd, x, k, b, steps=5)
            row[f"{name}_fwd"] = st["total_ms"] if st else float("nan")

            grad = jax.jit(jax.grad(lambda x, k, b: jnp.sum(fn(x, k, b).astype(jnp.float32) ** 2), argnums=(0, 1)))
            g = grad(x, k, b)
            jax.block_until_ready(g)
            st = measure_device_busy(grad, x, k, b, steps=5)
            row[f"{name}_fwdbwd"] = st["total_ms"] if st else float("nan")
        results[(h, cin, cout)] = row
        print(
            f"{h:4d}^2 {cin:4d}->{cout:4d}: "
            f"fwd xla {row['xla_fwd']:6.2f} pallas {row['pallas_fwd']:6.2f} | "
            f"fwd+bwd xla {row['xla_fwdbwd']:6.2f} pallas {row['pallas_fwdbwd']:6.2f}",
            flush=True,
        )

    print("\nPallas wins (fwd):", [s for s, r in results.items() if r["pallas_fwd"] < r["xla_fwd"]])
    print("Pallas wins (fwd+bwd):", [s for s, r in results.items() if r["pallas_fwdbwd"] < r["xla_fwdbwd"]])


if __name__ == "__main__":
    main()

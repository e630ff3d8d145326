"""Measure the minor-dim (lane) padding tax on bf16 tensors.

TPU tiled layouts pad the minor dimension to the 128-lane tile. If a
(B,H,W,64) bf16 tensor is physically stored as 128-lane rows, every HBM
pass over it costs 2x the logical bytes — a constant tax on the UNet's
level-0 (C=64) activations, which bench_component_map.py shows carry
~55% of the train step. This probe times an identical-element-count
elementwise op at minor dims 64 vs 128 vs 256 and prints the achieved
effective bandwidth, plus XLA's buffer sizes for the same shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_lane_tax.py
"""

from __future__ import annotations

import sys
import tempfile


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.utils.profiling import _tpu_op_durations, trace

    shapes = [
        (32, 320, 320, 64),   # level-0 activation: 64-lane minor
        (32, 320, 160, 128),  # same elements, full 128-lane minor
        (32, 320, 80, 256),   # same elements, 2x lane tile
        (32, 320, 320, 128),  # 2x elements, full lanes (scaling check)
        (32, 320, 320, 32),   # quarter-lane minor (head tensors)
    ]

    @jax.jit
    def ew(x):
        return x * jnp.bfloat16(1.0009765625) + jnp.bfloat16(0.5)

    for shape in shapes:
        x = jnp.zeros(shape, jnp.bfloat16)
        y = ew(x)
        jax.block_until_ready(y)
        # buffer size as XLA sees it
        try:
            c = jax.jit(ew).lower(x).compile()
            mem = c.memory_analysis()
            out_bytes = mem.output_size_in_bytes
        except Exception:
            out_bytes = -1
        steps = 20
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                for _ in range(steps):
                    x = ew(x)
                jax.block_until_ready(x)
            ops = _tpu_op_durations(td)
        if not ops:
            print("no trace")
            return
        ms = sum(ops.values()) / steps / 1e3
        logical_gb = 2 * x.size * 2 / 1e9  # read + write, bf16
        print(
            f"{str(shape):>22}  {ms:7.3f} ms/op   eff {logical_gb/ (ms/1e3):6.1f} GB/s"
            f"   xla_out_bytes={out_bytes/1e6:.1f} MB (logical {x.size*2/1e6:.1f})"
        )


if __name__ == "__main__":
    main()

"""Probe: batch-to-lane packing for the C=64 level-0 region.

A (32,320,320,64) bf16 tensor occupies 128 physical lanes (the lane tax,
bench_lane_tax.py): every HBM pass moves 2x the logical bytes and every
MXU tile of a 64->64 conv is 3/4 zeros. Packing PAIRS of batch images
into the lane dim — (32,H,W,64) -> (16,H,W,128) — fills the tiles and
halves the traffic. The 64->64 conv becomes a 128->128 conv with a
block-diagonal kernel (or feature_group_count=2), computing both images'
convs in full tiles.

This probe measures, at the flagship level-0 geometry (device-busy):
  1. conv 64->64 unpacked (the current 8 ms offender)
  2. conv 128->128 block-diag dense kernel, packed
  3. conv feature_group_count=2, packed
  4. BN-ish elementwise+reduce at 64 vs packed 128 lanes
  5. the pack/unpack relayout cost itself

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_batch_pack.py
"""

from __future__ import annotations

import sys
import tempfile


def _busy(fn, *args, steps=20):
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
    return sum(ops.values()) / steps / 1e3 if ops else float("nan")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")

    B, H, W, C = 32, 320, 320, 64
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    xp = jnp.asarray(rng.standard_normal((B // 2, H, W, 2 * C)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)

    def conv(a, kk, groups=1):
        return jax.lax.conv_general_dilated(
            a, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        ).astype(a.dtype)

    @jax.jit
    def conv_unpacked(a, kk):
        return conv(a, kk)

    @jax.jit
    def conv_blockdiag(a, kk):
        kbig = jnp.zeros((3, 3, 2 * C, 2 * C), kk.dtype)
        kbig = kbig.at[:, :, :C, :C].set(kk)
        kbig = kbig.at[:, :, C:, C:].set(kk)
        return conv(a, kbig)

    @jax.jit
    def conv_grouped(a, kk):
        kg = jnp.concatenate([kk, kk], axis=-1)  # (3,3,C,2C), groups=2
        return conv(a, kg, groups=2)

    @jax.jit
    def bnish(a):
        m = jnp.mean(a.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.mean(jnp.square(a.astype(jnp.float32)), axis=(0, 1, 2)) - m * m
        return jnp.maximum((a.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5), 0).astype(a.dtype)

    @jax.jit
    def pack(a):
        b, h, w, c = a.shape
        return a.reshape(b // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b // 2, h, w, 2 * c)

    @jax.jit
    def unpack(a):
        b, h, w, c2 = a.shape
        return a.reshape(b, h, w, 2, c2 // 2).transpose(0, 3, 1, 2, 4).reshape(2 * b, h, w, c2 // 2)

    # correctness: packed block-diag == unpacked conv on the two halves
    y_ref = np.asarray(conv_unpacked(x, k), np.float32)
    y_bd = np.asarray(unpack(conv_blockdiag(pack(x), k)), np.float32)
    y_gr = np.asarray(unpack(conv_grouped(pack(x), k)), np.float32)
    print("blockdiag rel", np.linalg.norm(y_bd - y_ref) / np.linalg.norm(y_ref))
    print("grouped  rel", np.linalg.norm(y_gr - y_ref) / np.linalg.norm(y_ref))

    print(f"conv64 unpacked   {_busy(conv_unpacked, x, k):8.3f} ms")
    print(f"conv128 blockdiag {_busy(conv_blockdiag, xp, k):8.3f} ms")
    print(f"conv128 grouped   {_busy(conv_grouped, xp, k):8.3f} ms")
    print(f"bn-ish 64 lanes   {_busy(bnish, x):8.3f} ms")
    print(f"bn-ish 128 lanes  {_busy(bnish, xp):8.3f} ms")
    print(f"pack              {_busy(pack, x):8.3f} ms")
    print(f"unpack            {_busy(unpack, xp):8.3f} ms")


if __name__ == "__main__":
    main()

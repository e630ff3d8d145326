"""Batch-to-lane packing for sub-lane-width channel counts.

The UNet's level-0 region (320², C=64) dominates the train step (~84 ms
of 160 at bf16 batch 32, benchmarks/bench_component_map.py) and pays the
TPU lane tax twice over: a C=64 bf16 tensor is physically stored on 128
lanes (2× HBM traffic for every pass, benchmarks/bench_lane_tax.py) and
every MXU tile of a 64→64 conv is ¾ zeros. Packing PAIRS of batch images
into the lane dim — (B,H,W,C) → (B/2,H,W,2C) — fills the tiles and the
lanes. The 64→64 conv becomes a 128→128 conv with a block-diagonal
kernel computing both images' convs in full tiles; spatial padding can't
mix the two images because they ride disjoint channel blocks.

Measured (v5e bf16 batch 32 @320²·64, benchmarks/bench_batch_pack.py,
device-busy): conv 8.04 → 4.66 ms packed block-diag (grouped conv
feature_group_count=2 lowers terribly: 11.2 ms — do NOT use it);
pack relayout 2.9 ms, unpack 7.1 ms at full res — so pack/unpack only at
small or low-res tensors and keep the whole level-0 subgraph packed.

These are pure XLA transforms (no Pallas): they compose with GSPMD,
autodiff, and remat for free. The pairing is (2i, 2i+1); any fixed
disjoint pairing is equivalent because every consumer is either
per-image (convs, pools, resize) or pairing-invariant (batch means,
BN statistics averaged across halves).

No reference counterpart: the reference's CUDA/cuDNN path has no lane
tiling (reference core/models/trunks/unet_parts.py runs NCHW convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack2", "unpack2", "blockdiag2", "tile2"]


def pack2(x: jax.Array) -> jax.Array:
    """(B,H,W,C) → (B/2,H,W,2C): image 2i on channels [:C], 2i+1 on [C:]."""
    b, h, w, c = x.shape
    assert b % 2 == 0, x.shape
    return x.reshape(b // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        b // 2, h, w, 2 * c
    )


def unpack2(x: jax.Array) -> jax.Array:
    """Inverse of pack2: (B/2,H,W,2C) → (B,H,W,C)."""
    b2, h, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(b2, h, w, 2, c).transpose(0, 3, 1, 2, 4).reshape(
        2 * b2, h, w, c
    )


def blockdiag2(kernel: jax.Array) -> jax.Array:
    """(kh,kw,Cin,Cout) conv kernel → (kh,kw,2Cin,2Cout) block-diagonal.

    conv(pack2(x), blockdiag2(K)) == pack2(conv(x, K)): each image's
    channel block only sees its own diagonal block. The off-diagonal
    zeros cost MXU MACs that the lane-padded unpacked conv was already
    wasting on pad lanes — net 2× fewer MXU tiles at C=64.
    """
    kh, kw, cin, cout = kernel.shape
    z = jnp.zeros((kh, kw, cin, cout), kernel.dtype)
    top = jnp.concatenate([kernel, z], axis=3)
    bot = jnp.concatenate([z, kernel], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def tile2(v: jax.Array) -> jax.Array:
    """Per-channel vector (C,) → (2C,) for packed application."""
    return jnp.concatenate([v, v], axis=0)

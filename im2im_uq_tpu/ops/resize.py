"""Spatial resize ops with align-corners semantics.

The reference trunk upsamples with torch.nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True) (reference: core/models/trunks/
unet_parts.py:53). jax.image.resize only implements half-pixel-centers
bilinear, so we implement the align-corners variant directly as a separable
two-tap gather + lerp — pure VPU work with static shapes, cheap for XLA to
fuse into the surrounding convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear_align_corners", "upsample2x_align_corners"]


def _resize_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1 or in_size == 1:
        pos = jnp.zeros((out_size,), dtype=jnp.float32)
    else:
        scale = (in_size - 1) / (out_size - 1)
        pos = jnp.arange(out_size, dtype=jnp.float32) * scale
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = (pos - i0.astype(jnp.float32)).astype(x.dtype)

    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return lo + (hi - lo) * frac


def resize_bilinear_align_corners(
    x: jax.Array, out_hw: tuple[int, int], *, spatial_axes: tuple[int, int] = (1, 2)
) -> jax.Array:
    """Bilinear resize with align_corners=True over the given spatial axes.

    Default axes (1, 2) match NHWC activations.
    """
    h_axis, w_axis = spatial_axes
    x = _resize_axis(x, out_hw[0], h_axis)
    return _resize_axis(x, out_hw[1], w_axis)


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x spatial upsample (NHWC) with align_corners=True bilinear weights."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))

"""On-device MRI pipeline: k-space → model input, fused into the training
program.

The reference runs its physics on the host, one slice at a time, inside the
data loader (reference: core/datasets/fastmri/transforms.py:252-328 —
mask → ifft2c → complex_center_crop → complex_abs → rss), with
num_workers=0 so the GPU waits on every FFT. TPU-native counterpart: the
same math as batched jnp ops (ops/fftc.py) compiled INTO the train/eval
step — pass ``zero_filled_recon`` (or a closure over it) as the
``preprocess`` argument of ``training.train.make_train_step`` and the
mask-multiply/IFFT/crop/magnitude fuse with the UNet forward in one XLA
program; the loader only ships raw k-space bytes. Mask *generation* stays
on the host (data/subsample.py) to preserve the reference's per-volume
seeding quirk — masks are tiny; applying them is the device's job.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from im2im_uq_tpu.ops.fftc import complex_abs, ifft2c, rss

__all__ = ["complex_center_crop", "center_crop", "zero_filled_recon"]


def complex_center_crop(data: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Center-crop dims (-3, -2) of a real-pair array (transforms.py:105-141).

    Crop sizes are static, so this lowers to a plain slice.
    """
    h, w = data.shape[-3], data.shape[-2]
    ch, cw = shape
    if not (0 < ch <= h and 0 < cw <= w):
        raise ValueError(f"crop {shape} invalid for input {(h, w)}")
    h0 = (h - ch) // 2
    w0 = (w - cw) // 2
    return data[..., h0 : h0 + ch, w0 : w0 + cw, :]


def center_crop(data: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Center-crop the last two dims (transforms.py:95-102)."""
    h, w = data.shape[-2], data.shape[-1]
    ch, cw = shape
    if not (0 < ch <= h and 0 < cw <= w):
        raise ValueError(f"crop {shape} invalid for input {(h, w)}")
    h0 = (h - ch) // 2
    w0 = (w - cw) // 2
    return data[..., h0 : h0 + ch, w0 : w0 + cw]


def zero_filled_recon(
    kspace_pair: jax.Array,
    mask: Optional[jax.Array],
    crop: Tuple[int, int],
    multicoil: bool = False,
) -> jax.Array:
    """Batched masked zero-filled reconstruction, NHWC output.

    Same recipe as the host UnetDataTransform (reference transforms.py:
    252-328): ``kspace_pair`` is (B[, coils], H, W, 2) real-pair k-space;
    ``mask`` broadcasts against it (e.g. (1, 1, W, 1) for a column mask) and
    may be None for the fully-sampled target recon. Returns (B, ch, cw, 1)
    magnitude images. Jit/grad-safe; fuses with whatever consumes it.
    """
    masked = kspace_pair if mask is None else kspace_pair * mask
    img = ifft2c(masked)
    img = complex_center_crop(img, crop)
    mag = complex_abs(img)
    if multicoil:
        mag = rss(mag, axis=1)  # (B, coils, h, w) → (B, h, w)
    return mag[..., None]

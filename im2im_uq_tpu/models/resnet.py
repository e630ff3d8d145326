"""ResNet-18 trunk (flax, NHWC).

The reference router has a vestigial CIFAR10/ResNet18 branch (reference:
core/scripts/router.py:58-62,80-82) that constructs a torchvision resnet18;
it could never reach add_uncertainty there (no ``n_channels_middle``
attribute). This implementation carries the branch over *and* makes it
functional as a UQ trunk: standard ResNet-18 feature extractor whose final
feature map is projected to ``n_channels_middle`` channels and bilinearly
upsampled back to the input resolution, so every uncertainty head works on
top of it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from im2im_uq_tpu.models.unet import TorchBatchNorm, conv_kernel_init
from im2im_uq_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["ResNet18"]


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=k // 2, use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 3, self.strides, "conv1")(x)))
        y = bn("bn2")(conv(self.features, 3, 1, "conv2")(y))
        if residual.shape != y.shape:
            residual = bn("bn_proj")(
                conv(self.features, 1, self.strides, "proj")(residual)
            )
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """ResNet-18 feature trunk emitting ``n_channels_middle`` channels at
    input resolution (CIFAR-style 3x3 stem)."""

    n_channels_out: int = 1
    dtype: Any = None
    n_channels_middle: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        y = nn.Conv(
            64, (3, 3), padding=1, use_bias=False,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="stem",
        )(x)
        y = nn.relu(
            TorchBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           name="stem_bn")(y)
        )
        for i, (features, strides) in enumerate(
            [(64, 1), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2), (512, 1)]
        ):
            y = _BasicBlock(features, strides, dtype=self.dtype, name=f"block{i}")(
                y, train
            )
        y = nn.Conv(
            self.n_channels_middle, (1, 1),
            kernel_init=conv_kernel_init, dtype=self.dtype, name="out",
        )(y)
        y = resize_bilinear_align_corners(y, (h, w))
        return y.astype(jnp.float32)

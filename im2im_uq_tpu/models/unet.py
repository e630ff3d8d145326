"""Flax UNet / WNet trunks, NHWC, TPU-first.

Re-design of the reference trunks (reference: core/models/trunks/unet.py:10-46,
unet_parts.py:8-93, wnet.py:9-59): the same topology — DoubleConv encoder with
4 maxpool downs (64→128→256→512→512 with bilinear upsampling), skip-concat
decoder, and a 1×1 projection to ``n_channels_middle = 32`` trunk features —
but laid out channels-last so conv channels ride the TPU lane dimension, with
an optional bfloat16 compute dtype (params and BatchNorm statistics stay
float32).

Initialization follows torch's Conv2d default (kaiming-uniform with a=√5 ⇒
U(±1/√fan_in) for kernels and biases) so training dynamics track the
reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from im2im_uq_tpu.ops.resize import upsample2x_align_corners

__all__ = [
    "UNet",
    "WNet",
    "DoubleConv",
    "Down",
    "Up",
    "TorchBatchNorm",
    "conv_kernel_init",
    "max_pool2x2",
]


class TorchBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's UNBIASED running-variance update.

    torch.nn.BatchNorm2d normalizes with the biased batch variance but
    stores the Bessel-corrected (n/(n−1)) variance in ``running_var``
    (reference models train with torch defaults, unet_parts.py:13-24);
    flax stores the biased one — a small but real eval-mode divergence
    after training. Only the running-stat update differs from the parent
    (uses flax's private normalization helpers; pinned-env acceptable).
    Under GSPMD jit, ``x.shape`` is the global shape, so n counts the full
    cross-device batch — matching the sync-BN statistics.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import normalization as _nrm

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _nrm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]
        stat_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), feature_shape
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            if not self.force_float32_reductions:
                mean = jnp.asarray(mean, self.param_dtype)
                var = jnp.asarray(var, self.param_dtype)
        else:
            mean, var = _nrm._compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var * bessel
                )

        return _nrm._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default kernel init: U(±1/√fan_in), fan_in = kh·kw·cin.

    Flax conv kernels are (kh, kw, cin, cout).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _TorchBiasInit:
    """torch Conv2d default bias init: U(±1/√fan_in) with the conv's fan_in."""

    def __init__(self, fan_in: int):
        self.bound = 1.0 / float(fan_in) ** 0.5

    def __call__(self, key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -self.bound, self.bound)


def conv3x3(features: int, in_features: int, dtype: Any = None, name: str | None = None):
    return nn.Conv(
        features,
        (3, 3),
        padding=1,
        kernel_init=conv_kernel_init,
        bias_init=_TorchBiasInit(9 * in_features),
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, in_features: int, dtype: Any = None, name: str | None = None):
    return nn.Conv(
        features,
        (1, 1),
        kernel_init=conv_kernel_init,
        bias_init=_TorchBiasInit(in_features),
        dtype=dtype,
        name=name,
    )


class Conv1x1Params(nn.Module):
    """Declares a conv1x1's (kernel, bias) without running the conv.

    Same scope path, param names, shapes, and inits as the ``conv1x1``
    nn.Conv it stands in for (see Conv3x3Params). Used by the lane-packed
    out-conv, where the conv runs manually with a block-diagonal kernel.
    """

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kernel_init, (1, 1, self.cin, self.cout))
        bias = self.param("bias", _TorchBiasInit(self.cin), (self.cout,))
        return kernel, bias


class Conv3x3Params(nn.Module):
    """Declares a conv3x3's (kernel, bias) without running the conv.

    Same scope path, param names, shapes, and init functions as the
    ``conv3x3`` nn.Conv it stands in for — flax derives param RNG keys from
    the scope path, so initial values and checkpoint trees are bit-identical
    (pinned by tests). Used where the conv itself is computed manually:
    fused multi-head convs (models/heads.py) and the skip-concat-free
    decoder conv below.
    """

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kernel_init, (3, 3, self.cin, self.cout))
        bias = self.param("bias", _TorchBiasInit(9 * self.cin), (self.cout,))
        return kernel, bias


def conv3x3_apply(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Plain NHWC 3×3 same-padding convolution (no bias)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def max_pool2x2(x: jax.Array) -> jax.Array:
    """2×2/stride-2 max pool as reshape + axis-max (torch floor semantics).

    Same forward values as nn.max_pool 2×2/2; the reshape is free
    (row-major) and the backward is an elementwise eq-mask instead of
    reduce_window's select_and_scatter. Odd trailing rows/cols are
    dropped, matching torch.nn.MaxPool2d floor division (reference
    unet_parts.py:33).

    Measured finding (v5e, UNet bf16 batch 32 @320²): the eq-mask backward
    is ~5 ms/step SLOWER than XLA's select_and_scatter here (the mask pass
    re-reads the full pre-pool tensor), so Down keeps nn.max_pool; this is
    retained as the documented probe and for odd-size-safe pooling needs.
    """
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2, :]
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


def pool2x2(x: jax.Array, backend: str = "xla") -> jax.Array:
    """Down's 2×2/2 max pool (reference unet_parts.py:33).

    ``backend='pallas'``: on a single real TPU chip with an eligible
    shape, the backward runs the fused Pallas scatter (ops/pallas_pool.py
    — one pass instead of select_and_scatter + mask/convert fusions,
    bit-exact incl. tie-breaking, and 2× faster STANDALONE: 2.06 vs
    4.05 ms at 320²×128). Default stays XLA's nn.max_pool because
    IN-STEP the custom call regresses the whole train step (126 →
    158 ms bf16 batch 32): its row-major operand layout constraint
    forces full-res layout-conversion copies — XLA lays these
    activations out {3,0,2,1} — and the conversions contaminate
    neighboring fusions. Measured finding; revisit if Pallas grows
    layout-aware operands.
    """
    from im2im_uq_tpu.ops import pallas_pool as _pp

    if (
        backend == "pallas"
        and _pp.pool_bwd_eligible(x.shape, x.dtype)
        and _pp._on_tpu()
        and jax.device_count() == 1
    ):
        return checkpoint_name(_pp.max_pool2x2(x), "pool_out")
    return checkpoint_name(nn.max_pool(x, (2, 2), strides=(2, 2)), "pool_out")


class FusedBN(nn.Module):
    """BatchNorm bookkeeping for the fused-conv path (same tree as flax BN).

    Declares the exact parameter/variable names and shapes of
    ``TorchBatchNorm`` (params: scale, bias; batch_stats: mean, var) so
    checkpoints are interchangeable between conv backends, but the
    normalization itself never runs here: it is folded into the NEXT
    Pallas conv's prologue as a per-channel (scale, shift) pair. The
    running-stat update keeps torch's unbiased-variance semantics
    (TorchBatchNorm docstring; reference unet_parts.py:13-24).

    ``__call__`` takes this BN's input-tensor per-channel sums/sumsqs (the
    fused conv's epilogue output) and the reduction count n, and returns
    the folded (scale, shift).
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, sums, sumsqs, n, train: bool = False):
        scale_p = self.param("scale", nn.initializers.ones, (self.features,))
        bias_p = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,),
        )
        if train:
            mean = sums / n
            var = sumsqs / n - mean * mean  # flax use_fast_variance form
            if not self.is_initializing():
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum)
                    * jax.lax.stop_gradient(mean)
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum)
                    * jax.lax.stop_gradient(var) * bessel
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        s = scale_p * jax.lax.rsqrt(var + self.epsilon)
        return s, bias_p - mean * s


class PackedBN(nn.Module):
    """TorchBatchNorm semantics on a lane-packed (B/2, H, W, 2C) tensor.

    Parameter/variable names, shapes, dtypes, and the running-stat update
    (torch unbiased running_var, biased normalization — see
    TorchBatchNorm) are identical to TorchBatchNorm at the LOGICAL C, so
    checkpoints are interchangeable with the unpacked path. Batch moments
    are reduced per packed channel then averaged across the two image
    halves — exactly the global per-logical-channel statistics, since the
    halves have equal counts. The normalize applies the folded
    (mul, add) = (γ·rsqrt(σ²+ε), β − μ·mul) pair tiled ×2 on lanes, in
    the compute dtype (one fused multiply-add per element).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from im2im_uq_tpu.ops.lane_pack import tile2

        c = x.shape[-1] // 2
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        if train:
            xf = x.astype(jnp.float32)
            m2 = jnp.mean(xf, axis=(0, 1, 2))
            q2 = jnp.mean(xf * xf, axis=(0, 1, 2))
            mean = 0.5 * (m2[:c] + m2[c:])
            var = 0.5 * (q2[:c] + q2[c:]) - mean * mean  # use_fast_variance form
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2] * 2
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * jax.lax.stop_gradient(mean)
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * jax.lax.stop_gradient(var) * bessel
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        mul, add = tile2(mul), tile2(add)
        x, mul, add = nn.dtypes.promote_dtype(x, mul, add, dtype=self.dtype)
        return x * mul + add


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 (reference unet_parts.py:8-25).

    BatchNorm uses torch defaults (eps 1e-5, torch momentum 0.1 ⇒ flax
    momentum 0.9). Under bf16 compute the *activations* stay bf16 through
    the BN (halving HBM traffic, the usual UNet bottleneck) while the
    statistics are still reduced in float32 — flax's _compute_stats
    force-promotes reductions to ≥f32 — and scale/bias/running stats live
    in float32 (param_dtype). Under pjit with a batch-sharded input the
    batch-stat reductions are global, i.e. sync-BN across the
    data-parallel mesh for free.
    """

    features: int
    mid_features: Optional[int] = None
    dtype: Any = None
    # "xla" | "pallas" (plain kernel swap) | "pallas_fused" (BN+ReLU folded
    # into the conv kernels' prologue/epilogue — see ops/pallas_conv.py)
    conv_backend: str = "xla"
    # lane-packed input (B/2, H, W, 2C): block-diagonal XLA convs +
    # PackedBN; takes precedence over conv_backend (see ops/lane_pack.py)
    packed: bool = False
    # "flax" (TorchBatchNorm/PackedBN: XLA fuses the stats reduces into the
    # elementwise passes) | "dot" | "barrier" (ops/batchnorm.py: reductions
    # as MXU dots / barrier-isolated reduce kernels — see that module's
    # roofline rationale). Parameter/batch-stats trees are identical.
    bn_backend: str = "flax"

    def _bn(self, i: int, x, train: bool, groups: int = 1):
        if self.bn_backend != "flax":
            from im2im_uq_tpu.ops.batchnorm import DotBatchNorm

            return DotBatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                method=self.bn_backend,
                groups=groups,
                name=f"bn{i}",
            )(x)
        if groups > 1:
            return PackedBN(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn{i}"
            )(x, train)
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=f"bn{i}",
        )(x)

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        mid = self.mid_features if self.mid_features is not None else self.features
        if self.packed:
            if self.conv_backend == "pallas_fused":
                return self._packed_fused(x, mid, train)
            return self._packed(x, mid, train)
        if self.conv_backend == "pallas_fused":
            return self._fused(x, mid, train)
        use_pallas = self.conv_backend == "pallas"
        if isinstance(x, (tuple, list)):
            # virtual-concat input (a ‖ b): conv(concat(a,b), W) computed as
            # conv(a, W[:cin_a]) + conv(b, W[cin_a:]) — identical math, but
            # the (B, H, W, cin_a+cin_b) concat tensor is never materialized
            # (nor split in backward), saving a full-res HBM round trip per
            # decoder level. Param tree is identical to the concat path.
            a, b = x
            ca = a.shape[-1]
            kernel, bias = Conv3x3Params(ca + b.shape[-1], mid, name="conv0")()
            a, b, kernel, bias = nn.dtypes.promote_dtype(
                a, b, kernel, bias, dtype=self.dtype
            )
            if use_pallas:
                from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv3x3

                zero = jnp.zeros((mid,), bias.dtype)
                x = pconv3x3(a, kernel[:, :, :ca], bias) + pconv3x3(
                    b, kernel[:, :, ca:], zero
                )
            else:
                x = (
                    conv3x3_apply(a, kernel[:, :, :ca])
                    + conv3x3_apply(b, kernel[:, :, ca:])
                    + bias
                )
        elif use_pallas:
            from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv3x3

            kernel, bias = Conv3x3Params(x.shape[-1], mid, name="conv0")()
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            x = pconv3x3(x, kernel, bias)
        else:
            x = conv3x3(mid, x.shape[-1], dtype=self.dtype, name="conv0")(x)

        def bn(i, x):
            return self._bn(i, x, train)

        # checkpoint_name tags are identity ops outside jax.checkpoint; under
        # UNet.remat they let the policy pick which tensors survive to the
        # backward (conv outputs) vs get recomputed (BN normalize + ReLU)
        x = checkpoint_name(x, "conv_out")
        x = checkpoint_name(nn.relu(bn(0, x)), "bn_relu_out")
        if use_pallas:
            from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv3x3

            kernel, bias = Conv3x3Params(x.shape[-1], self.features, name="conv1")()
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            x = pconv3x3(x, kernel, bias)
        else:
            x = conv3x3(self.features, x.shape[-1], dtype=self.dtype, name="conv1")(x)
        x = checkpoint_name(x, "conv_out")
        return checkpoint_name(nn.relu(bn(1, x)), "bn_relu_out")

    def _packed(self, x, mid: int, train: bool) -> jax.Array:
        """Lane-packed DoubleConv: identical math per image half, full MXU
        tiles and lanes at logical C=64 (ops/lane_pack.py). Param tree is
        bit-identical to the unpacked path (Conv3x3Params + PackedBN name
        and shape contracts at logical C)."""
        from im2im_uq_tpu.ops.lane_pack import blockdiag2, tile2

        if isinstance(x, (tuple, list)):
            # virtual concat of two PACKED maps: the split kernels get
            # block-diagonalized independently — no interleaved concat
            # tensor is ever materialized
            a, b = x
            ca = a.shape[-1] // 2
            kernel, bias = Conv3x3Params(ca + b.shape[-1] // 2, mid, name="conv0")()
            a, b, kernel, bias = nn.dtypes.promote_dtype(
                a, b, kernel, bias, dtype=self.dtype
            )
            x = (
                conv3x3_apply(a, blockdiag2(kernel[:, :, :ca]))
                + conv3x3_apply(b, blockdiag2(kernel[:, :, ca:]))
                + tile2(bias)
            )
        else:
            kernel, bias = Conv3x3Params(x.shape[-1] // 2, mid, name="conv0")()
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            x = conv3x3_apply(x, blockdiag2(kernel)) + tile2(bias)
        x = checkpoint_name(x, "conv_out")
        x = checkpoint_name(nn.relu(self._bn(0, x, train, groups=2)), "bn_relu_out")
        kernel, bias = Conv3x3Params(mid, self.features, name="conv1")()
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        x = conv3x3_apply(x, blockdiag2(kernel)) + tile2(bias)
        x = checkpoint_name(x, "conv_out")
        return checkpoint_name(
            nn.relu(self._bn(1, x, train, groups=2)), "bn_relu_out"
        )

    def _packed_fused(self, x, mid: int, train: bool) -> jax.Array:
        """Lane-packed DoubleConv through the fused Pallas kernels: the
        packed (B/2, H, W, 2C) tensor is already 128-lane aligned, so the
        block-diagonal convs route through conv3x3_bn_act — BN+ReLU ride
        the conv prologue and the per-packed-channel stats epilogue
        replaces the full-res reduction (logical-channel sums are the two
        128-lane halves added, since the halves carry disjoint images).
        Parameter/batch-stats tree is bit-identical to _packed (Conv3x3-
        Params at logical C; FusedBN declares TorchBatchNorm's tree), so
        checkpoints are portable across all backends.
        """
        from im2im_uq_tpu.ops.lane_pack import blockdiag2, tile2
        from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv3x3
        from im2im_uq_tpu.ops.pallas_conv import conv3x3_bn_act

        if isinstance(x, (tuple, list)):
            # virtual concat of two packed maps: stats of (conv_a + conv_b)
            # don't decompose per part (Σ(y_a+y_b)² ≠ Σy_a²+Σy_b²), so the
            # parts use the plain kernel and the stats reduce in XLA
            a, b = x
            ca = a.shape[-1] // 2
            k0, b0 = Conv3x3Params(ca + b.shape[-1] // 2, mid, name="conv0")()
            a, b, k0, b0 = nn.dtypes.promote_dtype(a, b, k0, b0, dtype=self.dtype)
            zero = jnp.zeros((2 * mid,), b0.dtype)
            y0 = pconv3x3(a, blockdiag2(k0[:, :, :ca]), tile2(b0)) + pconv3x3(
                b, blockdiag2(k0[:, :, ca:]), zero
            )
            if train:
                y0f = y0.astype(jnp.float32)
                s0p = jnp.sum(y0f, axis=(0, 1, 2))
                q0p = jnp.sum(y0f * y0f, axis=(0, 1, 2))
        else:
            k0, b0 = Conv3x3Params(x.shape[-1] // 2, mid, name="conv0")()
            x, k0, b0 = nn.dtypes.promote_dtype(x, k0, b0, dtype=self.dtype)
            y0, st0 = conv3x3_bn_act(
                x, blockdiag2(k0), tile2(b0),
                jnp.ones((x.shape[-1],), jnp.float32),
                jnp.zeros((x.shape[-1],), jnp.float32),
                prologue=False, stats=train,
            )
            if train:
                s0p, q0p = st0[:, 0].sum(0), st0[:, 1].sum(0)
        if train:
            s0 = s0p[:mid] + s0p[mid:]
            q0 = q0p[:mid] + q0p[mid:]
        else:
            s0 = q0 = jnp.zeros((mid,), jnp.float32)
        n0 = y0.shape[0] * y0.shape[1] * y0.shape[2] * 2
        scale0, shift0 = FusedBN(mid, name="bn0")(s0, q0, n0, train)

        k1, b1 = Conv3x3Params(mid, self.features, name="conv1")()
        _, k1, b1 = nn.dtypes.promote_dtype(y0, k1, b1, dtype=self.dtype)
        y1, st1 = conv3x3_bn_act(
            y0, blockdiag2(k1), tile2(b1), tile2(scale0), tile2(shift0),
            prologue=True, stats=train,
        )
        if train:
            s1p, q1p = st1[:, 0].sum(0), st1[:, 1].sum(0)
            s1 = s1p[: self.features] + s1p[self.features :]
            q1 = q1p[: self.features] + q1p[self.features :]
        else:
            s1 = q1 = jnp.zeros((self.features,), jnp.float32)
        n1 = y1.shape[0] * y1.shape[1] * y1.shape[2] * 2
        scale1, shift1 = FusedBN(self.features, name="bn1")(s1, q1, n1, train)
        out = jnp.maximum(
            y1.astype(jnp.float32) * tile2(scale1) + tile2(shift1), 0.0
        )
        return out.astype(y1.dtype)

    def _fused(self, x, mid: int, train: bool) -> jax.Array:
        """Fused-kernel DoubleConv: the two BN+ReLU stages never touch HBM
        as separate passes. conv0 emits its per-channel stats from its
        epilogue; bn0's folded affine + ReLU ride conv1's prologue; only
        bn1's apply remains as (XLA-fused) elementwise work. Parameter and
        batch-stats trees are identical to the unfused path (Conv3x3Params
        + FusedBN name/shape contracts), so checkpoints are backend-
        portable.
        """
        from im2im_uq_tpu.ops.pallas_conv import conv3x3 as pconv3x3
        from im2im_uq_tpu.ops.pallas_conv import conv3x3_bn_act

        k0, b0 = (
            Conv3x3Params(
                (x[0].shape[-1] + x[1].shape[-1])
                if isinstance(x, (tuple, list))
                else x.shape[-1],
                mid,
                name="conv0",
            )()
        )
        if isinstance(x, (tuple, list)):
            # virtual-concat conv0: stats of (conv_a + conv_b) are not the
            # sum of per-part stats (Σ(y_a+y_b)² ≠ Σy_a²+Σy_b²), so the
            # parts use the plain kernel and the stats reduce in XLA
            a, b = x
            ca = a.shape[-1]
            a, b, k0, b0 = nn.dtypes.promote_dtype(a, b, k0, b0, dtype=self.dtype)
            zero = jnp.zeros((mid,), b0.dtype)
            y0 = pconv3x3(a, k0[:, :, :ca], b0) + pconv3x3(b, k0[:, :, ca:], zero)
            if train:
                y0f = y0.astype(jnp.float32)
                s0 = jnp.sum(y0f, axis=(0, 1, 2))
                q0 = jnp.sum(y0f * y0f, axis=(0, 1, 2))
            else:
                s0 = q0 = jnp.zeros((mid,), jnp.float32)
        else:
            x, k0, b0 = nn.dtypes.promote_dtype(x, k0, b0, dtype=self.dtype)
            y0, st0 = conv3x3_bn_act(
                x, k0, b0, jnp.ones((x.shape[-1],), jnp.float32),
                jnp.zeros((x.shape[-1],), jnp.float32),
                prologue=False, stats=train,
            )
            if train:
                s0, q0 = st0[:, 0].sum(0), st0[:, 1].sum(0)
            else:
                s0 = q0 = jnp.zeros((mid,), jnp.float32)
        n0 = y0.shape[0] * y0.shape[1] * y0.shape[2]
        scale0, shift0 = FusedBN(mid, name="bn0")(s0, q0, n0, train)

        k1, b1 = Conv3x3Params(mid, self.features, name="conv1")()
        _, k1, b1 = nn.dtypes.promote_dtype(y0, k1, b1, dtype=self.dtype)
        y1, st1 = conv3x3_bn_act(
            y0, k1, b1, scale0, shift0, prologue=True, stats=train
        )
        if train:
            s1, q1 = st1[:, 0].sum(0), st1[:, 1].sum(0)
        else:
            s1 = q1 = jnp.zeros((self.features,), jnp.float32)
        n1 = y1.shape[0] * y1.shape[1] * y1.shape[2]
        scale1, shift1 = FusedBN(self.features, name="bn1")(s1, q1, n1, train)
        out = jnp.maximum(
            y1.astype(jnp.float32) * scale1 + shift1, 0.0
        )
        return out.astype(y1.dtype)


class Down(nn.Module):
    """2×2 maxpool then DoubleConv (reference unet_parts.py:28-39)."""

    features: int
    dtype: Any = None
    conv_backend: str = "xla"
    pool_backend: str = "xla"
    bn_backend: str = "flax"  # see DoubleConv.bn_backend
    # input arrives lane-packed: pool it packed (halves the pool's HBM
    # traffic at full res), then unpack at the 4×-smaller pooled size
    packed_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = pool2x2(x, backend=self.pool_backend)
        if self.packed_input:
            from im2im_uq_tpu.ops.lane_pack import unpack2

            x = unpack2(x)
        return DoubleConv(
            self.features, dtype=self.dtype, conv_backend=self.conv_backend,
            bn_backend=self.bn_backend, name="conv",
        )(x, train)


class Up(nn.Module):
    """Upsample, pad-to-match, skip-concat, DoubleConv (reference unet_parts.py:42-69)."""

    features: int
    bilinear: bool = True
    dtype: Any = None
    conv_backend: str = "xla"
    # "auto" picks the fused Pallas upsample on a single real TPU chip;
    # "xla" keeps the program free of pallas_call (portable — required for
    # cross-platform jax.export AOT artifacts, scripts/export_serving.py)
    resize_backend: str = "auto"
    bn_backend: str = "flax"  # see DoubleConv.bn_backend
    # lane-packed decoder level: x1 (decoder stream) is packed here at the
    # LOW resolution (cheap relayout), x2 (skip) must already arrive
    # packed; upsample/pad/DoubleConv all run packed. bilinear only.
    packed: bool = False

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        if self.packed:
            assert self.bilinear, "lane packing supports the bilinear path only"
            from im2im_uq_tpu.ops.lane_pack import pack2

            x1 = pack2(x1)
        if self.bilinear:
            pf = 2 if self.packed else 1
            x1 = checkpoint_name(
                upsample2x_align_corners(x1, backend=self.resize_backend),
                "resize_out",
            )
            mid = x1.shape[-1] // pf // 2 + x2.shape[-1] // pf // 2
        else:
            half = x1.shape[-1] // 2
            x1 = nn.ConvTranspose(
                half,
                (2, 2),
                strides=(2, 2),
                kernel_init=conv_kernel_init,
                bias_init=_TorchBiasInit(4 * x1.shape[-1]),
                dtype=self.dtype,
                name="up",
            )(x1)
            mid = None
        # Center-pad the upsampled map to the skip connection's spatial size
        # (left gets diff//2, right the remainder — reference unet_parts.py:62).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
        )
        # virtual concat [x2, x1]: DoubleConv's split-kernel path computes
        # conv-over-concat without materializing the concatenated tensor
        return DoubleConv(
            self.features, mid_features=mid, dtype=self.dtype,
            conv_backend=self.conv_backend, bn_backend=self.bn_backend,
            packed=self.packed, name="conv",
        )((x2, x1), train)


class UpNoSkip(nn.Module):
    """Upsample + DoubleConv without a skip connection.

    Counterpart of the reference's unused Up_custom (unet_parts.py:71-84),
    kept for surface parity; supports arbitrary scale factors.
    """

    features: int
    scale_factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from im2im_uq_tpu.ops.resize import resize_bilinear_align_corners

        _, h, w, c = x.shape
        x = resize_bilinear_align_corners(
            x, (h * self.scale_factor, w * self.scale_factor)
        )
        return DoubleConv(
            self.features, mid_features=c // 2, dtype=self.dtype, name="conv"
        )(x, train)


class UNet(nn.Module):
    """Classic 4-down/4-up UNet trunk emitting 32 feature channels.

    Topology per reference core/models/trunks/unet.py:10-46 (bilinear=True:
    encoder 64/128/256/512/512, decoder 256/128/64/64, 1×1 out-conv to 32).
    Input/output are NHWC; ``n_channels_middle`` is the trunk-feature
    contract consumed by the uncertainty heads.
    """

    n_channels_out: int = 1
    bilinear: bool = True
    dtype: Any = None
    n_channels_middle: int = 32
    # False | True/"full" (save nothing per block — the memory-for-FLOPs
    # trade for batches past HBM) | "conv" (save only conv/pool/resize
    # outputs; BN normalize+ReLU and their stats recompute in the backward)
    # | "bn" (save everything except the post-BN/ReLU tensors — the minimal
    # recompute-the-elementwise experiment from VERDICT r2 #3)
    remat: Any = False
    conv_backend: str = "xla"  # "pallas" = ops/pallas_conv.py 3x3 kernels
    # "pallas" = ops/pallas_pool.py backward. Measured on the full train
    # step (v5e bf16 batch 32, device-busy): 157.9 vs 126.0 ms xla — the
    # custom-VJP boundary breaks XLA's fusions around the pool, costing
    # far more than the 8.8 ms pool-bwd bucket it targets. Stays opt-in.
    pool_backend: str = "xla"
    # lane-pack the level-0 (C=64, full-res) region: batch pairs ride the
    # lane dim through inc → down1's pool → up4 → out → (packed) trunk
    # output. Requires an even batch (odd batches silently fall back) and
    # the bilinear decoder. See ops/lane_pack.py for the measurements.
    lane_pack: bool = False
    # decoder upsample backend (see Up.resize_backend): "auto" | "xla" | "pallas"
    resize_backend: str = "auto"
    # "flax" | "dot" | "barrier" — see DoubleConv.bn_backend / ops/batchnorm.py
    bn_backend: str = "flax"

    def packs(self, x: jax.Array) -> bool:
        """Whether this call runs lane-packed (even batch, bilinear)."""
        return self.lane_pack and self.bilinear and x.shape[0] % 2 == 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        factor = 2 if self.bilinear else 1
        # jax.checkpoint per block trades ~1 extra forward of FLOPs for not
        # storing full-res intermediate activations — lets batch size grow
        # past HBM on large tiles.
        # the `train` flag must stay a static (python) bool through remat;
        # its positional index depends on the block's arity (Up takes two maps)
        if self.remat:
            mode = "full" if self.remat is True else str(self.remat)
            if mode == "full":
                policy = None
            elif mode == "conv":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "pool_out", "resize_out"
                )
            elif mode == "bn":
                policy = jax.checkpoint_policies.save_anything_except_these_names(
                    "bn_relu_out"
                )
            else:
                raise ValueError(f"unknown remat mode {self.remat!r}")
            DC = nn.remat(DoubleConv, static_argnums=(2,), policy=policy)
            Dn = nn.remat(Down, static_argnums=(2,), policy=policy)
            UpB = nn.remat(Up, static_argnums=(3,), policy=policy)
        else:
            DC, Dn, UpB = DoubleConv, Down, Up
        cb = self.conv_backend
        pb = self.pool_backend
        bb = self.bn_backend
        packed = self.packs(x)
        if packed:
            from im2im_uq_tpu.ops.lane_pack import blockdiag2, pack2, tile2

            x = pack2(x)
        x1 = DC(64, dtype=self.dtype, conv_backend=cb, bn_backend=bb, packed=packed, name="inc")(x, train)
        x2 = Dn(128, dtype=self.dtype, conv_backend=cb, pool_backend=pb, bn_backend=bb, packed_input=packed, name="down1")(x1, train)
        x3 = Dn(256, dtype=self.dtype, conv_backend=cb, pool_backend=pb, bn_backend=bb, name="down2")(x2, train)
        x4 = Dn(512, dtype=self.dtype, conv_backend=cb, pool_backend=pb, bn_backend=bb, name="down3")(x3, train)
        x5 = Dn(1024 // factor, dtype=self.dtype, conv_backend=cb, pool_backend=pb, bn_backend=bb, name="down4")(x4, train)

        rb = self.resize_backend
        x = UpB(512 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up1")(x5, x4, train)
        x = UpB(256 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up2")(x, x3, train)
        x = UpB(128 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up3")(x, x2, train)
        x = UpB(64, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, packed=packed, name="up4")(x, x1, train)
        if packed:
            # out-conv on the packed features; the trunk output STAYS
            # packed — the uncertainty heads consume it packed and unpack
            # only their (tiny-C) outputs (models/heads.py)
            kernel, bias = Conv1x1Params(
                x.shape[-1] // 2, self.n_channels_middle, name="out"
            )()
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype
            )
            x = (
                jax.lax.conv_general_dilated(
                    x, blockdiag2(kernel), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + tile2(bias)
            )
        else:
            x = conv1x1(self.n_channels_middle, x.shape[-1], dtype=self.dtype, name="out")(x)
        # compute-dtype features go out as-is: the heads promote to the
        # same compute dtype anyway, so an astype(float32) here would be a
        # values-identical f32 round trip costing two full-res HBM passes
        # (bf16→f32→bf16 is exact; measured ~3 ms/step at 320² batch 32).
        # Heads still emit float32 outputs.
        return x


class WNet(nn.Module):
    """Dual-encoder UNet for two-channel inputs (reference wnet.py:9-59).

    Each input channel gets its own 32/64/128/256/256 encoder; the decoder
    consumes per-level concatenations of the two paths.
    """

    n_channels_out: int = 1
    bilinear: bool = True
    dtype: Any = None
    n_channels_middle: int = 32
    conv_backend: str = "xla"
    resize_backend: str = "auto"  # see Up.resize_backend
    bn_backend: str = "flax"  # see DoubleConv.bn_backend

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        factor = 2 if self.bilinear else 1
        cb = self.conv_backend
        rb = self.resize_backend
        bb = self.bn_backend
        p1, p2 = x[..., 0:1], x[..., 1:2]

        def encode(p: jax.Array, tag: str):
            e1 = DoubleConv(32, dtype=self.dtype, conv_backend=cb, bn_backend=bb, name=f"{tag}inc")(p, train)
            e2 = Down(64, dtype=self.dtype, conv_backend=cb, bn_backend=bb, name=f"{tag}down1")(e1, train)
            e3 = Down(128, dtype=self.dtype, conv_backend=cb, bn_backend=bb, name=f"{tag}down2")(e2, train)
            e4 = Down(256, dtype=self.dtype, conv_backend=cb, bn_backend=bb, name=f"{tag}down3")(e3, train)
            e5 = Down(512 // factor, dtype=self.dtype, conv_backend=cb, bn_backend=bb, name=f"{tag}down4")(e4, train)
            return e1, e2, e3, e4, e5

        a = encode(p1, "p1")
        b = encode(p2, "p2")
        cat = lambda i: jnp.concatenate([a[i], b[i]], axis=-1)

        x = Up(512 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up1")(
            cat(4), cat(3), train
        )
        x = Up(256 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up2")(x, cat(2), train)
        x = Up(128 // factor, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up3")(x, cat(1), train)
        x = Up(64, self.bilinear, dtype=self.dtype, conv_backend=cb, resize_backend=rb, bn_backend=bb, name="up4")(x, cat(0), train)
        x = conv1x1(self.n_channels_middle, x.shape[-1], dtype=self.dtype, name="out")(x)
        return x  # compute-dtype features; see UNet's return note

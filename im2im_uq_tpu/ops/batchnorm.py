"""Training-mode BatchNorm with unfusable channel reductions (custom VJP).

Why this exists: the train-step roofline audit (STATUS.md,
benchmarks/bench_roofline.py) shows the BN/elementwise buckets running at
~50% of standalone-achievable HBM bandwidth (fwd 293 GB/s, bwd 385 GB/s vs
546-750 measured standalone) because XLA fuses the per-channel reduce
epilogues — batch statistics on the forward, dgamma/dbeta/sum(g) on the
backward — into the elementwise loop fusions, serializing them. This module
provides BN whose reductions *cannot* join those fusions:

- ``method="dot"``: channel sums ride the MXU — ``sum(x)`` as a
  ``(1,N)x(N,C)`` matvec, ``sum(x*x)`` / ``sum(g*x)`` as the diagonal of an
  f32-accumulating ``(C,C)`` Gram matmul. The extra FLOPs are trivial
  (``N*C**2`` ~= 13 GFLOP per UNet level vs the chip's 197 bf16 TFLOP/s);
  the dot reads the tensor once at streaming bandwidth and XLA never fuses
  a dot into a loop fusion.
- ``method="barrier"``: plain reduces behind ``lax.optimization_barrier``
  so XLA keeps them as standalone reduce kernels (measured 628-750 GB/s
  standalone) instead of epilogues inside the elementwise passes.

Numerics match flax's ``use_fast_variance`` path (``E[x^2]-E[x]^2``), i.e.
the normalization the reference trains with (torch BatchNorm2d defaults,
reference core/models/trunks/unet_parts.py:13-24). The custom VJP is the
textbook BN training backward:

    dbeta  = sum(g)
    dgamma = sum(g * xhat)
    dx     = gamma*r * (g - sum(g)/n - xhat * sum(g*xhat)/n)

computed as one streaming FMA pass (``A*g + B*x + D`` with per-channel
coefficients) so the backward elementwise work is a pure loop fusion too.
Cotangents for the returned ``(mean, var)`` are ignored: they only feed the
module's (non-differentiated) running-stat update.

``groups=2`` supports the lane-packed ``(B/2, H, W, 2C)`` layout
(ops/lane_pack.py): packed channel ``g*C + c`` is logical channel ``c`` of
image half ``g``; statistics fold across groups (equal counts), exactly
PackedBN's semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _fold(v: jax.Array, groups: int) -> jax.Array:
    """Sum a per-packed-channel vector across the group copies."""
    if groups == 1:
        return v
    return v.reshape(groups, -1).sum(axis=0)


def _num_blocks(n: int, c: int, target_chunk: int = 2048,
                gram_bytes: int = 8 << 20) -> int:
    """Row-block count for the blocked dots.

    The MXU/dot accumulates the contraction sequentially, so a single
    (N,C)-row dot carries ~sqrt(N)*eps relative error — measured 2e-4 on
    the variance at N=262k on the chip (default precision), vs ~2e-7 for
    jnp's tree reduce. Blocking the rows into K batched dots of
    ~``target_chunk`` rows and tree-summing the K partials (together with
    ``Precision.HIGHEST``, which keeps f32 operands out of the MXU's
    single-pass bf16 decomposition) brings the error to flax's reduce
    level — measured 1.3e-7 on the chip, 2.3e-7 on CPU. K is capped so
    the (K,C,C) partial-Gram buffer stays under ``gram_bytes`` and
    lowered until it divides N.
    """
    k = max(1, min(n // target_chunk, gram_bytes // (4 * c * c)))
    while n % k:
        k -= 1
    return k


def _channel_sum(flat: jax.Array, method: str) -> jax.Array:
    """sum over rows -> (C,) float32, as a dot or a barrier-isolated reduce."""
    if method == "dot":
        n, c = flat.shape
        k = _num_blocks(n, c)
        blocked = flat.reshape(k, n // k, c)
        ones = jnp.ones((k, n // k), flat.dtype)
        s = jax.lax.dot_general(
            ones, blocked, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(s, axis=0)
    xb = jax.lax.optimization_barrier(flat)
    return jnp.sum(xb.astype(jnp.float32), axis=0)


def _channel_dot(a: jax.Array, b: jax.Array, method: str) -> jax.Array:
    """sum over rows of a*b per channel -> (C,) float32."""
    if method == "dot":
        n, c = a.shape
        k = _num_blocks(n, c)
        g = jax.lax.dot_general(
            a.reshape(k, n // k, c), b.reshape(k, n // k, c),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(jnp.diagonal(g, axis1=1, axis2=2), axis=0)
    ab, bb = jax.lax.optimization_barrier((a, b))
    return jnp.sum(ab.astype(jnp.float32) * bb.astype(jnp.float32), axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_train(x, gamma, beta, eps: float, groups: int, method: str):
    """Batch-norm a NHWC tensor with batch statistics; returns (y, mean, var).

    ``gamma``/``beta``/``mean``/``var`` are float32 at the LOGICAL channel
    count ``C = x.shape[-1] // groups``; ``y`` keeps ``x.dtype``. ``mean``/
    ``var`` are the biased batch moments (callers apply Bessel for the
    running update). Differentiating through ``mean``/``var`` is
    unsupported (their cotangents are dropped) — they exist for the
    running-stat bookkeeping only.
    """
    y, mean, var, _ = _bn_train_fwd_impl(x, gamma, beta, eps, groups, method)
    return y, mean, var


def _bn_train_fwd_impl(x, gamma, beta, eps, groups, method):
    cp = x.shape[-1]
    flat = x.reshape(-1, cp)
    n_total = flat.shape[0] * groups
    s = _fold(_channel_sum(flat, method), groups)
    ss = _fold(_channel_dot(flat, flat, method), groups)
    mean = s / n_total
    var = ss / n_total - mean * mean
    r = jax.lax.rsqrt(var + eps)
    mul = gamma * r
    add = beta - mean * mul
    if groups > 1:
        mul, add = jnp.tile(mul, groups), jnp.tile(add, groups)
    y = x * mul.astype(x.dtype) + add.astype(x.dtype)
    return y, mean, var, r


def _bn_train_fwd(x, gamma, beta, eps, groups, method):
    y, mean, var, r = _bn_train_fwd_impl(x, gamma, beta, eps, groups, method)
    return (y, mean, var), (x, gamma, mean, r)


def _bn_train_bwd(eps, groups, method, res, cts):
    gy = cts[0]  # mean/var cotangents: running-stat bookkeeping only
    x, gamma, mean, r = res
    cp = x.shape[-1]
    flat_x = x.reshape(-1, cp)
    flat_g = gy.reshape(-1, cp)
    n_total = flat_x.shape[0] * groups
    sg = _fold(_channel_sum(flat_g, method), groups)
    sgx = _fold(_channel_dot(flat_g, flat_x, method), groups)
    t = (sgx - mean * sg) * r  # sum(g * xhat)
    a = gamma * r
    b = -a * r * t / n_total
    d = -(a * sg / n_total) - b * mean
    if groups > 1:
        a, b, d = jnp.tile(a, groups), jnp.tile(b, groups), jnp.tile(d, groups)
    dx = gy * a.astype(gy.dtype) + x * b.astype(x.dtype) + d.astype(gy.dtype)
    return dx.astype(x.dtype), t, sg


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class DotBatchNorm(nn.Module):
    """TorchBatchNorm's tree and running-stat semantics over ``bn_train``.

    Parameter/variable names, shapes, and dtypes (params ``scale``/``bias``,
    ``batch_stats`` ``mean``/``var``, all float32 at the logical channel
    count) and the torch unbiased running-variance update are identical to
    ``TorchBatchNorm`` / ``PackedBN`` (models/unet.py), so checkpoints are
    interchangeable across ``bn_backend`` settings. Training-mode
    normalization numerics are the folded ``x*mul+add`` form (same as
    PackedBN); under bf16 compute this differs from flax's unfolded order
    only at rounding level.

    ``groups=2`` consumes the lane-packed layout. Under GSPMD jit the dot/
    reduce operate on the global batch, so cross-device sync-BN statistics
    come out exactly as in the flax path.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    method: str = "dot"  # "dot" | "barrier"
    groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        if use_running_average:
            mul = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            add = bias - ra_mean.value * mul
            if self.groups > 1:
                mul, add = jnp.tile(mul, self.groups), jnp.tile(add, self.groups)
            x, mul, add = nn.dtypes.promote_dtype(x, mul, add, dtype=self.dtype)
            return x * mul + add
        # mirror the eval path's dtype promotion: bn_train keeps x.dtype, so
        # promote x first or train/eval outputs disagree with the flax path
        # when input dtype != compute dtype
        (x,) = nn.dtypes.promote_dtype(x, dtype=self.dtype)
        y, mean, var = bn_train(
            x,
            scale.astype(jnp.float32),
            bias.astype(jnp.float32),
            self.epsilon,
            self.groups,
            self.method,
        )
        if not self.is_initializing():
            n = 1
            for dim in x.shape[:-1]:
                n *= dim
            n *= self.groups
            bessel = n / (n - 1) if n > 1 else 1.0
            ra_mean.value = (
                self.momentum * ra_mean.value
                + (1 - self.momentum) * jax.lax.stop_gradient(mean)
            )
            ra_var.value = (
                self.momentum * ra_var.value
                + (1 - self.momentum) * jax.lax.stop_gradient(var) * bessel
            )
        return y

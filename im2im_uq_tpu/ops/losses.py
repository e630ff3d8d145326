"""Pure-jnp loss primitives for the uncertainty heads.

Functional counterparts of the reference's loss layer (reference:
core/models/losses/pinball.py:4-26, core/models/losses/inn.py:4-21, plus the
torch criteria used inside core/models/finallayers/*: MSELoss, L1Loss,
GaussianNLLLoss, CrossEntropyLoss). Everything here is a pure function of
arrays — jit/vmap/grad-safe, no modules, no state — so XLA can fuse each loss
into the trunk's backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "pinball",
    "mse",
    "l1",
    "gaussian_nll",
    "interval_score",
    "bucketize_targets",
    "softmax_cross_entropy",
]


def pinball(pred: jax.Array, target: jax.Array, quantile: float) -> jax.Array:
    """Asymmetric quantile (pinball) loss, mean-reduced.

    Matches the reference PinballLoss (core/models/losses/pinball.py:14-26):
    error = pred - target; under-prediction weighted by ``quantile``,
    over-prediction by ``1 - quantile``; exact zeros contribute nothing.
    """
    err = pred - target
    return jnp.mean(jnp.where(err < 0, quantile * (-err), (1.0 - quantile) * err))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred - target
    return jnp.mean(d * d)


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def gaussian_nll(
    mean: jax.Array, target: jax.Array, var: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Heteroscedastic Gaussian negative log-likelihood, mean-reduced.

    Same formula as torch.nn.GaussianNLLLoss(full=False, eps=1e-6) used by
    the gaussian head (reference core/models/finallayers/gaussian_layer.py:
    19-24): 0.5 * (log(max(var, eps)) + (target - mean)^2 / max(var, eps)).
    """
    var = jnp.maximum(var, eps)
    d = target - mean
    return jnp.mean(0.5 * (jnp.log(var) + d * d / var))


def interval_score(
    lower: jax.Array, upper: jax.Array, target: jax.Array, beta: float
) -> jax.Array:
    """Interval-neural-network loss, mean-reduced.

    Matches the reference INNLoss (core/models/losses/inn.py:11-21):
    relu(target - upper)^2 + relu(lower - target)^2 + beta * |upper - lower|.
    """
    over = jax.nn.relu(target - upper)
    under = jax.nn.relu(lower - target)
    return jnp.mean(over * over + under * under + beta * jnp.abs(upper - lower))


def bucketize_targets(target: jax.Array, num_classes: int) -> jax.Array:
    """Bin [0,1]-valued targets into ``num_classes`` integer classes.

    Same binning as the softmax head's loss (reference core/models/
    finallayers/softmax_layer.py:16-22): boundaries at linspace(0, 1, S),
    torch.bucketize(right=False) semantics (== searchsorted side='left'),
    then clamp indices >= S to S - 1.
    """
    classes = jnp.linspace(0.0, 1.0, num_classes, dtype=target.dtype)
    idx = jnp.searchsorted(classes, target, side="left")
    return jnp.minimum(idx, num_classes - 1).astype(jnp.int32)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array, axis: int = 1) -> jax.Array:
    """Mean cross-entropy of integer ``labels`` under ``logits`` along ``axis``.

    Counterpart of torch.nn.CrossEntropyLoss with the class dim at ``axis``
    (reference softmax_layer.py:17-24 feeds (B, S, C, H, W) logits).
    """
    logp = jax.nn.log_softmax(logits, axis=axis)
    picked = jnp.take_along_axis(logp, jnp.expand_dims(labels, axis), axis=axis)
    return -jnp.mean(picked)

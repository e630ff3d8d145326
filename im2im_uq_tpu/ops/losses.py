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
    "per_example_mean",
]


def per_example_mean(elem: jax.Array) -> jax.Array:
    """Reduce an elementwise loss map over all non-batch dims → (B,).

    All reference losses are plain means over every element of equal-sized
    examples, so mean-of-per-example-means equals the global mean; the
    per-example form additionally supports masked batches (padded final
    batch under SPMD data parallelism).
    """
    return jnp.mean(elem.reshape(elem.shape[0], -1), axis=1)


def pinball_elem(pred: jax.Array, target: jax.Array, quantile: float) -> jax.Array:
    """Elementwise pinball loss map (reference core/models/losses/pinball.py:14-26):
    error = pred - target; under-prediction weighted by ``quantile``,
    over-prediction by ``1 - quantile``; exact zeros contribute nothing."""
    err = pred - target
    return jnp.where(err < 0, quantile * (-err), (1.0 - quantile) * err)


def pinball(pred: jax.Array, target: jax.Array, quantile: float) -> jax.Array:
    """Asymmetric quantile (pinball) loss, mean-reduced."""
    return jnp.mean(pinball_elem(pred, target, quantile))


def se_elem(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred - target
    return d * d


def ae_elem(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(se_elem(pred, target))


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(ae_elem(pred, target))


def gaussian_nll_elem(
    mean: jax.Array, target: jax.Array, var: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Elementwise heteroscedastic Gaussian NLL; same formula as
    torch.nn.GaussianNLLLoss(full=False, eps=1e-6) used by the gaussian head
    (reference core/models/finallayers/gaussian_layer.py:19-24)."""
    var = jnp.maximum(var, eps)
    d = target - mean
    return 0.5 * (jnp.log(var) + d * d / var)


def gaussian_nll(
    mean: jax.Array, target: jax.Array, var: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Heteroscedastic Gaussian negative log-likelihood, mean-reduced."""
    return jnp.mean(gaussian_nll_elem(mean, target, var, eps))


def interval_score_elem(
    lower: jax.Array, upper: jax.Array, target: jax.Array, beta: float
) -> jax.Array:
    """Elementwise interval-neural-network loss (reference core/models/
    losses/inn.py:11-21): relu(target - upper)^2 + relu(lower - target)^2
    + beta * |upper - lower|."""
    over = jax.nn.relu(target - upper)
    under = jax.nn.relu(lower - target)
    return over * over + under * under + beta * jnp.abs(upper - lower)


def interval_score(
    lower: jax.Array, upper: jax.Array, target: jax.Array, beta: float
) -> jax.Array:
    """Interval-neural-network loss, mean-reduced."""
    return jnp.mean(interval_score_elem(lower, upper, target, beta))


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


def softmax_cross_entropy_elem(
    logits: jax.Array, labels: jax.Array, axis: int = 1
) -> jax.Array:
    """Elementwise cross-entropy of integer ``labels`` under ``logits``.

    Counterpart of torch.nn.CrossEntropyLoss with the class dim at ``axis``
    (reference softmax_layer.py:17-24 feeds (B, S, C, H, W) logits); the
    class axis is consumed, the result matches the label shape.
    """
    logp = jax.nn.log_softmax(logits, axis=axis)
    picked = jnp.take_along_axis(logp, jnp.expand_dims(labels, axis), axis=axis)
    return -jnp.squeeze(picked, axis=axis)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array, axis: int = 1) -> jax.Array:
    """Mean cross-entropy of integer ``labels`` under ``logits`` along ``axis``."""
    return jnp.mean(softmax_cross_entropy_elem(logits, labels, axis))

"""Nested prediction-set algebra for every uncertainty head, as pure jnp.

This is the functional counterpart of the reference's per-head
``*_nested_sets_from_output`` functions (reference: core/models/finallayers/
quantile_layer.py:34-44, gaussian_layer.py:26-34, residual_magnitude_layer.py:
28-36, softmax_layer.py:27-53, inn_layer.py:30-40) plus the global collapse
guard applied by ModelWithUncertainty.nested_sets_from_output (reference:
core/models/add_uncertainty.py:33-38).

TPU-first design: every head's prediction set is *linear in λ* around the
point prediction — ``lower(λ) = pred − λ·dl`` and ``upper(λ) = pred + λ·du``
with per-pixel, λ-independent slopes ``dl, du ≥ 0``. We therefore factor set
construction into

  1. ``interval_params(output, head)``  → (pred, dl, du), computed once, and
  2. ``sets_from_params(params, λ)``    → elementwise (lower, pred, upper),

which turns the reference's per-λ recomputation (softmax/cumsum re-run for
every λ in calibrate_model.py:134-136) into a single pass plus cheap VPU
elementwise work, and enables the O(P log P) critical-λ loss table
(`rcps_loss_table(..., method="fast")`) instead of O(P·L).

Array layout: head outputs are NHWC with a leading component axis —
``(B, K, H, W, C)`` (K = 3 for quantile/inn, 2 for gaussian/residual,
``num_softmax`` for the softmax head). All returned maps are ``(B, H, W, C)``.

The reference's in-place clamps (quantile_layer.py:39-40) are idempotent —
clamp-then-scale — and are reproduced here order-exactly but functionally.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "IntervalParams",
    "interval_params",
    "sets_from_params",
    "nested_sets_from_output",
    "fraction_missed",
    "miss_map",
    "critical_lambdas",
    "rcps_loss_table",
    "INTERVAL_PARAM_FNS",
    "COLLAPSE_EPS",
]

# Minimum half-width of any prediction set (reference add_uncertainty.py:35-36).
COLLAPSE_EPS = 1e-6
# Pre-scale clamp on quantile/inn raw edges (reference quantile_layer.py:39-40).
_EDGE_EPS = 1e-6


class IntervalParams(NamedTuple):
    """λ-independent per-pixel set geometry: lower(λ) = pred − λ·dl, etc."""

    pred: jax.Array  # (B, H, W, C) point prediction
    dl: jax.Array  # (B, H, W, C) lower slope, ≥ 0
    du: jax.Array  # (B, H, W, C) upper slope, ≥ 0


def _quantile_interval_params(output: jax.Array) -> IntervalParams:
    """Three-component heads (quantiles, quantiles_l1, inn).

    Reference semantics (quantile_layer.py:39-43): raw lower is clamped to
    pred − 1e−6 and raw upper to pred + 1e−6 *before* λ-scaling, so the
    slopes are max(pred − lo, 1e−6) and max(hi − pred, 1e−6).
    """
    lo, pred, hi = output[:, 0], output[:, 1], output[:, 2]
    dl = jnp.maximum(pred - lo, _EDGE_EPS)
    du = jnp.maximum(hi - pred, _EDGE_EPS)
    return IntervalParams(pred, dl, du)


def _gaussian_interval_params(output: jax.Array) -> IntervalParams:
    """Mean/variance head: symmetric ±λ·σ sets (gaussian_layer.py:26-34)."""
    pred, var = output[:, 0], output[:, 1]
    sigma = jnp.sqrt(var)
    return IntervalParams(pred, sigma, sigma)


def _residual_interval_params(output: jax.Array) -> IntervalParams:
    """Prediction + |residual| head: ±λ·r sets (residual_magnitude_layer.py:28-36)."""
    pred, r = output[:, 0], output[:, 1]
    return IntervalParams(pred, r, r)


def _softmax_interval_params(output: jax.Array) -> IntervalParams:
    """Per-pixel classifier over S bins of [0, 1] (softmax_layer.py:27-53).

    pred = argmax bin / S; the 5%/95% cumulative-softmax quantiles give the
    raw edges; collapse protection widens an edge by one bin when it
    coincides with the prediction; edges are clipped to [0, 1]; slopes are
    the relu'd distances (so sets never invert).

    λ-independent by construction, computed once under stop_gradient (the
    reference wraps this in torch.no_grad, softmax_layer.py:28).
    """
    output = jax.lax.stop_gradient(output)
    num_softmax = output.shape[1]
    probs = jax.nn.softmax(output, axis=1)
    cdf = jnp.cumsum(probs, axis=1)
    inv_s = 1.0 / num_softmax
    lower_q = jnp.sum((cdf <= 0.05).astype(probs.dtype), axis=1) * inv_s
    upper_q = jnp.sum((cdf <= 0.95).astype(probs.dtype), axis=1) * inv_s
    pred = jnp.argmax(probs, axis=1).astype(probs.dtype) * inv_s

    lower_q = jnp.where(pred == lower_q, lower_q - inv_s, lower_q)
    upper_q = jnp.where(pred == upper_q, upper_q + inv_s, upper_q)
    lower_q = jnp.clip(lower_q, 0.0, 1.0)
    upper_q = jnp.clip(upper_q, 0.0, 1.0)

    dl = jax.nn.relu(pred - lower_q)
    du = jax.nn.relu(upper_q - pred)
    return IntervalParams(pred, dl, du)


INTERVAL_PARAM_FNS: dict[str, Callable[[jax.Array], IntervalParams]] = {
    "quantiles": _quantile_interval_params,
    "quantiles_l1": _quantile_interval_params,
    "inn": _quantile_interval_params,
    "gaussian": _gaussian_interval_params,
    "residual_magnitude": _residual_interval_params,
    "residual_magnitude_l1": _residual_interval_params,
    "softmax": _softmax_interval_params,
}


def interval_params(output: jax.Array, uncertainty_type: str) -> IntervalParams:
    """Factor a head's raw output into λ-independent set geometry."""
    try:
        fn = INTERVAL_PARAM_FNS[uncertainty_type]
    except KeyError:
        raise NotImplementedError(
            f"unknown uncertainty_type {uncertainty_type!r}; "
            f"expected one of {sorted(INTERVAL_PARAM_FNS)}"
        ) from None
    return fn(output)


def sets_from_params(
    params: IntervalParams, lam: jax.Array | float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(lower, pred, upper) at scale λ, with the global collapse guard.

    upper = max(pred + λ·du, pred + 1e−6); lower = min(pred − λ·dl,
    pred − 1e−6) — exactly ModelWithUncertainty.nested_sets_from_output
    (reference add_uncertainty.py:33-38).
    """
    pred, dl, du = params
    lower = jnp.minimum(pred - lam * dl, pred - COLLAPSE_EPS)
    upper = jnp.maximum(pred + lam * du, pred + COLLAPSE_EPS)
    return lower, pred, upper


def nested_sets_from_output(
    output: jax.Array, lam: jax.Array | float, uncertainty_type: str
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One-shot (lower, pred, upper) from a head's raw output at scale λ."""
    return sets_from_params(interval_params(output, uncertainty_type), lam)


def miss_map(lower: jax.Array, upper: jax.Array, label: jax.Array) -> jax.Array:
    """Per-pixel miscoverage indicator in {0, 1} (float).

    (label < lower) + (label > upper), capped at 1 — the reference computes
    the same two strict comparisons (calibrate_model.py:77-78). The two
    events are disjoint whenever lower < upper so the cap is a no-op kept
    for exact semantics.
    """
    miss = (lower > label).astype(label.dtype) + (upper < label).astype(label.dtype)
    return jnp.minimum(miss, 1.0)


def fraction_missed(
    lower: jax.Array, upper: jax.Array, label: jax.Array
) -> jax.Array:
    """Per-example fraction of pixels outside [lower, upper] → shape (B,).

    Counterpart of fraction_missed_loss (reference calibrate_model.py:76-80),
    reducing over all non-batch dims.
    """
    m = miss_map(lower, upper, label)
    return jnp.mean(m.reshape(m.shape[0], -1), axis=1)


def critical_lambdas(params: IntervalParams, labels: jax.Array) -> jax.Array:
    """Per-pixel critical λ: the pixel is missed at λ iff λ < crit.

    Derivation (per side): the pixel is missed low at λ iff
    ``pred − max(λ·dl, 1e−6) > label`` ⟺ ``max(λ·dl, 1e−6) < a`` with
    a = pred − label. For a ≤ 1e−6 that never holds (crit_lo = 0); otherwise
    it holds iff λ·dl < a, i.e. λ < a / dl (crit_lo = +inf when dl == 0).
    Symmetric for the upper side with b = label − pred and du. The pixel is
    missed iff either side misses, so crit = max(crit_lo, crit_hi).

    This factors the (N, L) loss table into one O(P) pass + a per-image
    sort, replacing the reference's L full sweeps over the calibration set
    (calibrate_model.py:134-136).
    """
    pred, dl, du = params
    a = pred - labels  # positive when the label is below the prediction
    b = labels - pred
    inf = jnp.asarray(jnp.inf, dtype=pred.dtype)
    crit_lo = jnp.where(a > COLLAPSE_EPS, jnp.where(dl > 0, a / dl, inf), 0.0)
    crit_hi = jnp.where(b > COLLAPSE_EPS, jnp.where(du > 0, b / du, inf), 0.0)
    return jnp.maximum(crit_lo, crit_hi)


def _loss_table_direct(
    params: IntervalParams, labels: jax.Array, lam_grid: jax.Array
) -> jax.Array:
    """(N, L) table by direct per-λ set construction (exact reference math)."""

    def one_lambda(lam: jax.Array) -> jax.Array:
        lower, _, upper = sets_from_params(params, lam)
        return fraction_missed(lower, upper, labels)

    # lax.map keeps peak memory at one (B,H,W,C) miss map per λ step while
    # XLA pipelines the elementwise work; (L, N) -> (N, L).
    return jax.lax.map(one_lambda, lam_grid).T


def _loss_table_fast(
    params: IntervalParams, labels: jax.Array, lam_grid: jax.Array
) -> jax.Array:
    """(N, L) table via sorted critical λs: loss(n, j) = mean(crit_n > λ_j).

    O(N·P·log P + N·L·log P) instead of O(N·P·L). Agrees with the direct
    table except on exact λ·slope == residual float ties (a/dl rounding);
    see tests/test_sets.py for the agreement check.
    """
    crit = critical_lambdas(params, labels)
    n = crit.shape[0]
    flat = jnp.sort(crit.reshape(n, -1), axis=1)
    num_px = flat.shape[1]

    def per_image(sorted_crit: jax.Array) -> jax.Array:
        # count of pixels with crit > λ  ==  P − (# of crit ≤ λ)
        covered = jnp.searchsorted(sorted_crit, lam_grid, side="right")
        return (num_px - covered).astype(labels.dtype) / num_px

    return jax.vmap(per_image)(flat)


def rcps_loss_table(
    params: IntervalParams,
    labels: jax.Array,
    lam_grid: jax.Array,
    method: str = "direct",
) -> jax.Array:
    """Full (N, num_lambdas) fraction-missed loss table in one XLA program.

    ``method='direct'`` evaluates the sets at every λ (bit-exact with the
    reference's per-λ loop); ``method='fast'`` uses the critical-λ
    factorization.
    """
    lam_grid = jnp.asarray(lam_grid, dtype=params.pred.dtype)
    if method == "direct":
        return _loss_table_direct(params, labels, lam_grid)
    if method == "fast":
        return _loss_table_fast(params, labels, lam_grid)
    if method == "pallas":
        from im2im_uq_tpu.ops.pallas_kernels import loss_table_pallas

        return loss_table_pallas(params, labels, lam_grid)
    raise ValueError(f"unknown loss-table method {method!r}")

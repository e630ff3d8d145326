"""Nested-set algebra vs. a torch oracle of the reference semantics.

The oracle functions below transcribe the published reference behavior
(reference: core/models/finallayers/*_layer.py nested-set functions composed
with the ModelWithUncertainty collapse guard, core/models/add_uncertainty.py:
33-38), including the in-place clamp-before-scale order and the 1e-6 guards.
Our λ-factored implementation must agree elementwise for every head and λ.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from im2im_uq_tpu.ops import sets as S

RNG = np.random.RandomState(7)
SHAPE = (3, 6, 5, 1)  # (B, H, W, C)


def _guard(lower, pred, upper):
    upper = torch.maximum(upper, pred + 1e-6)
    lower = torch.minimum(lower, pred - 1e-6)
    return lower, pred, upper


def oracle_quantile(out, lam):
    out = out.clone()
    out[:, 0] = torch.minimum(out[:, 0], out[:, 1] - 1e-6)
    out[:, 2] = torch.maximum(out[:, 2], out[:, 1] + 1e-6)
    upper = lam * (out[:, 2] - out[:, 1]) + out[:, 1]
    lower = out[:, 1] - lam * (out[:, 1] - out[:, 0])
    return _guard(lower, out[:, 1], upper)


def oracle_gaussian(out, lam):
    upper = lam * out[:, 1].sqrt() + out[:, 0]
    lower = -lam * out[:, 1].sqrt() + out[:, 0]
    return _guard(lower, out[:, 0], upper)


def oracle_residual(out, lam):
    upper = lam * out[:, 1] + out[:, 0]
    lower = -lam * out[:, 1] + out[:, 0]
    return _guard(lower, out[:, 0], upper)


def oracle_softmax(out, lam):
    probs = out.softmax(dim=1)
    num = probs.shape[1]
    cumsum = torch.cumsum(probs, dim=1)
    lower_q = (cumsum <= 0.05).float().sum(dim=1) / num
    upper_q = (cumsum <= 0.95).float().sum(dim=1) / num
    pred = torch.argmax(probs, dim=1) / num
    lower_q[pred == lower_q] -= 1 / num
    upper_q[pred == upper_q] += 1 / num
    lower_q = lower_q.clamp(min=0, max=1)
    upper_q = upper_q.clamp(min=0, max=1)
    lower = pred - (pred - lower_q).relu() * lam
    upper = pred + (upper_q - pred).relu() * lam
    return _guard(lower, pred, upper)


ORACLES = {
    "quantiles": oracle_quantile,
    "quantiles_l1": oracle_quantile,
    "inn": oracle_quantile,
    "gaussian": oracle_gaussian,
    "residual_magnitude": oracle_residual,
    "residual_magnitude_l1": oracle_residual,
    "softmax": oracle_softmax,
}


def _random_output(head):
    if head in ("quantiles", "quantiles_l1", "inn"):
        k = 3
        out = RNG.randn(SHAPE[0], k, *SHAPE[1:]).astype(np.float32)
        # make some lower/upper coherent, some inverted (exercises the clamps)
        out[:2, 0] = out[:2, 1] - np.abs(out[:2, 0])
        out[:2, 2] = out[:2, 1] + np.abs(out[:2, 2])
    elif head in ("gaussian", "residual_magnitude", "residual_magnitude_l1"):
        out = RNG.randn(SHAPE[0], 2, *SHAPE[1:]).astype(np.float32)
        out[:, 1] = np.abs(out[:, 1])  # heads rectify the spread channel
        out[0, 1, 0, :2] = 0.0  # exact zero spread exercises the guard
    elif head == "softmax":
        out = RNG.randn(SHAPE[0], 10, *SHAPE[1:]).astype(np.float32) * 3
    return out


@pytest.mark.parametrize("head", sorted(ORACLES))
@pytest.mark.parametrize("lam", [0.0, 0.3, 1.0, 2.5])
def test_sets_match_reference_oracle(head, lam):
    out = _random_output(head)
    lower, pred, upper = S.nested_sets_from_output(jnp.asarray(out), lam, head)
    # oracle expects (B, K, C, H, W); ours is (B, K, H, W, C)
    t_out = torch.tensor(np.moveaxis(out, -1, 2))
    o_lower, o_pred, o_upper = ORACLES[head](t_out, lam)
    for got, exp in [(lower, o_lower), (pred, o_pred), (upper, o_upper)]:
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got), -1, 1), exp.numpy(), rtol=1e-5, atol=1e-7
        )


def test_fraction_missed_matches_reference():
    lower = RNG.randn(4, 8, 8, 1).astype(np.float32)
    upper = lower + np.abs(RNG.randn(4, 8, 8, 1)).astype(np.float32)
    label = RNG.randn(4, 8, 8, 1).astype(np.float32)
    got = S.fraction_missed(jnp.asarray(lower), jnp.asarray(upper), jnp.asarray(label))
    lo_t, up_t, lb_t = map(torch.tensor, (lower, upper, label))
    misses = (lo_t.squeeze() > lb_t.squeeze()).float() + (
        up_t.squeeze() < lb_t.squeeze()
    ).float()
    misses[misses > 1.0] = 1.0
    expected = misses.mean(dim=(1, 2))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-6)


@pytest.mark.parametrize("head", sorted(ORACLES))
def test_loss_table_direct_matches_per_lambda_eval(head):
    out = jnp.asarray(_random_output(head))
    labels = jnp.asarray(RNG.randn(*SHAPE).astype(np.float32) * 0.5)
    lam_grid = jnp.linspace(0.0, 3.0, 17)
    params = S.interval_params(out, head)
    table = S.rcps_loss_table(params, labels, lam_grid, method="direct")
    assert table.shape == (SHAPE[0], 17)
    for j in [0, 5, 16]:
        lower, _, upper = S.sets_from_params(params, lam_grid[j])
        np.testing.assert_allclose(
            np.asarray(table[:, j]),
            np.asarray(S.fraction_missed(lower, upper, labels)),
            rtol=1e-6,
        )


@pytest.mark.parametrize("head", ["quantiles", "gaussian", "softmax"])
def test_loss_table_fast_agrees_with_direct(head):
    out = jnp.asarray(_random_output(head))
    labels = jnp.asarray(RNG.randn(*SHAPE).astype(np.float32) * 0.5)
    lam_grid = jnp.linspace(0.0, 3.0, 101)
    params = S.interval_params(out, head)
    direct = np.asarray(S.rcps_loss_table(params, labels, lam_grid, method="direct"))
    fast = np.asarray(S.rcps_loss_table(params, labels, lam_grid, method="fast"))
    # miss *counts* must agree up to float boundary ties on λ·slope == residual
    # (the two paths round the mean differently: jnp.mean vs count/P)
    num_px = int(np.prod(SHAPE[1:]))
    direct_counts = np.round(direct * num_px)
    fast_counts = np.round(fast * num_px)
    assert np.max(np.abs(direct_counts - fast_counts)) <= 1
    assert np.mean(direct_counts != fast_counts) < 0.01


def test_monotonicity_of_loss_table():
    out = jnp.asarray(_random_output("quantiles"))
    labels = jnp.asarray(RNG.randn(*SHAPE).astype(np.float32))
    lam_grid = jnp.linspace(0.0, 5.0, 33)
    table = np.asarray(
        S.rcps_loss_table(S.interval_params(out, "quantiles"), labels, lam_grid)
    )
    # nested sets ⇒ risk is non-increasing in λ
    assert np.all(np.diff(table, axis=1) <= 1e-7)

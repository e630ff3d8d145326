"""Loss primitives vs. torch criteria (the reference's building blocks).

The reference losses are thin wrappers over torch ops (reference:
core/models/losses/pinball.py, core/models/losses/inn.py, and the torch
criteria used in core/models/finallayers/*). We check our pure-jnp versions
against torch directly on random data.
"""

import numpy as np
import pytest
import torch

from im2im_uq_tpu.ops import losses as L

RNG = np.random.RandomState(42)


def _rand(shape):
    return RNG.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("q", [0.05, 0.5, 0.95])
def test_pinball_vs_torch(q):
    pred, target = _rand((4, 16, 16)), _rand((4, 16, 16))
    err = torch.tensor(pred) - torch.tensor(target)
    expected = torch.where(
        err < 0, q * err.abs(), torch.where(err > 0, (1 - q) * err.abs(), 0.0)
    ).mean()
    got = L.pinball(pred, target, q)
    assert float(got) == pytest.approx(float(expected), rel=1e-6)


def test_mse_l1_vs_torch():
    pred, target = _rand((3, 8, 8)), _rand((3, 8, 8))
    assert float(L.mse(pred, target)) == pytest.approx(
        float(torch.nn.MSELoss()(torch.tensor(pred), torch.tensor(target))), rel=1e-6
    )
    assert float(L.l1(pred, target)) == pytest.approx(
        float(torch.nn.L1Loss()(torch.tensor(pred), torch.tensor(target))), rel=1e-6
    )


def test_gaussian_nll_vs_torch():
    mean, target = _rand((4, 8, 8)), _rand((4, 8, 8))
    var = np.abs(_rand((4, 8, 8)))
    # include some exact zeros to exercise the eps clamp
    var[0, 0, :4] = 0.0
    expected = torch.nn.GaussianNLLLoss()(
        torch.tensor(mean), torch.tensor(target), torch.tensor(var)
    )
    got = L.gaussian_nll(mean, target, var)
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_interval_score_vs_torch_formula():
    lower, upper, target = _rand((4, 8, 8)), _rand((4, 8, 8)), _rand((4, 8, 8))
    beta = 0.1
    lo_t, up_t, t_t = map(torch.tensor, (lower, upper, target))
    expected = (
        torch.relu(t_t - up_t).square()
        + torch.relu(lo_t - t_t).square()
        + beta * (up_t - lo_t).abs()
    ).mean()
    got = L.interval_score(lower, upper, target, beta)
    assert float(got) == pytest.approx(float(expected), rel=1e-6)


def test_bucketize_vs_torch():
    num = 50
    target = RNG.rand(2, 16, 16).astype(np.float32)
    # hit the boundaries and the overflow clamp
    target[0, 0, :5] = [0.0, 1.0, 0.5, 1.5, -0.2]
    classes = torch.linspace(0, 1, num)
    expected = torch.bucketize(torch.tensor(target), classes, right=False)
    expected[expected >= num] = num - 1
    got = L.bucketize_targets(target, num)
    np.testing.assert_array_equal(np.asarray(got), expected.numpy())


def test_softmax_cross_entropy_vs_torch():
    logits = _rand((4, 50, 8, 8))
    labels = RNG.randint(0, 50, size=(4, 8, 8))
    expected = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels)
    )
    got = L.softmax_cross_entropy(logits, labels, axis=1)
    assert float(got) == pytest.approx(float(expected), rel=1e-5)

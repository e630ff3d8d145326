"""Pallas loss-table kernel vs. the XLA direct path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.ops import sets as S
from im2im_uq_tpu.ops.pallas_kernels import loss_table_pallas

RNG = np.random.RandomState(3)


def _params(B=5, H=30, W=25, zero_slopes=True):
    pred = jnp.asarray(RNG.randn(B, H, W, 1).astype(np.float32))
    dl = jnp.asarray(np.abs(RNG.randn(B, H, W, 1)).astype(np.float32))
    du = jnp.asarray(np.abs(RNG.randn(B, H, W, 1)).astype(np.float32))
    if zero_slopes:
        dl = dl.at[0, :3].set(0.0)
        du = du.at[1, :, :2].set(0.0)
    labels = jnp.asarray(RNG.randn(B, H, W, 1).astype(np.float32))
    return S.IntervalParams(pred, dl, du), labels


@pytest.mark.parametrize("L", [7, 128, 173])
def test_pallas_matches_direct(L):
    params, labels = _params()
    lam = jnp.linspace(0.0, 3.0, L)
    direct = np.asarray(S.rcps_loss_table(params, labels, lam, method="direct"))
    got = np.asarray(loss_table_pallas(params, labels, lam, interpret=True))
    num_px = int(np.prod(labels.shape[1:]))
    np.testing.assert_array_equal(
        np.round(direct * num_px), np.round(got * num_px)
    )


def test_pallas_tiny_batch_and_tiny_lambda():
    params, labels = _params(B=1, H=9, W=11)
    lam = jnp.asarray([0.0, 0.5])
    direct = np.asarray(S.rcps_loss_table(params, labels, lam, method="direct"))
    got = np.asarray(loss_table_pallas(params, labels, lam, interpret=True))
    np.testing.assert_allclose(got, direct, atol=1e-7)

"""Uncertainty heads: Flax modules + pure loss functions, one per head type.

Rebuild of the reference's finallayers (reference: core/models/finallayers/
quantile_layer.py, quantile_l1_layer.py, gaussian_layer.py,
residual_magnitude_layer.py, residual_magnitude_l1_layer.py, softmax_layer.py,
inn_layer.py — each a {layer, loss_fn, nested_sets_fn} triple). The
nested-set functions live in ops/sets.py as λ-factored pure functions; here
are the modules and training losses.

Layout contract: heads consume NHWC trunk features (B, H, W, 32) and emit
``(B, K, H, W, C)`` — component axis right after batch, channels last — so
component slices are contiguous and the per-pixel math stays on the VPU
lanes. The softmax head emits (B, S, H, W, C) logits.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from im2im_uq_tpu.models.unet import Conv3x3Params as _Conv3x3Params
from im2im_uq_tpu.models.unet import conv3x3_apply
from im2im_uq_tpu.ops import losses as L

__all__ = [
    "QuantileHead",
    "GaussianHead",
    "ResidualMagnitudeHead",
    "SoftmaxHead",
    "build_head",
    "head_loss_fn",
    "head_loss_pe_fn",
    "HEAD_BUILDERS",
    "HEAD_LOSS_FNS",
    "HEAD_LOSS_PE_FNS",
]


def _fused_conv3x3(
    x: jax.Array, params: list, dtype: Any, packed: bool = False
) -> jax.Array:
    """One conv3x3 evaluating several same-input convs at once.

    The K sibling head convs all read the same (B, H, W, 32) trunk feature
    map — HBM-bound passes. Concatenating their (tiny) kernels/biases on the
    output-channel axis computes identical per-channel dot products in ONE
    pass over ``x``, cutting the head's feature-map traffic K×.

    ``packed``: ``x`` is lane-packed (B/2, H, W, 2·Cin) trunk features
    (ops/lane_pack.py); the fused conv runs with a block-diagonal kernel
    and the OUTPUT is unpacked here — it has only K·n_channels_out
    channels, so this is the one cheap place to leave the packed world.
    """
    kernel = jnp.concatenate([k for k, _ in params], axis=-1)
    bias = jnp.concatenate([b for _, b in params], axis=-1)
    if packed:
        from im2im_uq_tpu.ops.lane_pack import blockdiag2, tile2, unpack2

        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
        return unpack2(conv3x3_apply(x, blockdiag2(kernel)) + tile2(bias))
    x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
    return conv3x3_apply(x, kernel) + bias


class QuantileHead(nn.Module):
    """Three conv3x3 heads: lower quantile / prediction / upper quantile.

    Reference QuantileRegressionLayer (quantile_layer.py:8-21) and the
    identically-shaped INNLayer (inn_layer.py:8-20) / QuantileRegressionL1Layer.
    """

    n_channels_out: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        cin, c = x.shape[-1] // (2 if packed else 1), self.n_channels_out
        params = [
            _Conv3x3Params(cin, c, name=n)() for n in ("lower", "prediction", "upper")
        ]
        y = _fused_conv3x3(x, params, self.dtype, packed)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 3, c).transpose(0, 3, 1, 2, 4)
        return y.astype(jnp.float32)


class GaussianHead(nn.Module):
    """Mean + ReLU-rectified variance heads (gaussian_layer.py:7-17)."""

    n_channels_out: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        cin, c = x.shape[-1] // (2 if packed else 1), self.n_channels_out
        params = [_Conv3x3Params(cin, c, name=n)() for n in ("mean", "variance")]
        y = _fused_conv3x3(x, params, self.dtype, packed)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 2, c).transpose(0, 3, 1, 2, 4)
        y = jnp.stack([y[:, 0], nn.relu(y[:, 1])], axis=1)
        return y.astype(jnp.float32)


class ResidualMagnitudeHead(nn.Module):
    """Prediction + |residual-magnitude| heads (residual_magnitude_layer.py:7-17)."""

    n_channels_out: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        cin, c = x.shape[-1] // (2 if packed else 1), self.n_channels_out
        params = [
            _Conv3x3Params(cin, c, name=n)()
            for n in ("prediction", "residual_magnitude")
        ]
        y = _fused_conv3x3(x, params, self.dtype, packed)
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 2, c).transpose(0, 3, 1, 2, 4)
        y = jnp.stack([y[:, 0], jnp.abs(y[:, 1])], axis=1)
        return y.astype(jnp.float32)


class SoftmaxHead(nn.Module):
    """Per-output-channel S-way classifier over binned [0,1] values.

    Reference SoftmaxLayer (softmax_layer.py:7-14): one conv3x3 with
    ``num_softmax`` outputs per target channel; emits (B, S, H, W, C) logits.
    """

    num_softmax: int
    n_channels_out: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, packed: bool = False) -> jax.Array:
        cin, s = x.shape[-1] // (2 if packed else 1), self.num_softmax
        params = [
            _Conv3x3Params(cin, s, name=f"out{c}")()
            for c in range(self.n_channels_out)
        ]
        y = _fused_conv3x3(x, params, self.dtype, packed)  # (B, H, W, C*S)
        b, h, w, _ = y.shape
        # channel-major concat → (B, H, W, C, S) → (B, S, H, W, C)
        logits = y.reshape(b, h, w, self.n_channels_out, s).transpose(0, 4, 1, 2, 3)
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training losses — pure functions of (head_output, target, params dict).
#
# Each head has a per-example form (→ shape (B,), mean over an example's
# pixels) whose batch mean equals the reference's global-mean loss; the
# per-example form also supports masked batches (padded final batch under
# data-parallel SPMD), where the mean is taken over real examples only.
# ---------------------------------------------------------------------------

_pe = L.per_example_mean


def quantile_loss_pe(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """w_lo·Pinball(q_lo) + w_hi·Pinball(q_hi) + w_mse·MSE (quantile_layer.py:23-32)."""
    return (
        params["q_lo_weight"] * _pe(L.pinball_elem(pred[:, 0], target, params["q_lo"]))
        + params["q_hi_weight"] * _pe(L.pinball_elem(pred[:, 2], target, params["q_hi"]))
        + params["mse_weight"] * _pe(L.se_elem(pred[:, 1], target))
    )


def quantile_l1_loss_pe(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """Same as quantile_loss with an L1 center term (quantile_l1_layer.py:23-32)."""
    return (
        params["q_lo_weight"] * _pe(L.pinball_elem(pred[:, 0], target, params["q_lo"]))
        + params["q_hi_weight"] * _pe(L.pinball_elem(pred[:, 2], target, params["q_hi"]))
        + params["mse_weight"] * _pe(L.ae_elem(pred[:, 1], target))
    )


def gaussian_loss_pe(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """Heteroscedastic Gaussian NLL (gaussian_layer.py:19-24)."""
    return _pe(L.gaussian_nll_elem(pred[:, 0], target, pred[:, 1]))


def residual_magnitude_loss_pe(
    pred: jax.Array, target: jax.Array, params: dict
) -> jax.Array:
    """MSE(center) + MSE(residual head vs |error|) (residual_magnitude_layer.py:19-26).

    Gradients flow through the |error| term's center prediction, matching
    the reference (no detach there).
    """
    return _pe(L.se_elem(pred[:, 0], target)) + _pe(
        L.se_elem(pred[:, 1], jnp.abs(target - pred[:, 0]))
    )


def residual_magnitude_l1_loss_pe(
    pred: jax.Array, target: jax.Array, params: dict
) -> jax.Array:
    """L1 center variant (residual_magnitude_l1_layer.py:19-26)."""
    return _pe(L.ae_elem(pred[:, 0], target)) + _pe(
        L.se_elem(pred[:, 1], jnp.abs(target - pred[:, 0]))
    )


def softmax_loss_pe(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """Cross-entropy over bucketized [0,1] targets (softmax_layer.py:16-25)."""
    labels = L.bucketize_targets(target, params["num_softmax"])
    return _pe(L.softmax_cross_entropy_elem(pred, labels, axis=1))


def inn_loss_pe(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """MSE(center) + interval score on (lower, upper) (inn_layer.py:22-28)."""
    return _pe(L.se_elem(pred[:, 1], target)) + _pe(
        L.interval_score_elem(pred[:, 0], pred[:, 2], target, params["beta"])
    )


HEAD_LOSS_PE_FNS: dict[str, Callable[[jax.Array, jax.Array, dict], jax.Array]] = {
    "quantiles": quantile_loss_pe,
    "quantiles_l1": quantile_l1_loss_pe,
    "gaussian": gaussian_loss_pe,
    "residual_magnitude": residual_magnitude_loss_pe,
    "residual_magnitude_l1": residual_magnitude_l1_loss_pe,
    "softmax": softmax_loss_pe,
    "inn": inn_loss_pe,
}


def _scalarize(pe_fn):
    def fn(pred, target, params):
        return jnp.mean(pe_fn(pred, target, params))

    return fn


HEAD_LOSS_FNS: dict[str, Callable[[jax.Array, jax.Array, dict], jax.Array]] = {
    name: _scalarize(fn) for name, fn in HEAD_LOSS_PE_FNS.items()
}

HEAD_BUILDERS: dict[str, Callable[[int, dict, Any], nn.Module]] = {
    "quantiles": lambda n_out, p, dt: QuantileHead(n_out, dtype=dt),
    "quantiles_l1": lambda n_out, p, dt: QuantileHead(n_out, dtype=dt),
    "inn": lambda n_out, p, dt: QuantileHead(n_out, dtype=dt),
    "gaussian": lambda n_out, p, dt: GaussianHead(n_out, dtype=dt),
    "residual_magnitude": lambda n_out, p, dt: ResidualMagnitudeHead(n_out, dtype=dt),
    "residual_magnitude_l1": lambda n_out, p, dt: ResidualMagnitudeHead(n_out, dtype=dt),
    "softmax": lambda n_out, p, dt: SoftmaxHead(p["num_softmax"], n_out, dtype=dt),
}


def build_head(uncertainty_type: str, n_channels_out: int, params: dict, dtype: Any = None):
    """Factory matching the reference add_uncertainty dispatch (add_uncertainty.py:51-87)."""
    try:
        return HEAD_BUILDERS[uncertainty_type](n_channels_out, params, dtype)
    except KeyError:
        raise NotImplementedError(
            f"unknown uncertainty_type {uncertainty_type!r}"
        ) from None


def head_loss_fn(uncertainty_type: str):
    try:
        return HEAD_LOSS_FNS[uncertainty_type]
    except KeyError:
        raise NotImplementedError(
            f"unknown uncertainty_type {uncertainty_type!r}"
        ) from None


def head_loss_pe_fn(uncertainty_type: str):
    """Per-example (B,)-shaped loss for masked/weighted batch reductions."""
    try:
        return HEAD_LOSS_PE_FNS[uncertainty_type]
    except KeyError:
        raise NotImplementedError(
            f"unknown uncertainty_type {uncertainty_type!r}"
        ) from None

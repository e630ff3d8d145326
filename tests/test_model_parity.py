"""Full-model forward parity: reference torch UNet+head vs this framework.

The strongest "same model" proof: initialize the REFERENCE
ModelWithUncertainty (imported from /root/reference), port its weights
tensor-by-tensor into our Flax UQModel, and require the full forward
(trunk topology, conv padding, BatchNorm eval semantics, align-corners
bilinear upsampling, skip concat ORDER, head wiring) to agree on random
inputs to fp32 tolerance. Also checks the training loss computed from
those outputs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
if not os.path.exists("/root/reference/core"):
    pytest.skip("reference tree not mounted", allow_module_level=True)

import torch  # noqa: E402
from core.models.add_uncertainty import add_uncertainty as ref_add_uncertainty  # noqa: E402
from core.models.trunks.unet import UNet as RefUNet  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk  # noqa: E402
from im2im_uq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

PARAMS = {
    "uncertainty_type": "quantiles",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
}


def _conv_to_flax(torch_conv):
    return {
        "kernel": jnp.asarray(torch_conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(torch_conv.bias.detach().numpy()),
    }


def _bn_to_flax(torch_bn):
    params = {
        "scale": jnp.asarray(torch_bn.weight.detach().numpy()),
        "bias": jnp.asarray(torch_bn.bias.detach().numpy()),
    }
    stats = {
        "mean": jnp.asarray(torch_bn.running_mean.detach().numpy()),
        "var": jnp.asarray(torch_bn.running_var.detach().numpy()),
    }
    return params, stats


def _double_conv_to_flax(ref_dc):
    """reference DoubleConv = Sequential(conv, bn, relu, conv, bn, relu)."""
    seq = ref_dc.double_conv
    params, stats = {}, {}
    for i, (c_idx, b_idx) in enumerate(((0, 1), (3, 4))):
        params[f"conv{i}"] = _conv_to_flax(seq[c_idx])
        p, s = _bn_to_flax(seq[b_idx])
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def _port_reference_weights(ref_model):
    """reference ModelWithUncertainty → (params, batch_stats) flax trees."""
    trunk = ref_model.baseModel
    params, stats = {}, {}

    def put(name, pair):
        params[name], stats[name] = pair

    put("inc", _double_conv_to_flax(trunk.inc))
    for i in (1, 2, 3, 4):
        down = getattr(trunk, f"down{i}")
        p, s = _double_conv_to_flax(down.maxpool_conv[1])
        params[f"down{i}"] = {"conv": p}
        stats[f"down{i}"] = {"conv": s}
    for i in (1, 2, 3, 4):
        up = getattr(trunk, f"up{i}")
        p, s = _double_conv_to_flax(up.conv)
        params[f"up{i}"] = {"conv": p}
        stats[f"up{i}"] = {"conv": s}
    params["out"] = _conv_to_flax(trunk.out.conv)

    head = ref_model.last_layer  # quantile head: lower/prediction/upper convs
    head_params = {
        "lower": _conv_to_flax(head.lower),
        "prediction": _conv_to_flax(head.prediction),
        "upper": _conv_to_flax(head.upper),
    }
    return {"trunk": params, "head": head_params}, {"trunk": stats}


@pytest.fixture(scope="module")
def ported():
    torch.manual_seed(0)
    ref_trunk = RefUNet(1, 1)
    ref_model = ref_add_uncertainty(ref_trunk, dict(PARAMS, device="cpu"))
    ref_model.eval()

    state = add_uncertainty(
        build_trunk({"model": "UNet", **PARAMS}),
        PARAMS,
        rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    params, stats = _port_reference_weights(ref_model)
    # structural check: every ported leaf matches the initialized tree's shape
    ref_shapes = jax.tree.map(lambda a: a.shape, state.variables["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    state = state.replace(variables={"params": params, "batch_stats": stats})
    return ref_model, state


def test_full_forward_parity(ported):
    ref_model, state = ported
    rng = np.random.RandomState(0)
    x = rng.randn(2, 48, 40, 1).astype(np.float32)  # non-square, non-pow2 W
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(np.moveaxis(x, -1, 1))).numpy()
    out = np.asarray(state.apply(jnp.asarray(x)))  # ours: (B, 3, H, W, C)
    got = out[:, :, :, :, 0]  # (B, 3, H, W)
    ref_out = ref_out[:, :, 0]  # reference: (B, 3, C, H, W) → (B, 3, H, W)
    scale = np.abs(ref_out).std() + 1e-12
    assert ref_out.shape == got.shape
    np.testing.assert_allclose(got / scale, ref_out / scale, rtol=0, atol=2e-5)


def test_training_loss_parity(ported):
    ref_model, state = ported
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 32, 1).astype(np.float32)
    y = rng.rand(2, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(np.moveaxis(x, -1, 1)))
        ref_loss = float(
            ref_model.loss_fn(ref_out, torch.tensor(np.moveaxis(y, -1, 1)))
        )
    out = state.apply(jnp.asarray(x))
    loss = float(state.loss_fn(out, jnp.asarray(y)))
    assert loss == pytest.approx(ref_loss, rel=1e-5)


def test_nested_sets_parity(ported):
    ref_model, state = ported
    rng = np.random.RandomState(2)
    x = rng.randn(2, 32, 32, 1).astype(np.float32)
    lam = 1.7
    with torch.no_grad():
        ref_sets = ref_model.nested_sets((torch.tensor(np.moveaxis(x, -1, 1)),), lam)
    lo, pred, hi = state.nested_sets(jnp.asarray(x), lam=lam)
    for ref_t, got in ((ref_sets[0], lo), (ref_sets[2], hi)):
        ref_np = ref_t.numpy()
        got_np = np.moveaxis(np.asarray(got), -1, 1)
        scale = np.abs(ref_np).std() + 1e-12
        np.testing.assert_allclose(
            got_np / scale, ref_np / scale, rtol=0, atol=5e-5
        )

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

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

PARAMS = {
    "uncertainty_type": "quantiles",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
}


def _np(t):
    # copy! .numpy() is a VIEW of torch's storage and jax:cpu aliases numpy
    # buffers zero-copy — without the copy, torch optimizer steps mutate the
    # "ported" jax params in place mid-test
    return np.array(t.detach().numpy(), copy=True)


def _conv_to_flax(torch_conv):
    return {
        "kernel": jnp.asarray(_np(torch_conv.weight).transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(_np(torch_conv.bias)),
    }


def _bn_to_flax(torch_bn):
    params = {
        "scale": jnp.asarray(_np(torch_bn.weight)),
        "bias": jnp.asarray(_np(torch_bn.bias)),
    }
    stats = {
        "mean": jnp.asarray(_np(torch_bn.running_mean)),
        "var": jnp.asarray(_np(torch_bn.running_var)),
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


def _port_reference_trunk(trunk):
    """reference UNet trunk → (params, batch_stats) flax subtrees."""
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
    return params, stats


def _port_reference_weights(ref_model):
    """reference ModelWithUncertainty (quantile head) → flax trees."""
    params, stats = _port_reference_trunk(ref_model.baseModel)
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


def test_training_trajectory_parity(ported):
    """3 Adam steps from identical weights: per-step losses and the
    post-training EVAL forward (exercising the Bessel-corrected running
    stats) must track torch within fp32 drift."""
    import optax

    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    torch.manual_seed(0)
    ref_trunk = RefUNet(1, 1)
    ref_model = ref_add_uncertainty(ref_trunk, dict(PARAMS, device="cpu"))

    state = add_uncertainty(
        build_trunk({"model": "UNet", **PARAMS}),
        PARAMS,
        rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    params, stats = _port_reference_weights(ref_model)
    state = state.replace(variables={"params": params, "batch_stats": stats})

    lr = 1e-3
    opt = torch.optim.Adam(ref_model.parameters(), lr=lr)
    tx = optax.adam(lr)
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(state.model, head_loss_pe_fn("quantiles"), PARAMS, tx)

    rng = np.random.RandomState(3)
    ref_model.train()
    for i in range(3):
        x = rng.randn(2, 32, 32, 1).astype(np.float32)
        y = rng.rand(2, 32, 32, 1).astype(np.float32)
        ref_loss = ref_model.loss_fn(
            ref_model(torch.tensor(np.moveaxis(x, -1, 1))),
            torch.tensor(np.moveaxis(y, -1, 1)),
        )
        opt.zero_grad()
        ref_loss.backward()
        opt.step()
        ts, loss = step(ts, x, y, np.ones((2,), np.float32))
        # fp32 drift compounds through Adam updates — grow the tolerance
        # with step index (semantic bugs show up orders of magnitude larger)
        assert float(loss) == pytest.approx(float(ref_loss), rel=3e-4 * 4**i), f"step {i}"

    # BN running stats must track torch closely (pins the Bessel-corrected
    # running-variance update through real training)
    t_bn = ref_model.baseModel.inc.double_conv[1]
    o_bn = ts.batch_stats["trunk"]["inc"]["bn0"]
    np.testing.assert_allclose(
        np.asarray(o_bn["var"]), t_bn.running_var.detach().numpy(), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(o_bn["mean"]), t_bn.running_mean.detach().numpy(),
        rtol=1e-2, atol=1e-3,
    )
    # post-training EVAL forward: pointwise equality is not meaningful after
    # Adam sign-normalizes fp-level gradient noise (params drift ~lr per
    # coordinate); require RMS-level agreement instead
    ref_model.eval()
    x = rng.randn(2, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(np.moveaxis(x, -1, 1))).numpy()[:, :, 0]
    trained = state.replace(
        variables={"params": ts.params, "batch_stats": ts.batch_stats}
    )
    got = np.asarray(trained.apply(jnp.asarray(x)))[..., 0]
    scale = np.abs(ref_out).std() + 1e-12
    rms = float(np.sqrt(np.mean((got - ref_out) ** 2))) / scale
    assert rms < 5e-2, f"post-training eval forward RMS divergence {rms}"


@pytest.mark.parametrize("utype", ["gaussian", "softmax"])
def test_other_heads_nested_sets_parity(utype):
    """Ported-weight parity for the gaussian/softmax heads, compared at the
    nested-sets surface (covers head wiring + set algebra jointly)."""
    params_cfg = dict(PARAMS, uncertainty_type=utype, num_softmax=8, device="cpu")
    torch.manual_seed(0)
    ref_model = ref_add_uncertainty(RefUNet(1, 1), params_cfg)
    ref_model.eval()

    ours_cfg = {k: v for k, v in params_cfg.items() if k != "device"}
    state = add_uncertainty(
        build_trunk({"model": "UNet", **ours_cfg}),
        ours_cfg,
        rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    trunk_params, trunk_stats = _port_reference_trunk(ref_model.baseModel)
    head = ref_model.last_layer
    if utype == "gaussian":
        head_params = {
            "mean": _conv_to_flax(head.mean),
            "variance": _conv_to_flax(head.variance),
        }
    else:
        head_params = {
            f"out{i}": _conv_to_flax(layer) for i, layer in enumerate(head.output_layers)
        }
    state = state.replace(
        variables={
            "params": {"trunk": trunk_params, "head": head_params},
            "batch_stats": {"trunk": trunk_stats},
        }
    )

    rng = np.random.RandomState(4)
    x = rng.randn(2, 32, 32, 1).astype(np.float32)
    lam = 0.8 if utype == "softmax" else 1.5
    with torch.no_grad():
        ref_sets = ref_model.nested_sets((torch.tensor(np.moveaxis(x, -1, 1)),), lam)
    lo, pred, hi = state.nested_sets(jnp.asarray(x), lam=lam)
    for ref_t, got in ((ref_sets[0], lo), (ref_sets[2], hi)):
        ref_np = ref_t.numpy()
        got_np = np.moveaxis(np.asarray(got), -1, 1)
        scale = np.abs(ref_np).std() + 1e-12
        np.testing.assert_allclose(got_np / scale, ref_np / scale, rtol=0, atol=1e-4)

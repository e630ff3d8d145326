"""Model-layer shape/contract tests: trunks, heads, init statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk, resolve_dtype
from im2im_uq_tpu.models.resnet import ResNet18
from im2im_uq_tpu.models.unet import UNet, UpNoSkip, WNet, conv_kernel_init
from im2im_uq_tpu.ops.resize import resize_bilinear_align_corners

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke


def test_unet_feature_contract():
    m = UNet()
    v = jax.jit(lambda r, x: m.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1))
    )
    y = m.apply(v, jnp.zeros((2, 32, 32, 1)), train=False)
    assert y.shape == (2, 32, 32, 32)  # n_channels_middle = 32
    assert m.n_channels_middle == 32


def test_resnet18_feature_contract():
    m = ResNet18()
    v = jax.jit(lambda r, x: m.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )
    y = m.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert y.shape == (2, 32, 32, 32)


def test_build_trunk_dispatch():
    assert isinstance(build_trunk({"model": "UNet"}), UNet)
    assert isinstance(build_trunk({"model": "WNet"}), WNet)
    assert isinstance(build_trunk({"model": "ResNet18"}), ResNet18)
    with pytest.raises(NotImplementedError):
        build_trunk({"model": "VGG"})


def test_resolve_dtype():
    assert resolve_dtype({}) is None
    assert resolve_dtype({"compute_dtype": "bfloat16"}) == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_dtype({"compute_dtype": "fp8"})


def test_bf16_trunk_outputs_f32():
    cfg = {"model": "UNet", "uncertainty_type": "gaussian", "compute_dtype": "bfloat16"}
    st = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=jnp.zeros((1, 32, 32, 1))
    )
    out = st.apply(jnp.zeros((1, 32, 32, 1)))
    assert out.dtype == jnp.float32  # heads return f32 regardless of compute dtype
    # params stay f32
    k = st.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]
    assert k.dtype == jnp.float32


def test_remat_preserves_numerics():
    import optax

    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    cfg = {"model": "UNet", "uncertainty_type": "quantiles", "q_lo": 0.05,
           "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0}
    x = np.random.RandomState(0).randn(2, 32, 32, 1).astype(np.float32)
    y = np.random.RandomState(1).randn(2, 32, 32, 1).astype(np.float32)
    m = np.ones((2,), np.float32)
    losses = {}
    for remat in (False, True):
        c = dict(cfg, remat=remat)
        st = add_uncertainty(build_trunk(c), c, rng=jax.random.key(0),
                             example_input=jnp.zeros((1, 32, 32, 1)))
        tx = optax.adam(1e-3)
        ts = TrainState(params=st.variables["params"],
                        batch_stats=st.variables["batch_stats"],
                        opt_state=tx.init(st.variables["params"]),
                        step=jnp.zeros((), jnp.int32))
        step = make_train_step(st.model, head_loss_pe_fn("quantiles"), c, tx)
        ts, l1 = step(ts, x, y, m)
        ts, l2 = step(ts, x, y, m)
        losses[remat] = (float(l1), float(l2))
    assert losses[False] == pytest.approx(losses[True], rel=1e-5)


def test_upnoskip_shapes():
    m = UpNoSkip(features=8, scale_factor=4)
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 16)), False)
    y = m.apply(v, jnp.zeros((1, 8, 8, 16)), False)
    assert y.shape == (1, 32, 32, 8)


def test_conv_init_matches_torch_distribution():
    # torch Conv2d default: U(±1/sqrt(fan_in)); check bounds + rough uniformity
    key = jax.random.key(0)
    k = conv_kernel_init(key, (3, 3, 16, 32))
    bound = 1.0 / np.sqrt(3 * 3 * 16)
    vals = np.asarray(k).ravel()
    assert vals.min() >= -bound and vals.max() <= bound
    assert abs(vals.mean()) < bound / 10
    assert np.std(vals) == pytest.approx(2 * bound / np.sqrt(12), rel=0.1)


def test_bilinear_align_corners_matches_torch():
    import torch

    x = np.random.RandomState(0).rand(2, 9, 7, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (18, 14)))
    exp = (
        torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)(
            torch.tensor(np.moveaxis(x, -1, 1))
        )
        .numpy()
    )
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), exp, rtol=1e-5, atol=1e-6)


def test_bf16_bn_activation_path_numerics():
    """bf16 activations flow through BatchNorm (no f32 round-trip) while
    BN statistics and params stay f32; training-mode forward tracks f32."""
    import optax

    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    cfg = {"model": "UNet", "uncertainty_type": "quantiles", "q_lo": 0.05,
           "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0}
    r = np.random.RandomState(0)
    x = r.randn(2, 32, 32, 1).astype(np.float32)
    y = r.randn(2, 32, 32, 1).astype(np.float32)
    m = np.ones((2,), np.float32)
    outs, losses, states = {}, {}, {}
    for dt in ("float32", "bfloat16"):
        c = dict(cfg, compute_dtype=dt)
        st = add_uncertainty(build_trunk(c), c, rng=jax.random.key(0),
                             example_input=jnp.zeros((1, 32, 32, 1)))
        outs[dt] = st.apply(jnp.asarray(x))
        tx = optax.adam(1e-3)
        ts = TrainState(params=st.variables["params"],
                        batch_stats=st.variables["batch_stats"],
                        opt_state=tx.init(st.variables["params"]),
                        step=jnp.zeros((), jnp.int32))
        step = make_train_step(st.model, head_loss_pe_fn("quantiles"), c, tx)
        ts, loss = step(ts, x, y, m)
        losses[dt] = float(loss)
        states[dt] = ts
    # eval-mode forward within bf16 tolerance of f32
    scale = float(jnp.std(outs["float32"])) or 1.0
    assert float(jnp.max(jnp.abs(outs["bfloat16"] - outs["float32"]))) < 0.1 * scale
    # one train step: loss within bf16 rounding of the f32 loss
    assert losses["bfloat16"] == pytest.approx(losses["float32"], rel=0.05)
    # BN running stats and params still f32 after the bf16 step
    bs = states["bfloat16"].batch_stats["trunk"]["inc"]["bn0"]
    assert bs["mean"].dtype == jnp.float32 and bs["var"].dtype == jnp.float32
    k = states["bfloat16"].params["trunk"]["inc"]["conv0"]["kernel"]
    assert k.dtype == jnp.float32


def test_resize_custom_vjp_matches_autodiff():
    """The scatter-free resize backward must equal autodiff of the plain
    gather+lerp formulation (same taps, reordered sums)."""

    def plain_resize(x, out_size, axis):
        in_size = x.shape[axis]
        if out_size == 1 or in_size == 1:
            pos = jnp.zeros((out_size,), jnp.float32)
        else:
            pos = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        frac = (pos - i0.astype(jnp.float32)).astype(x.dtype)
        lo = jnp.take(x, i0, axis=axis)
        hi = jnp.take(x, i1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        return lo + (hi - lo) * frac.reshape(shape)

    from im2im_uq_tpu.ops.resize import _resize_axis

    r = np.random.RandomState(0)
    for in_size, out_size, axis in [(5, 10, 1), (7, 13, 2), (8, 16, 1),
                                    (10, 5, 1), (9, 1, 2), (1, 6, 1), (4, 4, 1)]:
        shape = [2, in_size if axis == 1 else 3, in_size if axis == 2 else 3, 2]
        x = jnp.asarray(r.randn(*shape).astype(np.float32))
        ct = jnp.asarray(r.randn(*[s if i != axis else out_size
                                   for i, s in enumerate(shape)]).astype(np.float32))
        got_out = _resize_axis(x, out_size, axis)
        exp_out = plain_resize(x, out_size, axis)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(exp_out),
                                   rtol=1e-6, atol=1e-6)
        got_grad = jax.vjp(lambda a: _resize_axis(a, out_size, axis), x)[1](ct)[0]
        exp_grad = jax.vjp(lambda a: plain_resize(a, out_size, axis), x)[1](ct)[0]
        np.testing.assert_allclose(np.asarray(got_grad), np.asarray(exp_grad),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"in={in_size} out={out_size} axis={axis}")


def test_resize_backward_is_gather_only():
    """The train-critical property: the resize VJP HLO has no scatter op
    (XLA:TPU serializes scatter into a while/dynamic-update-slice loop)."""
    from im2im_uq_tpu.ops.resize import upsample2x_align_corners

    def f(x):
        return jnp.sum(upsample2x_align_corners(x) ** 2)

    hlo = jax.jit(jax.grad(f)).lower(jnp.zeros((2, 8, 8, 4))).compile().as_text()
    assert "scatter(" not in hlo, "resize backward reintroduced a scatter"


def test_torch_batchnorm_running_stats_match_torch():
    """TorchBatchNorm stores the Bessel-corrected running variance (torch
    semantics); flax's stock BatchNorm stores the biased one."""
    import torch

    from im2im_uq_tpu.models.unet import TorchBatchNorm

    x = np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tbn.train()
    out_t = tbn(torch.tensor(np.moveaxis(x, -1, 1)))
    fbn = TorchBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vs = fbn.init(jax.random.key(0), jnp.asarray(x))
    out_f, upd = fbn.apply(vs, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.moveaxis(out_t.detach().numpy(), 1, -1), np.asarray(out_f),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["var"]), tbn.running_var.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["mean"]), tbn.running_mean.detach().numpy(),
        rtol=1e-6, atol=1e-7,
    )


def test_max_pool2x2_matches_nn_max_pool():
    from flax import linen as nn

    from im2im_uq_tpu.models.unet import max_pool2x2

    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 12, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(x)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))),
    )
    # odd sizes: trailing row/col dropped (torch floor semantics)
    xo = jnp.asarray(np.random.RandomState(1).randn(1, 13, 15, 2), jnp.float32)
    assert max_pool2x2(xo).shape == (1, 6, 7, 2)
    np.testing.assert_array_equal(
        np.asarray(max_pool2x2(xo)),
        np.asarray(nn.max_pool(xo, (2, 2), strides=(2, 2))),
    )


def test_fused_head_matches_separate_convs():
    """The fused K-in-1 head conv computes the same values as K separate
    nn.Conv passes with the same parameters."""
    from flax import linen as nn

    from im2im_uq_tpu.models.heads import QuantileHead
    from im2im_uq_tpu.models.unet import conv3x3

    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 32), jnp.float32)
    head = QuantileHead(n_channels_out=1)
    v = head.init(jax.random.key(3), x)
    y = head.apply(v, x)

    class Separate(nn.Module):
        @nn.compact
        def __call__(self, x):
            ys = [
                conv3x3(1, x.shape[-1], name=n)(x)
                for n in ("lower", "prediction", "upper")
            ]
            return jnp.stack(ys, axis=1)

    y_ref = Separate().apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)


def test_virtual_concat_doubleconv_matches_concat():
    """DoubleConv's split-kernel pair path == conv over the concatenated
    input with the same parameters."""
    from im2im_uq_tpu.models.unet import DoubleConv

    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    b = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    dc = DoubleConv(16, mid_features=8)
    v = dc.init(jax.random.key(5), (a, b))
    y_pair = dc.apply(v, (a, b))
    y_cat = dc.apply(v, jnp.concatenate([a, b], axis=-1))
    np.testing.assert_allclose(
        np.asarray(y_pair), np.asarray(y_cat), rtol=1e-5, atol=1e-5
    )

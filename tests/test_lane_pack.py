"""Parity tests for batch-to-lane packing (ops/lane_pack.py).

The packed UNet level-0 region (UNet.lane_pack) must be a pure
compute-graph transformation: identical parameter/batch-stats trees,
same forward values, same gradients, same BN running-stat updates as the
unpacked model — packing only changes the physical layout XLA sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.models.heads import head_loss_pe_fn
from im2im_uq_tpu.ops import lane_pack as lp

pytestmark = pytest.mark.smoke


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32)
    xp = lp.pack2(x)
    assert xp.shape == (2, 8, 8, 6)
    np.testing.assert_array_equal(np.asarray(lp.unpack2(xp)), np.asarray(x))
    # image 2i rides channels [:C], 2i+1 rides [C:]
    np.testing.assert_array_equal(np.asarray(xp[0, ..., :3]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(xp[0, ..., 3:]), np.asarray(x[1]))


def test_blockdiag_conv_equals_per_image_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 10, 10, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
    from im2im_uq_tpu.models.unet import conv3x3_apply

    y_ref = conv3x3_apply(x, k)
    y_pk = lp.unpack2(conv3x3_apply(lp.pack2(x), lp.blockdiag2(k)))
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def _build(cfg, batch=4):
    x0 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    return add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=x0
    )


CFG = {
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "q_lo": 0.05, "q_hi": 0.95,
    "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
}


def test_packed_unet_forward_and_grad_parity():
    cfg_off = dict(CFG, lane_pack=False)
    cfg_on = dict(CFG, lane_pack=True)
    st_off = _build(cfg_off)
    st_on = _build(cfg_on)
    # identical parameter trees (packing declares the same logical shapes)
    flat_off = jax.tree_util.tree_leaves_with_path(st_off.variables)
    flat_on = jax.tree_util.tree_leaves_with_path(st_on.variables)
    assert [p for p, _ in flat_off] == [p for p, _ in flat_on]
    for (_, a), (_, b) in zip(flat_off, flat_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 1)), jnp.float32)
    y_off = np.asarray(st_off.apply(x))
    y_on = np.asarray(st_on.apply(x))
    assert y_on.shape == y_off.shape
    rel = np.linalg.norm(y_on - y_off) / (np.linalg.norm(y_off) + 1e-12)
    assert rel < 1e-5, rel

    # training gradients + BN batch-stats updates agree
    target = jnp.asarray(rng.standard_normal((4, 32, 32, 1)), jnp.float32)
    loss_pe = head_loss_pe_fn("quantiles")

    def loss(st):
        def fn(params):
            out, mut = st.model.apply(
                {"params": params, "batch_stats": st.variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(loss_pe(out, target, st.params)), mut
        return jax.value_and_grad(fn, has_aux=True)(st.variables["params"])

    (l_off, mut_off), g_off = loss(st_off)
    (l_on, mut_on), g_on = loss(st_on)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_off),
        jax.tree_util.tree_leaves_with_path(g_on),
    ):
        assert pa == pb
        na = np.linalg.norm(np.asarray(a, np.float64))
        d = np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        # absolute floor 1e-6: conv biases directly before BN have
        # analytically-zero gradients (BN subtracts the mean), so their
        # "gradient" is f32 summation noise at ~1e-8 in both programs
        assert d <= 1e-4 * na + 1e-6, (pa, d, na)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(mut_off["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(mut_on["batch_stats"]),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_odd_batch_falls_back_unpacked():
    st_on = _build(dict(CFG, lane_pack=True))
    st_off = _build(dict(CFG, lane_pack=False))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 1)), jnp.float32)
    y_on = np.asarray(st_on.apply(x))
    y_off = np.asarray(st_off.apply(x))
    np.testing.assert_array_equal(y_on, y_off)  # same (unpacked) program


@pytest.mark.parametrize("utype,extra", [
    ("gaussian", {}),
    ("softmax", {"num_softmax": 10}),
    ("residual_magnitude", {}),
])
def test_packed_parity_other_heads(utype, extra):
    cfg = dict(CFG, uncertainty_type=utype, **extra)
    st_off = _build(dict(cfg, lane_pack=False))
    st_on = _build(dict(cfg, lane_pack=True))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
    y_off = np.asarray(st_off.apply(x))
    y_on = np.asarray(st_on.apply(x))
    assert y_on.shape == y_off.shape
    rel = np.linalg.norm(y_on - y_off) / (np.linalg.norm(y_off) + 1e-12)
    assert rel < 1e-5, rel

"""Remat modes must not change the math — only what the backward stores.

UNet.remat ∈ {False, "full", "conv", "bn"} controls the jax.checkpoint
policy per block (save nothing / save only conv+pool+resize outputs /
save everything except post-BN-ReLU tensors). All four must produce
identical losses, gradients, and batch-stat updates; only residual
memory and HBM traffic differ (measured on hardware by
benchmarks/bench_roofline.py; see STATUS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.models.heads import head_loss_pe_fn

pytestmark = pytest.mark.full  # four full UNet grad compiles

CFG = {
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
}


def _loss_and_grads(remat, x, y):
    cfg = dict(CFG, remat=remat)
    st = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=x[:1]
    )
    loss_pe = head_loss_pe_fn("quantiles")

    def loss_of(params):
        out, updates = st.model.apply(
            {"params": params, "batch_stats": st.variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(loss_pe(out, y, cfg)), updates["batch_stats"]

    (loss, bs), grads = jax.jit(jax.value_and_grad(loss_of, has_aux=True))(
        st.variables["params"]
    )
    return float(loss), jax.device_get(grads), jax.device_get(bs)


def test_remat_modes_match_baseline():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 1), jnp.float32)
    y = jnp.asarray(rng.randn(2, 32, 32, 1), jnp.float32)
    base_loss, base_grads, base_bs = _loss_and_grads(False, x, y)
    for mode in ("full", "conv", "bn"):
        loss, grads, bs = _loss_and_grads(mode, x, y)
        assert loss == pytest.approx(base_loss, rel=1e-6), mode
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-6, err_msg=mode
            ),
            grads,
            base_grads,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-6, err_msg=mode
            ),
            bs,
            base_bs,
        )


def test_remat_unknown_mode_raises():
    with pytest.raises(ValueError, match="remat"):
        _loss_and_grads("bogus", jnp.zeros((2, 32, 32, 1)), jnp.zeros((2, 32, 32, 1)))


def test_resolve_remat_coercion():
    """Config-level coercion: booleans/0/1 from YAML map to UNet modes and
    unknown values fail at the config layer, not at trace time (advisor
    round-3 finding)."""
    from im2im_uq_tpu.models.assembly import resolve_remat

    assert resolve_remat({}) is False
    assert resolve_remat({"remat": False}) is False
    assert resolve_remat({"remat": 0}) is False
    assert resolve_remat({"remat": None}) is False
    assert resolve_remat({"remat": True}) == "full"
    assert resolve_remat({"remat": 1}) == "full"
    for mode in ("full", "conv", "bn"):
        assert resolve_remat({"remat": mode}) == mode
    with pytest.raises(ValueError, match="remat"):
        resolve_remat({"remat": "bogus"})


def test_pallas_fused_rejects_non_flax_bn():
    from im2im_uq_tpu.models.assembly import build_trunk

    cfg = {"model": "UNet", "conv_backend": "pallas_fused", "bn_backend": "dot"}
    with pytest.raises(ValueError, match="pallas_fused"):
        build_trunk(cfg)

"""Parity tests for the production Pallas 3×3 conv (ops/pallas_conv.py).

Run on CPU: the kernel executes in Pallas interpret mode (same program,
no Mosaic compile), so these pin numerics + the custom VJP; the on-TPU
perf claims live in benchmarks/bench_pallas_conv.py and STATUS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.ops.pallas_conv import (
    conv3x3,
    conv3x3_pallas_raw,
    pallas_conv_eligible,
)

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke


def _xla_conv(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _mk(b, h, w, cin, cout, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, cin), dtype)
    k = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), dtype)
    bias = jnp.asarray(0.1 * rng.randn(cout), dtype)
    return x, k, bias


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 128, 128),  # aligned: direct Pallas path
        (2, 16, 16, 128, 64),   # aligned in, narrow out
        (2, 16, 16, 64, 64),    # channel-pad path (64 → 128 lanes)
        (2, 20, 20, 128, 128),  # th=10 row tile
    ],
)
def test_forward_parity(shape):
    b, h, w, cin, cout = shape
    x, k, bias = _mk(b, h, w, cin, cout)
    got = np.asarray(conv3x3(x, k, bias), np.float32)
    want = np.asarray(_xla_conv(x, k, bias), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_raw_kernel_requires_alignment():
    x, k, bias = _mk(1, 16, 16, 128, 128)
    assert pallas_conv_eligible(x.shape, 128, x.dtype)
    got = np.asarray(conv3x3_pallas_raw(x, k, bias, interpret=True), np.float32)
    want = np.asarray(_xla_conv(x, k, bias), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert not pallas_conv_eligible((1, 16, 16, 64), 64, x.dtype)
    assert not pallas_conv_eligible((1, 17, 16, 128), 128, x.dtype)


def test_fallback_small_cin():
    # 1-channel stem: stays on XLA (padding to 128 lanes would be 128x traffic)
    x, k, bias = _mk(2, 16, 16, 1, 64)
    got = np.asarray(conv3x3(x, k, bias), np.float32)
    want = np.asarray(_xla_conv(x, k, bias), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cin,cout", [(128, 128), (64, 128), (128, 64)])
def test_gradient_parity(cin, cout):
    x, k, bias = _mk(2, 16, 16, cin, cout, seed=1)
    rng = np.random.RandomState(2)
    # non-trivial cotangent via a weighted sum
    wgt = jnp.asarray(rng.randn(2, 16, 16, cout), jnp.float32)

    def loss_p(x, k, b):
        return jnp.sum(conv3x3(x, k, b) * wgt)

    def loss_x(x, k, b):
        return jnp.sum(_xla_conv(x, k, b) * wgt)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, bias)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, k, bias)
    for a, b_, nm in zip(gp, gx, ["dx", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-4, err_msg=nm
        )


def test_unet_backend_equivalence():
    """UNet forward with conv_backend='pallas' matches 'xla' on shared params."""
    from im2im_uq_tpu.models.unet import UNet

    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 1), jnp.float32)
    m_x = UNet(n_channels_out=1, conv_backend="xla")
    m_p = UNet(n_channels_out=1, conv_backend="pallas")
    vs = m_x.init(jax.random.key(0), x, train=False)
    vs_p = m_p.init(jax.random.key(0), x, train=False)
    # identical param trees (Conv3x3Params scope-path contract)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        vs["params"],
        vs_p["params"],
    )
    out_x = m_x.apply(vs, x, train=False)
    out_p = m_p.apply(vs, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), rtol=2e-4, atol=2e-4
    )


def test_unet_backend_train_step_equivalence():
    """One gradient step agrees between backends (VJP correctness in situ)."""
    from im2im_uq_tpu.models.unet import UNet

    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 1), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 32), jnp.float32)

    grads = {}
    for backend in ("xla", "pallas"):
        m = UNet(n_channels_out=1, conv_backend=backend)
        vs = m.init(jax.random.key(0), x, train=False)

        def loss(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - y) ** 2)

        grads[backend] = jax.grad(loss)(vs["params"])

    flat_x, _ = jax.tree_util.tree_flatten_with_path(grads["xla"])
    # dict keyed by path for aligned comparison
    flat_p = dict(jax.tree_util.tree_flatten_with_path(grads["pallas"])[0])
    for path, gx in flat_x:
        gp = flat_p[path]
        # f32 accumulation order differs between the 9-matmul Pallas conv
        # and XLA's conv through 20+ layers of backward — sub-1% relative
        # drift on small-magnitude grads is expected, not a defect
        np.testing.assert_allclose(
            np.asarray(gx), np.asarray(gp), rtol=1e-2, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )

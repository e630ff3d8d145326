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
        (2, 40, 40, 128, 128),  # gated-in: direct Pallas path (th=8)
        (2, 80, 80, 128, 128),  # gated-in Pallas
        (2, 16, 16, 128, 64),   # gated-out (narrow out / small H): XLA
        (2, 16, 16, 64, 64),    # gated-out: XLA
        (2, 20, 20, 128, 128),  # gated-out (20^2 loses on hardware): XLA
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
    # h=40 puts (128,128) on the gated-in Pallas path; the others exercise
    # the XLA fallback through the same custom VJP
    x, k, bias = _mk(2, 40, 40, cin, cout, seed=1)
    rng = np.random.RandomState(2)
    # non-trivial cotangent via a weighted sum
    wgt = jnp.asarray(rng.randn(2, 40, 40, cout), jnp.float32)

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


def test_fused_op_matches_composition():
    """conv3x3_bn_act == relu(scale·x+shift) → conv+bias, with correct stats."""
    from im2im_uq_tpu.ops.pallas_conv import conv3x3_bn_act

    x, k, bias = _mk(2, 16, 16, 128, 128, seed=3)
    rng = np.random.RandomState(4)
    scale = jnp.asarray(np.abs(rng.randn(128)) + 0.5, jnp.float32)
    shift = jnp.asarray(0.3 * rng.randn(128), jnp.float32)

    y, st = conv3x3_bn_act(x, k, bias, scale, shift, True, True)
    a = jnp.maximum(x * scale + shift, 0.0)
    want = _xla_conv(a, k, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=2e-5, atol=2e-5)
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), wf.sum((1, 2)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(st[:, 1]), (wf * wf).sum((1, 2)), rtol=1e-4, atol=1e-2
    )


def test_fused_op_gradients():
    """VJP of the fused op (incl. through the stats outputs) matches XLA."""
    from im2im_uq_tpu.ops.pallas_conv import conv3x3_bn_act

    x, k, bias = _mk(2, 16, 16, 128, 64, seed=5)
    rng = np.random.RandomState(6)
    scale = jnp.asarray(np.abs(rng.randn(128)) + 0.5, jnp.float32)
    shift = jnp.asarray(0.3 * rng.randn(128), jnp.float32)
    wy = jnp.asarray(rng.randn(2, 16, 16, 64), jnp.float32)
    ws = jnp.asarray(rng.randn(2, 2, 64), jnp.float32)

    def loss_fused(x, k, b, sc, sh):
        y, st = conv3x3_bn_act(x, k, b, sc, sh, True, True)
        return jnp.sum(y * wy) + jnp.sum(st * ws)

    def loss_ref(x, k, b, sc, sh):
        a = jnp.maximum(x * sc + sh, 0.0)
        y = _xla_conv(a, k, b)
        yf = y.astype(jnp.float32)
        st = jnp.stack([yf.sum((1, 2)), (yf * yf).sum((1, 2))], axis=1)
        return jnp.sum(y * wy) + jnp.sum(st * ws)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale, shift)
    for a, b_, nm in zip(gf, gr, ["dx", "dw", "db", "dscale", "dshift"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3, err_msg=nm
        )


@pytest.mark.parametrize("cin,prologue", [(128, True), (128, False), (64, True)])
def test_fused_op_gradients_pallas_bwd(cin, prologue):
    """VJP of the fused op through the PALLAS backward kernels (cout=128
    makes ops/pallas_conv_bwd.py eligible; cin=64 exercises the
    channel-padded slicing of dx/dw/dscale/dshift)."""
    from im2im_uq_tpu.ops.pallas_conv import conv3x3_bn_act

    x, k, bias = _mk(2, 16, 16, cin, 128, seed=11)
    rng = np.random.RandomState(12)
    scale = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    shift = jnp.asarray(0.3 * rng.randn(cin), jnp.float32)
    wy = jnp.asarray(rng.randn(2, 16, 16, 128), jnp.float32)
    ws = jnp.asarray(rng.randn(2, 2, 128), jnp.float32)

    def loss_fused(x, k, b, sc, sh):
        y, st = conv3x3_bn_act(x, k, b, sc, sh, prologue, True)
        return jnp.sum(y * wy) + jnp.sum(st * ws)

    def loss_ref(x, k, b, sc, sh):
        a = jnp.maximum(x * sc + sh, 0.0) if prologue else x
        y = _xla_conv(a, k, b)
        yf = y.astype(jnp.float32)
        st = jnp.stack([yf.sum((1, 2)), (yf * yf).sum((1, 2))], axis=1)
        return jnp.sum(y * wy) + jnp.sum(st * ws)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale, shift)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale, shift)
    for a, b_, nm in zip(gf, gr, ["dx", "dw", "db", "dscale", "dshift"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3, err_msg=nm
        )


def _rel_l2(a, b, floor=1e-4):
    """‖a−b‖ / max(‖b‖, floor). The floor keeps analytically-zero tensors
    (e.g. conv-bias grads, which BatchNorm's mean-subtraction cancels
    exactly — measured ‖grad‖ ~1e-8 vs ~0.5 for kernels) from turning
    numerical noise into O(1) 'relative' error."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), floor))


def _tree_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return float(np.sqrt(sum(float(np.vdot(np.asarray(l, np.float64),
                                           np.asarray(l, np.float64)))
                             for l in leaves)))


def test_fused_double_conv_block_gradients_tight():
    """Single DoubleConv: fused vs xla grads must agree tightly — this is
    the bug-catcher; the whole-UNet test below tolerates composition noise."""
    from im2im_uq_tpu.models.unet import DoubleConv

    x = jnp.asarray(np.random.RandomState(9).randn(2, 16, 16, 128), jnp.float32)
    y = jnp.asarray(np.random.RandomState(10).randn(2, 16, 16, 64), jnp.float32)

    grads, stats = {}, {}
    for backend in ("xla", "pallas_fused"):
        m = DoubleConv(64, conv_backend=backend)
        vs = m.init(jax.random.key(0), x, train=False)

        def loss(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - y) ** 2), upd["batch_stats"]

        (_, bs), g = jax.value_and_grad(loss, has_aux=True)(vs["params"])
        grads[backend], stats[backend] = g, bs

    gx = dict(jax.tree_util.tree_flatten_with_path(grads["xla"])[0])
    gf = dict(jax.tree_util.tree_flatten_with_path(grads["pallas_fused"])[0])
    assert gx.keys() == gf.keys()
    floor = 0.01 * _tree_norm(grads["xla"])  # analytically-zero-tensor guard
    for path in gx:
        assert _rel_l2(gf[path], gx[path], floor) < 2e-4, (
            jax.tree_util.keystr(path), _rel_l2(gf[path], gx[path], floor)
        )
    sx = dict(jax.tree_util.tree_flatten_with_path(stats["xla"])[0])
    sf = dict(jax.tree_util.tree_flatten_with_path(stats["pallas_fused"])[0])
    for path in sx:
        assert _rel_l2(sf[path], sx[path]) < 1e-5, jax.tree_util.keystr(path)


def test_fused_backend_matches_xla_backend():
    """Whole-UNet: conv_backend='pallas_fused' tracks 'xla' in forward,
    gradients, and BatchNorm running-stat updates."""
    from im2im_uq_tpu.models.unet import UNet

    x = jnp.asarray(np.random.RandomState(7).randn(2, 16, 16, 1), jnp.float32)
    y = jnp.asarray(np.random.RandomState(8).randn(2, 16, 16, 32), jnp.float32)

    outs, grads, stats = {}, {}, {}
    for backend in ("xla", "pallas_fused"):
        m = UNet(n_channels_out=1, conv_backend=backend)
        vs = m.init(jax.random.key(0), x, train=False)
        outs[backend] = m.apply(vs, x, train=False)

        def loss(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((out - y) ** 2), upd["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss, has_aux=True)(vs["params"])
        grads[backend], stats[backend] = g, bs

    assert _rel_l2(outs["pallas_fused"], outs["xla"]) < 1e-4
    # per-tensor relative-L2: elementwise tolerances misfire on deep-
    # composition grads (tiny entries see reassociation noise amplified
    # through 20+ layers and the BN rsqrt); the block-level test above
    # pins tight correctness
    flat_x = dict(jax.tree_util.tree_flatten_with_path(grads["xla"])[0])
    flat_f = dict(jax.tree_util.tree_flatten_with_path(grads["pallas_fused"])[0])
    assert flat_x.keys() == flat_f.keys(), "param trees must match across backends"
    # ReLU-mask flips on near-zero pre-activations (f32 noise decides u>0
    # differently between backends — BN pins pre-activations near zero by
    # construction) inject O(local-grad) differences that amplify through
    # 20+ layers.  Measured: in a clean 1-CPU-device process the tree-level
    # disagreement is 0.9%; under the conftest 8-virtual-device environment
    # the same seeds give 2.3e-2–3.7e-2 and vary run to run (XLA-CPU
    # partitioning changes reassociation, which changes which masks flip).
    # So this check is a tripwire for O(1) VJP bugs, not a precision test —
    # precision is pinned at 2e-4 by the single-block test above and by
    # test_unet_backend_train_step_equivalence.
    floor = 0.01 * _tree_norm(grads["xla"])
    num = 0.0
    for path in flat_x:
        num += float(
            np.linalg.norm(
                np.asarray(flat_f[path], np.float64).ravel()
                - np.asarray(flat_x[path], np.float64).ravel()
            )
            ** 2
        )
        assert _rel_l2(flat_f[path], flat_x[path], floor) < 1.5e-1, (
            jax.tree_util.keystr(path), _rel_l2(flat_f[path], flat_x[path], floor)
        )
    assert num**0.5 / _tree_norm(grads["xla"]) < 6e-2, (
        "whole-tree gradient disagreement", num**0.5 / _tree_norm(grads["xla"])
    )
    sx = dict(jax.tree_util.tree_flatten_with_path(stats["xla"])[0])
    sf = dict(jax.tree_util.tree_flatten_with_path(stats["pallas_fused"])[0])
    assert sx.keys() == sf.keys(), "batch_stats trees must match across backends"
    for path in sx:
        assert _rel_l2(sf[path], sx[path]) < 1e-3, jax.tree_util.keystr(path)


def test_packed_fused_matches_packed_xla():
    """Lane-packed UNet: conv_backend='pallas_fused' (_packed_fused) tracks
    'xla' (_packed) in forward, BN running stats, and gradients (tripwire
    tolerances — see test_fused_backend_matches_xla_backend's noise note).
    Also pins the param/batch-stats tree contract across the two paths."""
    from im2im_uq_tpu.models.unet import UNet

    from im2im_uq_tpu.ops.lane_pack import unpack2

    x = jnp.asarray(np.random.RandomState(17).randn(2, 16, 16, 1), jnp.float32)
    y = jnp.asarray(np.random.RandomState(18).randn(2, 16, 16, 32), jnp.float32)

    outs, grads, stats, trees = {}, {}, {}, {}
    for backend in ("xla", "pallas_fused"):
        m = UNet(n_channels_out=1, conv_backend=backend, lane_pack=True)
        vs = m.init(jax.random.key(0), x, train=False)
        trees[backend] = jax.tree_util.tree_structure(vs)
        # the packed trunk emits (B/2, H, W, 2*32) features; heads normally
        # consume them packed — unpack here to compare against the target
        outs[backend] = unpack2(m.apply(vs, x, train=False))

        def loss(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.mean((unpack2(out) - y) ** 2), upd["batch_stats"]

        (_, bs), g = jax.value_and_grad(loss, has_aux=True)(vs["params"])
        grads[backend], stats[backend] = g, bs

    assert trees["xla"] == trees["pallas_fused"], "checkpoint-portable trees"
    assert _rel_l2(outs["pallas_fused"], outs["xla"]) < 1e-4
    sx = dict(jax.tree_util.tree_flatten_with_path(stats["xla"])[0])
    sf = dict(jax.tree_util.tree_flatten_with_path(stats["pallas_fused"])[0])
    assert sx.keys() == sf.keys()
    for path in sx:
        assert _rel_l2(sf[path], sx[path]) < 1e-3, jax.tree_util.keystr(path)
    flat_x = dict(jax.tree_util.tree_flatten_with_path(grads["xla"])[0])
    flat_f = dict(jax.tree_util.tree_flatten_with_path(grads["pallas_fused"])[0])
    assert flat_x.keys() == flat_f.keys()
    floor = 0.01 * _tree_norm(grads["xla"])
    num = 0.0
    for path in flat_x:
        num += float(
            np.linalg.norm(
                np.asarray(flat_f[path], np.float64).ravel()
                - np.asarray(flat_x[path], np.float64).ravel()
            )
            ** 2
        )
        assert _rel_l2(flat_f[path], flat_x[path], floor) < 1.5e-1, (
            jax.tree_util.keystr(path), _rel_l2(flat_f[path], flat_x[path], floor)
        )
    assert num**0.5 / _tree_norm(grads["xla"]) < 6e-2, (
        "whole-tree gradient disagreement", num**0.5 / _tree_norm(grads["xla"])
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

"""ops/pallas_pool: fused max-pool backward parity (interpret mode).

The kernel must reproduce XLA's select_and_scatter gradient bit-exactly,
including first-match tie-breaking (torch MaxPool2d semantics, reference
core/models/trunks/unet_parts.py:33). Quantized inputs make ties common.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.ops.pallas_pool import (
    _pool_fwd,
    max_pool2x2,
    pool_bwd_eligible,
)

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke


@pytest.mark.parametrize(
    "shape", [(2, 8, 16, 128), (1, 4, 8, 256), (2, 16, 8, 128)]
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pool_bwd_matches_select_and_scatter(shape, dtype):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    # quantize so 2x2 windows frequently contain equal elements (ties)
    x = jnp.asarray(np.round(rng.randn(b, h, w, c) * 2) / 2, dtype)
    g = jnp.asarray(rng.randn(b, h // 2, w // 2, c), dtype)
    out, vjp = jax.vjp(lambda a: max_pool2x2(a, True), x)
    dx = vjp(g)[0]
    out_ref, vjp_ref = jax.vjp(_pool_fwd, x)
    dx_ref = vjp_ref(g)[0]
    assert jnp.all(out == out_ref)
    assert jnp.all(dx == dx_ref)


def test_all_ties_routes_to_first():
    # constant windows: the whole gradient must land on the top-left
    x = jnp.zeros((1, 4, 8, 128), jnp.float32)
    g = jnp.ones((1, 2, 4, 128), jnp.float32)
    _, vjp = jax.vjp(lambda a: max_pool2x2(a, True), x)
    dx = vjp(g)[0]
    assert jnp.all(dx[:, ::2, ::2] == 1.0)
    dx_rest = dx.at[:, ::2, ::2].set(0.0)
    assert jnp.all(dx_rest == 0.0)


def test_ineligible_falls_back():
    # C=64 < 128 lanes: custom_vjp must fall back to select_and_scatter
    assert not pool_bwd_eligible((2, 8, 16, 64), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 16, 64), jnp.float32)
    g = jnp.ones((2, 4, 8, 64), jnp.float32)
    _, vjp = jax.vjp(lambda a: max_pool2x2(a, True), x)
    _, vjp_ref = jax.vjp(_pool_fwd, x)
    assert jnp.all(vjp(g)[0] == vjp_ref(g)[0])


def test_unet_pool_backend_config():
    # pool_backend plumbs through build_trunk; values identical either way
    from im2im_uq_tpu.models.assembly import build_trunk

    for pb in ("xla", "pallas"):
        t = build_trunk({"model": "UNet", "pool_backend": pb})
        assert t.pool_backend == pb
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 1), jnp.float32)
    t0 = build_trunk({"model": "UNet", "pool_backend": "xla"})
    v = t0.init(jax.random.key(0), x)
    y0 = t0.apply(v, x)
    t1 = build_trunk({"model": "UNet", "pool_backend": "pallas"})
    y1 = t1.apply(v, x)
    assert jnp.array_equal(y0, y1)

"""Parity tests for the fused Pallas 2x align-corners upsample.

ops/pallas_resize.py replaces the decoder's stack/reshape interleave
(ops/resize.upsample2x_align_corners; reference counterpart
torch.nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True),
reference core/models/trunks/unet_parts.py:53) with one fused kernel.

Contract pinned here (interpret mode — runs on the CPU mesh):
  - forward matches the XLA formulation to f32 machine precision for
    fp32 inputs and to bf16 resolution for bf16 (the kernel's W axis is
    an f32-accumulating MXU matmul — the more accurate side; the XLA
    path rounds every intermediate lerp to bf16).
  - backward (custom VJP) matches jax.vjp of the XLA path to fp32
    accuracy (the kernel accumulates in f32, better than the bf16 chain).
  - eligibility gate refuses shapes the kernel cannot tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.ops import pallas_resize as pr
from im2im_uq_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample2x_align_corners,
)

pytestmark = pytest.mark.smoke

# every decoder upsample shape of the flagship 320^2 UNet (batch shrunk),
# plus odd-tile and rectangular cases
SHAPES = [
    ((2, 20, 24, 512), jnp.bfloat16),  # up1 geometry (w padded to %8)
    ((2, 40, 40, 256), jnp.bfloat16),  # up2
    ((1, 80, 80, 128), jnp.float32),   # up3
    ((1, 160, 160, 64), jnp.bfloat16), # up4
    ((2, 80, 40, 64), jnp.float32),    # rectangular, lane-pad path (C=64→128)
    ((3, 10, 16, 64), jnp.float32),    # th=5 tile path
]


def _xla_up(x):
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))


@pytest.mark.parametrize("shape,dtype", SHAPES)
def test_forward_parity_vs_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    assert pr.pallas_upsample_eligible(x.shape, x.dtype)
    y_p = np.asarray(pr.upsample2x_pallas(x, True), np.float32)
    y_x = np.asarray(jax.jit(_xla_up)(x), np.float32)
    rel = np.linalg.norm(y_p - y_x) / (np.linalg.norm(y_x) + 1e-12)
    # fp32: ~5e-8 measured; bf16: ~3.6e-3 measured (bf16 resolution)
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    assert rel < tol, rel


@pytest.mark.parametrize("shape,dtype", SHAPES)
def test_backward_matches_xla_vjp(shape, dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    g = jnp.asarray(rng.standard_normal((shape[0], 2 * shape[1], 2 * shape[2], shape[3])), dtype)
    _, vjp_x = jax.vjp(_xla_up, x)
    _, vjp_p = jax.vjp(lambda a: pr.upsample2x_pallas(a, True), x)
    (dx_x,) = vjp_x(g)
    (dx_p,) = vjp_p(g)
    dx_x = np.asarray(dx_x, np.float32)
    dx_p = np.asarray(dx_p, np.float32)
    rel = np.linalg.norm(dx_x - dx_p) / (np.linalg.norm(dx_x) + 1e-12)
    # f32 taps: near machine eps; bf16: kernel accumulates in f32 while the
    # XLA chain rounds each add to bf16 — bounded by bf16 resolution
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    assert rel < tol, rel


def test_eligibility_gate():
    ok = pr.pallas_upsample_eligible
    assert ok((2, 40, 40, 64), jnp.bfloat16)
    assert not ok((2, 40, 40, 64), jnp.float16)   # unsupported dtype
    assert not ok((2, 40, 41, 64), jnp.float32)   # W % 8 != 0
    assert not ok((2, 40, 40, 16), jnp.float32)   # C too small
    assert not ok((2, 40, 40, 32), jnp.float32)   # lane-pad factor 4 > 2
    assert ok((2, 160, 160, 64), jnp.bfloat16)    # lane-pad path (pad to 128)
    assert not ok((2, 7, 40, 64), jnp.float32)    # no row tile divides H
    assert not ok((40, 40, 64), jnp.float32)      # not 4-D


def test_dispatcher_falls_back_to_xla_off_tpu():
    # on CPU (this suite) 'auto' must route to the XLA path; 'pallas'
    # forces the kernel in interpret mode — both agree with the jitted
    # XLA formulation
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 20, 24, 64)), jnp.bfloat16)
    y_auto = np.asarray(upsample2x_align_corners(x), np.float32)
    y_forced = np.asarray(upsample2x_align_corners(x, backend="pallas"), np.float32)
    y_x = np.asarray(jax.jit(_xla_up)(x), np.float32)
    # auto on CPU = the XLA path, bit-for-bit
    np.testing.assert_array_equal(y_auto, np.asarray(_xla_up(x), np.float32))
    rel = np.linalg.norm(y_forced - y_x) / (np.linalg.norm(y_x) + 1e-12)
    assert rel < 1e-2, rel


def test_grad_through_dispatcher():
    # the custom VJP must compose with jax.grad through the public entry
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 10, 16, 32)), jnp.float32)

    def loss_pallas(a):
        return jnp.sum(pr.upsample2x_pallas(a, True) ** 2)

    def loss_xla(a):
        return jnp.sum(_xla_up(a) ** 2)

    gp = np.asarray(jax.grad(loss_pallas)(x))
    gx = np.asarray(jax.grad(loss_xla)(x))
    np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-5)


def test_mesh_scope_shard_maps_kernel_no_allgather():
    """Round-5: inside resize_mesh_scope on a 1-D data mesh the fused
    kernel runs as a shard_map island — per-shard, ZERO collectives. A
    bare pallas_call under GSPMD is all-gathered instead (measured: 9
    all-gathers), which this pins against."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from im2im_uq_tpu.ops.resize import resize_mesh_scope
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

    mesh = data_parallel_mesh()
    sh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(7)
    x = rng.standard_normal((16, 16, 24, 64)).astype(np.float32)

    def up(a):
        with resize_mesh_scope(mesh):
            return upsample2x_align_corners(a, backend="pallas")

    f = jax.jit(up, in_shardings=sh, out_shardings=sh)
    xd = jax.device_put(jnp.asarray(x), sh)
    out = f(xd)
    assert out.shape == (16, 32, 48, 64)
    # exactness vs the XLA formulation (kernel accumulates W pass in f32)
    ref = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (32, 48)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # the island must be collective-free: no all-gather in the SPMD HLO
    txt = f.lower(xd).compile().as_text()
    assert not re.search(r"all-gather", txt), "kernel input was all-gathered"

    # gradient flows through the shard_map island and matches XLA's
    def loss_scoped(a):
        with resize_mesh_scope(mesh):
            return jnp.sum(upsample2x_align_corners(a, backend="pallas") ** 2)

    def loss_xla(a):
        return jnp.sum(resize_bilinear_align_corners(a, (32, 48)) ** 2)

    g_s = np.asarray(jax.jit(jax.grad(loss_scoped), in_shardings=sh)(xd))
    g_x = np.asarray(jax.jit(jax.grad(loss_xla))(jnp.asarray(x)))
    np.testing.assert_allclose(g_s, g_x, rtol=1e-4, atol=1e-4)


def test_mesh_scope_ignored_when_not_applicable():
    """The scope must NOT reroute: 2-D meshes (height-sharded activations),
    batches not divisible by the mesh, or no scope at all — XLA runs."""
    from jax.sharding import Mesh

    from im2im_uq_tpu.ops.resize import resize_mesh_scope

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 16, 24, 64)), jnp.float32)
    ref = np.asarray(resize_bilinear_align_corners(x, (32, 48)))

    devs = np.asarray(jax.devices()).reshape(4, 2)
    mesh2 = Mesh(devs, ("data", "spatial"))
    with resize_mesh_scope(mesh2):
        out = upsample2x_align_corners(x, backend="auto")
    np.testing.assert_array_equal(np.asarray(out), ref)

    # 1-D mesh but batch 3 not divisible by 8: falls through to XLA
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

    with resize_mesh_scope(data_parallel_mesh()):
        out = upsample2x_align_corners(x, backend="auto")
    np.testing.assert_array_equal(np.asarray(out), ref)

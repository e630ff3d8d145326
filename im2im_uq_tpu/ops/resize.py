"""Spatial resize ops with align-corners semantics, scatter-free in both directions.

The reference trunk upsamples with torch.nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True) (reference: core/models/trunks/
unet_parts.py:53). jax.image.resize only implements half-pixel-centers
bilinear, so we implement the align-corners variant directly as a separable
two-tap gather + lerp.

TPU note: the VJP of a gather is a scatter-add, which XLA:TPU lowers to a
serialized while/dynamic-update-slice loop — profiled at ~25% of the whole
UNet train step (4 up-blocks × 2 axes). Since the interpolation taps are
static functions of (in_size, out_size), the transpose map is also static:
input row i receives cotangent from the ≤K output rows that read it, with
fixed weights. We register a custom VJP that evaluates that transpose as
another gather (+ weighted sum) — no scatter anywhere, forward and backward
both stream through the VPU.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

from im2im_uq_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "resize_bilinear_align_corners",
    "upsample2x_align_corners",
    "resize_mesh_scope",
]

# Trace-time mesh scope (a stack: scopes can nest). A bare pallas_call has
# no GSPMD partitioning rule, so under a mesh the SPMD partitioner
# ALL-GATHERS its input, runs the kernel on the full tensor per device, and
# slices the result (measured: 9 all-gathers in the partitioned HLO of one
# batch-sharded upsample) — erasing the kernel's win. Mesh-aware program
# builders open this scope INSIDE their traced bodies (so it is baked into
# the program regardless of trace order/caching), and
# upsample2x_align_corners wraps the kernel in a shard_map island over the
# batch axis instead: each device runs its own shard, zero collectives,
# same per-chip win as single-chip. A ContextVar (not a module global):
# concurrent traces in other threads — e.g. the calibration AOT precompile
# thread — must not observe this thread's scope.
_RESIZE_MESH: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "resize_mesh_stack", default=()
)


@contextlib.contextmanager
def resize_mesh_scope(mesh):
    """Enable per-shard Pallas resize under ``mesh`` for code traced inside.

    Pass the mesh the surrounding jit shards its batch over (1-D 'data'
    meshes only — on a 2-D data×spatial mesh the activations are height-
    sharded and the island would force a mid-model reshard, so the scope is
    ignored there and the XLA path runs, which GSPMD halo-exchanges
    correctly)."""
    token = _RESIZE_MESH.set(_RESIZE_MESH.get() + (mesh,))
    try:
        yield
    finally:
        _RESIZE_MESH.reset(token)


def _scope_mesh():
    stack = _RESIZE_MESH.get()
    return stack[-1] if stack else None


@functools.lru_cache(maxsize=128)
def _tap_tables(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static align-corners taps: (i0, i1, frac) per output index."""
    if out_size == 1 or in_size == 1:
        pos = np.zeros((out_size,), np.float64)
    else:
        pos = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    i0 = np.floor(pos).astype(np.int32)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (pos - i0).astype(np.float32)
    return i0, i1, frac


@functools.lru_cache(maxsize=128)
def _transpose_tables(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Static transpose map: for input row i, the (idx, w) pairs of output
    rows whose interpolation reads it. Padded to the max tap count K with
    weight-0 references to row 0."""
    i0, i1, frac = _tap_tables(in_size, out_size)
    contrib: list[list[tuple[int, float]]] = [[] for _ in range(in_size)]
    for j in range(out_size):
        if i0[j] == i1[j]:
            contrib[i0[j]].append((j, 1.0))
        else:
            contrib[i0[j]].append((j, 1.0 - float(frac[j])))
            contrib[i1[j]].append((j, float(frac[j])))
    k = max(len(c) for c in contrib)
    idx = np.zeros((in_size, k), np.int32)
    w = np.zeros((in_size, k), np.float32)
    for i, pairs in enumerate(contrib):
        for t, (j, wj) in enumerate(pairs):
            idx[i, t] = j
            w[i, t] = wj
    return idx, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _resize_axis_impl(x: jax.Array, out_size: int, axis: int, in_size: int) -> jax.Array:
    i0, i1, frac = _tap_tables(in_size, out_size)
    lo = jnp.take(x, jnp.asarray(i0), axis=axis)
    hi = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac).astype(x.dtype).reshape(shape)
    return lo + (hi - lo) * f


def _resize_axis_fwd(x, out_size, axis, in_size):
    return _resize_axis_impl(x, out_size, axis, in_size), None


def _resize_axis_bwd(out_size, axis, in_size, _res, g):
    idx, w = _transpose_tables(in_size, out_size)
    # K separate takes, one per tap slot: each idx[:, t] is monotone
    # non-decreasing in i, which XLA:TPU lowers to a cheap strided
    # mini-gather (one interleaved K·in gather lowers to a serialized
    # while/dynamic-slice loop instead — profiled 5-10 ms per up-block)
    w_shape = [1] * g.ndim
    w_shape[axis] = in_size
    dx = None
    # the op is dtype-preserving, so g carries x's dtype
    for t in range(idx.shape[1]):
        term = jnp.take(g, jnp.asarray(idx[:, t]), axis=axis) * jnp.asarray(
            w[:, t]
        ).astype(g.dtype).reshape(w_shape)
        dx = term if dx is None else dx + term
    return (dx,)


_resize_axis_impl.defvjp(_resize_axis_fwd, _resize_axis_bwd)


def _resize_axis(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    if out_size == 2 * x.shape[axis]:
        return _upsample2x_axis(x, axis)
    return _resize_axis_impl(x, out_size, axis, x.shape[axis])


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Gather-free exact-2x align-corners upsample along one axis.

    For out = 2n the taps decompose into two phases: even outputs j=2m read
    (x[m-1], x[m]) and odd outputs j=2m+1 read (x[m], x[m+1]) — floor of
    m − m/(2n−1) is exactly m−1 for 0 < m < n. So the op is two static
    shifts + lerps + an interleave (stack/reshape): no gather in the
    forward, and XLA's transpose is slice/pad — no scatter in the backward.
    (A gather here lowers to a serialized while/dynamic-slice loop on
    XLA:TPU — profiled at a quarter of the whole UNet train step.)
    Arithmetic is identical to the general tap path: lo + (hi−lo)·frac.
    """
    n = x.shape[axis]
    sl = functools.partial(jax.lax.slice_in_dim, x, axis=axis)
    xm1 = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis=axis)  # x[max(m-1,0)]
    xp1 = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis=axis)  # x[min(m+1,n-1)]
    m = np.arange(n, dtype=np.float64)
    if n == 1:
        f_even = np.ones((1,), np.float32)
        f_odd = np.zeros((1,), np.float32)
    else:
        scale = (n - 1) / (2 * n - 1)
        f_even = (2 * m * scale - (m - 1)).astype(np.float32)
        f_even[0] = 1.0  # j=0 reads x[0] exactly
        f_odd = ((2 * m + 1) * scale - m).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = n
    fe = jnp.asarray(f_even).astype(x.dtype).reshape(shape)
    fo = jnp.asarray(f_odd).astype(x.dtype).reshape(shape)
    even = xm1 + (x - xm1) * fe
    odd = x + (xp1 - x) * fo
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape)


def resize_bilinear_align_corners(
    x: jax.Array, out_hw: tuple[int, int], *, spatial_axes: tuple[int, int] = (1, 2)
) -> jax.Array:
    """Bilinear resize with align_corners=True over the given spatial axes.

    Default axes (1, 2) match NHWC activations.
    """
    h_axis, w_axis = spatial_axes
    if x.shape[h_axis] != out_hw[0]:
        x = _resize_axis(x, out_hw[0], h_axis)
    if x.shape[w_axis] != out_hw[1]:
        x = _resize_axis(x, out_hw[1], w_axis)
    return x


def upsample2x_align_corners(x: jax.Array, backend: str = "auto") -> jax.Array:
    """2x spatial upsample (NHWC) with align_corners=True bilinear weights.

    ``backend``: 'auto' uses the fused Pallas kernel (ops/pallas_resize.py)
    on a single real TPU chip when the shape is eligible — it replaces the
    stack/reshape interleave's multiple passes + layout copies with one
    read + one write — and this XLA formulation otherwise; 'xla'/'pallas'
    force a path ('pallas' runs interpreted off-TPU). Forward agreement
    between backends: f32 machine precision for fp32, bf16 resolution for
    bf16, where the kernel accumulates its W pass in f32 and is the more
    accurate side (pinned by tests/test_pallas_resize.py).

    Multi-device: a bare pallas_call has no GSPMD partitioning rule (the
    partitioner all-gathers around it — measured), so on a mesh the kernel
    only runs inside a ``resize_mesh_scope`` — a shard_map island over the
    1-D 'data' axis, each device upsampling its own batch shard with zero
    collectives (exactness pinned by tests/test_pallas_resize.py). Without
    the scope, or on a 2-D (data×spatial) mesh whose activations are
    height-sharded, the XLA formulation runs and GSPMD partitions it.
    """
    _, h, w, _ = x.shape
    if backend in ("auto", "pallas"):
        from im2im_uq_tpu.ops import pallas_resize as _pr

        if _pr.pallas_upsample_eligible(x.shape, x.dtype):
            mesh = _scope_mesh()
            if (
                mesh is not None
                and tuple(mesh.axis_names) == (DATA_AXIS,)
                and mesh.size > 1
                and x.shape[0] % mesh.size == 0
                and (backend == "pallas" or _pr._on_tpu())
            ):
                from jax.sharding import PartitionSpec as P

                return jax.shard_map(
                    _pr.upsample2x_pallas,
                    mesh=mesh,
                    in_specs=P(DATA_AXIS),
                    out_specs=P(DATA_AXIS),
                    # no collectives inside (per-example resize); pallas_call
                    # carries no varying-across-mesh annotations for the
                    # check_vma analysis (same as the rcps table island)
                    check_vma=False,
                )(x)
            if backend == "pallas" or (
                _pr._on_tpu() and jax.device_count() == 1
            ):
                return _pr.upsample2x_pallas(x)
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))

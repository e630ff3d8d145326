"""Fused Pallas backward for 2×2/2 max pooling (TPU).

The reference pools with ``nn.MaxPool2d(2)`` between UNet levels
(reference core/models/trunks/unet_parts.py:28-39). XLA's backward for
``lax.reduce_window`` is ``select_and_scatter`` plus mask/convert fusions
— measured ~8.8 ms/step of the bf16 batch-32 train step (four pools,
benchmarks/bench_time_buckets.py), ~4× the HBM roofline of the op (read
x and g, write dx once). This kernel computes the whole scatter in one
elementwise pass:

  dx[2i+di, 2j+dj] = g[i,j] · 1[x is the FIRST window element == max]

with torch/select_and_scatter first-match (row-major window scan)
semantics. The 2× expansions of g and the pooled max along W ride one
(W, W/2) 0/1 banded MXU matmul per row (Mosaic rejects elementwise
sublane interleaves — same finding as ops/pallas_resize.py); the H-axis
duplication is a free reshape on the untiled row dim. First-match
priority is pure VPU work: ±1 column rolls + row shifts of the equality
mask, combined under row/column parity masks.

Forward stays XLA's ``reduce_window`` (it is already near roofline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["max_pool2x2", "pool_bwd_eligible"]

LANE = 128


def _pick_row_tile(h: int) -> int | None:
    """Even row tile of the pre-pool tensor (pairs stay inside a tile)."""
    for th in (16, 8, 4, 2):
        if h % th == 0:
            return th
    return None


def pool_bwd_eligible(shape, dtype) -> bool:
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if h % 2 or w % 2 or w % 8 or c % LANE:
        return False
    return _pick_row_tile(h) is not None


@functools.lru_cache(maxsize=32)
def _expand2_matrix(w2: int) -> np.ndarray:
    """(W, W/2) 0/1 matrix E with (E @ row)[j] = row[j // 2]."""
    e = np.zeros((2 * w2, w2), np.float32)
    e[np.arange(2 * w2), np.arange(2 * w2) // 2] = 1.0
    return e


def _pool_bwd_kernel(x_ref, g_ref, m_ref, e_ref, dx_ref, *, th, w, c):
    # All mask logic runs in f32 0/1 arithmetic: this Mosaic build rejects
    # bf16 comparisons/selects AND any roll/convert of an i1 vector
    # (probed on v5e — f32 compare + select compiles, everything else
    # silently kills the remote compiler).
    th2 = th // 2
    xf = x_ref[0].astype(jnp.float32)  # (th, W, C) pre-pool rows t*th ..
    e = e_ref[...]  # (W, W/2)

    def expand(a_ref):
        # (th/2, W/2, C) → (th, W, C) f32: W via the banded matmul, H via
        # a free reshape on the untiled row dim.
        rows = [
            jax.lax.dot_general(
                e,
                a_ref[0, r],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for r in range(th2)
        ]
        up = jnp.stack(rows, axis=0)  # (th/2, W, C)
        return jnp.broadcast_to(up[:, None], (th2, 2, w, c)).reshape(th, w, c)

    mup = expand(m_ref)
    gup = expand(g_ref)
    eq = jnp.where(xf >= mup, 1.0, 0.0)  # == in exact arithmetic
    # First-match (row-major 2×2 scan) priority. Window-mates of (r, j):
    # parity (0,1) → left; (1,0) → up, up-right; (1,1) → up-left, up, left.
    eq_l = jnp.roll(eq, 1, axis=1)
    eq_u = jnp.roll(eq, 1, axis=0)
    eq_ul = jnp.roll(eq_u, 1, axis=1)
    eq_ur = jnp.roll(eq_u, -1, axis=1)
    rp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (th, w, 1), 0) % 2 == 1, 1.0, 0.0
    )
    cp = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (th, w, 1), 1) % 2 == 1, 1.0, 0.0
    )
    earlier = (
        (1.0 - rp) * cp * eq_l
        + rp * (1.0 - cp) * (eq_u + eq_ur)
        + rp * cp * (eq_ul + eq_u + eq_l)
    )
    sel = eq * jnp.where(earlier > 0, 0.0, 1.0)
    dx_ref[0] = (gup * sel).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_bwd_raw(x, out, g, interpret=False):
    bsz, h, w, c = x.shape
    th = _pick_row_tile(h)
    assert th is not None and w % 8 == 0 and c % LANE == 0, x.shape
    e = jnp.asarray(_expand2_matrix(w // 2), x.dtype)
    kfn = functools.partial(_pool_bwd_kernel, th=th, w=w, c=c)
    return pl.pallas_call(
        kfn,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, th // 2, w // 2, c), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, th // 2, w // 2, c), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((2 * (w // 2), w // 2), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret or not _on_tpu(),
    )(x, g, out, e)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pool_fwd(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype.type(0),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool2x2(x, interpret=False):
    """2×2 stride-2 max pool; backward is the fused Pallas scatter when
    eligible (torch/select_and_scatter first-match semantics), XLA's
    select_and_scatter otherwise."""
    return _pool_fwd(x)


def _mp_fwd(x, interpret):
    out = _pool_fwd(x)
    return out, (x, out)


def _mp_bwd(interpret, res, g):
    x, out = res
    if pool_bwd_eligible(x.shape, x.dtype):
        return (_pool_bwd_raw(x, out, g, interpret=interpret),)
    _, vjp = jax.vjp(_pool_fwd, x)
    return (vjp(g)[0],)


max_pool2x2.defvjp(_mp_fwd, _mp_bwd)

"""Centered FFTs and complex helpers over real-pair encoded arrays.

Counterpart of the reference MRI physics stack (reference:
core/datasets/fastmri/fftc.py:61-210 ``fft2c_new``/``ifft2c_new`` +
roll/fftshift/ifftshift, math_util.py:13-102 complex ops,
coil_combine.py:14-43 rss): complex values are stored as real arrays with a
trailing dim of size 2 (re, im); FFTs are orthonormal and centered
(ifftshift → fft2 → fftshift over the two spatial dims).

Implemented on jnp so the k-space → image pipeline can run jitted on the
TPU; jnp.fft's native shift/ortho primitives replace the reference's
hand-rolled roll loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "to_complex",
    "from_complex",
    "fft2c",
    "ifft2c",
    "complex_mul",
    "complex_conj",
    "complex_abs",
    "complex_abs_sq",
    "rss",
    "rss_complex",
]


def to_complex(data: jax.Array) -> jax.Array:
    """(..., 2) real-pair → native complex."""
    if data.shape[-1] != 2:
        raise ValueError("Tensor does not have separate complex dim.")
    return jax.lax.complex(data[..., 0], data[..., 1])


def from_complex(data: jax.Array) -> jax.Array:
    """native complex → (..., 2) real-pair."""
    return jnp.stack([jnp.real(data), jnp.imag(data)], axis=-1)


def _centered(transform, data: jax.Array) -> jax.Array:
    """ifftshift → 2-D ortho transform → fftshift on dims (-3, -2) of a
    real-pair array (the reference's centered-FFT recipe, fftc.py:61-110)."""
    if data.shape[-1] != 2:
        raise ValueError("Tensor does not have separate complex dim.")
    z = to_complex(data)
    z = jnp.fft.ifftshift(z, axes=(-2, -1))
    z = transform(z, axes=(-2, -1), norm="ortho")
    z = jnp.fft.fftshift(z, axes=(-2, -1))
    return from_complex(z)


def fft2c(data: jax.Array) -> jax.Array:
    """Centered orthonormal 2-D FFT (reference fft2c_new, fftc.py:61-83)."""
    return _centered(jnp.fft.fft2, data)


def ifft2c(data: jax.Array) -> jax.Array:
    """Centered orthonormal 2-D IFFT (reference ifft2c_new, fftc.py:87-110)."""
    return _centered(jnp.fft.ifft2, data)


def complex_mul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Elementwise complex product of real-pair arrays (math_util.py:13-33)."""
    if not (x.shape[-1] == y.shape[-1] == 2):
        raise ValueError("Tensors do not have separate complex dim.")
    re = x[..., 0] * y[..., 0] - x[..., 1] * y[..., 1]
    im = x[..., 0] * y[..., 1] + x[..., 1] * y[..., 0]
    return jnp.stack([re, im], axis=-1)


def complex_conj(x: jax.Array) -> jax.Array:
    """Complex conjugate of a real-pair array (math_util.py:36-53)."""
    if x.shape[-1] != 2:
        raise ValueError("Tensor does not have separate complex dim.")
    return jnp.stack([x[..., 0], -x[..., 1]], axis=-1)


def complex_abs(data: jax.Array) -> jax.Array:
    """|z| of a real-pair array (math_util.py:56-70)."""
    if data.shape[-1] != 2:
        raise ValueError("Tensor does not have separate complex dim.")
    return jnp.sqrt(jnp.sum(data * data, axis=-1))


def complex_abs_sq(data: jax.Array) -> jax.Array:
    """|z|^2 of a real-pair array (math_util.py:73-86)."""
    if data.shape[-1] != 2:
        raise ValueError("Tensor does not have separate complex dim.")
    return jnp.sum(data * data, axis=-1)


def rss(data: jax.Array, axis: int = 0) -> jax.Array:
    """Root-sum-of-squares coil combine (coil_combine.py:14-28)."""
    return jnp.sqrt(jnp.sum(data * data, axis=axis))


def rss_complex(data: jax.Array, axis: int = 0) -> jax.Array:
    """RSS over a coil axis of real-pair data (coil_combine.py:31-43)."""
    return jnp.sqrt(jnp.sum(complex_abs_sq(data), axis=axis))

"""Planar complex arithmetic on float32 (..., 2) arrays.

TPUs have no native complex unit — XLA decomposes complex ops into real
arithmetic, and the tunneled backend in this environment cannot even lower
``real(z)``/``abs(z)``/complex constants. All device-side DSP therefore uses
an explicit (re, im) last-axis-of-2 float32 layout: it is what the hardware
executes anyway, it vectorizes cleanly on the VPU, and the host boundary is a
free ``complex64 <-> float32 view`` reinterpretation.
"""

import jax.numpy as jnp
import numpy as np


def from_np(x: np.ndarray):
    """numpy complex -> float32 (..., 2) numpy view (host-side, zero copy)."""
    x = np.ascontiguousarray(x, dtype=np.complex64)
    return x.view(np.float32).reshape(x.shape + (2,))


def to_np(x) -> np.ndarray:
    """float32 (..., 2) (device or host) -> numpy complex64."""
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float32))
    return x.view(np.complex64)[..., 0]


def re(x):
    return x[..., 0]


def im(x):
    return x[..., 1]


def make(re_part, im_part):
    return jnp.stack([re_part, im_part], axis=-1)


def cmul(a, b):
    """a * b"""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def conj_mul(a, b):
    """conj(a) * b"""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br + ai * bi, ar * bi - ai * br], axis=-1)


def conj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def cadd(a, b):
    return a + b


def scale(a, s):
    """a * s with real s (broadcast over the pair axis)."""
    return a * s[..., None]


def abs2(a):
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]


def cabs(a):
    return jnp.sqrt(abs2(a))


def cexp(ph):
    """exp(j*ph) for real ph -> (..., 2)."""
    return jnp.stack([jnp.cos(ph), jnp.sin(ph)], axis=-1)


def rotate(a, ph):
    """a * exp(j*ph)"""
    return cmul(a, cexp(ph))


def angle(a):
    return jnp.arctan2(a[..., 1], a[..., 0])


def csum(a, axis):
    """Sum over a data axis (negative axes count before the pair axis)."""
    if axis < 0:
        axis = axis - 1
    return jnp.sum(a, axis=axis)


def dot_real(a, b, axis=-1):
    """real(<a, b>) = sum(re*re + im*im) over the given data axis."""
    if axis < 0:
        axis = axis - 1
    return jnp.sum(a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1], axis=axis)

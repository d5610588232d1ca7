"""Soft constellation demapping + deinterleaving (JAX, batched, planar IQ).

Device-side counterpart of ``spec/constellations.py`` (reference
``lib/xfecframe_demapper_cb_impl.cc``): XFECFRAME symbols -> int8 LLRs in
codeword order, plus the data-aided SNR estimator used to set the LLR scale.
LLR sign convention: positive = bit 0. Symbols are float32 (..., n, 2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.constellations import (
    BITS_PER_SYMBOL,
    SIN_PI_8,
    SQRT2_2,
    constellation_points,
)
from ..spec.interleaver import column_order
from . import cplx


def _quantize(vals):
    return jnp.clip(jnp.round(vals), -128, 127).astype(jnp.int8)


def estimate_snr_qpsk(syms):
    """Data-aided linear SNR from sliced QPSK symbols. syms: (..., n, 2)."""
    s = np.float32(SQRT2_2)
    ref = jnp.sign(syms) * s
    sp = jnp.sum(jnp.sum(ref * ref, axis=-1), axis=-1)
    np_ = jnp.sum(jnp.sum((syms - ref) ** 2, axis=-1), axis=-1)
    return sp / jnp.maximum(np_, 1e-12)


def estimate_snr_generic(syms, constellation, rate):
    pts = cplx.from_np(constellation_points(constellation, rate))
    ptsj = jnp.asarray(pts)
    d2 = jnp.sum(
        (syms[..., None, :] - ptsj[None, :, :]) ** 2, axis=-1
    )
    # noise power is the min distance itself; signal power selects the
    # slicer point's energy with an exact one-hot (a pts[argmin] gather
    # from the tiny table serializes on TPU — see _snr_refine)
    dmin = jnp.min(d2, axis=-1)
    np_ = jnp.sum(dmin, axis=-1)
    e = jnp.sum(ptsj * ptsj, axis=-1)                       # (P,)
    oh = (d2 == dmin[..., None]).astype(jnp.float32)
    oh = oh / jnp.maximum(jnp.sum(oh, axis=-1, keepdims=True), 1.0)
    # HIGHEST precision keeps the one-hot select exact (default bf16
    # contraction would round the point energies ~2^-9); trivial cost
    sp = jnp.sum(
        jnp.matmul(oh, e, precision=jax.lax.Precision.HIGHEST), axis=-1
    )
    return sp / jnp.maximum(np_, 1e-12)


def demap_qpsk(syms, n0, quantize=True):
    """(..., n, 2) -> (..., 2n) int8 LLRs; scale 2*sqrt(2)/N0."""
    scale = (2.0 * np.sqrt(2.0) / n0)[..., None, None]
    vals = syms * scale
    flat = vals.reshape(vals.shape[:-2] + (-1,))
    return _quantize(flat) if quantize else flat


def demap_8psk(syms, n0, quantize=True):
    """8PSK soft demap with the reference's rotated-axes formulation."""
    precision = (4.0 / n0)[..., None]
    dist = np.float32(2.0 * SIN_PI_8)
    rot = cplx.from_np(np.exp(-1j * np.pi / 8).astype(np.complex64).reshape(1))
    c = cplx.cmul(syms, jnp.asarray(rot)[0])
    cr, ci = c[..., 0], c[..., 1]
    b1 = cr
    b2 = ci
    b0 = np.float32(SQRT2_2) * (jnp.abs(cr) - jnp.abs(ci))
    vals = jnp.stack([b0, b1, b2], axis=-1) * (dist * precision)[..., None]
    flat = vals.reshape(vals.shape[:-2] + (-1,))
    return _quantize(flat) if quantize else flat


def demap_maxlog(syms, n0, constellation, rate, quantize=True):
    """Max-log-MAP LLRs for APSK constellations."""
    n_mod = BITS_PER_SYMBOL[constellation]
    pts = cplx.from_np(constellation_points(constellation, rate))
    d2 = jnp.sum(
        (syms[..., None, :] - jnp.asarray(pts)[None, :, :]) ** 2, axis=-1
    )  # (..., n, n_points)
    idx = np.arange(pts.shape[0])
    llrs = []
    for b in range(n_mod):
        bit = (idx >> (n_mod - 1 - b)) & 1
        m0 = jnp.min(jnp.where(bit == 0, d2, jnp.inf), axis=-1)
        m1 = jnp.min(jnp.where(bit == 1, d2, jnp.inf), axis=-1)
        llrs.append((m1 - m0) / n0[..., None])
    vals = jnp.stack(llrs, axis=-1)
    flat = vals.reshape(vals.shape[:-2] + (-1,))
    return _quantize(flat) if quantize else flat


def deinterleave_llrs(llrs, constellation, rate):
    """Symbol-ordered LLRs -> codeword-ordered LLRs (batched)."""
    order = column_order(constellation, rate)
    if order is None:
        return llrs
    n_mod = len(order)
    rows = llrs.shape[-1] // n_mod
    per_sym = llrs.reshape(llrs.shape[:-1] + (rows, n_mod))
    cols = [per_sym[..., :, int(np.where(np.asarray(order) == c)[0][0])]
            for c in range(n_mod)]
    return jnp.concatenate(cols, axis=-1)


def demap(syms, n0, constellation, rate, quantize=True):
    """Full demapper: planar symbols -> codeword-ordered LLRs.

    ``quantize=False`` returns pre-quantization float32 LLR values so the
    caller can transpose to the decoder's lane-major layout in f32 (TPU
    transposes f32 efficiently; int8 transposes are pathological) and apply
    ``quantize_llrs`` afterwards — bit-identical to quantize-then-transpose.
    """
    if constellation == "QPSK":
        llrs = demap_qpsk(syms, n0, quantize)
    elif constellation == "8PSK":
        llrs = demap_8psk(syms, n0, quantize)
    else:
        llrs = demap_maxlog(syms, n0, constellation, rate, quantize)
    return deinterleave_llrs(llrs, constellation, rate)


def quantize_llrs(vals):
    """Float LLR values -> int8 (the demapper's quantizer, exported)."""
    return _quantize(vals)

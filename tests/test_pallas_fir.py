"""Pallas fused MF+decimate kernels vs an exact numpy reference.

The kernels compile on hardware (phase-decomposed design — see the module
docstring for the two Mosaic constraints that shaped it); on the CPU test
backend they run through the Pallas interpreter. Both paths are checked
against f64 numpy, NOT against the XLA conv fallback: TPU convolutions
default to bf16 multiplies (the fallback now pins f32 HIGHEST — one of the
findings that came out of this A/B).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvbs2rx_tpu.ops.pallas_fir import mf_decimate, mf_segmented, TILE, PAD

_INTERPRET = jax.devices()[0].platform != "tpu"


def _ref_decimate(x, taps, base, sps, n_out):
    L = taps.shape[0]
    xs = x.astype(np.float64)
    t = taps.astype(np.float64)
    return np.stack(
        [xs[base + k * sps: base + k * sps + L].T @ t for k in range(n_out)]
    ).astype(np.float32)


@pytest.mark.parametrize("base", [0, 1, 3, 16])
def test_mf_decimate_matches_numpy(base):
    rng = np.random.default_rng(base)
    n_out, sps, L = TILE, 2, 21
    n = n_out * sps + PAD + 32
    x = rng.normal(size=(n, 2)).astype(np.float32)
    taps = rng.normal(size=(L,)).astype(np.float32)
    want = _ref_decimate(x, taps, base, sps, n_out)
    got = mf_decimate(
        jnp.asarray(x), jnp.asarray(taps), jnp.int32(base), sps, n_out,
        use_pallas=True, off_bound=16, interpret=_INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_mf_segmented_matches_numpy():
    rng = np.random.default_rng(7)
    sps, L, OFF = 2, 21, 16
    C, S, seg_len = 2, 4, TILE
    n_out = S * seg_len
    x = rng.normal(size=(C, n_out * sps + 120, 2)).astype(np.float32)
    taps_seg = rng.normal(size=(C, S, L)).astype(np.float32)
    base_seg = rng.integers(0, OFF + 1, (C, S)).astype(np.int32)
    got = np.asarray(
        mf_segmented(
            jnp.asarray(x), jnp.asarray(taps_seg), jnp.asarray(base_seg),
            sps, seg_len, OFF, use_pallas=True, interpret=_INTERPRET,
        )
    )
    for c in range(C):
        for s in range(S):
            want = _ref_decimate(
                x[c, s * seg_len * sps + base_seg[c, s]:],
                taps_seg[c, s], 0, sps, seg_len,
            )
            np.testing.assert_allclose(
                got[c, s * seg_len: (s + 1) * seg_len], want,
                rtol=1e-4, atol=1e-5,
            )


def test_segmented_fallback_matches_pallas():
    """The XLA grouped-conv fallback (ffsync's production path) computes
    the same extraction as the Pallas kernel."""
    rng = np.random.default_rng(3)
    sps, L, OFF = 2, 21, 16
    C, S, seg_len = 1, 2, TILE
    n_out = S * seg_len
    x = rng.normal(size=(C, n_out * sps + 80, 2)).astype(np.float32)
    taps_seg = rng.normal(size=(C, S, L)).astype(np.float32)
    base_seg = rng.integers(0, OFF + 1, (C, S)).astype(np.int32)
    a = mf_segmented(
        jnp.asarray(x), jnp.asarray(taps_seg), jnp.asarray(base_seg),
        sps, seg_len, OFF, use_pallas=True, interpret=_INTERPRET,
    )
    b = mf_segmented(
        jnp.asarray(x), jnp.asarray(taps_seg), jnp.asarray(base_seg),
        sps, seg_len, OFF, use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
    )


def test_fallback_on_untiled_shapes():
    rng = np.random.default_rng(9)
    n_out, sps, L = 1000, 2, 21  # not a TILE multiple -> XLA path
    n = n_out * sps + 64
    x = rng.normal(size=(n, 2)).astype(np.float32)
    taps = rng.normal(size=(L,)).astype(np.float32)
    y = mf_decimate(jnp.asarray(x), jnp.asarray(taps), jnp.int32(1), sps,
                    n_out)
    want = _ref_decimate(x, taps, 1, sps, n_out)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)

"""Pallas fused MF+decimate kernel: correctness via the Pallas interpreter.

This environment's remote Mosaic compile helper cannot build the kernel's
strided-lane constructs (see PARITY.md known gaps), so the compiled path is
exercised on standard TPU runtimes only; here the interpreter validates the
kernel against the XLA fallback bit-for-bit (up to f32 accumulation order).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dvbs2rx_tpu.ops.pallas_fir import mf_decimate, TILE, PAD


@pytest.mark.parametrize("base", [0, 1, 3])
def test_pallas_matches_xla(base):
    rng = np.random.default_rng(base)
    n_out, sps, L = TILE, 2, 21
    n = n_out * sps + PAD + 32
    x = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    taps = jnp.asarray(rng.normal(size=(L,)).astype(np.float32))
    ref = mf_decimate(x, taps, jnp.int32(base), sps, n_out, use_pallas=False)
    pal = mf_decimate(x, taps, jnp.int32(base), sps, n_out,
                      use_pallas=True, interpret=True)
    assert float(jnp.max(jnp.abs(ref - pal))) < 1e-4


def test_fallback_on_untiled_shapes():
    rng = np.random.default_rng(9)
    n_out, sps, L = 1000, 2, 21  # not a TILE multiple -> XLA path
    n = n_out * sps + 64
    x = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    taps = jnp.asarray(rng.normal(size=(L,)).astype(np.float32))
    y = mf_decimate(x, taps, jnp.int32(1), sps, n_out)
    # direct check of a few outputs
    xn = np.asarray(x)
    t = np.asarray(taps)
    for k in [0, 17, 999]:
        want = (xn[1 + k * sps: 1 + k * sps + L] * t[:, None]).sum(0)
        np.testing.assert_allclose(np.asarray(y)[k], want, rtol=1e-4, atol=1e-5)

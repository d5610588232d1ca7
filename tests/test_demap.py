"""Demapper unit tests (reference ``lib/qa_qpsk.cc`` + demapper block).

Soft LLR values against the analytic formulas, SNR estimators at known
Es/N0, interleaver round trips, and the quantize-after-transpose contract
the lane-major pipeline relies on.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2rx_tpu.ops import cplx
from dvbs2rx_tpu.ops.demap import (
    demap,
    demap_qpsk,
    estimate_snr_generic,
    estimate_snr_qpsk,
    quantize_llrs,
)
from dvbs2rx_tpu.spec.constellations import map_bits
from dvbs2rx_tpu.spec.interleaver import column_order, deinterleave, interleave


def awgn(syms, esn0_db, seed=0):
    rng = np.random.default_rng(seed)
    n0 = 10 ** (-esn0_db / 10)
    noise = rng.normal(0, np.sqrt(n0 / 2), (syms.size, 2)).astype(np.float32)
    return (syms + noise @ np.array([1, 1j], np.complex64)).astype(np.complex64), n0


def test_qpsk_llr_values():
    """LLR = 2*sqrt(2)/N0 * component (reference qpsk.h:209 scaling), then
    round-clip to int8."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 600).astype(np.uint8)
    syms = map_bits(bits, "QPSK", "1/2")
    noisy, n0 = awgn(syms, 6.0)
    llrs = np.asarray(demap_qpsk(
        jnp.asarray(cplx.from_np(noisy)), jnp.float32(n0)))
    planar = cplx.from_np(noisy)
    expect = np.clip(
        np.round(planar.reshape(-1) * (2 * np.sqrt(2) / n0)), -128, 127
    ).astype(np.int8)
    assert np.array_equal(llrs, expect)
    # sign decodes the bits wherever the LLR is nonzero
    nz = llrs != 0
    assert np.mean((llrs[nz] < 0) == bits[nz]) > 0.97


@pytest.mark.parametrize("esn0_db", [6.0, 10.0, 14.0])
def test_qpsk_snr_estimator(esn0_db):
    """Data-aided estimate within 10% of the true Es/N0 (the reference's
    qa_qpsk tolerance)."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 2 * 16200).astype(np.uint8)
    syms = map_bits(bits, "QPSK", "1/2")
    noisy, _ = awgn(syms, esn0_db, seed=3)
    est = float(estimate_snr_qpsk(jnp.asarray(cplx.from_np(noisy))))
    assert est == pytest.approx(10 ** (esn0_db / 10), rel=0.1)


def test_generic_snr_estimator_8psk():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 3 * 10800).astype(np.uint8)
    syms = map_bits(bits, "8PSK", "3/5")
    noisy, _ = awgn(syms, 12.0, seed=5)
    est = float(estimate_snr_generic(
        jnp.asarray(cplx.from_np(noisy)), "8PSK", "3/5"))
    assert est == pytest.approx(10 ** 1.2, rel=0.15)


@pytest.mark.parametrize("constellation,rate", [
    ("8PSK", "3/5"), ("8PSK", "2/3"), ("8PSK", "3/4"),
    ("16APSK", "2/3"), ("32APSK", "3/4"),
])
def test_demap_decodes_clean_symbols(constellation, rate):
    """On clean symbols every codeword bit is recovered by the LLR signs
    (demap + deinterleave invert map + interleave)."""
    rng = np.random.default_rng(6)
    n_mod = {"8PSK": 3, "16APSK": 4, "32APSK": 5}[constellation]
    cw = rng.integers(0, 2, n_mod * 1200).astype(np.uint8)
    sym_bits = interleave(cw, constellation, rate)
    syms = map_bits(sym_bits, constellation, rate)
    llrs = np.asarray(demap(
        jnp.asarray(cplx.from_np(syms))[None],
        jnp.asarray([np.float32(0.05)]), constellation, rate))[0]
    assert np.array_equal((llrs < 0).astype(np.uint8), cw)


def test_interleaver_roundtrip():
    rng = np.random.default_rng(7)
    for constellation, rate in [("8PSK", "3/5"), ("8PSK", "5/6"),
                                ("16APSK", "4/5"), ("32APSK", "8/9")]:
        n_mod = {"8PSK": 3, "16APSK": 4, "32APSK": 5}[constellation]
        cw = rng.integers(0, 2, n_mod * 500).astype(np.uint8)
        assert np.array_equal(
            deinterleave(interleave(cw, constellation, rate),
                         constellation, rate), cw)


def test_quantize_after_transpose_contract():
    """demap(quantize=False).T -> quantize_llrs must equal the int8 demap
    transposed — the lane-major pipeline's bit-exactness premise."""
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, (4, 2 * 3000)).astype(np.uint8)
    syms = np.stack([map_bits(b, "QPSK", "1/2") for b in bits])
    noisy = np.stack([awgn(s, 4.0, seed=i)[0] for i, s in enumerate(syms)])
    x = jnp.asarray(cplx.from_np(noisy))
    n0 = jnp.full((4,), 0.4, jnp.float32)
    a = np.asarray(demap(x, n0, "QPSK", "1/2"))            # int8 (4, N)
    b = np.asarray(quantize_llrs(
        demap(x, n0, "QPSK", "1/2", quantize=False).transpose(1, 0)))
    assert np.array_equal(a.T, b)
    # 8PSK too (deinterleave in the f32 path)
    bits8 = rng.integers(0, 2, (2, 3 * 2400)).astype(np.uint8)
    syms8 = np.stack([map_bits(interleave(b, "8PSK", "3/5"), "8PSK", "3/5")
                      for b in bits8])
    x8 = jnp.asarray(cplx.from_np(syms8))
    n08 = jnp.full((2,), 0.2, jnp.float32)
    a8 = np.asarray(demap(x8, n08, "8PSK", "3/5"))
    b8 = np.asarray(quantize_llrs(
        demap(x8, n08, "8PSK", "3/5", quantize=False).transpose(1, 0)))
    assert np.array_equal(a8.T, b8)

"""Carrier frequency/phase estimator tests (qa_pl_freq_sync.cc analog).

Parameterized over synthetic CFO/phase like the reference's boost data test
cases: apply a rotation to ideal PLHEADER/payload symbols and validate the
coarse/fine estimates within tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dvbs2rx_tpu.ops import plsync, cplx
from dvbs2rx_tpu.spec import pl_defs, reed_muller
from dvbs2rx_tpu.spec.pi2_bpsk import map_bpsk
from dvbs2rx_tpu.spec.pls import make_pls, parse_pls


def ideal_plheader(pls):
    bits = np.concatenate(
        [pl_defs.SOF_BITS, reed_muller.codeword_bits()[pls] ^ pl_defs.PLSC_SCRAMBLER_BITS]
    )
    return map_bpsk(bits)


def rotate(x, foffset, phase0=0.0):
    n = np.arange(x.size)
    return (x * np.exp(1j * (2 * np.pi * foffset * n + phase0))).astype(np.complex64)


@pytest.mark.parametrize("foffset", [-0.2, -0.01, 1e-4, 0.05, 0.25])
def test_coarse_estimate(foffset):
    pls = make_pls(4, False, False)
    hdr = ideal_plheader(pls)
    rng = np.random.default_rng(1)
    acc = np.zeros(89, dtype=np.complex64)
    for frame in range(10):
        rx = rotate(hdr, foffset, rng.uniform(0, 2 * np.pi))
        rx += (rng.normal(0, 0.05, (90, 2)) @ [1, 1j]).astype(np.complex64)
        r = plsync.coarse_autocorr(
            jnp.asarray(cplx.from_np(rx)), jnp.asarray(pls), full=True
        )
        acc += cplx.to_np(r)
    est = float(
        plsync.coarse_foffset_from_autocorr(jnp.asarray(cplx.from_np(acc)))
    )
    assert abs(est - foffset) < max(2e-3, abs(foffset) * 0.02)


@pytest.mark.parametrize("foffset", [-3e-4, -5e-5, 1e-5, 2e-4])
def test_fine_pilot_mode(foffset):
    pls = make_pls(5, False, True)  # qpsk3/5 normal with pilots
    info = parse_pls(pls)
    hdr = ideal_plheader(pls)
    # descrambled payload: data irrelevant except pilot blocks (angle pi/4)
    payload = np.zeros(info.payload_len, dtype=np.complex64)
    for i in range(info.n_pilots):
        end = (i + 1) * pl_defs.PILOT_BLK_PERIOD
        payload[end - 36: end] = pl_defs.PILOT_SYMBOL
    # a common CFO rotates header+payload continuously
    full = rotate(np.concatenate([hdr, payload]), foffset)
    rx_hdr, rx_payload = full[:90], full[90:]
    est = float(
        plsync.fine_foffset_pilot_mode(
            jnp.asarray(cplx.from_np(rx_hdr))[None],
            jnp.asarray(cplx.from_np(rx_payload))[None],
            jnp.asarray([pls]),
            info.n_pilots,
        )[0]
    )
    assert abs(est - foffset) < 2e-6


@pytest.mark.parametrize("foffset", [-1e-5, 4e-6, 1.2e-5])
def test_fine_pilotless(foffset):
    pls = make_pls(4, False, False)
    info = parse_pls(pls)
    hdr = ideal_plheader(pls)
    seq = np.concatenate([hdr, np.zeros(info.payload_len, np.complex64), hdr])
    seq = rotate(seq, foffset)
    h0 = plsync.plheader_phase(
        jnp.asarray(cplx.from_np(seq[:90])), jnp.asarray(pls)
    )
    h1 = plsync.plheader_phase(
        jnp.asarray(cplx.from_np(seq[info.plframe_len:info.plframe_len + 90])),
        jnp.asarray(pls),
    )
    est = float(plsync.fine_foffset_pilotless(h0, h1, info.plframe_len))
    assert abs(est - foffset) < 1e-7


def test_plheader_phase():
    pls = make_pls(4, False, False)
    hdr = ideal_plheader(pls)
    for phase in [-2.0, -0.5, 0.3, 2.5]:
        rx = rotate(hdr, 0.0, phase)
        est = float(
            plsync.plheader_phase(jnp.asarray(cplx.from_np(rx)), jnp.asarray(pls))
        )
        expect = (phase + np.pi) % (2 * np.pi) - np.pi
        assert abs(est - expect) < 1e-3


def test_plsc_decode_under_rotation():
    """Soft PLSC decode survives a static phase + slight CFO."""
    for pls in [3, 23, 87]:
        hdr = ideal_plheader(pls)
        rx = rotate(hdr, 5e-5, 0.4)
        # derotate by the SOF-estimated phase like the receiver's open loop
        ph = float(plsync.sof_phase(jnp.asarray(cplx.from_np(rx))))
        rx = rx * np.exp(-1j * ph)
        dec, _ = plsync.plsc_decode_soft(jnp.asarray(cplx.from_np(rx)))
        assert int(dec) == pls

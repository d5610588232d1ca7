"""Symbol timing recovery tests: convergence on RRC-shaped QPSK.

Mirrors the reference's convergence QA (``qa_symbol_sync_cc.py:99-131``):
random QPSK through the Tx RRC with a timing offset; after loop convergence
the recovered symbols must sit on the constellation and match the transmitted
sequence.
"""

import numpy as np
import pytest

from dvbs2rx_tpu.ops.frontend import SymbolSync, rotate_block, pi_constants
from dvbs2rx_tpu.ops import cplx
from dvbs2rx_tpu.spec.rrc import root_raised_cosine


def _tx_waveform(n_syms, sps, rolloff, seed=0, frac_delay=0):
    rng = np.random.default_rng(seed)
    s = (1 - 2 * rng.integers(0, 2, (n_syms, 2))) / np.sqrt(2)
    syms = (s[:, 0] + 1j * s[:, 1]).astype(np.complex64)
    ntaps = 2 * sps * 10 + 1
    taps = root_raised_cosine(sps, sps, 1.0, rolloff, ntaps)
    up = np.zeros(n_syms * sps, dtype=np.complex64)
    up[::sps] = syms
    iq = np.convolve(up, taps).astype(np.complex64)
    if frac_delay:
        # apply a fractional delay via frequency-domain phase ramp
        n = iq.size
        f = np.fft.fftfreq(n)
        iq = np.fft.ifft(np.fft.fft(iq) * np.exp(-2j * np.pi * f * frac_delay))
        iq = iq.astype(np.complex64)
    return syms, iq


def _best_alignment_evm(out, syms):
    """Find the delay aligning out with syms; return min EVM over lags.

    The synchronizer output is delayed by the filter group delay plus the
    startup offset, so lag the reference sequence on both sides.
    """
    best = np.inf
    for lag in range(-40, 40):
        seg_out = out[max(lag, 0):]
        seg_in = syms[max(-lag, 0):]
        n = min(seg_out.size, seg_in.size)
        if n < 100:
            continue
        seg_out, seg_in = seg_out[:n], seg_in[:n]
        # allow a constant phase ambiguity
        rot = np.vdot(seg_out, seg_in)
        rot /= np.abs(rot) + 1e-12
        evm = np.sqrt(np.mean(np.abs(seg_out * rot - seg_in) ** 2))
        best = min(best, evm)
    return best


@pytest.mark.parametrize("frac_delay", [0.0, 0.3, 0.5, 0.77])
def test_convergence(frac_delay):
    sps, rolloff = 2, 0.2
    syms, iq = _tx_waveform(4000, sps, rolloff, seed=1, frac_delay=frac_delay)
    sync = SymbolSync(sps=sps, loop_bw=0.01, rolloff=rolloff)
    state = sync.init_state()
    n_out = 3500
    state, out = sync.step(state, cplx.from_np(iq), n_out)
    out = cplx.to_np(out)
    # skip the acquisition transient, compare the steady-state tail
    tail_out = out[1500:]
    tail_syms = syms[1500 - 20: ]
    evm = _best_alignment_evm(tail_out, tail_syms)
    assert evm < 0.08, f"EVM {evm:.3f} too high for frac_delay={frac_delay}"


def test_streaming_blocks_equal_one_shot():
    """Block-wise streaming with the carry state matches a single call."""
    sps, rolloff = 2, 0.2
    _, iq = _tx_waveform(2000, sps, rolloff, seed=2, frac_delay=0.4)
    sync = SymbolSync(sps=sps, rolloff=rolloff)

    state = sync.init_state()
    state, out_once = sync.step(state, cplx.from_np(iq), 1800)
    out_once = cplx.to_np(out_once)

    # streaming: feed in two chunks with a ring buffer
    state = sync.init_state()
    n1 = 900
    state1, out1 = sync.step(state, cplx.from_np(iq), n1)
    consumed = int(state1.n) + 1 - sync.history()
    # rebase: drop consumed samples, reset the absolute index
    import dataclasses
    state2 = dataclasses.replace(
        state1, n=state1.n - consumed
    )
    state2, out2 = sync.step(state2, cplx.from_np(iq[consumed:]), 900)
    out_stream = np.concatenate([cplx.to_np(out1), cplx.to_np(out2)])
    np.testing.assert_allclose(out_stream, out_once[:1800], rtol=0, atol=2e-4)


def test_rotate_block():
    iq = cplx.from_np(np.ones(100, dtype=np.complex64))
    out, ph = rotate_block(iq, 0.0, 0.01)
    np.testing.assert_allclose(np.angle(cplx.to_np(out)), 0.01 * np.arange(100),
                               atol=1e-5)
    assert np.isclose(float(ph), (0.01 * 100) % (2 * np.pi), atol=1e-6)
    # streaming continuity
    out1, ph1 = rotate_block(iq[:50], 0.0, 0.01)
    out2, ph2 = rotate_block(iq[50:], ph1, 0.01)
    np.testing.assert_allclose(
        np.concatenate([cplx.to_np(out1), cplx.to_np(out2)]), cplx.to_np(out),
        atol=1e-5,
    )


def test_pi_constants_sign():
    K1, K2 = pi_constants(2, 0.01, 1.0, 0.2)
    # decrementing counter -> negative gains
    assert K1 < 0 and K2 < 0
    assert abs(K2) < abs(K1)


def _rc_waveform(n_syms, sps, rolloff, seed=0, frac_delay=0.0):
    """Raised-cosine shaped QPSK (Tx RRC + Rx MF already applied)."""
    import numpy as np
    from dvbs2rx_tpu.spec.rrc import root_raised_cosine
    rng = np.random.default_rng(seed)
    s = (1 - 2 * rng.integers(0, 2, (n_syms, 2))) / np.sqrt(2)
    syms = (s[:, 0] + 1j * s[:, 1]).astype(np.complex64)
    ntaps = 2 * sps * 10 + 1
    tx = root_raised_cosine(sps, sps, 1.0, rolloff, ntaps)
    mf = root_raised_cosine(1.0, sps, 1.0, rolloff, ntaps)
    rc = np.convolve(tx, mf)
    up = np.zeros(n_syms * sps, dtype=np.complex64)
    up[::sps] = syms
    iq = np.convolve(up, rc).astype(np.complex64)
    if frac_delay:
        n = iq.size
        f = np.fft.fftfreq(n)
        iq = np.fft.ifft(np.fft.fft(iq) * np.exp(-2j * np.pi * f * frac_delay))
        iq = iq.astype(np.complex64)
    return syms, iq


@pytest.mark.parametrize("method", ["linear", "quadratic", "cubic"])
def test_other_interpolators_converge(method):
    """The reference's alternative interpolators (which assume an upstream
    matched filter) lock on RC-shaped QPSK."""
    sps, rolloff = 2, 0.2
    syms, iq = _rc_waveform(4000, sps, rolloff, seed=9, frac_delay=0.43)
    sync = SymbolSync(sps=sps, loop_bw=0.01, rolloff=rolloff,
                      interp_method=method)
    state = sync.init_state()
    state, out = sync.step(state, cplx.from_np(iq), 3500)
    out = cplx.to_np(out)
    evm = _best_alignment_evm(out[1500:], syms[1500 - 40:])
    # linear interpolation at 2 samples/symbol has inherent ~14% EVM on RC
    # pulses mid-sample; the Farrow interpolators do much better
    limit = 0.2 if method == "linear" else 0.1
    assert evm < limit, f"{method}: EVM {evm:.3f}"

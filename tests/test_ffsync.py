"""Feed-forward (O&M) timing recovery tests: accuracy across fractional delays."""

import numpy as np
import pytest

from dvbs2rx_tpu.ops.ffsync import FeedForwardSync
from dvbs2rx_tpu.ops import cplx
from tests.test_symbol_sync import _tx_waveform, _best_alignment_evm


@pytest.mark.parametrize("frac_delay", [0.0, 0.25, 0.5, 0.8, 1.3])
def test_ffsync_accuracy(frac_delay):
    sps, rolloff = 2, 0.2
    syms, iq = _tx_waveform(4000, sps, rolloff, seed=3, frac_delay=frac_delay)
    sync = FeedForwardSync(sps=sps, rolloff=rolloff)
    state = sync.init_state()
    n_out = 3500
    state, out, consumed = sync.step(state, cplx.from_np(iq), n_out)
    out = cplx.to_np(out)
    # whole-symbol slips are allowed (and must be multiples of sps)
    assert (int(consumed) - n_out * sps) % sps == 0
    assert abs(int(consumed) - n_out * sps) <= sps
    evm = _best_alignment_evm(out[100:], syms[100:])
    assert evm < 0.06, f"EVM {evm:.3f} for frac_delay={frac_delay}"


def test_ffsync_streaming_consistency():
    """Block-wise operation keeps the timing estimate stable across blocks."""
    sps, rolloff = 2, 0.2
    syms, iq = _tx_waveform(8000, sps, rolloff, seed=4, frac_delay=0.63)
    sync = FeedForwardSync(sps=sps, rolloff=rolloff)
    state = sync.init_state()
    outs = []
    pos = 0
    n_out = 2000
    need = n_out * sps + sync.history()
    while pos + need <= iq.size:
        state, out, consumed = sync.step(
            state, cplx.from_np(iq[pos: pos + need]), n_out
        )
        outs.append(cplx.to_np(out))
        pos += int(consumed)
    out = np.concatenate(outs)
    assert len(outs) >= 3
    evm = _best_alignment_evm(out[100:3000], syms[100:])
    assert evm < 0.06
    # tau settled
    taus = float(state.tau)
    assert 0.0 <= taus < sps


def test_ffsync_noise_robustness():
    sps, rolloff = 2, 0.2
    syms, iq = _tx_waveform(6000, sps, rolloff, seed=5, frac_delay=0.4)
    rng = np.random.default_rng(6)
    esn0 = 10 ** 0.6  # 6 dB
    sigma = np.sqrt(sps / esn0 / 2)
    noisy = iq + (rng.normal(0, sigma, (iq.size, 2)) @ [1, 1j]).astype(np.complex64)
    sync = FeedForwardSync(sps=sps, rolloff=rolloff)
    state, out, _ = sync.step(sync.init_state(), cplx.from_np(noisy), 5000)
    out = cplx.to_np(out)
    evm = _best_alignment_evm(out[100:], syms[100:])
    # noise-limited EVM at 6 dB is ~0.5; timing must not add materially
    assert evm < 0.56


def test_ffsync_large_block_stability():
    """Alpha-beta loop stability at normal-FECFRAME block size.

    Regression for the round-2 StreamReceiver collapse: with the rate
    innovation normalized by the measurement-window center instead of the
    block length, the closed loop's eigenvalue was ~3.5 at n_out=64980
    (QPSK normal, F=2) and the rate estimate railed at MAX_RATE within 2-3
    blocks, destroying the symbol grid. The loop must track a +50 ppm
    symbol-clock offset over many large blocks with a stable rate estimate
    and low EVM throughout.
    """
    sps, rolloff = 2, 0.2
    n_out = 64980                     # QPSK 1/2 normal frame_len * F=2
    n_blocks = 8
    n_syms = n_out * (n_blocks + 1) + 200
    syms, iq = _tx_waveform(n_syms, sps, rolloff, seed=11)
    # resample at t = k*(1+ppm): the waveform compresses, so the receiver
    # sees sps/(1+ppm) samples per symbol -> rate drifts -sps*ppm
    ppm = 50e-6
    t_out = np.arange(int(iq.size / (1 + ppm))) * (1 + ppm)
    base = np.arange(iq.size)
    iq = (np.interp(t_out, base, iq.real)
          + 1j * np.interp(t_out, base, iq.imag)).astype(np.complex64)
    true_rate = -sps * ppm / (1 + ppm)   # input samples per output symbol

    sync = FeedForwardSync(sps=sps, rolloff=rolloff, max_block=n_out)
    state = sync.init_state()
    need = n_out * sps + sync.history()
    pos, out_idx = 0, 0
    rates, evms = [], []
    for blk in range(n_blocks):
        state, out, consumed = sync.step(
            state, cplx.from_np(iq[pos: pos + need]), n_out
        )
        out = cplx.to_np(out)
        evm = _best_alignment_evm(out[:4000], syms[out_idx: out_idx + 4100])
        rates.append(float(state.rate))
        evms.append(evm)
        pos += int(consumed)
        out_idx += n_out
    # the rate estimate must converge toward the true clock offset and
    # NEVER rail at the clamp (railing = the round-2 divergence)
    from dvbs2rx_tpu.ops.ffsync import MAX_RATE
    assert all(abs(r) < 0.9 * MAX_RATE for r in rates), rates
    assert abs(rates[-1] - true_rate) < 4e-5, rates
    # symbol grid intact in every block: ~0.13-0.15 here is the linear-
    # interpolation resampler's own distortion floor (worst at fractional
    # delay 0.5); a broken grid reads ~1.0
    assert all(e < 0.2 for e in evms), evms

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

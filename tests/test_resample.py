"""Arbitrary-rate resampling: kernels, stream/device resamplers, and the
fractional-sps Tx->Rx loopback (reference fractional-ratio support:
``apps/dvbs2-tx:638-686`` Tx PFB arbitrary resampler, ``apps/dvbs2-rx:887-916``
in-tree symbol sync accepting any sps)."""

import numpy as np
import pytest

from dvbs2rx_tpu.ops.resample import (
    DeviceResampler,
    StreamResampler,
    lowpass_kernel,
    rrc_continuous,
    rrc_kernel,
)
from dvbs2rx_tpu.spec.rrc import root_raised_cosine


def tone(n, f, amp=1.0):
    return (amp * np.exp(2j * np.pi * f * np.arange(n))).astype(np.complex64)


def tone_snr_db(x, f):
    """SNR of x against its best-fit complex tone at frequency f."""
    ref = np.exp(2j * np.pi * f * np.arange(x.size))
    a = np.vdot(ref, x) / x.size
    err = x - a * ref
    return 10 * np.log10((np.abs(a) ** 2 * x.size) / np.sum(np.abs(err) ** 2))


def test_rrc_continuous_matches_sampled_design():
    """Closed-form RRC sampled on the sps grid equals the GR-convention
    sampled design (spec/rrc.py) up to its sum-normalization."""
    for sps, rolloff in [(2, 0.2), (4, 0.35), (2, 0.25)]:
        ntaps = 2 * sps * 25 + 1
        ref = root_raised_cosine(sps, sps, 1.0, rolloff, ntaps)
        t = (np.arange(ntaps) - ntaps // 2) / sps
        cont = rrc_continuous(t, rolloff).astype(np.float32)
        cont *= sps / cont.sum()  # the GR design normalizes to sum = gain
        np.testing.assert_allclose(cont, ref, atol=1e-6)


def test_stream_resampler_tone_fidelity():
    """A tone through an irrational-ish ratio keeps > 60 dB SNR and lands at
    the scaled frequency."""
    f_in = 0.11
    for ratio in (1.7, 0.83, 2.5):
        rs = StreamResampler(ratio, delay=10)
        x = tone(8000, f_in)
        y = np.concatenate([rs(x), rs.flush()])
        assert y.size == pytest.approx(8000 * ratio, rel=0.02)
        mid = y[200: y.size - 200]
        # output tone frequency scales by 1/ratio (cycles per output sample);
        # use the resampler's exact rational ratio for the fit
        snr = tone_snr_db(mid, f_in * rs.Q / rs.P)
        assert snr > 60, f"ratio {ratio}: {snr:.1f} dB"


def test_stream_resampler_chunked_equals_oneshot():
    rng = np.random.default_rng(3)
    x = (rng.normal(size=4096) + 1j * rng.normal(size=4096)).astype(np.complex64)
    one = StreamResampler(1.25, delay=8)
    y1 = np.concatenate([one(x), one.flush()])
    two = StreamResampler(1.25, delay=8)
    parts = [two(c) for c in np.split(x, [7, 500, 501, 2048])]
    parts.append(two.flush())
    y2 = np.concatenate(parts)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_fractional_pulse_shape_matches_integer_grid():
    """StreamResampler with the RRC kernel at an integer ratio reproduces the
    integer-sps FIR pulse shaping (modulo the filter group delay)."""
    from dvbs2rx_tpu.ops.resample import StreamResampler

    rng = np.random.default_rng(0)
    syms = (rng.choice([-1, 1], 512) + 1j * rng.choice([-1, 1], 512)).astype(
        np.complex64
    ) / np.sqrt(2)
    sps, delay, rolloff = 2, 25, 0.2
    ntaps = 2 * sps * delay + 1
    taps = root_raised_cosine(sps, sps, 1.0, rolloff, ntaps)
    up = np.zeros(syms.size * sps, np.complex64)
    up[::sps] = syms
    ref = np.convolve(up, taps)

    rs = StreamResampler(sps, kernel=rrc_kernel(rolloff, delay), delay=delay)
    out = np.concatenate([rs(syms), rs.flush()])
    # stream output k corresponds to full-conv output k + delay*sps
    n = min(out.size, ref.size - delay * sps)
    d = out[:n] - ref[delay * sps: delay * sps + n]
    rms = np.sqrt(np.mean(np.abs(ref) ** 2))
    # residual comes from the differing tail-window conventions (GR's
    # rectangular truncation + sum-normalization vs the tapered continuous
    # kernel); ~1% peak is inconsequential next to channel noise
    assert np.max(np.abs(d)) / rms < 2e-2


def test_device_resampler_matches_stream():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=9000) + 1j * rng.normal(size=9000)).astype(np.complex64)
    ratio = 0.8
    dev = DeviceResampler(ratio, block_out=512, delay=8)
    sr = StreamResampler(ratio, kernel=lowpass_kernel(ratio, 8), delay=8)
    y_dev = np.concatenate([dev(x), dev.flush()])
    y_sr = np.concatenate([sr(x), sr.flush()])
    n = min(y_dev.size, y_sr.size)
    assert n > 6000
    np.testing.assert_allclose(y_dev[:n], y_sr[:n], atol=2e-5)


def test_device_resampler_tone_downsample():
    f_in = 0.05
    dev = DeviceResampler(2.0 / 2.5, block_out=1024, delay=8)
    x = tone(20000, f_in)
    y = np.concatenate([dev(x), dev.flush()])
    mid = y[200: y.size - 200]
    snr = tone_snr_db(mid, f_in * dev.Q / dev.P)
    assert snr > 60


def test_loopback_fractional_sps():
    """Tx at 2.5 samples/symbol -> rational resampler to 2 sps -> Rx:
    bit-exact TS recovery (the fractional-rate system test)."""
    from dvbs2rx_tpu.tx import Transmitter, TxConfig, awgn_channel
    from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig
    from tests.test_e2e_loopback import check_ts_subset, make_ts

    sps_tx = 2.5
    tx = Transmitter(
        TxConfig(modcod="qpsk1/2", frame_size="short", sps=sps_tx, rolloff=0.2)
    )
    n_pkts = (8 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts)
    iq = tx.ts_to_iq(ts_in)
    iq = awgn_channel(iq, 15.0, sps=sps_tx, seed=7)

    dev = DeviceResampler(2.0 / sps_tx, block_out=8192, delay=8)
    iq2 = np.concatenate([dev(iq), dev.flush()])

    rx = Receiver(
        RxConfig(modcod="qpsk1/2", frame_size="short", sps=2, rolloff=0.2,
                 fec_batch=4)
    )
    ts_out = rx.receive(iq2)
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 2)

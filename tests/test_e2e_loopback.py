"""End-to-end loopback: Tx -> channel -> Rx, bit-exact TS recovery.

The de facto system test mirroring the reference's ``cat ts | dvbs2-tx |
dvbs2-rx`` oracle (SURVEY.md §4 tier 3). Uses short FECFRAMEs to keep CPU
compile/run time down; the normal-frame path shares all the same code.
"""

import numpy as np
import pytest

from dvbs2rx_tpu.tx import Transmitter, TxConfig, awgn_channel
from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig


def make_ts(n_packets, seed=0):
    rng = np.random.default_rng(seed)
    pkts = rng.integers(0, 256, (n_packets, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    pkts[:, 1] &= 0x7F
    return pkts.reshape(-1)


def run_loopback(modcod="qpsk1/2", frame_size="short", pilots=False,
                 esn0_db=15.0, freq_offset=0.0, n_pkts=None, seed=0,
                 rx_kwargs=None, rolloff=0.2):
    tx_cfg = TxConfig(modcod=modcod, frame_size=frame_size, pilots=pilots,
                      sps=2, rolloff=rolloff)
    tx = Transmitter(tx_cfg)
    if n_pkts is None:
        # enough packets for ~10 PLFRAMEs
        n_pkts = (10 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=seed)
    iq = tx.ts_to_iq(ts_in)
    iq = awgn_channel(iq, esn0_db, sps=2, freq_offset=freq_offset, seed=seed + 1)

    rx = Receiver(RxConfig(modcod=modcod, frame_size=frame_size, pilots=pilots,
                           sps=2, rolloff=rolloff, fec_batch=4,
                           **(rx_kwargs or {})))
    ts_out = rx.receive(iq)
    return ts_in, ts_out, rx


def check_ts_subset(ts_in, ts_out, min_packets):
    """Recovered packets must be a contiguous, in-order, bit-exact run of the
    input packets (start offset free: acquisition drops leading frames).

    Packets recovered while synchronization is still converging (e.g. during
    closed-loop CFO pull-in) carry the Transport-Error-Indicator instead of
    being dropped (reference ``bbdeheader_bb_impl.cc:231-235``); strip any
    leading TEI-marked packets before the bit-exactness check."""
    assert ts_out.size % 188 == 0
    while ts_out.size and (ts_out[1] & 0x80):
        ts_out = ts_out[188:]
    n_out = ts_out.size // 188
    assert n_out >= min_packets, f"only {n_out} packets recovered"
    in_pkts = ts_in.reshape(-1, 188)
    first = ts_out[:188]
    matches = np.where((in_pkts == first).all(axis=1))[0]
    assert matches.size >= 1, "first recovered packet not in the input"
    k = matches[0]
    expect = in_pkts[k: k + n_out].reshape(-1)
    assert np.array_equal(ts_out, expect[: ts_out.size]), "TS not bit-exact"
    return n_out


def test_loopback_qpsk_short_clean():
    ts_in, ts_out, rx = run_loopback(esn0_db=15.0)
    n = check_ts_subset(ts_in, ts_out, min_packets=30)
    assert rx.stats.locked
    assert rx.stats.frame_cnt >= 8
    assert rx.stats.bch_frame_errors == 0


def test_loopback_qpsk_noisy():
    # QPSK 1/2 operates fine at ~3-4 dB Es/N0; test comfortably above
    ts_in, ts_out, rx = run_loopback(esn0_db=5.0, seed=3)
    check_ts_subset(ts_in, ts_out, min_packets=25)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_with_pilots():
    ts_in, ts_out, rx = run_loopback(modcod="qpsk3/5", pilots=True,
                                     esn0_db=12.0, seed=5)
    check_ts_subset(ts_in, ts_out, min_packets=20)


def test_loopback_with_cfo():
    """Static carrier frequency offset exercises coarse+fine sync and the
    closed-loop rotator carry. The offset (5e-4 of the symbol rate) is beyond
    the fine estimation range, so the coarse estimator must first pull it in
    before the pilot-aided fine loop takes over."""
    tx = Transmitter(TxConfig(modcod="qpsk3/5", frame_size="short",
                              pilots=True, sps=2, rolloff=0.2))
    n_pkts = (22 * tx.df_bytes) // 188 + 2
    ts_in, ts_out, rx = run_loopback(
        modcod="qpsk3/5", pilots=True, esn0_db=12.0,
        freq_offset=2.5e-4, seed=7, n_pkts=n_pkts,
        rx_kwargs=dict(coarse_period=6),
    )
    check_ts_subset(ts_in, ts_out, min_packets=10)
    assert rx.stats.coarse_corrected
    assert abs(rx.stats.cum_freq_offset - 5e-4) < 1e-4


def test_loopback_streaming_chunks():
    """Feeding the receiver in chunks gives the same TS as one shot."""
    tx_cfg = TxConfig(modcod="qpsk1/2", frame_size="short", sps=2, rolloff=0.2)
    tx = Transmitter(tx_cfg)
    ts_in = make_ts((8 * tx.df_bytes) // 188 + 2, seed=11)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 15.0, sps=2, seed=12)

    rx1 = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4))
    once = rx1.receive(iq)

    rx2 = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4))
    outs = []
    for i in range(0, iq.size, 50000):
        outs.append(rx2.receive(iq[i: i + 50000], flush=False))
    outs.append(rx2.receive(np.empty(0, np.complex64), flush=True))
    streamed = np.concatenate(outs)
    assert np.array_equal(once, streamed)


def test_loopback_8psk():
    """8PSK 3/5 short exercises the rotated-axes demapper and the per-rate
    column-twist deinterleaver (the reference's second supported
    constellation)."""
    ts_in, ts_out, rx = run_loopback(modcod="8psk3/5", esn0_db=14.0, seed=21)
    check_ts_subset(ts_in, ts_out, min_packets=20)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_16apsk():
    """16APSK 2/3 short: max-log demapper + 4-column deinterleaver (beyond
    the reference receiver, which rejects APSK constellations)."""
    ts_in, ts_out, rx = run_loopback(modcod="16apsk2/3", esn0_db=16.0, seed=22)
    check_ts_subset(ts_in, ts_out, min_packets=15)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_32apsk():
    """32APSK 3/4 short: 5-bit max-log demapper (beyond the reference Rx)."""
    ts_in, ts_out, rx = run_loopback(modcod="32apsk3/4", esn0_db=19.0, seed=23)
    check_ts_subset(ts_in, ts_out, min_packets=12)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_s2x_rolloff_010():
    """DVB-S2X low rolloff 0.10 (EN 302 307-2; reference defs.py carries
    0.15/0.10/0.05): the narrower excess band stresses the RRC matched
    filter and the O&M timing tone (whose amplitude scales with the
    rolloff), so the loopback must still deliver bit-exact TS."""
    ts_in, ts_out, rx = run_loopback(esn0_db=15.0, seed=24, rolloff=0.10)
    check_ts_subset(ts_in, ts_out, min_packets=25)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_u8_format():
    """u8 (RTL-SDR style) IQ round trip through the io conversion path."""
    from dvbs2rx_tpu.io.iq import fc32_to_u8, u8_to_fc32

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              sps=2, rolloff=0.2))
    ts_in = make_ts((8 * tx.df_bytes) // 188 + 2, seed=31)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 13.0, sps=2, seed=32)
    # quantize to u8 like an RTL-SDR capture (scale down to avoid clipping)
    iq_u8 = fc32_to_u8(iq * 0.25)
    iq_rt = u8_to_fc32(iq_u8)
    # instant AGC: the 0.25-amplitude u8 capture would otherwise take ~30
    # front-end blocks to normalize at the reference default rate of 1e-5
    # (an SDR user sets --agc-gain for that); this test targets the u8 IO
    # conversion path, not AGC pull-in dynamics
    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4,
                           agc_rate=1.0))
    ts_out = rx.receive(iq_rt)
    check_ts_subset(ts_in, ts_out, min_packets=20)


def test_loopback_bb_stream_output():
    """--out-stream bb taps descrambled BBFRAMEs (reference dvbs2-rx
    feature); they must equal the Tx BBFRAMEs pre-scrambling."""
    from dvbs2rx_tpu.spec.scramblers import bb_derandomizer_bytes

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    ts_in = make_ts((6 * tx.df_bytes) // 188 + 2, seed=41)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 14.0, sps=2, seed=42)
    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short",
                           fec_batch=4, out_stream="bb"))
    bb = rx.receive(iq)
    kb = tx.kbch_bytes
    assert bb.size % kb == 0 and bb.size > 0
    tx_ref = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    ref = tx_ref.bbframes(ts_in) ^ bb_derandomizer_bytes(kb)
    got = bb.reshape(-1, kb)
    # find the alignment (acquisition may drop leading frames)
    first = got[0]
    k = np.where((ref == first).all(axis=1))[0]
    assert k.size == 1
    n = min(got.shape[0], ref.shape[0] - k[0])
    assert np.array_equal(got[:n], ref[k[0]: k[0] + n])


def test_loopback_gold_code():
    """Non-default PL scrambling Gold code round-trips (and a mismatched
    receiver code fails to lock onto the payload cleanly)."""
    ts_in, ts_out, rx = run_loopback(esn0_db=14.0, seed=51, n_pkts=60,
                                     rx_kwargs=dict(gold_code=131070))
    # mismatched gold code: expect FEC failures
    assert rx.stats.bch_frame_errors > 0 or ts_out.size == 0


def test_loopback_gold_code_matched():
    tx_cfg = TxConfig(modcod="qpsk1/2", frame_size="short", gold_code=17)
    tx = Transmitter(tx_cfg)
    ts_in = make_ts((6 * tx.df_bytes) // 188 + 2, seed=52)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 14.0, sps=2, seed=53)
    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short",
                           gold_code=17, fec_batch=4))
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=20)


def test_loopback_dropout_relock():
    """Failure recovery (SURVEY.md §5): a mid-stream signal dropout must
    trigger the unlock counter (3 consecutive weak timing metrics), and the
    receiver must re-acquire on the second burst and keep decoding
    (reference ``pl_frame_sync.cc:201-216`` unlock/re-search semantics)."""
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              sps=2, rolloff=0.2))
    n_pkts = (8 * tx.df_bytes) // 188 + 2
    ts_a = make_ts(n_pkts, seed=71)
    ts_b = make_ts(n_pkts, seed=72)
    iq_a = awgn_channel(tx.ts_to_iq(ts_a), 12.0, sps=2, seed=73)
    tx2 = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                               sps=2, rolloff=0.2))
    iq_b = awgn_channel(tx2.ts_to_iq(ts_b), 12.0, sps=2, seed=74)
    # dropout: noise only, long enough for several missed frame periods
    rng = np.random.default_rng(75)
    gap_len = 10 * tx.cfg.pls_info.plframe_len * 2
    gap = (0.2 * (rng.normal(size=gap_len) + 1j * rng.normal(size=gap_len))
           / np.sqrt(2)).astype(np.complex64)
    iq = np.concatenate([iq_a, gap, iq_b])

    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4))
    ts_out = rx.receive(iq)
    assert rx.stats.unlock_cnt >= 1, "dropout did not trigger unlock"
    assert rx.stats.lock_cnt >= 2, "no re-acquisition after the dropout"
    # packets from the second burst must be recovered bit-exact
    out_pkts = ts_out.reshape(-1, 188)
    in_b = ts_b.reshape(-1, 188)
    hits_b = sum((in_b == p).all(axis=1).any() for p in out_pkts)
    assert hits_b >= 10, f"only {hits_b} packets from the post-gap burst"


def test_loopback_large_cfo():
    """Large carrier offset (5% of the symbol rate, ~250x the fine range):
    acquisition must succeed on the differential (CFO-tolerant) timing
    metric alone, then the coarse estimator pulls the offset in over a few
    periods before the pilot-aided fine loop converges. Mirrors the
    reference's coarse->fine handoff (``plsync_cc_impl.cc:605-637``)."""
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True, sps=2, rolloff=0.2))
    n_pkts = (40 * tx.df_bytes) // 188 + 2
    ts_in, ts_out, rx = run_loopback(
        modcod="qpsk1/2", pilots=True, esn0_db=10.0,
        freq_offset=0.025, seed=91, n_pkts=n_pkts,
        rx_kwargs=dict(coarse_period=8),
    )
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 2)
    assert rx.stats.coarse_corrected
    # cumulative rotator correction = CFO in symbol-rate units (sps=2)
    assert abs(rx.stats.cum_freq_offset - 0.05) < 5e-4


def test_loopback_clock_offset():
    """Symbol-clock offset (±50 ppm, a TCXO-grade bound): the timing
    position drifts through many wraps over the capture; the feed-forward
    sync must track it via fractional-tau unwrap + whole-symbol slips
    without losing frame lock."""
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              sps=2, rolloff=0.2))
    n_pkts = (30 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=81)
    iq = tx.ts_to_iq(ts_in)
    # resample by 1 + 50e-6 (receiver sample clock slow by 50 ppm)
    ppm = 50e-6
    t_out = np.arange(int(iq.size / (1 + ppm))) * (1 + ppm)
    base = np.arange(iq.size)
    iq_r = (np.interp(t_out, base, iq.real)
            + 1j * np.interp(t_out, base, iq.imag)).astype(np.complex64)
    iq_r = awgn_channel(iq_r, 15.0, sps=2, seed=82)

    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4))
    ts_out = rx.receive(iq_r)
    n = check_ts_subset(ts_in, ts_out, min_packets=3 * n_pkts // 4)
    assert rx.stats.unlock_cnt == 0, "clock drift broke frame lock"


def test_loopback_min_operating_snr():
    """The reference's documented sensitivity bound: QPSK 1/4 with pilots
    operates down to 2 dB Es/N0, where PL synchronization (not FEC) is the
    bottleneck (``docs/support.md:31-49``). The receiver must acquire frame
    lock, hold it, and deliver error-free TS at exactly that operating
    point."""
    tx = Transmitter(TxConfig(modcod="qpsk1/4", frame_size="short",
                              pilots=True, sps=2, rolloff=0.2))
    n_pkts = (16 * tx.df_bytes) // 188 + 2
    ts_in, ts_out, rx = run_loopback(
        modcod="qpsk1/4", pilots=True, esn0_db=2.0, seed=41, n_pkts=n_pkts,
    )
    check_ts_subset(ts_in, ts_out, min_packets=10)
    assert rx.stats.locked
    assert rx.stats.unlock_cnt == 0, "lost frame lock at the operating point"
    assert rx.stats.bch_frame_errors == 0


@pytest.mark.slow
def test_loopback_normal_frame():
    """Normal FECFRAME (the headline benchmark config). Slow on CPU: the
    rate-1/2 normal LDPC graph takes minutes to compile."""
    ts_in, ts_out, rx = run_loopback(modcod="qpsk1/2", frame_size="normal",
                                     esn0_db=8.0, seed=61, n_pkts=900)
    check_ts_subset(ts_in, ts_out, min_packets=200)
    assert rx.stats.bch_frame_errors == 0


def test_loopback_combined_impairments():
    """CFO, symbol-clock offset, and noise together — the realistic SDR
    condition (the reference's field configuration faces all three at
    once). Carrier at 1% of the symbol rate, clock slow by 30 ppm,
    Es/N0 8 dB, pilots on."""
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True, sps=2, rolloff=0.2))
    n_pkts = (36 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=71)
    iq = tx.ts_to_iq(ts_in)
    ppm = 30e-6
    t_out = np.arange(int(iq.size / (1 + ppm))) * (1 + ppm)
    base = np.arange(iq.size)
    iq_r = (np.interp(t_out, base, iq.real)
            + 1j * np.interp(t_out, base, iq.imag)).astype(np.complex64)
    iq_r = awgn_channel(iq_r, 8.0, sps=2, freq_offset=0.005, seed=72)

    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", pilots=True,
                           fec_batch=4, coarse_period=8))
    ts_out = rx.receive(iq_r)
    # acquisition + coarse convergence drop the leading frames; the steady
    # state after the coarse handoff must be bit-exact
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 3)
    assert rx.stats.coarse_corrected
    assert rx.stats.unlock_cnt == 0
    # recovered cumulative correction ~= CFO in symbol-rate units (sps=2)
    assert abs(rx.stats.cum_freq_offset - 0.01) < 1e-3

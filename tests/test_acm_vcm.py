"""ACM/VCM receiver tests: PLSC-driven multi-MODCOD demodulation."""

import numpy as np
import pytest

from dvbs2rx_tpu.tx import TxConfig
from dvbs2rx_tpu.tx.transmitter import awgn_channel
from dvbs2rx_tpu.tx.vcm import VCMTransmitter
from dvbs2rx_tpu.rx.receiver import RxConfig, make_receiver, ACMReceiver
from dvbs2rx_tpu.spec.pls import make_pls

from tests.test_e2e_loopback import make_ts, check_ts_subset


CFG_A = dict(modcod="qpsk1/2", frame_size="short")
CFG_B = dict(modcod="qpsk3/5", frame_size="short")
CFG_C = dict(modcod="8psk2/3", frame_size="short")


def _vcm_waveform(schedule, n_pkts=160, esn0_db=15.0, seed=0, freq_offset=0.0):
    vtx = VCMTransmitter([TxConfig(**CFG_A), TxConfig(**CFG_B), TxConfig(**CFG_C)])
    ts_in = make_ts(n_pkts, seed=seed)
    iq = vtx.ts_to_iq(ts_in, schedule)
    iq = awgn_channel(iq, esn0_db, sps=2, seed=seed + 1,
                      freq_offset=freq_offset)
    return ts_in, iq


def _acm_rx(pls_list=None, **kw):
    cfg = RxConfig(
        modcod="qpsk1/2", frame_size="short",  # nominal; PLSC overrides
        acm_vcm=True,
        pls_list=tuple(pls_list) if pls_list else (),
        fec_batch=4,
        **kw,
    )
    rx = make_receiver(cfg)
    assert isinstance(rx, ACMReceiver)
    return rx


def test_vcm_two_modcods():
    """Alternating QPSK 1/2 and QPSK 3/5 short frames, one TS stream."""
    ts_in, iq = _vcm_waveform(schedule=[0, 1])
    rx = _acm_rx()
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=40)
    assert rx.stats.frame_cnt >= 8
    assert rx.stats.bch_frame_errors == 0
    # both MODCODs were exercised
    assert len(rx._pls_resources) >= 2


def test_vcm_with_dummy_frames():
    """Dummy PLFRAMEs (PLS 0) are skipped and counted."""
    ts_in, iq = _vcm_waveform(schedule=[0, -1, 1], seed=3)
    rx = _acm_rx()
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=30)
    assert rx.stats.dummy_cnt >= 2


def test_pls_filter_rejects():
    """Frames with a PLS outside the filter are rejected and counted
    (reference ``plsync_cc_impl.cc:904-909``)."""
    ts_in, iq = _vcm_waveform(schedule=[0, 1], seed=5)
    pls_a = make_pls(4, True, False)  # qpsk1/2 short
    rx = _acm_rx(pls_list=[pls_a])
    ts_out = rx.receive(iq)
    assert rx.stats.rejected_cnt >= 3
    # the accepted frames still decode cleanly (TS has gaps at rejections,
    # so only verify packets are valid input packets)
    if ts_out.size:
        in_pkts = set(
            make_ts(160, seed=5).reshape(-1, 188).tobytes()[i * 188:(i + 1) * 188]
            for i in range(160)
        )
        for i in range(ts_out.size // 188):
            assert ts_out[i * 188:(i + 1) * 188].tobytes() in in_pkts


def test_vcm_mixed_constellations():
    """QPSK and 8PSK frames interleaved in one stream: the ACM receiver
    switches demappers per decoded PLS."""
    ts_in, iq = _vcm_waveform(schedule=[0, 2, 1], n_pkts=200, esn0_db=16.0,
                              seed=9)
    rx = _acm_rx()
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=40)
    assert rx.stats.bch_frame_errors == 0
    consts = {r["constellation"] for r in rx._pls_resources.values()}
    assert {"QPSK", "8PSK"} <= consts


def test_reserved_modcod_rejected():
    """Reserved modcods (29-31, reference ``pls_info_t::parse`` n_mod=0)
    must be excluded from the default PLS filter: a noisy PLSC decode
    landing there counts as a rejected frame instead of crashing the
    per-PLS resource lookup."""
    rx = _acm_rx()
    for modcod in (29, 30, 31):
        for tail in range(4):
            assert not rx._pls_enabled[(modcod << 2) | tail]
    assert rx._pls_enabled[(4 << 2)]      # QPSK 1/2 stays enabled
    assert not rx._pls_enabled[0]         # dummy frame


def test_pilots_auto_dual_pls():
    """--pilots auto semantics: the receiver accepts the two PLS values of
    one MODCOD (pilots on/off) and detects the transmitted variant via the
    PLSC (reference pls_filter with two entries, apps/dvbs2-rx:764-830)."""
    from dvbs2rx_tpu.tx import Transmitter

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True))
    ts_in = make_ts(100, seed=21)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 13.0, sps=2, seed=22)
    dual = tuple(make_pls(4, True, p) for p in (False, True))
    rx = _acm_rx(pls_list=dual)
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=40)
    assert rx.stats.bch_frame_errors == 0
    assert rx.stats.rejected_cnt == 0
    # the pilots-on PLS was the one detected and processed
    assert list(rx._pls_resources) == [make_pls(4, True, True)]


def test_acm_cfo_small():
    """ACM under a small CFO (2.5e-4 of the sample rate = 5e-4 of the
    symbol rate): the SOF-phase-corrected coherent-soft PLSC decode works
    from the first header; coarse (SOF-only) accumulation pulls the
    residual into the fine range and the stream decodes bit-exact
    (VERDICT item 2 done-criterion)."""
    ts_in, iq = _vcm_waveform(schedule=[0, 1], n_pkts=200, esn0_db=13.0,
                              seed=31, freq_offset=2.5e-4)
    rx = _acm_rx(coarse_period=6)
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=30)
    assert rx.stats.frame_cnt >= 8
    # cumulative correction converges to the symbol-rate-normalized CFO
    assert abs(rx.stats.cum_freq_offset - 5e-4) < 1.5e-4


def test_acm_cfo_large():
    """ACM under a large CFO (1% of the sample rate = 2% of the symbol
    rate, ~60x the fine range): the coherent-soft PLSC decode is garbage
    until the SOF-only coarse accumulation (headers detected via the
    CFO-invariant differential timing metric) pulls the rotator in; after
    the coarse->fine handoff the stream decodes bit-exact."""
    from dvbs2rx_tpu.tx import Transmitter

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True))
    n_pkts = (48 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=35)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 13.0, sps=2, freq_offset=0.01,
                      seed=36)
    # the SOF-only estimator averages 26 symbols/frame; 10 frames per
    # estimate keeps its residual within the fine range at this SNR (the
    # reference default period is 30 for the same reason)
    rx = _acm_rx(coarse_period=10)
    ts_out = rx.receive(iq)
    # frames before the coarse->fine handoff fail FEC by design (like the
    # reference); the steady state after it must be bit-exact
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 5)
    assert rx.stats.coarse_corrected
    assert abs(rx.stats.cum_freq_offset - 0.02) < 5e-4


def test_acm_open_loop_derotation():
    """Open-loop mode (closed_loop=False, no rotator corrections at all):
    every PLHEADER is explicitly derotated by the latest coarse/fine
    estimate before PLSC decoding (reference pl_freq_sync.cc:351-437
    open-loop branch) and the payload phase ramp is handled feed-forward."""
    from dvbs2rx_tpu.tx import Transmitter

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True))
    n_pkts = (16 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=45)
    # symbol-rate CFO 2e-4: inside the fine estimation range, so the
    # open-loop receiver can reach coarse-corrected without any correction
    iq = awgn_channel(tx.ts_to_iq(ts_in), 12.0, sps=2, freq_offset=1e-4,
                      seed=46)
    rx = _acm_rx(coarse_period=4, closed_loop=False, pilots=True)
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 3)
    assert rx.stats.coarse_corrected
    assert rx.stats.cum_freq_offset == 0.0      # nothing was corrected
    assert rx._fine_ready                       # fine drove the derotation


def test_pilots_auto_dual_pls_cfo():
    """--pilots auto (dual-PLS filter) under CFO: the PLSC detects the
    pilots-on variant while the coarse loop pulls the offset in."""
    from dvbs2rx_tpu.tx import Transmitter

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short",
                              pilots=True))
    n_pkts = (36 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts, seed=51)
    iq = awgn_channel(tx.ts_to_iq(ts_in), 16.0, sps=2, freq_offset=2.5e-4,
                      seed=52)
    dual = tuple(make_pls(4, True, p) for p in (False, True))
    rx = _acm_rx(pls_list=dual, coarse_period=10)
    ts_out = rx.receive(iq)
    # early frames may fail FEC until the fine loop engages
    check_ts_subset(ts_in, ts_out, min_packets=n_pkts // 3)
    assert rx.stats.rejected_cnt == 0
    assert list(rx._pls_resources) == [make_pls(4, True, True)]
    assert abs(rx.stats.cum_freq_offset - 5e-4) < 1.5e-4


def test_acm_snr_refinement():
    """The ACM path refines N0 from decoded codewords per PLS (reference
    xfecframe_demapper_cb_impl.cc:188-318) and reports the refined SNR;
    subsequent demapping of that PLS uses the refined estimate."""
    ts_in, iq = _vcm_waveform(schedule=[2], n_pkts=160, esn0_db=16.0,
                              seed=61)
    rx = _acm_rx()
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=30)
    pls_8psk = make_pls(13, True, False)  # 8psk2/3 short
    res = rx._pls_resources[pls_8psk]
    assert res["n0_refined"] > 0, "refined N0 not fed back"
    # the refined estimate must land near the true Es/N0 (8PSK soft-demap
    # data-aided estimates are biased low at this SNR; the refinement
    # recovers the true value within ~1 dB)
    assert abs(rx.stats.snr_db - 16.0) < 1.0


def test_acm_per_pls_stats():
    """ACM get_stats() reports coherent per-PLS sections (VERDICT r3 weak
    #5: a variable-MODCOD monitor needs SNR/frame counters per MODCOD, the
    ACM analog of the reference's per-demapper SNR)."""
    ts_in, iq = _vcm_waveform(schedule=[0, 2], n_pkts=200, esn0_db=16.0,
                              seed=71)
    rx = _acm_rx()
    rx.receive(iq)
    st = rx.get_stats(sym_rate=1e6)
    pls_a = make_pls(4, True, False)    # qpsk1/2 short
    pls_c = make_pls(13, True, False)   # 8psk2/3 short
    for pls, name in ((pls_a, "qpsk1/2"), (pls_c, "8psk2/3")):
        p = st["plsync"]["per_pls"][pls]
        f = st["fec"]["per_pls"][pls]
        assert p["modcod"] == name and p["frames"] >= 3
        assert f["frames"] >= 3 and f["errors"] == 0
        assert f["avg_ldpc_trials"] is not None
        assert f["snr"] is not None and abs(f["snr"] - 16.0) < 1.5


def test_batched_acm_matches_single():
    """BatchedACMReceiver: C lockstep channels with different data/schedules
    decode bit-identically to C individual ACMReceivers (the batcher only
    changes dispatch grouping, never math). VERDICT r2 item 7: the windowed
    ACM pipeline gains a channel axis."""
    from dvbs2rx_tpu.rx.acm_batch import BatchedACMReceiver
    from dvbs2rx_tpu.rx.receiver import RxConfig

    C = 3
    streams = [
        _vcm_waveform(schedule=[0, 1], n_pkts=120, seed=10 + c)
        for c in range(C)
    ]
    n = min(iq.size for _, iq in streams)
    iq = np.stack([iq[:n] for _, iq in streams])

    def mk_cfg():
        return RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                        fec_batch=4)

    # singles
    singles = []
    for c in range(C):
        rx = ACMReceiver(mk_cfg())
        singles.append(rx.receive(iq[c]))
    # batched (two receive calls to exercise streaming carry)
    brx = BatchedACMReceiver(mk_cfg(), n_channels=C)
    cut = n // 2
    out1 = brx.receive(iq[:, :cut], flush=False)
    out2 = brx.receive(iq[:, cut:], flush=True)
    for c in range(C):
        got = np.concatenate([out1[c], out2[c]])
        np.testing.assert_array_equal(got, singles[c],
                                      err_msg=f"channel {c} diverged")
        check_ts_subset(streams[c][0], got, min_packets=30)


def test_weak_header_fallback_decode():
    """A PLHEADER whose timing-metric peak falls below the locked threshold
    must still be PLSC-decoded by the single-header fallback in the chain
    walk (the reference decodes every expected PLHEADER regardless of the
    metric, plsync_cc_impl.cc:494). Regression: the fallback referenced an
    unbound jit and crashed on first use."""
    ts_in, iq = _vcm_waveform(schedule=[0], n_pkts=120, seed=31)
    # attenuate the 4th PLHEADER (after lock): the timing metric scales
    # ~|a|^2 so x0.5 puts the peak at ~a quarter of threshold. iq is at
    # sps=2 SAMPLES; cover the 90-symbol header plus pulse-shaping delay
    # slack (a few payload symbols also attenuate — harmless at 15 dB)
    L = 8190                   # qpsk1/2 short PLFRAME (8100 payload + 90)
    start = 2 * 3 * L          # frame-3 header (+pulse delay, inside window)
    iq = iq.copy()
    iq[start: start + 2 * 135] *= 0.5
    rx = _acm_rx()
    ts_out = rx.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=40)
    assert rx.stats.bch_frame_errors == 0
    assert rx.stats.locked

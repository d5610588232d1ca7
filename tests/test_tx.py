"""Transmitter chain tests: BB framing loopback, FEC validity, PL geometry."""

import numpy as np
import pytest

from dvbs2rx_tpu.spec import pl_defs
from dvbs2rx_tpu.spec.bb_frame import BBFrameParser
from dvbs2rx_tpu.spec.scramblers import bb_derandomizer_bytes
from dvbs2rx_tpu.spec.interleaver import interleave, deinterleave
from dvbs2rx_tpu.spec.constellations import (
    map_bits,
    hard_decide,
    demap_soft,
    constellation_points,
    BITS_PER_SYMBOL,
)
from dvbs2rx_tpu.tx import Transmitter, TxConfig


def make_ts(n_packets, seed=0):
    rng = np.random.default_rng(seed)
    pkts = rng.integers(0, 256, (n_packets, 188), dtype=np.uint8)
    pkts[:, 0] = pl_defs.TS_SYNC_BYTE
    pkts[:, 1] &= 0x7F  # keep TEI clear so loopback comparison is exact
    return pkts.reshape(-1)


@pytest.mark.parametrize("frame_size", ["normal", "short"])
def test_bb_framing_loopback(frame_size):
    cfg = TxConfig(modcod="qpsk1/2", frame_size=frame_size)
    tx = Transmitter(cfg)
    n_pkts = (4 * tx.df_bytes) // 188 + 2
    ts_in = make_ts(n_pkts)
    frames = tx.bbframes(ts_in)
    assert frames.shape[0] >= 4
    assert frames.shape[1] == tx.kbch_bytes

    parser = BBFrameParser(cfg.fec.kbch)
    scr = bb_derandomizer_bytes(tx.kbch_bytes)
    out = []
    for f in frames:
        out.append(parser.push(f ^ scr))
    ts_out = np.concatenate(out)
    assert parser.stats.bbframe_drop_cnt == 0
    assert parser.stats.error_cnt == 0
    # All fully-contained packets recovered in order, bit exact
    n_out = ts_out.size // 188
    assert n_out > 0
    assert np.array_equal(ts_out, ts_in[: n_out * 188])


def test_bb_framing_resync_after_drop():
    cfg = TxConfig(modcod="qpsk1/2", frame_size="short")
    tx = Transmitter(cfg)
    ts_in = make_ts((8 * tx.df_bytes) // 188 + 2, seed=1)
    frames = tx.bbframes(ts_in)
    parser = BBFrameParser(cfg.fec.kbch)
    scr = bb_derandomizer_bytes(tx.kbch_bytes)
    out = []
    for i, f in enumerate(frames):
        if i == 2:
            continue  # simulate a lost BBFRAME
        out.append(parser.push(f ^ scr))
    assert parser.stats.bbframe_gap_cnt >= 1
    ts_out = np.concatenate(out)
    # every recovered packet is a real input packet (no corruption)
    pkts_in = set(ts_in.reshape(-1, 188).tobytes()[i * 188:(i + 1) * 188]
                  for i in range(ts_in.size // 188))
    for i in range(ts_out.size // 188):
        pkt = ts_out[i * 188:(i + 1) * 188]
        assert pkt.tobytes() in pkts_in


def test_corrupted_bbheader_dropped():
    cfg = TxConfig(modcod="qpsk1/2", frame_size="short")
    tx = Transmitter(cfg)
    frames = tx.bbframes(make_ts(60, seed=2))
    parser = BBFrameParser(cfg.fec.kbch)
    scr = bb_derandomizer_bytes(tx.kbch_bytes)
    bad = (frames[0] ^ scr).copy()
    bad[0] ^= 0xFF  # breaks the header CRC
    assert parser.push(bad).size == 0
    assert parser.stats.bbframe_drop_cnt == 1


def test_fecframe_valid_ldpc():
    cfg = TxConfig(modcod="qpsk1/2", frame_size="short")
    tx = Transmitter(cfg)
    frames = tx.bbframes(make_ts(60, seed=3))
    cw = tx.fecframe_bits(frames[0])
    assert cw.size == cfg.fec.nldpc
    assert tx.ldpc.check(cw)


@pytest.mark.parametrize("constellation,rate", [
    ("QPSK", "1/2"), ("8PSK", "3/5"), ("8PSK", "2/3"),
    ("16APSK", "2/3"), ("32APSK", "3/4"),
])
def test_constellation_roundtrip(constellation, rate):
    pts = constellation_points(constellation, rate)
    n_mod = BITS_PER_SYMBOL[constellation]
    assert pts.size == 2 ** n_mod
    # unit average energy and unique points
    assert np.isclose(np.mean(np.abs(pts) ** 2), 1.0, atol=1e-5)
    assert len(np.unique(np.round(pts, 5))) == pts.size
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 1200 * n_mod).astype(np.uint8)
    syms = map_bits(bits, constellation, rate)
    assert np.array_equal(hard_decide(syms, constellation, rate), bits)
    # soft demap signs agree with bits in the noiseless case. Use an N0 low
    # enough that the smallest distance gap quantizes to a nonzero int8 LLR
    # (the 32APSK outer ring spacing is ~0.46 -> d^2/N0 must round >= 1).
    llrs = demap_soft(syms, constellation, 0.05, rate)
    assert np.all((llrs < 0) == (bits == 1))


@pytest.mark.parametrize("constellation,rate", [
    ("8PSK", "3/5"), ("8PSK", "2/3"), ("8PSK", "25/36"),
    ("16APSK", "2/3"), ("32APSK", "3/4"),
])
def test_interleaver_roundtrip(constellation, rate):
    n_mod = BITS_PER_SYMBOL[constellation]
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 360 * n_mod).astype(np.uint8)
    il = interleave(bits, constellation, rate)
    assert il.shape == bits.shape
    assert not np.array_equal(il, bits)  # actually permutes
    assert np.array_equal(deinterleave(il, constellation, rate), bits)


def test_plframe_geometry():
    for pilots in (False, True):
        cfg = TxConfig(modcod="qpsk3/5", frame_size="short", pilots=pilots)
        tx = Transmitter(cfg)
        info = cfg.pls_info
        xfec = np.ones(info.xfecframe_len, dtype=np.complex64)
        pl = tx.plframe(xfec)
        assert pl.size == info.plframe_len
        # header is pi/2-BPSK on the unit circle
        np.testing.assert_allclose(np.abs(pl[:90]), 1.0, atol=1e-5)


def test_full_tx_waveform():
    cfg = TxConfig(modcod="qpsk1/2", frame_size="short", sps=2)
    tx = Transmitter(cfg)
    ts = make_ts(60, seed=6)
    syms = tx.modulate_ts(ts)
    info = cfg.pls_info
    assert syms.size % info.plframe_len == 0
    n_frames = syms.size // info.plframe_len
    assert n_frames >= 4
    iq = tx.pulse_shape(syms)
    assert iq.size == syms.size * 2 + 2 * cfg.sps * cfg.rrc_delay
    # matched filter + decimate at the right phase recovers symbols (ISI-free
    # to RRC precision). Build the Rx RRC and convolve.
    from dvbs2rx_tpu.spec.rrc import root_raised_cosine
    ntaps = 2 * cfg.sps * cfg.rrc_delay + 1
    mf = root_raised_cosine(1.0, cfg.sps, 1.0, cfg.rolloff, ntaps)
    rx = np.convolve(iq, mf)
    delay = ntaps - 1
    rec = rx[delay: delay + cfg.sps * syms.size: cfg.sps]
    err = np.abs(rec - syms)
    assert np.percentile(err, 99) < 0.05


def test_streaming_pulse_shape_equals_one_shot():
    """Chunked modulate + pulse_shape_stream + flush == one-shot ts_to_iq,
    including the streaming channel (CFO + AWGN) equivalence."""
    from dvbs2rx_tpu.tx.transmitter import StreamingChannel, awgn_channel

    ts = make_ts(120, seed=21)
    cfg = dict(modcod="qpsk1/2", frame_size="short", rrc_delay=25)

    tx1 = Transmitter(TxConfig(**cfg))
    iq_once = tx1.ts_to_iq(ts)

    tx2 = Transmitter(TxConfig(**cfg))
    chunks = []
    for i in range(0, ts.size, 17 * 188):
        chunk = ts[i: i + 17 * 188]
        chunks.append(tx2.pulse_shape_stream(tx2.modulate_ts(chunk)))
    chunks.append(tx2.pulse_shape_flush())
    iq_stream = np.concatenate(chunks)

    assert iq_stream.size == iq_once.size
    np.testing.assert_allclose(iq_stream, iq_once, atol=2e-6)

    # streaming channel == one-shot channel
    ch = StreamingChannel(esn0_db=8.0, sps=2, freq_offset=1e-4, seed=3)
    imp_stream = np.concatenate(
        [ch(iq_once[:1000]), ch(iq_once[1000:5000]), ch(iq_once[5000:])]
    )
    imp_once = awgn_channel(iq_once, 8.0, sps=2, freq_offset=1e-4, seed=3)
    np.testing.assert_allclose(imp_stream, imp_once, atol=1e-5)

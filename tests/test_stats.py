"""Nested get_stats shape parity (reference ``apps/dvbs2-rx:996-1057``)."""

import numpy as np

from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig
from dvbs2rx_tpu.tx import Transmitter, TxConfig


def test_get_stats_shape():
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    rng = np.random.default_rng(2)
    pkts = rng.integers(0, 256, (40, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    iq = tx.ts_to_iq(pkts.reshape(-1))
    rx = Receiver(RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=4))

    d0 = rx.get_stats()
    assert d0["lock"] is False and d0["snr"] is None
    assert d0["plsync"]["locked_since"] is None
    assert d0["fec"]["fer"] is None and d0["mpeg-ts"]["per"] is None

    ts = rx.receive(iq)
    assert ts.size > 0
    d = rx.get_stats(sym_rate=1e6)
    assert d["lock"] is True
    assert d["snr"] is not None and d["snr"] > 5.0
    assert d["plsync"]["sof_count"] >= d["plsync"]["frame_count"]["processed"]
    assert d["plsync"]["locked_since"] is not None
    assert d["fec"]["frames"] > 0 and d["fec"]["errors"] == 0
    # clean input can converge in 0 iterations (parity holds pre-update)
    assert d["fec"]["fer"] == 0.0 and d["fec"]["avg_ldpc_trials"] >= 0.0
    assert d["bbframes"]["processed"] == d["fec"]["frames"]
    assert d["bbframes"]["dropped"] == 0
    assert d["mpeg-ts"]["packets"] == ts.size // 188
    assert d["mpeg-ts"]["errors"] == 0 and d["mpeg-ts"]["per"] == 0.0
    # freq offset scaled to Hz by sym_rate
    assert abs(d["plsync"]["freq_offset_hz"]) < 1e3

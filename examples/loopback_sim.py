#!/usr/bin/env python3
"""Full Tx -> channel -> Rx loopback simulation (examples/dvbs2_tx_rx.grc analog).

Run: python examples/loopback_sim.py [--modcod qpsk3/5] [--esn0 8] [--cfo 1e-4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modcod", default="qpsk3/5")
    ap.add_argument("--frame-size", default="short")
    ap.add_argument("--pilots", action="store_true", default=True)
    ap.add_argument("--esn0", type=float, default=10.0)
    ap.add_argument("--cfo", type=float, default=0.0)
    ap.add_argument("--packets", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache, force_cpu

    enable_compilation_cache()
    if args.cpu:
        force_cpu()

    from dvbs2rx_tpu.tx import Transmitter, TxConfig, awgn_channel
    from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig

    rng = np.random.default_rng(0)
    ts = rng.integers(0, 256, (args.packets, 188), dtype=np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F

    tx = Transmitter(TxConfig(modcod=args.modcod, frame_size=args.frame_size,
                              pilots=args.pilots))
    iq = awgn_channel(tx.ts_to_iq(ts.reshape(-1)), args.esn0, sps=2,
                      freq_offset=args.cfo)
    rx = Receiver(RxConfig(modcod=args.modcod, frame_size=args.frame_size,
                           pilots=args.pilots))
    out = rx.receive(iq)

    n_out = out.size // 188
    ok = False
    if n_out:
        in_pkts = ts.reshape(-1, 188)
        first = out[:188]
        hits = np.where((in_pkts == first).all(axis=1))[0]
        if hits.size:
            k = hits[0]
            ok = np.array_equal(out, in_pkts[k: k + n_out].reshape(-1)[: out.size])
    print(f"recovered {n_out}/{args.packets} packets, bit-exact: {ok}")
    for key, val in rx.stats.as_dict().items():
        print(f"  {key}: {val}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Frame-sync timing metric demo (examples/dvbs2_pl_sync.grc analog):
plots/prints the dense SOF+PLSC metric over a noisy PLFRAME stream."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from dvbs2rx_tpu.utils.runtime import force_cpu

    force_cpu()
    import jax.numpy as jnp
    from dvbs2rx_tpu.tx import Transmitter, TxConfig
    from dvbs2rx_tpu.ops import plsync, cplx

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    rng = np.random.default_rng(0)
    ts = rng.integers(0, 256, (40, 188), dtype=np.uint8)
    ts[:, 0] = 0x47
    syms = tx.modulate_ts(ts.reshape(-1))
    noisy = syms + (rng.normal(0, 0.2, (syms.size, 2)) @ [1, 1j]).astype(np.complex64)

    metric, _, _ = plsync.timing_metric(
        jnp.asarray(cplx.from_np(noisy[:20000])),
        jnp.zeros((90, 2), jnp.float32),
    )
    metric = np.asarray(metric)
    peaks = np.where(metric > plsync.THRESHOLD_UNLOCKED)[0]
    L = tx.cfg.pls_info.plframe_len
    print(f"PLFRAME length: {L} symbols")
    print(f"metric peaks at: {peaks[:8].tolist()}")
    print(f"peak spacing:    {np.diff(peaks[:8]).tolist()} (expect {L})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the LDPC decoder on the current default device.

Measures per-iteration cost by decoding random (junk) LLRs, which never
converge, so the while_loop runs all ``max_trials`` iterations — the honest
worst-case (waterfall-SNR) cost, unlike the early-exit steady state that
bench.py measures.

Usage: python tools/ldpc_time.py [table] [batch] [trials] [xla|pallas]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    table = sys.argv[1] if len(sys.argv) > 1 else "S2_B4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    impl = sys.argv[4] if len(sys.argv) > 4 else "xla"

    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if impl == "pallas":
        from dvbs2rx_tpu.ops.ldpc_pallas import get_pallas_decoder

        dec = get_pallas_decoder(table, max_trials=trials)
        dec.max_deg = 0
    else:
        from dvbs2rx_tpu.ops.ldpc import get_decoder

        dec = get_decoder(table, max_trials=trials)
    N = dec.code.N
    rng = np.random.default_rng(0)
    llrs = rng.integers(-25, 25, (B, N), dtype=np.int8)
    llrs = jax.device_put(llrs)  # keep input device-resident: the tunneled
    # environment's host->device transfer would otherwise dominate timing

    t0 = time.perf_counter()
    out = dec(llrs)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    iters = int(np.max(np.asarray(out[2])))
    for _ in range(2):
        jax.block_until_ready(dec(llrs))
    t0 = time.perf_counter()
    n = 5
    outs = [dec(llrs) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n

    bits = B * dec.code.K
    print(
        f"table={table} N={N} q={dec.q} max_deg={dec.max_deg} B={B} "
        f"iters_used={iters} compile+first={t_compile:.1f}s "
        f"decode={dt*1e3:.2f}ms  per-iter={dt/max(iters,1)*1e6:.0f}us  "
        f"info-throughput@{iters}it={bits/dt/1e6:.0f} Mb/s "
        f"device={jax.devices()[0].device_kind}"
    )


if __name__ == "__main__":
    main()

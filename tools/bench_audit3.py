#!/usr/bin/env python3
"""Third-stage audit: separate tunnel dispatch overhead from device compute.

Times (after a readback, so blocking is honest):
  t1 = single step dispatch          = overhead + compute
  tk = one dispatch fusing K chained steps = overhead + K * compute
=> compute = (tk - t1) / (K - 1), overhead = t1 - compute.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C = 64
    F = 2
    K = 6
    ESN0_DB = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    impl = sys.argv[2] if len(sys.argv) > 2 else "xla"
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F,
                   ldpc_impl=impl)
    L = cfg.pls_info.plframe_len

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(0)
    n_pkts = ((F + 2) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: (F + 1) * L + 91]
    n0 = 10 ** (-ESN0_DB / 10)
    noisy = syms + (
        rng.normal(0, np.sqrt(n0 / 2), (syms.size, 2)).astype(np.float32)
        @ np.array([1, 1j], dtype=np.complex64)
    )
    symbols = np.stack([noisy.astype(np.complex64)] * C)

    pipe = BatchedPipeline(cfg, n_channels=C, frames_per_step=F)
    h, p = pipe.channel_major_inputs(symbols)
    h = jax.device_put(jnp.asarray(h))
    p = jax.device_put(jnp.asarray(p))
    flag = jnp.asarray(True)

    def step_fn(h, p, flag):
        return pipe.step(h, p, flag)

    @jax.jit
    def one(h, p, flag):
        return step_fn(h, p, flag)[0]

    @jax.jit
    def many(h, p, flag):
        kb = step_fn(h, p, flag)[0]
        for _ in range(K - 1):
            eps = (jnp.sum(kb[0, 0, :2]) % 2).astype(jnp.float32) * 1e-12
            kb = step_fn(h + eps, p, flag)[0]
        return kb

    # warm up + force honest blocking via a readback
    _ = int(np.asarray(one(h, p, flag))[0, 0, 0])
    _ = int(np.asarray(many(h, p, flag))[0, 0, 0])

    def t(f, n=4):
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f(h, p, flag))
        return (time.perf_counter() - t0) / n

    t1 = t(one)
    tk = t(many)
    compute = (tk - t1) / (K - 1)
    overhead = t1 - compute
    print(
        f"esn0={ESN0_DB} impl={impl} t1={t1*1e3:.2f}ms tK={tk*1e3:.2f}ms "
        f"(K={K}) => per-step compute={compute*1e3:.2f}ms "
        f"dispatch_overhead={overhead*1e3:.2f}ms"
    )


if __name__ == "__main__":
    main()

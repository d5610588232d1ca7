#!/usr/bin/env python3
"""Audit the bench timing methodology on the tunneled TPU.

Compares three ways of timing the batched frame-group + FEC step:
  serial    — block_until_ready after every call
  pipelined — submit N, block once (bench.py's method)
  chained   — each step's input *data-depends* on the previous step's
              output, then one final scalar readback. This cannot
              over-report: the device must finish step k before step k+1.

If pipelined << chained, block_until_ready is acking early through the
tunnel and pipelined numbers are bogus.
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
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C = 64
    F = 2
    ESN0_DB = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
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

    # warmup + iteration count
    out = pipe.step(h, p, flag)
    jax.block_until_ready(out)
    iters = int(out[2]["ldpc_iters"])

    N = 8
    # serial
    t0 = time.perf_counter()
    for _ in range(N):
        jax.block_until_ready(pipe.step(h, p, flag))
    t_serial = (time.perf_counter() - t0) / N

    # pipelined (bench.py method)
    t0 = time.perf_counter()
    outs = [pipe.step(h, p, flag) for _ in range(N)]
    jax.block_until_ready(outs)
    t_pipe = (time.perf_counter() - t0) / N

    # chained: h depends on previous kbytes => true serialized compute
    @jax.jit
    def chained(h, p, flag, prev):
        eps = (jnp.sum(prev) % 2).astype(jnp.float32) * 1e-12
        out = pipe.step(h + eps, p, flag)
        return out[0]

    kb = chained(h, p, flag, jnp.zeros((), jnp.uint8))
    jax.block_until_ready(kb)
    t0 = time.perf_counter()
    prev = jnp.zeros((), jnp.uint8)
    for _ in range(N):
        kb = chained(h, p, flag, prev)
        prev = kb[0, 0, 0]
    v = int(prev)  # force the final readback
    t_chain = (time.perf_counter() - t0) / N

    print(
        f"esn0={ESN0_DB} impl={impl} ldpc_iters={iters} "
        f"serial={t_serial*1e3:.2f}ms pipelined={t_pipe*1e3:.2f}ms "
        f"chained={t_chain*1e3:.2f}ms (readback v={v})"
    )


if __name__ == "__main__":
    main()

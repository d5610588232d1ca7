#!/usr/bin/env python3
"""Second-stage audit: isolate the tunnel's dispatch behaviors.

Order matters: no device->host readback happens before the pipelined
timings (the axon tunnel reportedly leaves streaming mode after a d2h).

Measures, in order:
  1. pipelined-identical: N submissions of the same args, block once
  2. pipelined-distinct: N submissions over N different pre-uploaded inputs
  3. one scalar readback
  4. pipelined-identical again (post-readback)
  5. chained (data-dependent, cannot lie)
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
    ESN0_DB = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    impl = sys.argv[2] if len(sys.argv) > 2 else "xla"
    N = 8
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

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        noisy = syms + (
            r.normal(0, np.sqrt(n0 / 2), (syms.size, 2)).astype(np.float32)
            @ np.array([1, 1j], dtype=np.complex64)
        )
        symbols = np.stack([noisy.astype(np.complex64)] * C)
        h, p = pipe.channel_major_inputs(symbols)
        return jax.device_put(jnp.asarray(h)), jax.device_put(jnp.asarray(p))

    pipe = BatchedPipeline(cfg, n_channels=C, frames_per_step=F)
    flag = jnp.asarray(True)
    inputs = [make_inputs(s) for s in range(N)]
    h0, p0 = inputs[0]

    # warmup WITHOUT readback
    jax.block_until_ready(pipe.step(h0, p0, flag))

    t0 = time.perf_counter()
    outs = [pipe.step(h0, p0, flag) for _ in range(N)]
    jax.block_until_ready(outs)
    t_ident = (time.perf_counter() - t0) / N

    t0 = time.perf_counter()
    outs = [pipe.step(h, p, flag) for h, p in inputs]
    jax.block_until_ready(outs)
    t_dist = (time.perf_counter() - t0) / N

    iters = int(outs[0][2]["ldpc_iters"])  # first readback

    t0 = time.perf_counter()
    outs = [pipe.step(h0, p0, flag) for _ in range(N)]
    jax.block_until_ready(outs)
    t_ident2 = (time.perf_counter() - t0) / N

    @jax.jit
    def chained(h, p, flag, prev):
        eps = (jnp.sum(prev) % 2).astype(jnp.float32) * 1e-12
        out = pipe.step(h + eps, p, flag)
        return out[0]

    kb = chained(h0, p0, flag, jnp.zeros((), jnp.uint8))
    jax.block_until_ready(kb)
    t0 = time.perf_counter()
    prev = jnp.zeros((), jnp.uint8)
    for _ in range(N):
        kb = chained(h0, p0, flag, prev)
        prev = kb[0, 0, 0]
    v = int(prev)
    t_chain = (time.perf_counter() - t0) / N

    print(
        f"esn0={ESN0_DB} impl={impl} ldpc_iters={iters} "
        f"pipelined_identical={t_ident*1e3:.2f}ms "
        f"pipelined_distinct={t_dist*1e3:.2f}ms "
        f"pipelined_identical_post_readback={t_ident2*1e3:.2f}ms "
        f"chained={t_chain*1e3:.2f}ms (v={v})"
    )


if __name__ == "__main__":
    main()

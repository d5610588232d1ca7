#!/usr/bin/env python3
"""A/B LDPC kernel timing: real chain LLRs vs synthetic, long scan chains.

The K=9 chain used by group_profile showed a 5x spread between synthetic
(1.1 ms) and real (5.3 ms) LLRs at the SAME iteration count — physically
implausible for a data-independent program, so one of the readings is tunnel
noise. This uses K=25 chains (~130 ms dispatches) to drown the noise.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 25
REPS = 5


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C, F = 64, 2
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F)
    L = cfg.pls_info.plframe_len
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(0)
    n_pkts = ((F + 2) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: (F + 1) * L + 91]
    n0 = 10 ** (-6.0 / 10)
    noisy = syms + (rng.normal(0, np.sqrt(n0 / 2), (syms.size, 2)).astype(np.float32)
                    @ np.array([1, 1j], np.complex64))
    symbols = np.stack([noisy.astype(np.complex64)] * C)

    jax.block_until_ready(jnp.zeros(()) + 1)
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    pipe = BatchedPipeline(cfg, n_channels=C, frames_per_step=F)
    rx = pipe._rx
    h, p = pipe.channel_major_inputs(symbols)
    h = jax.device_put(jnp.asarray(h)); p = jax.device_put(jnp.asarray(p))
    flag = jnp.asarray(True)

    def g_one(h, p, flag):
        out = jax.vmap(lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F))(h, p)
        return out["llrs"]

    real = np.asarray(jax.jit(g_one)(h, p, flag)).reshape(-1, cfg.fec.nldpc)
    real = real.astype(np.int8)
    synth = np.full_like(real, 20)
    flip = np.random.default_rng(1).random(real.shape) < 0.01
    synth = np.where(flip, np.int8(-6), synth)

    def ldpc_one(l):
        return rx.ldpc._decode_impl(l)

    @jax.jit
    def ldpc_chain(l0):
        def body(l, _):
            out = ldpc_one(l)
            eps = (out[0][0, 0] % 2).astype(jnp.int8)
            return (l + eps[None, None]).astype(jnp.int8), None
        l, _ = jax.lax.scan(body, l0, None, length=K)
        return l

    one = jax.jit(lambda l: (ldpc_one(l)[0][0, 0] % 2).astype(jnp.int8))

    for label, arr in (("real", real), ("synth", synth)):
        l0 = jax.device_put(jnp.asarray(arr))
        iters = int(jax.jit(ldpc_one)(l0)[2])
        jax.block_until_ready(one(l0)); jax.block_until_ready(ldpc_chain(l0))

        def t(f):
            best = np.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(f(l0))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tk = t(one), t(ldpc_chain)
        print(f"{label}: iters={iters}  per-decode {(tk - t1) / (K - 1) * 1e3:.3f} ms"
              f"  (t1 {t1*1e3:.1f} ms, tK {tk*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

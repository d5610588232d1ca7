#!/usr/bin/env python3
"""Find where the composed step loses ~4.7 ms vs the sum of its stages.

All chains: perturb BOTH h and p by eps (1e-12), carry a FULL reduction.
  A. group -> LDPC-layout transposes -> sum   (no Pallas call)
  B. group -> ldpc -> sum(hard)
  C. group -> ldpc -> bch -> pack -> sum      (= full step)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 9
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
    n0v = 10 ** (-6.0 / 10)
    noisy = syms + (rng.normal(0, np.sqrt(n0v / 2), (syms.size, 2)).astype(np.float32)
                    @ np.array([1, 1j], np.complex64))
    symbols = np.stack([noisy.astype(np.complex64)] * C)

    jax.block_until_ready(jnp.zeros(()) + 1)
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    pipe = BatchedPipeline(cfg, n_channels=C, frames_per_step=F)
    rx = pipe._rx
    h, p = pipe.channel_major_inputs(symbols)
    h = jax.device_put(jnp.asarray(h)); p = jax.device_put(jnp.asarray(p))
    flag = jnp.asarray(True)
    code = rx.ldpc.code
    B, M, nb, q = C * F, code.M, code.n_blocks, code.q

    def group(h, p):
        out = jax.vmap(
            lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F)
        )(h, p)
        return out["llrs"].reshape(-1, cfg.fec.nldpc)

    def measure(one, label):
        @jax.jit
        def chain(h, p):
            def body(eps, _):
                chk = one(h + eps, p + eps)
                return (chk % 2) * 1e-12, None
            eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return eps

        single = jax.jit(lambda h, p: (one(h, p) % 2) * 1e-12)
        jax.block_until_ready(single(h, p))
        jax.block_until_ready(chain(h, p))

        def t(f):
            best = np.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(f(h, p))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tk = t(single), t(chain)
        print(f"{label}: {(tk - t1) / (K - 1) * 1e3:.3f} ms", flush=True)

    def a(h, p):
        llrs = group(h, p)
        Kb = code.K
        v = llrs[:, :Kb].reshape(B, nb, M).transpose(1, 2, 0)
        pz = llrs[:, Kb:].reshape(B, M, q).transpose(2, 1, 0)
        return jnp.sum(v.astype(jnp.float32)) + jnp.sum(pz.astype(jnp.float32))
    measure(a, "A group+transposes")

    def b(h, p):
        llrs = group(h, p)
        hard, _llo, _it, _ok = rx.ldpc._decode_impl(llrs)
        return jnp.sum(hard.astype(jnp.float32))
    measure(b, "B group+ldpc")

    def c(h, p):
        llrs = group(h, p)
        kbytes, n_corr, iters, ok, _hard = rx._fec_stage_impl(llrs)
        return jnp.sum(kbytes.astype(jnp.float32))
    measure(c, "C full step")


if __name__ == "__main__":
    main()

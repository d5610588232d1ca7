#!/usr/bin/env python3
"""In-situ split of the batched step cost using the SOUND h+eps chain.

ldpc_ab.py showed the int8 +eps chain perturbation corrupts LLRs into
max-trial decodes; every chain here perturbs only the float headers by
1e-12 (provably harmless) and truncates the step at different depths:

  group        -> llrs checksum
  group+ldpc   -> hard checksum
  group+ldpc+bch -> corrected checksum
  full step    -> kbytes checksum
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

    def group(h, p):
        out = jax.vmap(
            lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F)
        )(h, p)
        return out["llrs"].reshape(-1, cfg.fec.nldpc)

    def depth_fn(depth):
        def one(h, p):
            llrs = group(h, p)
            if depth == 0:
                return jnp.sum(llrs[0, :4].astype(jnp.float32))
            hard, _llo, iters, ok = rx.ldpc._decode_impl(llrs)
            if depth == 1:
                return jnp.sum(hard[0, :4].astype(jnp.float32))
            corrected, n_corr = rx.bch._decode_impl(
                hard[:, : cfg.fec.nbch])
            if depth == 2:
                return jnp.sum(corrected[0, :4].astype(jnp.float32))
            kbits = corrected[:, : cfg.fec.kbch].astype(jnp.int32)
            w = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
            kbytes = jnp.sum(
                kbits.reshape(kbits.shape[0], -1, 8) * w[None, None, :],
                axis=-1).astype(jnp.uint8)
            return jnp.sum(kbytes[0, :4].astype(jnp.float32))
        return one

    def measure(one, label):
        @jax.jit
        def chain(h, p):
            def body(eps, _):
                chk = one(h + eps, p)
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
        dt = (tk - t1) / (K - 1)
        print(f"{label}: {dt*1e3:.3f} ms  (t1 {t1*1e3:.1f}, tK {tk*1e3:.1f})",
              flush=True)
        return dt

    measure(depth_fn(0), "group only")
    measure(depth_fn(1), "group+ldpc")
    measure(depth_fn(2), "group+ldpc+bch")
    measure(depth_fn(3), "full step")


if __name__ == "__main__":
    main()

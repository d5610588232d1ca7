#!/usr/bin/env python3
"""Fourth-stage audit: per-sub-stage device compute via fused chaining.

Stages timed independently (K-fused chain minus single, honest blocking):
  group — vmapped Receiver._frame_group_impl over channels
  fec   — Receiver._fec_stage_impl (LDPC + BCH + pack)
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
    K = 5
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
    rx = pipe._rx
    h, p = pipe.channel_major_inputs(symbols)
    h = jax.device_put(jnp.asarray(h))
    p = jax.device_put(jnp.asarray(p))
    flag = jnp.asarray(True)

    def group_fn(h, p):
        return jax.vmap(
            lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F)
        )(h, p)

    g = jax.jit(group_fn)(h, p)
    llrs = jax.device_put(np.asarray(g["llrs"].reshape(-1, cfg.fec.nldpc)))

    def timed_pair(one_fn, many_fn, x):
        f1 = jax.jit(one_fn)
        fk = jax.jit(many_fn)
        _ = np.asarray(jax.tree.leaves(f1(x))[0]).ravel()[0]  # honest mode
        _ = jax.block_until_ready(fk(x))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f1(x))
        t1 = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(fk(x))
        tk = (time.perf_counter() - t0) / n
        return (tk - t1) / (K - 1)

    # group stage
    def group_one(h):
        return group_fn(h, p)["llrs"]

    def group_many(h):
        out = group_fn(h, p)["llrs"]
        for _ in range(K - 1):
            eps = (out[0, 0, 0].astype(jnp.float32) % 2) * 1e-12
            out = group_fn(h + eps, p)["llrs"]
        return out

    t_group = timed_pair(group_one, group_many, h)

    # fec stage
    def fec_one(llrs):
        return rx._fec_stage_impl(llrs)[0]

    def fec_many(llrs):
        kb = rx._fec_stage_impl(llrs)[0]
        for _ in range(K - 1):
            # data dependency that is always zero but not constant-foldable
            dep = jnp.where(kb[0, 0] == 255, jnp.int8(1), jnp.int8(0))
            kb = rx._fec_stage_impl(llrs + dep)[0]
        return kb

    t_fec = timed_pair(fec_one, fec_many, llrs)

    print(
        f"esn0={ESN0_DB} impl={impl} per-step compute: "
        f"group={t_group*1e3:.2f}ms fec={t_fec*1e3:.2f}ms"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Fifth-stage audit: decompose pipe.step cost (group vs fec vs overhead),
all in one process with the fused-chain method, measured twice each to
expose tunnel drift.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
K = 5


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C, F = 64, 2
    ESN0_DB = 6.0
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F)
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
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))  # honest blocking on

    def group_fn(h):
        return jax.vmap(
            lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F)
        )(h, p)["llrs"]

    g = jax.jit(group_fn)(h)
    llrs0 = jax.device_put(np.asarray(g.reshape(-1, cfg.fec.nldpc)))

    def dep_f32(x):
        return (jnp.sum(x[..., :1]) % 2).astype(jnp.float32) * 1e-12

    def make_pair(fn, dep, x):
        one = jax.jit(fn)

        @jax.jit
        def many(x):
            out = fn(x)
            for _ in range(K - 1):
                out = fn(x + dep(out))
            return out

        return one, many

    def chain_t(one, many, x, n=3):
        jax.block_until_ready(one(x))
        jax.block_until_ready(many(x))
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(one(x))
        t1 = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(many(x))
        tk = (time.perf_counter() - t0) / n
        return (tk - t1) / (K - 1), t1

    # full step
    def step_fn(hh):
        return pipe.step(hh, p, flag)[0].astype(jnp.float32)

    # group only
    # fec only
    def fec_fn(llrs):
        return rx._fec_stage_impl(llrs)[0].astype(jnp.float32) * 1e-12

    def dep_i8(kb):
        return jnp.where(jnp.sum(kb[:1, :1]) == 1e9, 1, 0).astype(jnp.int8)

    one_s, many_s = make_pair(step_fn, dep_f32, h)
    one_g, many_g = make_pair(group_fn, dep_f32, h)

    one_f = jax.jit(fec_fn)

    @jax.jit
    def many_f(llrs):
        kb = fec_fn(llrs)
        for _ in range(K - 1):
            d = jnp.where(jnp.sum(kb) == 1e9, 1, 0).astype(jnp.int8)
            kb = fec_fn(llrs + d)
        return kb

    for rep in range(2):
        ts, t1s = chain_t(one_s, many_s, h)
        tg, _ = chain_t(one_g, many_g, h)
        tf, _ = chain_t(one_f, many_f, llrs0)
        print(
            f"[{rep}] step={ts*1e3:.2f}ms (t1={t1s*1e3:.1f}ms) "
            f"group={tg*1e3:.2f}ms fec={tf*1e3:.2f}ms "
            f"residual={max(ts-tg-tf,0)*1e3:.2f}ms"
        )


if __name__ == "__main__":
    main()

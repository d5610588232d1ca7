#!/usr/bin/env python3
"""Sixth-stage audit: find the ~6 ms residual in the composed step.

Times fused chains of:
  A: group only            (llrs out)
  B: fec only              (fixed llrs in)
  C: group -> fec composed (what pipe.step does, minus stats)
  D: pipe.step
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
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F)
    L = cfg.pls_info.plframe_len
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(0)
    n_pkts = ((F + 2) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: (F + 1) * L + 91]
    n0 = 10 ** (-6.0 / 10)
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
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    def group_fn(hh):
        return jax.vmap(
            lambda a, b: rx._frame_group_impl(a, b, flag, n_frames=F)
        )(hh, p)["llrs"]

    llrs0 = jax.device_put(
        np.asarray(jax.jit(group_fn)(h).reshape(-1, cfg.fec.nldpc))
    )

    def fec_fn(llrs):
        return rx._fec_stage_impl(llrs)[0]

    def comp_fn(hh):
        return fec_fn(group_fn(hh).reshape(-1, cfg.fec.nldpc))

    def step_fn(hh):
        return pipe.step(hh, p, flag)[0]

    def chain(fn, dep):
        one = jax.jit(fn)

        @jax.jit
        def many(x):
            out = fn(x)
            for _ in range(K - 1):
                out = fn(dep(x, out))
            return out

        return one, many

    def t(f, x, n=3):
        jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(f(x))
        return (time.perf_counter() - t0) / n

    dep_h = lambda x, out: x + (
        jnp.sum(out[..., :1].astype(jnp.float32)) % 2
    ) * 1e-12
    dep_llr = lambda x, out: x + jnp.where(
        jnp.sum(out[..., :1].astype(jnp.int32)) == -1, 1, 0
    ).astype(jnp.int8)

    for name, fn, dep, x in [
        ("group", group_fn, dep_h, h),
        ("fec", fec_fn, dep_llr, llrs0),
        ("composed", comp_fn, dep_h, h),
        ("step", step_fn, dep_h, h),
    ]:
        one, many = chain(fn, dep)
        t1, tk = t(one, x), t(many, x)
        print(f"{name}: per-step={(tk-t1)/(K-1)*1e3:.2f}ms t1={t1*1e3:.1f}ms")


if __name__ == "__main__":
    main()

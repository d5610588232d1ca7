#!/usr/bin/env python3
"""Break the FEC stage into ldpc / bch / pack on REAL chain LLRs (TPU)."""
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

    llrs0 = jax.jit(g_one)(h, p, flag).reshape(-1, cfg.fec.nldpc)
    llrs0 = jax.device_put(jnp.asarray(np.asarray(llrs0)).astype(np.int8))

    K = 9

    def chain(f1, fM, *args, label=""):
        jax.block_until_ready(f1(*args)); jax.block_until_ready(fM(*args))
        def t(f):
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(f(*args))
            return (time.perf_counter() - t0) / 3
        dt = max((t(fM) - t(f1)) / (K - 1), 1e-9)
        print(f"{label}: {dt*1e3:.3f} ms", flush=True)
        return dt

    def scan_chain(one, perturb, l0, label):
        def fM(l0):
            def body(l, _):
                out = one(l)
                return perturb(l, out), None
            l, _ = jax.lax.scan(body, l0, None, length=K)
            return l
        return chain(jax.jit(lambda l: perturb(l, one(l))), jax.jit(fM),
                     l0, label=label)

    # 1. ldpc only (real LLRs)
    def ldpc_one(l):
        return rx.ldpc._decode_impl(l)
    def ldpc_perturb(l, out):
        eps = (out[0][0, 0] % 2).astype(jnp.int8)
        return (l + eps[None, None]).astype(jnp.int8)
    scan_chain(ldpc_one, ldpc_perturb, llrs0, "ldpc(real llrs)")
    hard, _llo, iters, conv = jax.jit(ldpc_one)(llrs0)
    print("iters:", int(iters), "all_conv:", bool(np.asarray(conv).all()), flush=True)

    # 2. bch only (real hard bits)
    bch_in = jax.device_put(jnp.asarray(
        np.asarray(hard[:, : cfg.fec.nbch]).astype(np.uint8)))
    def bch_one(b):
        return rx.bch._decode_impl(b)[0]
    def bch_perturb(b, out):
        return out.astype(jnp.uint8)
    scan_chain(bch_one, bch_perturb, bch_in, "bch(real bits)")

    # 3. pack only
    corr0 = jax.jit(bch_one)(bch_in)
    def pack_one(c):
        kbits = c[:, : rx.cfg.fec.kbch].astype(jnp.int32)
        w = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
        return jnp.sum(kbits.reshape(kbits.shape[0], -1, 8) * w[None, None, :],
                       axis=-1).astype(jnp.uint8)
    def pack_perturb(c, kb):
        return (c ^ (kb[0, 0] % 2).astype(c.dtype)[None, None]).astype(c.dtype)
    scan_chain(pack_one, pack_perturb, corr0.astype(jnp.uint8), "pack")

    # 4. full fec stage (real LLRs)
    def fec_one(l):
        return rx._fec_stage_impl(l)[0]
    def fec_perturb(l, kb):
        eps = (kb[0, 0] % 2).astype(jnp.int8)
        return (l + eps[None, None]).astype(jnp.int8)
    scan_chain(fec_one, fec_perturb, llrs0, "fec stage(full)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Honest frame-group substage decomposition on TPU.

Lessons from ldpc_ab/step_split: a chain is only honest when (a) the carry
consumes a FULL reduction of the stage output (otherwise XLA slice-propagates
the body down to almost nothing) and (b) the perturbation cannot corrupt the
data (float eps of 1e-12). Every stage here perturbs the payload input and
carries sum(output) % 2 * 1e-12.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 17
REPS = 5


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.ops import cplx, plsync
    from dvbs2rx_tpu.ops.demap import demap, estimate_snr_qpsk
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
    descr = jnp.asarray(rx._descr_np)

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

    def vm(f):
        return jax.vmap(f)

    # a) descramble only
    def descr_only(h, p):
        y = vm(lambda pp: cplx.cmul(pp, descr[None]))(p)
        return jnp.sum(y)
    measure(descr_only, "descramble")

    # b) + pilotless phase correction ramp
    def corr(h, p):
        def one_ch(hh, pp):
            pd = cplx.cmul(pp, descr[None])
            headers = hh[:, 1:]
            plsv = jnp.full((F + 1,), cfg.pls, jnp.int32)
            hdr_phase = plsync.plheader_phase(headers, plsv)
            fine = plsync.fine_foffset_pilotless(
                hdr_phase[:F], hdr_phase[1:], cfg.pls_info.plframe_len)
            return plsync.correct_payload_pilotless(pd, hdr_phase[:F], fine)
        y = vm(one_ch)(h, p)
        return jnp.sum(y)
    measure(corr, "descr+phase-corr")

    # c) + demap (full xfec -> llrs)
    def dmp(h, p):
        def one_ch(hh, pp):
            pd = cplx.cmul(pp, descr[None])
            headers = hh[:, 1:]
            plsv = jnp.full((F + 1,), cfg.pls, jnp.int32)
            hdr_phase = plsync.plheader_phase(headers, plsv)
            fine = plsync.fine_foffset_pilotless(
                hdr_phase[:F], hdr_phase[1:], cfg.pls_info.plframe_len)
            xfec = plsync.correct_payload_pilotless(pd, hdr_phase[:F], fine)
            snr = estimate_snr_qpsk(xfec[0])
            n0 = 1.0 / jnp.maximum(snr, 1e-9)
            return demap(xfec, jnp.broadcast_to(n0, (F,)), "QPSK", "1/2")
        y = vm(one_ch)(h, p)
        return jnp.sum(y.astype(jnp.float32))
    measure(dmp, "descr+corr+demap")

    # d) header-side ops only (metric, autocorr, phases)
    def hdr_only(h, p):
        def one_ch(hh, pp):
            headers_ext = hh
            headers = headers_ext[:, 1:]
            d = cplx.conj_mul(headers_ext[:, 1:], headers_ext[:, :-1])
            metric = plsync.frame_metric(d[:, 1:])
            plsv = jnp.full((F + 1,), cfg.pls, jnp.int32)
            r = plsync.coarse_autocorr(headers[:F], plsv[:F], full=True)
            hdr_phase = plsync.plheader_phase(headers, plsv)
            return jnp.sum(metric) + jnp.sum(r) + jnp.sum(hdr_phase) + jnp.sum(pp[0, 0, :2])
        y = vm(one_ch)(h, p)
        return jnp.sum(y)
    measure(hdr_only, "header ops")

    # e) full frame group (sum over every output)
    def full(h, p):
        out = vm(lambda hh, pp: rx._frame_group_impl(hh, pp, flag, n_frames=F))(h, p)
        return (jnp.sum(out["llrs"].astype(jnp.float32)) + jnp.sum(out["metric"])
                + jnp.sum(out["autocorr"]) + jnp.sum(out["fine"])
                + jnp.sum(out["n0"]) + jnp.sum(out["xfec"]))
    measure(full, "full group (all outputs)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Audit the bench timing methodology on the tunneled TPU.

Subcommands (``python tools/bench_audit.py <cmd> [args]``):

  methods [esn0] [impl]
      Compare three ways of timing the batched frame-group + FEC step:
        serial    — block_until_ready after every call
        pipelined — submit N, block once
        chained   — each step's input *data-depends* on the previous step's
                    output, then one final scalar readback. This cannot
                    over-report: the device must finish step k before k+1.
      If pipelined << chained, block_until_ready is acking early through
      the tunnel and pipelined numbers are bogus.

  stages
      Decompose the composed step cost (group vs fec vs residual) with the
      fused K-chain method (compute = (t_K - t_1)/(K-1) after an initial
      readback forces honest blocking), measured twice to expose tunnel
      drift.

Historical findings (from the round-1 forensic series this tool
consolidates): block_until_ready on this environment's axon tunnel returns
without waiting until the process has done one device->host readback;
dispatch latency is ~24-30 ms and long-tailed; chain carries must consume a
full reduction of the stage output (slice carries get slice-propagated and
the body computes almost nothing) and must perturb inputs harmlessly (an
int8 ``llrs + eps`` carry corrupts LLRs cumulatively and inflates decode
trials). bench.py's methodology follows these rules.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 5


def _setup(esn0_db=6.0, impl="auto"):
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C, F = 64, 2
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F,
                   ldpc_impl=impl)
    L = cfg.pls_info.plframe_len
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(0)
    n_pkts = ((F + 2) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: (F + 1) * L + 91]
    n0 = 10 ** (-esn0_db / 10)
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
    return jax, jnp, cfg, pipe, h, p, flag, C, F


def cmd_methods(argv):
    esn0_db = float(argv[0]) if argv else 6.0
    impl = argv[1] if len(argv) > 1 else "auto"
    jax, jnp, cfg, pipe, h, p, flag, C, F = _setup(esn0_db, impl)

    out = pipe.step(h, p, flag)
    jax.block_until_ready(out)
    iters = int(out[2]["ldpc_iters"])

    N = 8
    t0 = time.perf_counter()
    for _ in range(N):
        jax.block_until_ready(pipe.step(h, p, flag))
    t_serial = (time.perf_counter() - t0) / N

    t0 = time.perf_counter()
    outs = [pipe.step(h, p, flag) for _ in range(N)]
    jax.block_until_ready(outs)
    t_pipe = (time.perf_counter() - t0) / N

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
        f"esn0={esn0_db} impl={impl} ldpc_iters={iters} "
        f"serial={t_serial*1e3:.2f}ms pipelined={t_pipe*1e3:.2f}ms "
        f"chained={t_chain*1e3:.2f}ms (readback v={v})"
    )


def cmd_stages(argv):
    jax, jnp, cfg, pipe, h, p, flag, C, F = _setup()
    rx = pipe._rx
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))  # honest blocking on

    def group_fn(hh):
        return jax.vmap(
            lambda a, b: rx._frame_group_impl(a, b, flag, n_frames=F)
        )(hh, p)["llrs"]

    g = jax.jit(group_fn)(h)
    llrs0 = jax.device_put(np.asarray(g.reshape(-1, cfg.fec.nldpc)))

    def dep_f32(x):
        return (jnp.sum(x[..., :1]) % 2).astype(jnp.float32) * 1e-12

    def make_pair(fn, dep):
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

    def step_fn(hh):
        return pipe.step(hh, p, flag)[0].astype(jnp.float32)

    def fec_fn(llrs):
        return rx._fec_stage_impl(llrs)[0].astype(jnp.float32) * 1e-12

    one_s, many_s = make_pair(step_fn, dep_f32)
    one_g, many_g = make_pair(group_fn, dep_f32)
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


def main():
    cmds = {"methods": cmd_methods, "stages": cmd_stages}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: bench_audit.py {{{'|'.join(cmds)}}} [args]",
              file=sys.stderr)
        sys.exit(2)
    cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()

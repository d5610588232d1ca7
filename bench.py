#!/usr/bin/env python3
"""Benchmark: steady-state IQ->TS receiver throughput on one TPU chip.

Workload: QPSK 1/2 normal FECFRAMEs (the BASELINE.json headline config),
64-channel batched receiver in the locked steady state, Es/N0 6 dB. Stages:

  1. front end  — closed-loop rotator + feed-forward O&M symbol timing
                  (dense block conv; RxConfig.sym_sync_impl="ffw")
  2. PL + demap — frame group: timing metric, freq/phase sync, descrambling,
                  soft demap (batched over channels x frames)
  3. FEC        — Pallas layered LDPC + syndrome-gated BCH + bit packing

Timing methodology (honest under the tunneled device): on this
environment's axon TPU, ``jax.block_until_ready`` returns WITHOUT waiting
until the first device->host readback of the process, so naive
submit-and-block timing under-reports by orders of magnitude
(tools/bench_audit*.py). Each stage is therefore timed as

    compute = (t_K - t_1) / (K - 1)

where t_1 is one jitted dispatch and t_K is one jitted dispatch containing
K data-DEPENDENT executions of the stage (the device cannot overlap or
elide them), both measured after an initial readback forces honest
blocking. The K-chain is a ``lax.scan`` whose carry feeds a data-dependent
epsilon into the next execution's input: the stage body is compiled ONCE
(not K unrolled copies), keeping bench compile time flat in K.

Throughput = IQ samples consumed / per-sample device compute, reported as
Msamples/s/chip. ``vs_baseline`` compares against the reference's
field-validated real-time operating point (1 Mbaud at 2 samples/symbol =
2 Msamples/s on an RTL-SDR host CPU, ``docs/support.md:53-61``) since the
reference publishes no end-to-end throughput figure (BASELINE.md).

Prints ONE JSON line.
"""

import json
import time

import numpy as np

K = 33         # chained executions per fused timing dispatch (long chains:
               # per-step times are ~1 ms while tunnel dispatch jitter is
               # several ms, so the chain must dominate the subtraction)
K_FE = 33      # front-end chain length
REPS = 5       # wall-clock repetitions per measured dispatch


def chain_time(f1, fK, *args):
    """Per-stage device compute via fused data-dependent chaining."""
    import jax

    jax.block_until_ready(f1(*args))
    jax.block_until_ready(fK(*args))

    def t(f):
        # min over repetitions: dispatch latency through the tunneled
        # device is long-tailed, and the minimum is the robust estimator
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = t(f1), t(fK)
    return max((tk - t1) / (K - 1), 1e-9), t1


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.parallel.batch import BatchedPipeline
    from dvbs2rx_tpu.ops.ffsync import FeedForwardSync
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    C = 64                # channels
    F = 2                 # frames per step
    ESN0_DB = 6.0
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", fec_batch=C * F)
    L = cfg.pls_info.plframe_len
    sps = cfg.sps

    # ---- stimulus: frame-aligned noisy waveform (single channel, replicated)
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(0)
    n_pkts = ((F + 2) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: (F + 1) * L + 91]
    esn0 = 10 ** (ESN0_DB / 10)
    n0 = 1.0 / esn0
    noisy = syms + (
        rng.normal(0, np.sqrt(n0 / 2), (syms.size, 2)).astype(np.float32)
        @ np.array([1, 1j], dtype=np.complex64)
    )
    symbols = np.stack([noisy.astype(np.complex64)] * C)

    # force honest blocking for the whole process before any timing
    jax.block_until_ready(jnp.zeros(()) + 1)
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    # ---- stage 2+3: batched frame group + FEC
    pipe = BatchedPipeline(cfg, n_channels=C, frames_per_step=F)
    headers_ext, payloads = pipe.frame_inputs_from_symbols(symbols)
    h = jax.device_put(jnp.asarray(headers_ext))
    p = jax.device_put(jnp.asarray(payloads))
    flag = jnp.asarray(True)

    def gf_one(h, p, flag):
        return pipe.step(h, p, flag)[0]

    @jax.jit
    def gf_many(h, p, flag):
        def body(eps, _):
            kb = pipe.step(h + eps, p, flag)[0]
            eps = (jnp.sum(kb[0, 0, :2]) % 2).astype(jnp.float32) * 1e-12
            return eps, kb[0, 0, 0]
        eps, last = jax.lax.scan(
            body, jnp.float32(0.0), None, length=K
        )
        return eps, last

    t_group_fec, t1_gf = chain_time(jax.jit(gf_one), gf_many, h, p, flag)
    kbytes, _, stats = pipe.step(h, p, flag)
    ldpc_iters = int(stats["ldpc_iters"])

    # ---- stage 1: front end (vmapped feed-forward timing recovery);
    # chained by threading the timing state, a real recurrence
    sync = FeedForwardSync(sps=sps, rolloff=cfg.rolloff)
    n_out = 32768
    n_samp = n_out * sps + sync.history() + 64
    stim = np.resize(noisy, n_samp).astype(np.complex64)
    states = jax.tree.map(lambda x: jnp.stack([x] * C), sync.init_state())
    samples = jnp.asarray(cplx.from_np(np.stack([stim] * C)))

    def fe_step(st, s):
        new_st, syms, consumed = jax.vmap(
            lambda a, b: sync._step_impl(a, b, n_out)
        )(st, s)
        # checksum forces the symbol-producing compute (otherwise XLA
        # dead-code-eliminates the matched filter when only the carry
        # state is threaded through the chain)
        chk = jnp.sum(syms[0, :4]) * 1e-12
        return new_st, chk

    @jax.jit
    def fe_one(st, s):
        return fe_step(st, s)

    @jax.jit
    def fe_many(st, s):
        def body(carry, _):
            st, chk = carry
            st, chk = fe_step(st, s + chk)
            return (st, chk), None
        (st, chk), _ = jax.lax.scan(
            body, (st, jnp.float32(0.0)), None, length=K_FE
        )
        return st, chk

    def t_min(f):
        jax.block_until_ready(f(states, samples))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(f(states, samples))
            best = min(best, time.perf_counter() - t0)
        return best

    t1_fe, tk_fe = t_min(fe_one), t_min(fe_many)
    t_front = max((tk_fe - t1_fe) / (K_FE - 1), 1e-9)

    # ---- validation readbacks
    bch_errors = int(stats["bch_errors"])
    frames_bytes = np.asarray(kbytes)[0]  # (F, kbch/8)
    tx2 = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    ref_frames = tx2.bbframes(pkts.reshape(-1))[:F]
    # compare at the BCH-output level (scrambled BBFRAME bytes)
    ber = float(np.mean(np.unpackbits(frames_bytes ^ ref_frames, axis=1)))

    # ---- combined throughput (stages run back-to-back on one chip)
    samples_per_step_front = C * n_out * sps
    samples_per_step_group = C * F * L * sps
    t_per_sample = (
        t_front / samples_per_step_front + t_group_fec / samples_per_step_group
    )
    msamps = 1.0 / t_per_sample / 1e6

    result = {
        "metric": "iq_to_ts_throughput",
        "value": round(msamps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamps / 2.0, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "channels": C,
            "frames_per_step": F,
            "t_frontend_s": round(t_front, 6),
            "t_group_fec_s": round(t_group_fec, 6),
            "dispatch_latency_s": round(t1_gf - t_group_fec, 4),
            "frontend_msps": round(samples_per_step_front / t_front / 1e6, 2),
            "group_fec_msps": round(
                samples_per_step_group / t_group_fec / 1e6, 2
            ),
            "esn0_db": ESN0_DB,
            "ldpc_iters": ldpc_iters,
            "ldpc_impl": "pallas"
            if jax.devices()[0].platform == "tpu" else "xla",
            "post_fec_ber": ber,
            "bch_frame_errors": bch_errors,
            "timing": "fused data-dependent K-chain (see module docstring)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

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

Driver-survivable output (round-2 lesson: one JSON line printed only at
the very end lost everything to a driver timeout): the CCM headline JSON
line is printed+flushed the moment it is measured; each later section
(sustained, ACM) re-prints the full merged record as a NEW line, so the
LAST line on stdout is always the most complete valid result. Sections
run under a wall-clock budget (``BENCH_BUDGET_S`` env, default 1200 s
measured from process start) and are skipped (with a note in the record)
rather than overrunning. ``measure_sustained`` validates its own
integrity: per-step BCH errors, lock state, and delivered-vs-expected TS
bytes; a dead stream yields ``sustained_ok: false`` + an error field, not
a throughput.
"""

import functools
import json
import os
import sys
import time


def _fec_jit(*a, **k):
    from dvbs2rx_tpu.utils.runtime import fec_jit

    return fec_jit(*a, **k)

import numpy as np

K = 33         # chained executions per fused timing dispatch (long chains:
               # per-step times are ~1 ms while tunnel dispatch jitter is
               # several ms, so the chain must dominate the subtraction)
K_FE = 33      # front-end chain length
REPS = 5       # wall-clock repetitions per measured dispatch

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1800"))

# headline keys promoted from detail into the compact stdout record (the
# driver's tail capture holds ~2000 chars; r4's full merged record outgrew
# it and the round lost every number — the full record now lives in
# docs/bench_latest.json, committed by the build loop)
_HEADLINE_KEYS = (
    "frontend_msps", "group_fec_msps", "ldpc_iters", "post_fec_ber",
    "sustained_msps", "sustained_device_msps", "sustained_scan_msps",
    "sustained_ok", "sustained_bch_errors",
    "vcm_sustained_msps", "vcm_step_ms", "vcm_ok", "vcm_frames_ratio",
    "vcm_bch_errors", "vcm_warm_bch_errors",
    "acm_msps_per_stream", "acm_msps_c8", "acm_c8_vs_serial",
    "elapsed_s",
)
_FULL_RECORD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "docs", "bench_latest.json"
)


def budget_left():
    return BUDGET_S - (time.monotonic() - T_START)


def emit(result):
    """Persist the FULL record to docs/bench_latest.json, then print+flush
    a compact headline-only JSON line (always < 2000 chars; the driver
    reads the last stdout line)."""
    try:
        os.makedirs(os.path.dirname(_FULL_RECORD_PATH), exist_ok=True)
        with open(_FULL_RECORD_PATH, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    detail = result.get("detail", {})
    head = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")
            if k in result}
    for k in _HEADLINE_KEYS:
        if k in detail:
            head[k] = detail[k]
    for k, v in detail.items():
        if k.endswith("_error") or k.endswith("_skipped"):
            head[k] = str(v)[:120]
    head["full_record"] = "docs/bench_latest.json"
    line = json.dumps(head)
    if len(line) > 1950:        # hard cap: drop notes, keep numbers
        head = {k: v for k, v in head.items()
                if not isinstance(v, str) or len(v) < 40}
        line = json.dumps(head)[:1950]
    print(line, flush=True)
    sys.stdout.flush()


def _sync(out):
    """Force completion via a device->host READBACK of one small leaf.

    ``jax.block_until_ready`` on this environment's tunneled device can
    return without waiting (it was honest-after-first-readback through
    r4; in r5 it regressed to never-honest and the CCM stage times
    collapsed to ~0). A readback is unconditionally honest.
    """
    import jax

    leaves = jax.tree.leaves(out)
    small = min(leaves, key=lambda x: getattr(x, "size", 1))
    np.asarray(small)
    return out


def chain_time(f1, fK, *args):
    """Per-stage device compute via fused data-dependent chaining."""
    _sync(f1(*args))
    _sync(fK(*args))

    def t(f):
        # min over repetitions: dispatch latency through the tunneled
        # device is long-tailed, and the minimum is the robust estimator
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _sync(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = t(f1), t(fK)
    return max((tk - t1) / (K - 1), 1e-9), t1


def measure_sustained(C=64, F=2, W=40, LAG=4, esn0_db=6.0):
    """Sustained wall-clock IQ->TS throughput through the streaming host
    loop (VERDICT r1 item 3: prove the host can keep the device fed).

    Uses the device-resident ``StreamReceiver`` step: all carry state lives
    on device (donated), so the host submits steps back-to-back and the
    24 ms tunnel dispatch latency pipelines away. The IQ source is a
    periodic waveform staged in HBM once (the host->device tunnel of this
    environment moves 0.05 GB/s — three orders below a real TPU host's
    PCIe — so host-fed IQ is measured separately as ``h2d_msps``). Two
    figures:

    - ``sustained_msps``: steps chained with LAGged readback of every
      decoded BBFRAME batch + native TS stitching of all C channels on the
      host (overlapping device compute), i.e. bytes actually delivered.
    - ``sustained_device_msps``: same loop, outputs consumed on device
      (one final readback) — the pipeline-only sustained rate.
    """
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.stream import StreamReceiver
    from dvbs2rx_tpu.spec.bb_frame import BBFrameParser
    from dvbs2rx_tpu.spec.scramblers import bb_derandomizer_bytes
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal",
                   sym_sync_impl="ffw", fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    n_in = sr.n_in

    # ---- periodic stimulus: T_WRAP steps of frames, cyclically pulse-
    # shaped so the wrap point is seamless (tile symbols x3, keep middle)
    T_WRAP = 2
    txc = TxConfig(modcod="qpsk1/2", frame_size="normal", sps=2,
                   rolloff=cfg.rolloff)
    tx = Transmitter(txc)
    per_frames = T_WRAP * F
    rng = np.random.default_rng(7)
    # ceil + slack: flooring under-filled the period (3 frames of TS for a
    # 4-frame period), leaving a pulse-shaping seam at every wrap that
    # corrupted ~10 symbols of one frame per period — decodable, but it
    # drove that LDPC lane to max trials every other step
    n_pkts = (per_frames * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))[: per_frames * sr.frame_len]
    assert syms.size == per_frames * sr.frame_len, "stimulus under-filled"
    wave3 = tx.pulse_shape(np.tile(syms, 3))
    period = per_frames * sr.frame_len * cfg.sps
    mid = wave3[period: 2 * period]
    esn0 = 10 ** (esn0_db / 10)
    # per-sample sigma includes the sps factor (awgn_channel convention:
    # pulse_shape has DC gain sps -> unit per-sample signal power, so
    # sample SNR = Es/N0 - 10log10(sps)); without it the sustained
    # stimulus ran 3 dB hot of its label
    noise = rng.normal(0, np.sqrt(cfg.sps / esn0 / 2), (period, 2))
    wave = (mid + noise @ np.array([1, 1j])).astype(np.complex64)

    # prime from the (wrapped) head of the stream
    prefix = np.resize(wave, sr._n_fe + 8)[: sr._n_fe]
    state = sr.prime(np.stack([prefix] * C))
    # after prime, the next input sample is index n_fe (mod period)
    off0 = sr._n_fe % period
    src_np = cplx.from_np(
        np.stack([
            np.resize(np.roll(wave, -off0), (T_WRAP * n_in,))[
                t * n_in: (t + 1) * n_in
            ]
            for t in range(T_WRAP)
        ])
    ).astype(np.float32)
    src = jax.device_put(jnp.asarray(src_np))          # (T_WRAP, n_in, 2)

    @_fec_jit
    def step_i(state, i):
        blk = jax.lax.dynamic_index_in_dim(
            src, i % T_WRAP, keepdims=False
        )
        iq = jnp.broadcast_to(blk[None], (C, n_in, 2))
        return sr.raw_step(state, iq)

    # warmup + honest-blocking readback
    for w in range(2):
        state, kb, stats = step_i(state, jnp.int32(w))
    errs0 = int(stats["bch_errors"])
    kb0 = np.asarray(kb)

    scr = bb_derandomizer_bytes(cfg.fec.kbch // 8)
    from dvbs2rx_tpu.spec.bb_frame import BatchTSStitcher

    stitcher = BatchTSStitcher(C)
    parsers = [BBFrameParser(cfg.fec.kbch) for _ in range(C)]

    def stitch(kb_np, ok_np=None, hdr_np=None):
        # flagged: ONE descramble XOR + ONE native whole-step call (the
        # product StreamEngine path); flag-less: the per-frame native
        # CRC-computing loop (the r3 baseline being compared against)
        if ok_np is not None:
            return sum(
                t.size
                for t in stitcher.push_step(kb_np ^ scr[None, None],
                                            ok_np, hdr_np)
            )
        n = 0
        for c in range(C):
            for f in range(F):
                n += parsers[c].push(kb_np[c, f] ^ scr).size
        return n

    kb0_np = np.asarray(kb0)
    ok0_np = np.asarray(stats["ts_ok"])
    hdr0_np = np.asarray(stats["hdr_ok"])
    stitch(kb0_np, ok0_np, hdr0_np)
    # host stitch cost: device-flagged vectorized path vs the native
    # CRC-computing loop (VERDICT r3 item 6 done-criterion: >= 3x cut)
    t0 = time.perf_counter()
    for _ in range(3):
        stitch(kb0_np, ok0_np, hdr0_np)
    t_stitch_flag = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        stitch(kb0_np)
    t_stitch_native = (time.perf_counter() - t0) / 3

    # ---- policy A: chained steps + ASYNC readback thread + TS stitch
    # (VERDICT r3 item 5: the d2h fetch must not serialize with the step
    # feed; a reader thread overlaps it, so the loop is bounded by
    # max(compute, d2h) rather than their sum). Integrity accounting
    # (round-2 lesson): EVERY step's stats are retained as device scalars
    # and accumulated after timing, so a dead stream produces an error
    # count, never a throughput.
    import queue as _queue
    import threading

    fetchq = _queue.Queue(maxsize=2 * LAG)
    ts_acc = [0]
    reader_err = []

    def reader():
        while True:
            kb = fetchq.get()
            if kb is None:
                fetchq.task_done()
                return
            try:
                kb_d, ok_d, hdr_d = kb
                ts_acc[0] += stitch(np.asarray(kb_d), np.asarray(ok_d),
                                    np.asarray(hdr_d))
            except BaseException as e:
                reader_err.append(e)
            finally:
                fetchq.task_done()

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    all_stats = []
    t0 = time.perf_counter()
    for i in range(W):
        state, kb, stats = step_i(state, jnp.int32(2 + i))
        fetchq.put((kb, stats["ts_ok"], stats["hdr_ok"]))
        all_stats.append(stats)
    fetchq.join()                        # every TS byte delivered
    t_a = time.perf_counter() - t0
    fetchq.put(None)
    if reader_err:
        raise reader_err[0]
    ts_bytes = ts_acc[0]

    # ---- policy B: device-only consumption ----
    t0 = time.perf_counter()
    for i in range(W):
        state, kb, stats = step_i(state, jnp.int32(2 + W + i))
        all_stats.append(stats)
    errs = int(stats["bch_errors"])          # forces the chain
    t_b = time.perf_counter() - t0

    # ---- policy C: T_SCAN steps per dispatch (lax.scan over the step;
    # amortizes this environment's ~24 ms/dispatch tunnel cost, which
    # otherwise bounds the loop at step_samples / dispatch_latency) ----
    T_SCAN = 8

    @functools.partial(_fec_jit, donate_argnums=0)
    def scan_steps(state, i0):
        def body(st, i):
            blk = jax.lax.dynamic_index_in_dim(
                src, (i0 + i) % T_WRAP, keepdims=False
            )
            iq = jnp.broadcast_to(blk[None], (C, n_in, 2))
            st, kb, stats = sr.raw_step(st, iq)
            return st, {"bch_errors": stats["bch_errors"],
                        "locked": stats["locked"]}
        state, sstats = jax.lax.scan(
            body, state, jnp.arange(T_SCAN, dtype=jnp.int32)
        )
        return state, sstats

    state, sstats = scan_steps(state, jnp.int32(0))     # compile + warm
    jax.block_until_ready(sstats)
    scan_stats = []
    t0 = time.perf_counter()
    for d in range(W // T_SCAN):
        state, sstats = scan_steps(state, jnp.int32(2 + d * T_SCAN))
        scan_stats.append(sstats)
    errs_c = int(jnp.sum(scan_stats[-1]["bch_errors"]))  # forces the chain
    t_c = time.perf_counter() - t0
    errs_c = sum(int(np.asarray(s["bch_errors"]).sum()) for s in scan_stats)
    locked_c = bool(np.asarray(scan_stats[-1]["locked"][-1]).all())

    # ---- integrity: per-step errors, lock state, delivered TS bytes ----
    err_steps = [int(st["bch_errors"]) for st in all_stats]
    total_errs = errs0 + sum(err_steps)
    locked_end = bool(np.all(np.asarray(all_stats[-1]["locked"])))
    expected_ts = W * C * F * tx.df_bytes    # policy A's decoded payload
    ts_ratio = ts_bytes / max(expected_ts, 1)
    ok = (total_errs == 0 and errs_c == 0 and locked_end and locked_c
          and 0.95 <= ts_ratio <= 1.05)
    integrity = {
        "sustained_ok": bool(ok),
        "sustained_bch_error_steps": int(np.count_nonzero(err_steps)),
        "sustained_locked_end": locked_end,
        "sustained_ts_expected": int(expected_ts),
        "sustained_ts_ratio": round(ts_ratio, 4),
    }
    if not ok:
        integrity["sustained_error"] = (
            f"stream integrity FAILED: errors={total_errs} "
            f"locked_end={locked_end} ts_ratio={ts_ratio:.3f}"
        )

    # ---- host->device feed ceiling of THIS environment's tunnel ----
    blk_np = np.asarray(src_np[0])
    jax.block_until_ready(jax.device_put(blk_np))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(blk_np))
    t_h2d = (time.perf_counter() - t0) / 3

    samples = W * C * n_in
    samples_c = (W // T_SCAN) * T_SCAN * C * n_in
    return {
        "sustained_msps": round(samples / t_a / 1e6, 1),
        "stitch_ms_flagged": round(t_stitch_flag * 1e3, 2),
        "stitch_ms_host_crc": round(t_stitch_native * 1e3, 2),
        "sustained_device_msps": round(samples / t_b / 1e6, 1),
        "sustained_scan_msps": round(samples_c / t_c / 1e6, 1),
        "sustained_scan_bch_errors": errs_c,
        "sustained_scan_locked": locked_c,
        "sustained_steps": W,
        "sustained_ts_bytes": int(ts_bytes),
        "sustained_bch_errors": total_errs,
        **integrity,
        "h2d_msps_per_channel": round(n_in / t_h2d / 1e6, 2),
        "sustained_note": (
            "device-staged periodic IQ source; h2d_msps_per_channel is the "
            "tunnel feed ceiling of this environment (0.05 GB/s), not a "
            "property of the receiver. sustained_device_msps = per-step "
            "dispatches pipelined back-to-back (bounded by step compute "
            "once dispatch overlaps); sustained_scan_msps = T_SCAN steps "
            "per dispatch; sustained_msps additionally reads back + "
            "stitches every TS byte on the host via an ASYNC reader "
            "thread (r3 item 5), so it is bounded by max(step compute, "
            "d2h) — on this tunnel (~0.05 GB/s) the d2h leg is that "
            "bound, not the receiver (the native stitch itself measures "
            "2.6 ms/step)"
        ),
    }


def measure_vcm(C=64, F=2, W=40, esn0_db=13.0):
    """Sustained device-side throughput of the device-resident VCM stream
    engine on a 2-PLS variable-MODCOD stream (VERDICT r3 item 1 done
    criterion: qpsk1/2 + 8psk3/5 normal FECFRAMEs, >= 40 integrity-checked
    steps, target >= 0.5x the CCM sustained per-sample rate).

    Methodology mirrors ``measure_sustained``: periodic stimulus staged in
    HBM (sliced with wraparound from a doubled buffer), steps chained
    back-to-back through the donated state, EVERY step's stats retained and
    audited after timing (errors / lock / walked-frame accounting), one
    readback at the end. Integrity additionally checks the decoded BBFRAME
    count against the frames the stimulus carries.
    """
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.vcm_stream import VCMStreamReceiver
    from dvbs2rx_tpu.spec.pls import make_pls
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.tx import TxConfig
    from dvbs2rx_tpu.tx.transmitter import awgn_channel
    from dvbs2rx_tpu.tx.vcm import VCMTransmitter

    # PILOTED normal frames: DVB-S2 ACM/VCM deployments run pilots on,
    # and pilotless normal FECFRAMEs are physically incompatible with a
    # closed-loop CFO residual above 1/(2L) ~ 1.5e-5 (the pilotless fine
    # estimator aliases; the r5 limit-cycle study in
    # tools/probes/vcm_hw_diag.py). The pilot-mode fine range (3.39e-4)
    # covers the front end's coarse-estimator bias with 20x margin.
    pls_a = make_pls(4, False, True)     # qpsk1/2 normal, pilots
    pls_b = make_pls(12, False, True)    # 8psk3/5 normal, pilots (MODCOD 12)
    from dvbs2rx_tpu.spec.pls import parse_pls
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   pls_expected=(pls_a, pls_b))
    sr = VCMStreamReceiver(cfg, n_channels=C, frames_per_step=F)
    n_in = sr.n_in

    # ---- periodic 2-PLS stimulus (whole alternating frame pairs) ----
    vtx = VCMTransmitter([
        TxConfig(modcod="qpsk1/2", frame_size="normal", pilots=True),
        TxConfig(modcod="8psk3/5", frame_size="normal", pilots=True),
    ])
    pair_syms = parse_pls(pls_a).plframe_len + parse_pls(pls_b).plframe_len
    n_pairs = max(2, -(-sr._n_fe // (pair_syms * cfg.sps)) + 1)
    rng = np.random.default_rng(11)
    df_bytes = (vtx.txs[0].df_bytes + vtx.txs[1].df_bytes)
    n_pkts = (n_pairs * df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = vtx.modulate_ts(pkts.reshape(-1), [0, 1])[: n_pairs * pair_syms]
    assert syms.size == n_pairs * pair_syms, "stimulus under-filled"
    # cyclic pulse shaping: tile x3, keep the middle period
    wave3 = vtx.txs[0].pulse_shape(np.tile(syms, 3))
    period = n_pairs * pair_syms * cfg.sps
    mid = wave3[period: 2 * period]
    esn0 = 10 ** (esn0_db / 10)
    noise = rng.normal(0, np.sqrt(cfg.sps / esn0 / 2), (period, 2))
    wave = (mid + noise @ np.array([1, 1j])).astype(np.complex64)

    prefix = np.resize(wave, sr._n_fe + 8)[: sr._n_fe]
    state = sr.prime(np.stack([prefix] * C))
    assert sr.prime_ok.all(), "VCM bench prime failed"
    off0 = sr._n_fe % period
    # doubled buffer for wraparound slicing
    src2 = jax.device_put(jnp.asarray(
        cplx.from_np(np.concatenate([wave, wave[:n_in]])).astype(np.float32)
    ))

    @jax.jit
    def get_blk(i):
        off = (off0 + i * n_in) % period
        blk = jax.lax.dynamic_slice(src2, (off, 0), (n_in, 2))
        return jnp.broadcast_to(blk[None], (C, n_in, 2))

    def step_i(state, i):
        # sr.step = two pipelined dispatches (walk + FEC drains; split so
        # each program fits the tunnel's compile upload limit)
        return sr.step(state, get_blk(i))

    for w in range(2):
        state, outputs, stats = step_i(state, jnp.int32(w))
    frames_warm = int(stats["frames"])  # honest-blocking readback
    # per-lane audit of the warm-up drains (same math as the timed loop)
    nc_w = np.asarray(outputs["n_corr"])           # (S, DRAIN, B_fec)
    fired_w = np.asarray(outputs["fired"]).astype(bool)
    errs_warm = int((nc_w[fired_w] < 0).sum())

    all_stats, all_out = [], []
    t0 = time.perf_counter()
    for i in range(W):
        state, outputs, stats = step_i(state, jnp.int32(2 + i))
        all_stats.append(stats)
        all_out.append(outputs)
    _ = int(all_stats[-1]["frames"])     # forces the chain
    t_dev = time.perf_counter() - t0

    # ---- integrity audit over EVERY step ----
    frames = sum(int(st["frames"]) for st in all_stats)
    dummies = sum(int(st["dummies"]) for st in all_stats)
    rejected = sum(int(st["rejected"]) for st in all_stats)
    locked_end = bool(np.all(np.asarray(all_stats[-1]["locked"])))
    errs = 0
    decoded = 0
    for out in all_out:
        fired = np.asarray(out["fired"])
        nc = np.asarray(out["n_corr"])
        for si in range(sr.S):
            for d in range(sr.DRAIN):
                if fired[si, d]:
                    decoded += nc.shape[-1]
                    errs += int(np.sum(nc[si, d] < 0))
    # frames the stimulus carries over the timed window (both PLS)
    expected_frames = W * C * sr.n_out / (pair_syms / 2)
    frames_ratio = frames / expected_frames
    ok = (errs == 0 and locked_end and rejected == 0
          and 0.9 <= frames_ratio <= 1.05)

    samples = W * C * n_in
    msps = samples / t_dev / 1e6
    return {
        "vcm_sustained_msps": round(msps, 1),
        "vcm_step_ms": round(t_dev / W * 1e3, 2),
        "vcm_steps": W,
        "vcm_channels": C,
        "vcm_frames": frames,
        "vcm_frames_ratio": round(frames_ratio, 4),
        "vcm_frames_decoded": decoded,
        "vcm_dummies": dummies,
        "vcm_bch_errors": errs,
        "vcm_warm_bch_errors": errs_warm,
        "vcm_warm_frames": frames_warm,
        "vcm_locked_end": locked_end,
        "vcm_ok": bool(ok),
        "vcm_note": (
            "device-resident VCM stream engine (rx/vcm_stream.py), 2-PLS "
            "qpsk1/2+8psk3/5 normal alternating, device-staged periodic "
            "IQ, steps chained via donated state; compare "
            "vcm_sustained_msps against sustained_device_msps (CCM) for "
            "the VERDICT r3 item-1 >=0.5x criterion"
        ),
    }


def measure_acm(esn0_db=6.0):
    """ACM steady-state device compute (VERDICT r1 item 1).

    Measures the windowed ACM pipeline's per-stage device compute with the
    same fused K-chain methodology as the CCM figure, on a single-MODCOD
    QPSK 1/2 normal stream. Steady-state dispatch pattern per group-sized
    window (frame_group frames): dense timing metric + batched window PLSC
    decode + one per-PLS frame-group program + per-PLS FEC batch.
    ``acm_msps`` is per STREAM (the ACM host pipeline is single-channel;
    compare against the CCM per-channel figure = value/64).
    """
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.rx.receiver import ACMReceiver, RxConfig
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.tx import Transmitter, TxConfig

    F0 = 4
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   fec_batch=F0, frame_group=F0)
    rx = ACMReceiver(cfg)
    W = rx._win_len
    L = cfg.pls_info.plframe_len
    Lp = cfg.pls_info.payload_len
    sps = cfg.sps

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="normal"))
    rng = np.random.default_rng(3)
    n_pkts = ((F0 + 3) * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))
    esn0 = 10 ** (esn0_db / 10)
    noisy = (
        syms + rng.normal(0, np.sqrt(1 / esn0 / 2), (syms.size, 2))
        @ np.array([1, 1j])
    ).astype(np.complex64)
    win = np.resize(noisy, W)
    dev = jax.device_put(jnp.asarray(cplx.from_np(win)))

    K = 17

    def chain(f_one, *args):
        @_fec_jit
        def many(*a):
            def body(eps, _):
                out = f_one(a[0] + eps, *a[1:])
                # FULL reduction over EVERY leaf: a carry that reads only
                # one output lets XLA dead-code-eliminate the rest of the
                # stage (measured: the group stage's demap vanished and
                # the stage timed ~0)
                tot = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(out)
                )
                return (tot % 2) * 1e-12, None
            eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return eps
        one = _fec_jit(lambda *a: f_one(*a))
        return chain_time_k(one, many, K, *args)

    def chain_time_k(f1, fk, k, *args):
        _sync(f1(*args))
        _sync(fk(*args))

        def t(f):
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                _sync(f(*args))
                best = min(best, time.perf_counter() - t0)
            return best
        return max((t(fk) - t(f1)) / (k - 1), 1e-9)

    # stage A: dense SOF/PLSC timing metric over the window
    t_metric = chain(rx._acq_impl, dev)

    # stage B: batched window PLSC decode (C candidates)
    C = W // 3330 + 3
    sofs = jnp.asarray(
        np.arange(C, dtype=np.int32) % max(W - 90, 1)
    )
    t_plsc = chain(
        lambda d, s: rx._win_plsc_impl(d, s, jnp.float32(0.0),
                                       jnp.asarray(False)),
        dev, sofs,
    )

    # stage C: per-PLS frame group (F0 frames + next header)
    pls = cfg.pls
    hidx = np.arange(F0 + 1)[:, None] * L + np.arange(90)[None, :]
    headers = jnp.asarray(cplx.from_np(win[hidx]))
    pidx = 90 + np.arange(F0)[:, None] * L + np.arange(Lp)[None, :]
    payloads = jnp.asarray(cplx.from_np(win[pidx]))
    gfn = rx._acm_group(pls)
    t_group = chain(
        lambda h, p: gfn(h, jnp.int32(pls), p, jnp.asarray(True),
                         jnp.float32(0.0)),
        headers, payloads,
    )

    # stage D: per-PLS lane-major FEC (the product path: ACMReceiver
    # uploads the LLR queue lane-major, frames on the minor axis). Chain
    # perturbation via int xor-like carry — +eps on a FLOAT carry is
    # unsafe for int8 LLRs.
    out = gfn(headers, jnp.int32(pls), payloads, jnp.asarray(True),
              jnp.float32(0.0))
    llrsT = jnp.asarray(np.ascontiguousarray(np.asarray(out["llrs"]).T))
    fec_lane = rx._acm_fec_impl(pls)

    def fec_chain(width_llrsT):
        @_fec_jit
        def many(lt):
            def body(eps, _):
                kb, n_corr, iters, hard_t = fec_lane(
                    (lt + eps).astype(jnp.int8)
                )
                return (jnp.sum(n_corr) % 2).astype(jnp.int8), None
            eps, _ = jax.lax.scan(body, jnp.int8(0), None, length=K)
            return eps
        return chain_time_k(_fec_jit(fec_lane), many, K, width_llrsT)

    t_fec = fec_chain(llrsT)

    t_window = t_metric + t_plsc + t_group + t_fec
    samples = F0 * L * sps
    acm_msps = samples / t_window / 1e6
    n_corr = np.asarray(fec_lane(llrsT)[1])

    # ---- channel-batched ACM stages (BatchedACMReceiver's dispatch
    # shapes): metric/PLSC/group vmap over C=8 channels; the FEC stage
    # POOLS the channels' same-PLS frames into ONE lane-major decode
    # (N, C*F0) — the reference's SIMD-lane trick applied across channels
    # (ldpc_decoder_bb_impl.cc:309-352), bit-identical per frame thanks
    # to per-lane convergence freezing (VERDICT r3 item 2) ----
    CB = 8

    def rep(x):
        return jnp.broadcast_to(x[None], (CB,) + x.shape)

    t_metric8 = chain(jax.vmap(rx._acq_impl), rep(dev))
    t_plsc8 = chain(
        jax.vmap(lambda d, s: rx._win_plsc_impl(
            d, s, jnp.float32(0.0), jnp.asarray(False))),
        rep(dev), rep(sofs),
    )
    gimpl = rx._acm_group_impl(pls)
    t_group8 = chain(
        jax.vmap(lambda h, p: gimpl(h, jnp.int32(pls), p,
                                    jnp.asarray(True), jnp.float32(0.0))),
        rep(headers), rep(payloads),
    )
    llrsT8 = jnp.tile(llrsT, (1, CB))              # (N, CB*F0) pooled lanes
    t_fec8 = fec_chain(llrsT8)
    t_window8 = t_metric8 + t_plsc8 + t_group8 + t_fec8
    acm_msps8 = CB * samples / t_window8 / 1e6

    # pooled 128-lane decode: the fec_batch=16 x 8-channel operating point
    # whose lane count hits the Pallas kernel on hardware (decode_lane_major
    # falls back to XLA below 128 lanes); amortized over 4 windows/flush
    llrsT128 = jnp.tile(llrsT, (1, 32))
    t_fec128 = fec_chain(llrsT128)

    return {
        "acm_msps_per_stream": round(acm_msps, 1),
        "acm_t_metric_s": round(t_metric, 6),
        "acm_t_plsc_s": round(t_plsc, 6),
        "acm_t_group_s": round(t_group, 6),
        "acm_t_fec_s": round(t_fec, 6),
        "acm_window_syms": W,
        "acm_bch_errors": int(np.sum(n_corr < 0)),
        "acm_msps_c8": round(acm_msps8, 1),
        "acm_c8_vs_serial": round(acm_msps8 / max(acm_msps, 1e-9), 2),
        "acm_t_c8_s": round(t_window8, 6),
        "acm_t_metric8_s": round(t_metric8, 6),
        "acm_t_plsc8_s": round(t_plsc8, 6),
        "acm_t_group8_s": round(t_group8, 6),
        "acm_t_fec8_pooled_s": round(t_fec8, 6),
        "acm_t_fec128_pooled_s": round(t_fec128, 6),
        "acm_note": (
            "single-stream windowed ACM pipeline (group-sized window); "
            "acm_msps_c8 = metric/PLSC/group channel-batched x8 + the "
            "channels' same-PLS frames POOLED into one lane-major FEC "
            "decode (N, 32) — the product BatchedACMReceiver dispatch "
            "shapes after VERDICT r3 item 2. acm_t_fec128_pooled_s is "
            "the 128-lane pooled decode (fec_batch=16 operating point, "
            "Pallas kernel); per-window amortized it costs a quarter of "
            "that figure"
        ),
    }


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

    @_fec_jit
    def gf_many(h, p, flag):
        def body(eps, _):
            kb = pipe.step(h + eps, p, flag)[0]
            eps = (jnp.sum(kb[0, 0, :2]) % 2).astype(jnp.float32) * 1e-12
            return eps, kb[0, 0, 0]
        eps, last = jax.lax.scan(
            body, jnp.float32(0.0), None, length=K
        )
        return eps, last

    t_group_fec, t1_gf = chain_time(_fec_jit(gf_one), gf_many, h, p, flag)
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
        _sync(f(states, samples))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _sync(f(states, samples))
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
            "mf_precision": cfg.mf_precision,
            "post_fec_ber": ber,
            "bch_frame_errors": bch_errors,
            "timing": "fused data-dependent K-chain (see module docstring)",
            "elapsed_s": round(time.monotonic() - T_START, 1),
        },
    }
    # CCM headline is on the record the moment it exists (driver-timeout
    # safe); later sections re-emit the merged record as new lines
    emit(result)

    # release the CCM section's device arrays + compiled-step references
    # before the stream sections: the VCM step measured ~1.4x slower
    # in-process than standalone (452 -> 314 Msps) with these alive
    import gc

    del pipe, h, p, states, samples, kbytes, stats
    gc.collect()

    # vcm first: it is the r5 gate (hardware-verified VCM perf) and also
    # the costliest section to compile — it must not inherit a spent
    # budget from the others
    for name, fn, min_budget in (
        ("vcm", measure_vcm, 300),
        ("acm", measure_acm, 180),
        ("sustained", measure_sustained, 240),
    ):
        if budget_left() < min_budget:
            result["detail"][f"{name}_skipped"] = (
                f"wall-clock budget exhausted ({budget_left():.0f} s left "
                f"< {min_budget} s section minimum)"
            )
        else:
            try:
                result["detail"].update(fn())
            except Exception as e:  # a failed section must not lose the rest
                result["detail"][f"{name}_error"] = f"{type(e).__name__}: {e}"
        result["detail"]["elapsed_s"] = round(time.monotonic() - T_START, 1)
        emit(result)


if __name__ == "__main__":
    main()

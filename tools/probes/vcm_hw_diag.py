"""Diagnose the r5 hardware VCM integrity failure (4416/6144 BCH-bad at
bench shape while the identical config is clean on CPU).

Runs the exact measure_vcm stimulus at C=64 for a few steps, printing
per-(si, drain) bad-lane counts, per-PLS iteration counts, and the
refined-N0 carry. --zero-n0 overrides the refined-N0 carry to 0 (data-
aided scaling) from the host between steps to isolate the post-decoder
SNR-refinement feedback.

Usage: python tools/probes/vcm_hw_diag.py [--steps 6] [--zero-n0]
"""

import argparse
import sys

sys.path.insert(0, ".")

from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from dvbs2rx_tpu.rx.receiver import RxConfig
from dvbs2rx_tpu.rx.vcm_stream import VCMStreamReceiver
from dvbs2rx_tpu.spec.pls import make_pls
from dvbs2rx_tpu.ops import cplx
from dvbs2rx_tpu.tx import TxConfig
from dvbs2rx_tpu.tx.vcm import VCMTransmitter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--lanes", type=int, default=None)
    ap.add_argument("--zero-n0", action="store_true")
    ap.add_argument("--bench-mode", action="store_true",
                    help="defer ALL readback to the end (async chained "
                         "steps via donated state, like measure_vcm)")
    ap.add_argument("--single-pls", action="store_true",
                    help="qpsk1/2-normal-only stream (bias isolation)")
    ap.add_argument("--pilots", action="store_true",
                    help="piloted PLS (the bench operating point)")
    args = ap.parse_args()

    C, F, esn0_db = args.channels, 2, 13.0
    from dvbs2rx_tpu.spec.pls import parse_pls
    pls_a = make_pls(4, False, args.pilots)
    pls_b = make_pls(12, False, args.pilots)
    expected = (pls_a,) if args.single_pls else (pls_a, pls_b)
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   pls_expected=expected)
    sr = VCMStreamReceiver(cfg, n_channels=C, frames_per_step=F,
                           fec_lanes=args.lanes)
    n_in = sr.n_in

    txcs = [TxConfig(modcod="qpsk1/2", frame_size="normal",
                     pilots=args.pilots)]
    if not args.single_pls:
        txcs.append(TxConfig(modcod="8psk3/5", frame_size="normal",
                             pilots=args.pilots))
    vtx = VCMTransmitter(txcs)
    La = parse_pls(pls_a).plframe_len
    pair_syms = La + (parse_pls(pls_b).plframe_len
                      if not args.single_pls else La)
    n_pairs = max(2, -(-sr._n_fe // (pair_syms * cfg.sps)) + 1)
    rng = np.random.default_rng(11)
    df_bytes = sum(tx.df_bytes for tx in vtx.txs) * (
        2 if args.single_pls else 1
    )
    n_pkts = (n_pairs * df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    sched = [0] if args.single_pls else [0, 1]
    syms = vtx.modulate_ts(pkts.reshape(-1), sched)[: n_pairs * pair_syms]
    wave3 = vtx.txs[0].pulse_shape(np.tile(syms, 3))
    period = n_pairs * pair_syms * cfg.sps
    mid = wave3[period: 2 * period]
    esn0 = 10 ** (esn0_db / 10)
    noise = rng.normal(0, np.sqrt(cfg.sps / esn0 / 2), (period, 2))
    wave = (mid + noise @ np.array([1, 1j])).astype(np.complex64)

    prefix = np.resize(wave, sr._n_fe + 8)[: sr._n_fe]
    state = sr.prime(np.stack([prefix] * C))
    assert sr.prime_ok.all()
    off0 = sr._n_fe % period
    src2 = jax.device_put(jnp.asarray(
        cplx.from_np(np.concatenate([wave, wave[:n_in]])).astype(np.float32)
    ))

    @jax.jit
    def get_blk(i):
        off = (off0 + i * n_in) % period
        blk = jax.lax.dynamic_slice(src2, (off, 0), (n_in, 2))
        return jnp.broadcast_to(blk[None], (C, n_in, 2))

    zero_n0 = jnp.zeros((C, sr.S), jnp.float32)
    if args.bench_mode:
        all_out, all_stats = [], []
        for i in range(args.steps):
            state, outputs, stats = sr.step(state, get_blk(jnp.int32(i)))
            all_out.append(outputs)
            all_stats.append(stats)
        for i, (outputs, stats) in enumerate(zip(all_out, all_stats)):
            fired = np.asarray(outputs["fired"])
            nc = np.asarray(outputs["n_corr"])
            msg = [
                f"si{si}d{d}:bad={int((nc[si, d] < 0).sum())}/{nc.shape[-1]}"
                for si in range(sr.S) for d in range(sr.DRAIN)
                if fired[si, d]
            ]
            print(f"step{i}: frames={int(stats['frames'])} "
                  f"{' '.join(msg)}", flush=True)
        return
    for i in range(args.steps):
        if args.zero_n0:
            state = dict(state, n0_refined=zero_n0)
        state, outputs, stats = sr.step(state, get_blk(jnp.int32(i)))
        fired = np.asarray(outputs["fired"])
        nc = np.asarray(outputs["n_corr"])
        it = [int(np.asarray(x)) for x in stats["ldpc_iters"]]
        msg = []
        for si in range(sr.S):
            for d in range(sr.DRAIN):
                if fired[si, d]:
                    bad = int((nc[si, d] < 0).sum())
                    msg.append(f"si{si}d{d}:bad={bad}/{nc.shape[-1]}")
        n0r = np.asarray(stats["n0_refined"])
        n0s = " ".join(
            f"s{si}:[{n0r[:, si].min():.4f},{n0r[:, si].max():.4f}]"
            for si in range(sr.S)
        )
        st0 = {k: np.asarray(v)[0] for k, v in state.items()
               if k in ("ff_tau", "ff_rate", "rot_inc", "rot_phase",
                        "sfill", "symfill", "fp_right", "agc_gain")}
        print(f"step{i}: frames={int(stats['frames'])} iters={it} "
              f"{' '.join(msg)} n0r {n0s} "
              f"n0da={float(np.asarray(stats['n0'])[0]):.4f} "
              f"fine={float(np.asarray(stats['fine_foffset'])[0]):.2e} "
              f"cum={float(np.asarray(stats['cum_foffset'])[0]):.2e} "
              f"met={float(np.asarray(stats['metric'])[0]):.1f} "
              f"tau={st0['ff_tau']:.4f} rate={st0['ff_rate']:.6f} "
              f"rinc={st0['rot_inc']:.2e} sfill={st0['sfill']} "
              f"symfill={st0['symfill']} fpr={st0['fp_right']} "
              f"agc={st0['agc_gain']:.4f}", flush=True)


if __name__ == "__main__":
    main()

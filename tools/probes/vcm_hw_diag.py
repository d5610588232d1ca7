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
    args = ap.parse_args()

    C, F, esn0_db = args.channels, 2, 13.0
    pls_a = make_pls(4, False, False)
    pls_b = make_pls(12, False, False)
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   pls_expected=(pls_a, pls_b))
    sr = VCMStreamReceiver(cfg, n_channels=C, frames_per_step=F,
                           fec_lanes=args.lanes)
    n_in = sr.n_in

    vtx = VCMTransmitter([
        TxConfig(modcod="qpsk1/2", frame_size="normal"),
        TxConfig(modcod="8psk3/5", frame_size="normal"),
    ])
    pair_syms = 32490 + 21690
    n_pairs = max(2, -(-sr._n_fe // (pair_syms * cfg.sps)) + 1)
    rng = np.random.default_rng(11)
    df_bytes = (vtx.txs[0].df_bytes + vtx.txs[1].df_bytes)
    n_pkts = (n_pairs * df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = vtx.modulate_ts(pkts.reshape(-1), [0, 1])[: n_pairs * pair_syms]
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
        print(f"step{i}: frames={int(stats['frames'])} iters={it} "
              f"{' '.join(msg)} n0r {n0s} "
              f"n0da={np.asarray(stats['n0'])[:2]}", flush=True)


if __name__ == "__main__":
    main()

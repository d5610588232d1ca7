"""Measure the 1+S program-split overhead of the VCM step (VERDICT r4
item 6): the step is one step_a program (front end + walk + demap) plus S
per-PLS step_b programs (queue + pooled FEC). The r4 snapshot claimed the
extra dispatches "pipeline away" — this probe produces the number.

Method: on the bench stimulus, time W chained steps three ways:
  a-only   : step_a alone (fresh state each; donation-safe via re-prime)
  a+1b     : step_a + step_b[0]
  full     : step_a + both step_b
Per-program incremental cost and the dispatch overhead (vs the sum of
parts) fall out of the differences. Writes docs/vcm_split_overhead.json.

Usage: python tools/probes/vcm_split_overhead.py [--steps 30]
"""

import argparse
import json
import sys
import time

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


def build(C=64, F=2, esn0_db=13.0, lanes=None, pilots=True):
    from dvbs2rx_tpu.spec.pls import parse_pls

    pls_a = make_pls(4, False, pilots)
    pls_b = make_pls(12, False, pilots)
    cfg = RxConfig(
        modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
        pls_expected=(pls_a, pls_b),
    )
    sr = VCMStreamReceiver(cfg, n_channels=C, frames_per_step=F,
                           fec_lanes=lanes)
    vtx = VCMTransmitter([
        TxConfig(modcod="qpsk1/2", frame_size="normal", pilots=pilots),
        TxConfig(modcod="8psk3/5", frame_size="normal", pilots=pilots),
    ])
    pair_syms = parse_pls(pls_a).plframe_len + parse_pls(pls_b).plframe_len
    n_pairs = max(2, -(-sr._n_fe // (pair_syms * cfg.sps)) + 1)
    rng = np.random.default_rng(11)
    df_bytes = sum(tx.df_bytes for tx in vtx.txs)
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
    src2 = jax.device_put(jnp.asarray(
        cplx.from_np(np.concatenate([wave, wave[: sr.n_in]]))
        .astype(np.float32)
    ))
    off0 = sr._n_fe % period

    @jax.jit
    def get_blk(i):
        off = (off0 + i * sr.n_in) % period
        blk = jax.lax.dynamic_slice(src2, (off, 0), (sr.n_in, 2))
        return jnp.broadcast_to(blk[None], (C, sr.n_in, 2))

    prefix = np.resize(wave, sr._n_fe + 8)[: sr._n_fe]
    prime_iq = np.stack([prefix] * C)
    return sr, get_blk, prime_iq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    W = args.steps

    sr, get_blk, prime_iq = build()
    S = sr.S

    def timed(n_b):
        state = sr.prime(prime_iq)
        B = sr.B_lanes
        # warm (forces every program's compile + honest blocking)
        for w in range(2):
            state, llr8, xf8, meta, sels, stats = sr._step_a(
                state, get_blk(jnp.int32(w))
            )
            for fn in sr._step_b[:n_b]:
                state, o, sb = fn(state, llr8, xf8, meta, sels)
        _ = int(np.asarray(stats["frames"]))
        t0 = time.perf_counter()
        for i in range(W):
            state, llr8, xf8, meta, sels, stats = sr._step_a(
                state, get_blk(jnp.int32(2 + i))
            )
            for fn in sr._step_b[:n_b]:
                state, o, sb = fn(state, llr8, xf8, meta, sels)
        _ = int(np.asarray(stats["frames"]))        # forces the chain
        if n_b:
            _ = np.asarray(o["fired"])
        return (time.perf_counter() - t0) / W

    t_a = timed(0)
    t_a1 = timed(1)
    t_full = timed(S)
    rec = {
        "step_a_ms": round(t_a * 1e3, 2),
        "a_plus_1b_ms": round(t_a1 * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "per_step_b_ms": round((t_full - t_a) / S * 1e3, 2),
        "split_overhead_note": (
            "full - (a + S*(a1-a)) is the pipelining residue of the extra "
            "dispatch: "
            f"{round((t_full - (t_a + S * (t_a1 - t_a))) * 1e3, 2)} ms"
        ),
        "steps": W,
        "S": S,
    }
    print(json.dumps(rec), flush=True)
    with open("docs/vcm_split_overhead.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()

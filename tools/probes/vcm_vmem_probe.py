"""Reproduce + fix the r4 scoped-VMEM OOM: AOT-compile the VCM step_b
program at BENCH shape (C=64, 2-PLS normal, fec_lanes=128) on the real TPU.

BENCH_r04.json: "Ran out of memory in memory space vmem ... Scoped
allocation with size 124.88M and limit 115.82M" at the Pallas LDPC
pallas_call inside cond-in-scan (rx/vcm_stream.py:866).

Usage: python tools/probes/vcm_vmem_probe.py [--lanes 128] [--a]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dvbs2rx_tpu.rx.receiver import RxConfig
from dvbs2rx_tpu.rx.vcm_stream import VCMStreamReceiver
from dvbs2rx_tpu.spec.pls import make_pls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--a", action="store_true", help="also compile step_a")
    ap.add_argument("--si", type=int, default=None,
                    help="only compile step_b[si]")
    args = ap.parse_args()

    pls_a = make_pls(4, False, False)    # qpsk1/2 normal
    pls_b = make_pls(12, False, False)   # 8psk3/5 normal
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   pls_expected=(pls_a, pls_b))
    sr = VCMStreamReceiver(cfg, n_channels=args.channels,
                           frames_per_step=2, fec_lanes=args.lanes)
    print(f"C={sr.n_channels} S={sr.S} B_lanes={sr.B_lanes} "
          f"B_fec={sr.B_fec} DRAIN={sr.DRAIN} CAP={sr.CAP} "
          f"n_ldpc={sr.n_ldpc}", flush=True)

    state = jax.device_put(sr.init_state_np())
    B = sr.B_lanes
    llr8 = jnp.zeros((sr.n_ldpc, B), jnp.int8)
    xf8 = jnp.zeros((sr.R_SUB * 2, B), jnp.int8)
    meta = jnp.zeros((B, 2), jnp.int32)
    sels = jnp.zeros((sr.S, B), bool)

    if args.a:
        iq = jnp.zeros((sr.n_channels, sr.n_in, 2), jnp.float32)
        t0 = time.monotonic()
        try:
            lowered = sr._step_a.lower(state, iq)
            compiled = lowered.compile()
            print(f"step_a: COMPILED in {time.monotonic()-t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"step_a: FAILED in {time.monotonic()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:2000]}", flush=True)

    sis = range(sr.S) if args.si is None else [args.si]
    for si in sis:
        t0 = time.monotonic()
        try:
            lowered = sr._step_b[si].lower(state, llr8, xf8, meta, sels)
            compiled = lowered.compile()
            mem = compiled.memory_analysis()
            print(f"step_b[{si}]: COMPILED in {time.monotonic()-t0:.1f}s  "
                  f"{mem}", flush=True)
        except Exception as e:
            msg = str(e)
            key = [ln for ln in msg.splitlines()
                   if "vmem" in ln.lower() or "memory" in ln.lower()
                   or "Scoped" in ln]
            print(f"step_b[{si}]: FAILED in {time.monotonic()-t0:.1f}s: "
                  f"{type(e).__name__}", flush=True)
            print("\n".join(key)[:4000] or msg[-4000:], flush=True)


if __name__ == "__main__":
    main()

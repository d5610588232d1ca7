#!/usr/bin/env python3
"""Post-LDPC/BCH BER/FER and PLSC decode FER over an Es/N0 sweep.

Runs the demap -> LDPC -> BCH chain over synthetic codewords at each Es/N0
point and reports BER before decoding, after LDPC, and after BCH, plus FER —
the counterpart of the reference's AFF3CT FEC harnesses (``bench/fec/``).

``--plsc`` instead sweeps the PL signaling decoder: random PLS words are
RM(1,6)-encoded, scrambled, pi/2-BPSK mapped into PLHEADERs, AWGN-impaired,
and decoded with all three modes (coherent-soft / coherent-hard /
differential) — the counterpart of ``bench/fec/bench_plsc.cc`` (decoder
outputs themselves are A/B'd against the compiled reference in
``tests/test_reference_parity.py``). Expect the ~1.5 dB soft-vs-hard gain
at FER 1e-3 from the reference's README tables.

Usage:
    python tools/ber_sweep.py --modcod qpsk1/2 --frame-size normal \
        --esn0 0.5 1.0 1.5 --frames 64 [--json]
    python tools/ber_sweep.py --plsc --esn0 0 1 2 3 --frames 20000 [--json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modcod", default="qpsk1/2")
    ap.add_argument("--frame-size", default="short")
    ap.add_argument("--esn0", type=float, nargs="+", default=[0.0, 0.5, 1.0, 1.5, 2.0])
    ap.add_argument("--frames", type=int, default=32, help="frames per point")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iterations", type=int, default=25)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--plsc", action="store_true",
                    help="sweep PLSC decode FER instead of LDPC/BCH BER")
    args = ap.parse_args()

    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache, force_cpu

    enable_compilation_cache()
    if args.cpu:
        force_cpu()
    if args.plsc:
        return plsc_sweep(args)
    import jax.numpy as jnp

    from dvbs2rx_tpu.spec.fec_params import MODCOD_NUMBERS, DVBS2_MODCODS, get_fec_info
    from dvbs2rx_tpu.spec.ldpc_tables import get_code
    from dvbs2rx_tpu.spec.interleaver import interleave
    from dvbs2rx_tpu.spec.constellations import map_bits, BITS_PER_SYMBOL
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.ops.demap import demap
    from dvbs2rx_tpu.ops.ldpc import get_decoder
    from dvbs2rx_tpu.ops.bch import get_bch_decoder

    from dvbs2rx_tpu.ops.encode import get_device_encoder

    const, rate = DVBS2_MODCODS[MODCOD_NUMBERS[args.modcod.lower()]]
    fec = get_fec_info(args.frame_size, rate)
    code = get_code(fec.ldpc_table)
    ldpc = get_decoder(fec.ldpc_table, args.iterations)
    bch = get_bch_decoder(fec.framesize, fec.t, fec.nbch, fec.kbch)
    enc = get_device_encoder(fec.framesize, rate)
    n_mod = BITS_PER_SYMBOL[const]

    rng = np.random.default_rng(0)
    results = []
    for esn0_db in args.esn0:
        esn0 = 10 ** (esn0_db / 10)
        n0 = 1.0 / esn0
        sigma = np.sqrt(n0 / 2)
        raw_errs = ldpc_errs = bch_errs = 0
        fer = 0
        total_info = total_coded = 0
        done = 0
        while done < args.frames:
            B = min(args.batch, args.frames - done)
            # encode: device batched BCH+LDPC (ops/encode.py)
            info_bits = rng.integers(0, 2, (B, fec.kbch), dtype=np.uint8)
            cws = np.asarray(enc(info_bits.T.copy())).T       # (B, nldpc)
            # modulate + AWGN (host) + batched demap (device)
            noisy = np.empty((B, fec.nldpc // n_mod), dtype=np.complex64)
            for i in range(B):
                bits = interleave(cws[i], const, rate)
                syms = map_bits(bits, const, rate).astype(np.complex64)
                noise = rng.normal(0, sigma, (syms.size, 2)).astype(np.float32)
                noisy[i] = syms + noise[:, 0] + 1j * noise[:, 1]
            llr_batch = np.asarray(demap(
                jnp.asarray(cplx.from_np(noisy)),
                jnp.full((B,), np.float32(n0)),
                const,
                rate,
            ))
            raw_errs += int(np.sum((llr_batch < 0) != cws))
            total_coded += B * fec.nldpc
            # decode
            hard, _, iters, ok = ldpc(llr_batch)
            hard = np.asarray(hard)
            ldpc_errs += int(np.sum(hard[:, : fec.kbch] != cws[:, : fec.kbch]))
            corrected, n_corr = bch(hard[:, : fec.nbch])
            corrected = np.asarray(corrected)
            errs = np.sum(corrected[:, : fec.kbch] != info_bits, axis=1)
            bch_errs += int(errs.sum())
            fer += int(np.sum(errs > 0))
            total_info += B * fec.kbch
            done += B
        results.append({
            "esn0_db": esn0_db,
            "raw_ber": raw_errs / total_coded,
            "post_ldpc_ber": ldpc_errs / total_info,
            "post_bch_ber": bch_errs / total_info,
            "fer": fer / args.frames,
            "frames": args.frames,
        })
        if not args.json:
            r = results[-1]
            print(
                f"Es/N0 {esn0_db:5.2f} dB | raw BER {r['raw_ber']:.3e} | "
                f"post-LDPC {r['post_ldpc_ber']:.3e} | "
                f"post-BCH {r['post_bch_ber']:.3e} | FER {r['fer']:.3e}"
            )
    if args.json:
        print(json.dumps({"modcod": args.modcod, "frame_size": args.frame_size,
                          "points": results}))


def plsc_sweep(args):
    """PLSC decode FER vs Es/N0 for the three decode modes."""
    import jax.numpy as jnp

    from dvbs2rx_tpu.ops import cplx, plsync
    from dvbs2rx_tpu.spec import pi2_bpsk, pl_defs, reed_muller

    rng = np.random.default_rng(0)
    # all 128 PLS codewords searchable (no a-priori restriction), like the
    # reference PLSC benchmark
    headers = np.stack([
        pi2_bpsk.map_bpsk(np.concatenate([
            pl_defs.SOF_BITS,
            reed_muller.encode(pls) ^ pl_defs.PLSC_SCRAMBLER_BITS,
        ]))
        for pls in range(128)
    ])                                                   # (128, 90) complex
    decoders = {
        "soft": plsync.plsc_decode_soft,
        "hard": plsync.plsc_decode_hard,
        "diff": plsync.plsc_decode_diff,
    }
    B = 4096
    results = []
    for esn0_db in args.esn0:
        esn0 = 10 ** (esn0_db / 10)
        sigma = np.sqrt(1.0 / esn0 / 2)
        errs = {k: 0 for k in decoders}
        done = 0
        while done < args.frames:
            n = min(B, args.frames - done)
            pls_true = rng.integers(0, 128, n)
            hdr = headers[pls_true]
            noise = rng.normal(0, sigma, (n, 90, 2))
            noisy = (hdr + noise[..., 0] + 1j * noise[..., 1]).astype(
                np.complex64
            )
            dev = jnp.asarray(cplx.from_np(noisy))
            for k, dec in decoders.items():
                got = np.asarray(dec(dev)[0])
                errs[k] += int(np.sum(got != pls_true))
            done += n
        point = {"esn0_db": esn0_db, "frames": args.frames}
        point.update({f"fer_{k}": errs[k] / args.frames for k in decoders})
        results.append(point)
        if not args.json:
            print(
                f"Es/N0 {esn0_db:5.2f} dB | "
                + " | ".join(f"{k} FER {point[f'fer_{k}']:.3e}"
                             for k in decoders)
            )
    if args.json:
        print(json.dumps({"mode": "plsc", "points": results}))


if __name__ == "__main__":
    main()

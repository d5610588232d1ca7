"""Probe: flat (top-level) compile of the Pallas LDPC kernel per code, to
separate kernel-internal scoped-VMEM demand from the cond-in-scan stack
contribution seen in the r4 VCM OOM.

Usage: python tools/probes/ldpc_vmem_probe.py [--tables S2_B4 S2_B5]
       [--lanes 128] [--vmem-mb 100] [--cond]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from dvbs2rx_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", nargs="+", default=["S2_B4", "S2_B5"])
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--vmem-mb", type=int, default=None)
    ap.add_argument("--cond", action="store_true",
                    help="wrap the decode in cond-in-scan like step_b")
    ap.add_argument("--time", action="store_true",
                    help="measure per-decode device time (K-chain)")
    ap.add_argument("--scoped-kib", type=int, default=None,
                    help="xla_tpu_scoped_vmem_limit_kib compiler option")
    args = ap.parse_args()

    import dvbs2rx_tpu.ops.ldpc_pallas as lp
    if args.vmem_mb is not None:
        mb = args.vmem_mb

        orig = lp._build_kernel

        def patched(code, max_trials, B, interpret):
            import jax.experimental.pallas.tpu  # noqa
            call = orig(code, max_trials, B, interpret)
            return call
        # patch via module constant instead: edit CompilerParams path
        lp._VMEM_LIMIT_MB = mb

    from dvbs2rx_tpu.ops.ldpc_pallas import get_pallas_decoder

    for tab in args.tables:
        dec = get_pallas_decoder(tab, 25)
        B = args.lanes
        N = dec.code.N
        llrsT = jnp.zeros((N, B), jnp.int8)

        if args.cond:
            def wrapped(llrsT):
                def body(carry, _):
                    fill = carry

                    def dcd(lt):
                        h, lo, it, cv = dec.decode_lane_major(lt)
                        return jnp.sum(h.astype(jnp.int32)), it

                    def skp(lt):
                        return jnp.int32(0), jnp.int32(0)

                    s, it = jax.lax.cond(fill > 0, dcd, skp, llrsT)
                    return fill + s, it
                out, its = jax.lax.scan(body, jnp.int32(1), None, length=2)
                return out, its
            fn = jax.jit(wrapped)
        else:
            fn = jax.jit(lambda lt: dec.decode_lane_major(lt))

        copts = None
        if args.scoped_kib:
            copts = {"xla_tpu_scoped_vmem_limit_kib": str(args.scoped_kib)}
        t0 = time.monotonic()
        try:
            comp = fn.lower(llrsT).compile(compiler_options=copts)
            mem = comp.memory_analysis()
            print(f"{tab} lanes={B} cond={args.cond}: COMPILED "
                  f"{time.monotonic()-t0:.1f}s temp="
                  f"{mem.temp_size_in_bytes/1e6:.1f}MB", flush=True)
            if args.time:
                # noisy LLRs so the decoder does real iterations (all-zero
                # LLRs satisfy parity instantly)
                import numpy as np
                rng = np.random.default_rng(0)
                lt = jnp.asarray(
                    rng.integers(-20, 21, (N, B)).astype(np.int8)
                )
                K = 9

                @jax.jit
                def many(lt):
                    def body(eps, _):
                        h, lo, it, cv = dec.decode_lane_major(
                            (lt.astype(jnp.int32) + eps).astype(jnp.int8)
                        )
                        return (jnp.sum(h.astype(jnp.int32)) % 2), None
                    eps, _ = jax.lax.scan(
                        body, jnp.int32(0), None, length=K
                    )
                    return eps

                one = jax.jit(
                    lambda lt: dec.decode_lane_major(lt)
                )
                it = int(one(lt)[2])     # readback: honest blocking after
                jax.block_until_ready(many(lt))

                def t(f):
                    best = float("inf")
                    for _ in range(5):
                        t0 = time.perf_counter()
                        jax.block_until_ready(f(lt))
                        best = min(best, time.perf_counter() - t0)
                    return best

                t1, tk = t(one), t(many)
                print(f"  decode: {(tk - t1) / (K - 1) * 1e3:.3f} ms "
                      f"({it} iters, max_trials path)", flush=True)
        except Exception as e:
            msg = str(e)
            key = [ln for ln in msg.splitlines() if "Scoped" in ln
                   or "vmem" in ln.lower()]
            print(f"{tab} lanes={B} cond={args.cond}: FAILED "
                  f"{time.monotonic()-t0:.1f}s", flush=True)
            print("\n".join(key)[-1500:] or msg[-1500:], flush=True)


if __name__ == "__main__":
    main()

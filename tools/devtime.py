"""Profiler-based per-dispatch device-time measurement.

On this environment's tunneled TPU, ``block_until_ready`` wall time is
dominated by ~24 ms of dispatch latency, and fused K-chain subtraction
(bench.py) can distort stages whose XLA lowering changes inside a
``lax.scan`` body (measured: a 1.06 ms vmapped dense correlator timed
4.7 ms/iteration in-chain). The robust per-dispatch figure comes from the
profiler: run the jitted call N times under ``jax.profiler.trace`` and sum
the device-side ``jit_*`` executable events (the method from the round-3
hot-spot hunt; see MEMORY)."""

import glob
import gzip
import json
import os
import shutil
import tempfile


def device_ms(fn, *args, iters: int = 5):
    """Average device execution time of one ``fn(*args)`` dispatch, in ms.

    ``fn`` must be jitted (the measurement keys on device-side ``jit_*`` /
    ``pjit`` executable trace events). Includes all device work the call
    launches; excludes host dispatch latency.
    """
    import jax

    jax.block_until_ready(fn(*args))           # compile + warm
    d = tempfile.mkdtemp(prefix="devtime_")
    try:
        with jax.profiler.trace(d):
            for _ in range(iters):
                jax.block_until_ready(fn(*args))
        total = 0.0
        for path in glob.glob(
            os.path.join(d, "**", "*.trace.json.gz"), recursive=True
        ):
            ev = json.load(gzip.open(path))["traceEvents"]
            # device executable events: top-level jit_<name>(fingerprint)
            total += sum(
                e["dur"] for e in ev
                if e.get("ph") == "X"
                and e.get("name", "").startswith("jit_")
                and "(" in e.get("name", "")
            )
        return total / 1e3 / iters
    finally:
        shutil.rmtree(d, ignore_errors=True)

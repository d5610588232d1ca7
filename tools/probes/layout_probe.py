#!/usr/bin/env python3
"""Probe: elementwise complex-multiply cost, planar-last (..., 2) vs
planar-first (2, ...) layouts, on the shapes of the frame-group payload."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 17
REPS = 5


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros(()) + 1)
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    C, F, L = 64, 2, 32400
    rng = np.random.default_rng(0)
    x_last = jnp.asarray(rng.normal(size=(C, F, L, 2)).astype(np.float32))
    d_last = jnp.asarray(rng.normal(size=(L, 2)).astype(np.float32))
    x_first = jnp.asarray(np.moveaxis(np.asarray(x_last), -1, 0).copy())
    d_first = jnp.asarray(np.moveaxis(np.asarray(d_last), -1, 0).copy())

    def cmul_last(a, b):
        ar, ai = a[..., 0], a[..., 1]
        br, bi = b[..., 0], b[..., 1]
        return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)

    def cmul_first(a, b):
        ar, ai = a[0], a[1]
        br, bi = b[0], b[1]
        return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=0)

    def chain(f, x, d, label):
        @jax.jit
        def many(x):
            def body(c, _):
                y = f(c, d)
                return y, None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return y

        @jax.jit
        def one(x):
            return f(x, d)

        jax.block_until_ready(one(x)); jax.block_until_ready(many(x))

        def t(g):
            best = np.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(g(x))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tk = t(one), t(many)
        print(f"{label}: {(tk - t1) / (K - 1) * 1e3:.3f} ms/op", flush=True)

    chain(lambda a, d: cmul_last(a, d[None, None]), x_last, d_last,
          "planar-last (...,2)")
    chain(lambda a, d: cmul_first(a, d[:, None, None]), x_first, d_first,
          "planar-first (2,...)")


if __name__ == "__main__":
    main()

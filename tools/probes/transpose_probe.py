#!/usr/bin/env python3
"""Probe TPU transpose costs for the LLR layout candidates.

  T1: (B, N) f32 -> (N, B)            minor-axis transpose (current path)
  T2: (B, N) i8  -> (N, B)            minor-axis int8 (original path)
  T3: (F, N, C) f32 -> (N, F, C)      major-axes swap, C=64 minor preserved
  T4: (C, F, N) f32 -> (N, F*C) via reshape+transpose(2,0,1)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 17
REPS = 5
B, N, C, F = 128, 64800, 64, 2


def main():
    from dvbs2rx_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros(()) + 1)
    _ = float(np.asarray(jnp.sum(jnp.ones(8))))

    rng = np.random.default_rng(0)

    def chain(f, x, label):
        @jax.jit
        def many(x0):
            def body(x, _):
                y = f(x)
                # fold the output back into the input's shape/dtype with a
                # cheap data-dependent op so the chain can't be elided
                chk = jnp.sum(y.astype(jnp.float32)) % 2
                return x0 + chk.astype(x0.dtype), None
            x, _ = jax.lax.scan(body, x0, None, length=K)
            return x

        one = jax.jit(lambda x: jnp.sum(f(x).astype(jnp.float32)))
        jax.block_until_ready(one(x)); jax.block_until_ready(many(x))

        def t(g):
            best = np.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(g(x))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, tk = t(one), t(many)
        print(f"{label}: {(tk - t1) / (K - 1) * 1e3:.3f} ms", flush=True)

    x32 = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    chain(lambda x: x.transpose(1, 0), x32, "T1 f32 (B,N)->(N,B)")

    x8 = jnp.asarray(rng.integers(-100, 100, (B, N), dtype=np.int8))
    chain(lambda x: x.transpose(1, 0), x8, "T2 i8  (B,N)->(N,B)")

    x3 = jnp.asarray(rng.normal(size=(F, N, C)).astype(np.float32))
    chain(lambda x: x.transpose(1, 0, 2), x3, "T3 f32 (F,N,C)->(N,F,C)")

    x4 = jnp.asarray(rng.normal(size=(C, F, N)).astype(np.float32))
    chain(lambda x: x.transpose(2, 0, 1).reshape(N, C * F), x4,
          "T4 f32 (C,F,N)->(N,C*F)")


if __name__ == "__main__":
    main()

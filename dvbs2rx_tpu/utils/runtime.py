"""Runtime environment helpers (compilation cache, device selection)."""

import functools
import os

# Per-op scoped-VMEM ceiling (KiB) for programs embedding the Pallas LDPC
# kernel. The rate-3/5 normal kernel at 128 lanes demands 116.96 MiB of
# scoped VMEM (Mosaic's "fat" schedule; tools/probes/ldpc_vmem_probe.py) —
# above the default ~115.8 MiB ceiling, which OOMed the r4 VCM step at
# compile time (BENCH_r04) — plus ~2 MiB of cond-in-scan stack inside the
# VCM drain. XLA subtracts a per-program reserve (~8 MiB observed) from
# this flag before enforcing it, so request the full 128 MiB core VMEM;
# the compiler still fails loudly if a program genuinely cannot fit.
FEC_SCOPED_VMEM_KIB = 131072


def fec_compiler_options():
    """Compiler options for programs that embed the Pallas LDPC kernel
    (None off-TPU)."""
    import jax

    if jax.devices()[0].platform != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(FEC_SCOPED_VMEM_KIB)}


def fec_jit(fun=None, **kw):
    """``jax.jit`` for programs embedding the Pallas LDPC kernel: on TPU,
    raises the per-op scoped-vmem ceiling so the kernel compiles inside
    control flow (lax.cond / lax.scan) at 128 lanes. A plain jax.jit
    elsewhere.

    JAX rejects calling a compiler_options-carrying jit from inside
    another trace, so when invoked nested the wrapper inlines the raw
    function into the outer trace instead — the OUTERMOST jit around the
    decode must then be a fec_jit itself (every product entry point is)."""
    import jax

    if fun is None:
        return functools.partial(fec_jit, **kw)
    opts = fec_compiler_options()
    if opts is None:
        return jax.jit(fun, **kw)
    jitted = jax.jit(fun, compiler_options=opts, **kw)

    def _tracing():
        try:
            return not jax.core.trace_state_clean()
        except AttributeError:
            from jax._src import core as _core

            return not _core.trace_state_clean()

    @functools.wraps(fun)
    def wrapper(*a, **k):
        if _tracing():
            return fun(*a, **k)
        return jitted(*a, **k)

    wrapper.lower = jitted.lower
    wrapper._jitted = jitted
    return wrapper


def respect_platform_env():
    """Apply the JAX_PLATFORMS env var. The environment's axon TPU plugin
    force-prepends itself to ``jax_platforms`` (overriding the env var), so
    honoring a user's ``JAX_PLATFORMS=cpu`` requires rewriting the config
    after importing jax."""
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache (huge win on the tunneled
    TPU where first compiles are slow)."""
    import jax

    respect_platform_env()
    if path is None:
        # separate caches per backend: entries AOT-compiled under the TPU
        # tunnel's CPU feature flags are not portable to plain CPU runs
        backend = "cpu" if jax.config.jax_platforms == "cpu" else "dev"
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f".jax_cache_{backend}",
        )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_cpu():
    """Force the CPU backend (the axon TPU plugin overrides JAX_PLATFORMS)."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

"""Runtime environment helpers (compilation cache, device selection)."""

import os


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

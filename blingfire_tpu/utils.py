"""Small shared utilities."""

from __future__ import annotations

import os

_cache_done = False


def ensure_compile_cache() -> None:
    """Activate JAX's persistent compilation cache.

    On this jax build the JAX_COMPILATION_CACHE_DIR environment variable
    alone does NOT initialize the cache backend ("cache is disabled/not
    initialized"); jax.config.update does.  Warm-process cold starts drop
    from minutes (the unrolled resolve programs) to seconds once the cache
    is live.  Opt out with BTL_COMPILE_CACHE=0."""
    global _cache_done
    if _cache_done:
        return
    _cache_done = True
    d = os.environ.get("BTL_COMPILE_CACHE")
    if d == "0":
        return
    d = d or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not d:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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
        # default to a per-user cache: without a live persistent cache every
        # process pays ~10 s PER resolve-program compile (round-5 finding —
        # the round-4 "231 s warm" was this no-op branch, not the device)
        d = os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "blingfire_tpu", "jax_cache",
        )
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # 0.2 s: also persist the walk programs (~0.8 s compiles) — loading
        # a cached executable through the tunnel beats recompiling it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass

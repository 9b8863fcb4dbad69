"""Persistent XLA compilation cache (compiles here cost 20-180 s each)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Idempotently point JAX at an on-disk compilation cache."""
    import jax

    path = path or os.environ.get(
        "TPU3DSIS_COMPILE_CACHE", os.path.join("data", ".jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or read-only fs: caching is best-effort

"""Persistent XLA compilation cache.

The hosted TPU's remote compile server has highly variable latency (the same
graph compiles in ~30 s when healthy, 500+ s degraded). Enabling JAX's
persistent cache makes every previously-seen program shape skip the server
entirely — call :func:`enable` early in every entry point (bench, CLI,
driver entries). Safe to call multiple times / on CPU."""

from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless

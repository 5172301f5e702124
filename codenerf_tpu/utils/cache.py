"""Persistent XLA compilation cache setup.

First compile of the full render program costs minutes (more over remote
TPU tunnels); the persistent cache makes every subsequent process start
warm.  Called by all CLIs and bench entry points.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # NOT under /tmp: the sandbox wipes /tmp between sessions, and a cold
    # cache costs 4-7 min per jit shape through the TPU tunnel.
    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_compilation_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend: run without the cache

"""Persistent XLA compilation cache.

TPU compiles of the full train step take minutes (and go through a remote
AOT compile helper under the axon tunnel); caching compiled executables on
disk makes every re-run after a code-identical trace instant.  Safe to call
unconditionally — cache misses behave exactly like no cache.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    path = path or os.environ.get("NRTPU_COMPILATION_CACHE",
                                  "/tmp/nrtpu_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:   # cache is an optimization, never a requirement
        pass

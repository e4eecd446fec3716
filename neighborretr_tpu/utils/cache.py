"""Persistent XLA compilation cache.

TPU compiles of the full train step take minutes (and go through a remote
AOT compile helper under the axon tunnel); caching compiled executables on
disk makes every re-run after a code-identical trace instant.  Safe to call
unconditionally — cache misses behave exactly like no cache.
"""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Fingerprint of this host's CPU capabilities.

    XLA:CPU caches AOT-compiled machine code; loading an executable built
    on a host with different CPU features can SIGILL (observed: VM
    migration between heterogeneous hosts mid-session — the loader warns
    'Machine type used for XLA:CPU compilation doesn't match', then the
    process dies mid-suite).  Keying the cache directory by the host's
    feature set makes a migrated process start a fresh cache instead of
    executing foreign code."""
    import hashlib
    import platform
    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    tag += "-" + hashlib.sha1(
                        line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return tag


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent cache unless the process is pinned to the CPU
    platform.  CPU executables are AOT machine code: serializing them for
    the cache has been observed to SEGFAULT jaxlib mid-suite on some hosts
    (jax/_src/compilation_cache.py::put_executable_and_time), and loading
    entries compiled on a different host can SIGILL — while the CPU
    compiles they would save are cheap anyway.  The cache's real payoff is
    TPU compiles (minutes over the axon tunnel), which stay cached.
    Set NRTPU_CACHE_CPU=1 to force-enable on CPU."""
    import jax
    base = path or os.environ.get("NRTPU_COMPILATION_CACHE",
                                  "/tmp/nrtpu_jax_cache")
    if base.lower() in ("", "off", "none", "0"):
        return
    if os.environ.get("NRTPU_CACHE_CPU") != "1":
        platforms = (jax.config.jax_platforms or "").split(",")[0]
        if platforms == "cpu":
            return
        if not platforms:
            # nothing pinned: ask the backend (this initializes it, which
            # every caller does moments later anyway — the CLIs/bench enable
            # the cache immediately before creating their mesh/devices)
            if jax.default_backend() == "cpu":
                return
    path = os.path.join(base, _host_tag())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:   # cache is an optimization, never a requirement
        pass

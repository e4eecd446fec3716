"""Test harness: force an 8-device virtual CPU platform.

The environment's sitecustomize registers the `axon` TPU backend and forces
jax_platforms='axon,cpu' in every interpreter, so a plain env var is not
enough — we re-point the config at CPU before any backend initializes.
Multi-device sharding paths run on the virtual host platform
(xla_force_host_platform_device_count=8), mirroring how the driver validates
the multi-chip program without real chips.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: a no-op here since the platform is pinned to
# cpu above — serializing CPU executables for the cache has segfaulted
# jaxlib mid-suite on some hosts, and entries AOT-compiled on a different
# host can SIGILL after a VM migration (see utils/cache.py).  Re-enable
# for an iteration session with NRTPU_CACHE_CPU=1 at your own risk.
from neighborretr_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Default-backend health probe shared by the driver surfaces.

bench.py and __graft_entry__ must never hang or record an infrastructure
outage as a framework failure: this environment's default backend is a
remote axon/libtpu tunnel that can be down or version-mismatched.  Both
probe it in a BOUNDED child interpreter (the parent must not initialize a
broken backend) and then self-heal — bench re-execs pinned to CPU with the
measured same-CPU baseline, the graft entry re-points jax.config before
backend init.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional, Tuple


def probe_default_backend(timeout: Optional[int] = None) -> Tuple[bool, str]:
    """(ok, reason).  ok=True when the default JAX backend initializes and
    exposes a device inside `timeout` seconds (default: BENCH_PROBE_TIMEOUT
    env or 420).  Already-pinned-to-CPU processes probe trivially OK."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return True, ""
    if timeout is None:
        timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "420"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0])"],
            capture_output=True, text=True, timeout=timeout)
        if proc.returncode == 0:
            return True, ""
        lines = (proc.stderr or "").strip().splitlines()
        return False, (lines[-1] if lines else f"probe rc={proc.returncode}")
    except subprocess.TimeoutExpired:
        return False, "probe timed out (tunnel down?)"

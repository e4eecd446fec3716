"""Async host→device batch prefetch.

JAX device transfers are asynchronous: ``jax.device_put`` returns immediately
and the copy proceeds in the background.  What serializes transfer with
compute is *dispatch order* — if the upload of batch N+1 is only issued after
step N's program has been enqueued from the host loop, the device sits idle
for the full PCIe (or, worse, tunnel) latency of a ~115 MB uint8 video batch
every step.  This iterator keeps `size` batches in flight: while step N runs,
batches N+1..N+size are already streaming to HBM.

The reference overlaps host *decode* with GPU compute via DataLoader worker
processes + ``pin_memory`` (args_parser.py:44-58) but still issues its H2D
copies synchronously at the top of each step (trainer.py:73).  Here both
stages are overlapped: BatchLoader threads decode ahead, and this wrapper
uploads ahead.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterable, Iterator, Optional, Sequence

import jax


def prefetch_to_device(
    iterator: Iterable[Dict],
    size: int = 2,
    mesh=None,
    axis: str = "data",
    drop_keys: Sequence[str] = ("valid", "video_hash"),
) -> Iterator[Dict]:
    """Wrap a host-batch iterator, keeping `size` device transfers in flight.

    Args:
      iterator: yields dicts of host numpy arrays (global batches).
      size: number of batches in flight (2 = classic double buffering;
        more only helps when step times are noisy — each slot pins a full
        batch in HBM).
      mesh: when given, arrays are placed batch-sharded over `axis` (the
        training layout from parallel/mesh.py); otherwise they go to the
        default device.
      drop_keys: host-only keys stripped before upload.
    """
    if mesh is not None:
        from ..parallel.mesh import batch_sharding
        sharding = batch_sharding(mesh, axis)
    else:
        sharding = None

    multiprocess = jax.process_count() > 1

    def put(batch: Dict) -> Dict:
        batch = {k: v for k, v in batch.items()
                 if k not in drop_keys and not k.startswith("global_")}
        if sharding is not None:
            if multiprocess:
                # local rows from the process-sharded loader → global Array
                import numpy as np
                return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)) for k, v in batch.items()}
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    queue: collections.deque = collections.deque()
    it = iter(iterator)

    def enqueue(n: int) -> None:
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(put(batch))

    enqueue(max(size, 1))
    while queue:
        yield queue.popleft()
        enqueue(1)

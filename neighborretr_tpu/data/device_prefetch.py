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
    def put(batch: Dict) -> Dict:
        batch = {k: v for k, v in batch.items() if k not in drop_keys}
        if mesh is not None:
            # single placement-dispatch implementation for the whole codebase
            # (global device_put vs per-process
            # make_array_from_process_local_data lives in mesh.shard_batch)
            from ..parallel.mesh import shard_batch
            return shard_batch(batch, mesh, axis)
        return {k: jax.device_put(v) for k, v in batch.items()
                if not k.startswith("global_")}

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

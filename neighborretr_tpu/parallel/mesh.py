"""Device mesh + sharding helpers.

The reference's NCCL DDP world (setup.py:44-69, DistributedSampler,
AllGather autograd fns) collapses into one SPMD program here: a 1-D `data`
mesh (ICI within a slice; add a DCN axis for multi-slice later), batches
sharded on axis 0, parameters and memory bank replicated.  XLA inserts the
all-gathers the reference issued manually (modeling.py:273-280), and gradient
psums replace DDP bucket all-reduce.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a global numpy batch with axis-0 sharded across the mesh."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)

"""Device mesh + sharding helpers.

The reference's NCCL DDP world (setup.py:44-69, DistributedSampler,
AllGather autograd fns) collapses into one SPMD program here: a 1-D `data`
mesh (ICI within a slice; add a DCN axis for multi-slice later), batches
sharded on axis 0, parameters and memory bank replicated.  XLA inserts the
all-gathers the reference issued manually (modeling.py:273-280), and gradient
psums replace DDP bucket all-reduce.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def take_devices(n: int):
    """First n visible devices, with a friendly error instead of the
    cryptic numpy reshape failure a silent `jax.devices()[:n]` under-slice
    would produce downstream."""
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(
            f"requested {n} devices but only {len(devices)} are visible — "
            "refusing to silently run on fewer")
    return devices[:n]


def _mesh_from_shape(shape: Tuple[int, ...], axes: Tuple[str, ...]) -> Mesh:
    """take_devices + reshape + Mesh — the one construction behind the
    single-process arms of every mesh builder here and in pipeline.py."""
    n = int(np.prod(shape))
    return Mesh(np.array(take_devices(n)).reshape(shape), axis_names=axes)


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = (jax.devices() if num_devices is None
               else take_devices(num_devices))
    if jax.process_count() > 1 and len(devices) != len(jax.devices()):
        # a subset mesh on a multi-host run would leave some processes with
        # no addressable devices in the mesh — make_array_from_process_
        # local_data then fails with an opaque device-assignment error (or
        # the first collective hangs).  Same guard make_hybrid_mesh has.
        raise ValueError(
            f"num_devices={len(devices)} covers a subset of this multi-host "
            f"run's {len(jax.devices())} devices — subset meshes are "
            "single-process only")
    return Mesh(np.array(devices), axis_names=(axis,))


def make_hybrid_mesh(shape: Tuple[int, int],
                     axes: Tuple[str, str] = ("replica", "data")) -> Mesh:
    """2-D data-parallel mesh for multi-slice topologies.

    The OUTER axis is the slow-interconnect (DCN) dimension, the inner one
    rides ICI.  Batches shard over BOTH axes (see `batch_sharding`), so
    gradient psums reduce within a slice over ICI first and across slices
    over DCN once — the standard multi-slice DP layout.  On multi-host
    runs, `mesh_utils.create_hybrid_device_mesh` orders devices so the outer
    axis really crosses DCN; single-process (and the virtual CPU platform)
    falls back to a plain reshape, which exercises the same program.
    """
    n = shape[0] * shape[1]
    if jax.process_count() > 1:
        if n != len(jax.devices()):
            raise ValueError(
                f"hybrid mesh shape {shape} covers {n} devices but this "
                f"multi-host run has {len(jax.devices())} — "
                "create_hybrid_device_mesh requires every device (subset "
                "meshes are single-process only)")
        from jax.experimental import mesh_utils
        # CPU/GPU cluster devices carry no slice_index attribute; there the
        # process IS the DCN granule (one controller per "slice")
        granule = not all(hasattr(d, "slice_index") for d in jax.devices())
        devices = mesh_utils.create_hybrid_device_mesh(
            (shape[1],), dcn_mesh_shape=(shape[0],),
            process_is_granule=granule)
        return Mesh(devices.reshape(shape), axis_names=axes)
    return _mesh_from_shape(shape, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding over the data-parallel mesh axes (1-D mesh of any
    axis name, or the hybrid (replica, data) mesh — axis 0 of the array
    splits over all).  `model` (tensor-parallel) and `stage` (pipeline)
    axes are excluded: batches replicate across them, parameters shard over
    them (`tp_param_shardings` / pipeline.pp_param_shardings).
    The mesh's OWN axis names are used; `axis` is accepted for signature
    compatibility but ignored (a caller-supplied name that differs from the
    mesh's would only ever raise at placement time)."""
    del axis
    dp_axes = tuple(a for a in mesh.axis_names if a not in ("model", "stage"))
    return NamedSharding(mesh, P(dp_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a batch with axis-0 sharded across the mesh.

    Single-process: `batch` holds GLOBAL arrays → device_put splits them.
    Multi-process: `batch` holds this process's LOCAL rows (see
    data/loader.py process sharding) → jax.make_array_from_process_local_data
    assembles the global jax.Array from per-process shards (the reference's
    DistributedSampler + NCCL all-gather, without the gather).  Host-only
    `global_*` bookkeeping keys are stripped either way."""
    sh = batch_sharding(mesh, axis)
    arrays = {k: v for k, v in batch.items() if not k.startswith("global_")}
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in arrays.items()}
    return {k: jax.device_put(v, sh) for k, v in arrays.items()}


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


# ---------------------------------------------------------------------------
# tensor parallelism (optional 2-D data×model mesh)
# ---------------------------------------------------------------------------

def make_tp_mesh(shape: Tuple[int, int],
                 axes: Tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D mesh for data + tensor parallelism: batches shard over `data`,
    transformer weight matrices shard over `model` (Megatron layout via
    GSPMD — see `tp_param_shardings`).

    Beyond-reference capability: the reference is DP-only (SURVEY §2.2 —
    ViT-B fits one GPU), but larger backbones (ViT-L/14 at 64 frames) want
    the towers' weights and activations split across chips.  Here TP is pure
    placement — the model code is unchanged; XLA partitions the einsums and
    inserts the all-reduces the Megatron pattern implies."""
    return _mesh_from_shape(shape, axes)


def tp_param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """NamedSharding tree for Megatron-style tensor parallelism.

    Per residual block (layers.py pytrees, stacked on a leading layer axis):
      attn.in_proj.w  [.., D, 3, D] → LAST axis over `model`.  q/k/v live on
                                      their own axis, so a contiguous shard
                                      of the last axis holds whole heads of
                                      q, k AND v — the split/heads reshape in
                                      mha stays local (true Megatron column
                                      parallelism, no activation reshard)
      attn.in_proj.b  [.., 3, D]    → last axis over `model`
      attn.out_proj.w [.., D, D]    → rows over `model` (partial sums → psum)
      mlp.c_fc.w      [.., D, 4D]   → columns;  mlp.c_fc.b [.., 4D] → last
      mlp.c_proj.w    [.., 4D, D]   → rows
    Everything else (embeddings, LayerNorms, projections, CTM, weighting
    heads, logit scale) replicates.  Row-sharded matrices keep their bias
    replicated (added once after the psum)."""
    col_w = {("attn", "in_proj", "w"), ("mlp", "c_fc", "w")}
    col_b = {("attn", "in_proj", "b"), ("mlp", "c_fc", "b")}
    row_w = {("attn", "out_proj", "w"), ("mlp", "c_proj", "w")}

    def spec_for(path, leaf):
        names = tuple(getattr(k, "key", None) for k in path)
        tail3 = names[-3:]
        nd = leaf.ndim
        if tail3 in col_w or tail3 in col_b:
            return P(*([None] * (nd - 1) + [model_axis]))
        if tail3 in row_w:
            return P(*([None] * (nd - 2) + [model_axis, None]))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def shard_params_tp(params, mesh: Mesh, model_axis: str = "model"):
    """Place a parameter pytree with tensor-parallel shardings."""
    return jax.tree.map(jax.device_put, params,
                        tp_param_shardings(params, mesh, model_axis))


def fetch_to_host(tree):
    """Host (numpy) copy of a pytree whose leaves may be sharded across
    PROCESSES (tensor-parallel params on a multi-host mesh).

    `jax.device_get` alone raises on arrays with non-addressable shards;
    those are first assembled with `multihost_utils.process_allgather`
    (a collective — every process must call this together).  Replicated
    or fully-addressable leaves take the plain device_get path, so on
    single-host runs this is exactly `jax.device_get`."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(x):
        # fully-replicated leaves are locally readable even when their shards
        # span processes (jax.Array._value allows it) — only genuinely
        # partitioned leaves (TP weight shards) need the allgather collective
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            # tiled=True reassembles the GLOBAL value (tiled=False would
            # stack a leading per-process dim — and raises outright on
            # non-fully-addressable jax.Arrays)
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree.map(get, tree)


def fsdp_param_shardings(params, mesh: Mesh):
    """ZeRO-3 / FSDP-style shardings: every parameter splits over the
    data-parallel axes on its largest evenly-divisible dimension (later
    dims win ties, so the stacked-layer axis stays whole and the towers'
    lax.scan slices stay layout-local).  Under GSPMD this is placement
    only: the forward all-gathers one layer's weights just in time per
    scan step, the backward reduce-scatters the matching gradient shard,
    and the Adam moments (placed with the same rule via `place_params`)
    never exist replicated — per-chip param+moment memory drops ~dp×.
    Leaves with no divisible dim (scalars, tiny vectors) replicate."""
    dp_axes = tuple(a for a in mesh.axis_names if a not in ("model", "stage"))
    dp = int(np.prod([mesh.shape[a] for a in dp_axes])) if dp_axes else 1
    axis_val = dp_axes if len(dp_axes) > 1 else (dp_axes[0] if dp_axes else None)

    def spec_for(leaf):
        if dp == 1 or leaf.ndim == 0:
            return P()
        best = None
        for d in range(leaf.ndim):
            if leaf.shape[d] % dp == 0 and leaf.shape[d] >= dp:
                if best is None or leaf.shape[d] >= leaf.shape[best]:
                    best = d
        if best is None:
            return P()
        sp = [None] * leaf.ndim
        sp[best] = axis_val
        return P(*sp)

    return jax.tree.map(lambda l: NamedSharding(mesh, spec_for(l)), params)


def place_params(params, mesh: Mesh, fsdp: bool = False):
    """Mesh-appropriate parameter placement: TP shardings when the mesh has
    a `model` axis, stage (layer-slice) shardings on a pipeline mesh,
    FSDP (ZeRO-3) data-axis shardings when requested, plain replication
    otherwise."""
    if fsdp:
        if "model" in mesh.axis_names or "stage" in mesh.axis_names:
            raise ValueError("fsdp applies to pure data-parallel meshes "
                             "(tensor/pipeline parallelism shard params "
                             "through their own rules)")
        return jax.tree.map(jax.device_put, params,
                            fsdp_param_shardings(params, mesh))
    if "model" in mesh.axis_names and "stage" in mesh.axis_names:
        from .pipeline import shard_params_pp_tp
        return shard_params_pp_tp(params, mesh)
    if "model" in mesh.axis_names:
        return shard_params_tp(params, mesh)
    if "stage" in mesh.axis_names:
        from .pipeline import shard_params_pp
        return shard_params_pp(params, mesh)
    return replicate_tree(params, mesh)


def shard_map_compat(f, mesh, in_specs, out_specs, manual_axes=None):
    """Version-portable shard_map with replication checking off (gathers/
    psums replicate outputs in ways the checker cannot always prove).
    One implementation for spmd.py and pipeline.py — the jax.shard_map API
    and its kwarg names move between releases; track them here only.

    manual_axes: mesh axes the body is manual over.  Axes NOT listed (e.g.
    a Megatron `model` axis on a 3-D data×stage×model mesh) stay AUTO: the
    body's arrays remain global w.r.t. them and GSPMD partitions the
    einsums inside each stage — this is how pipeline and tensor
    parallelism compose in one program."""
    import jax
    auto = manual_axes is not None and set(mesh.axis_names) - set(manual_axes)
    kwargs = {"axis_names": frozenset(manual_axes)} if auto else {}
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False, **kwargs)
    except (AttributeError, TypeError):  # pragma: no cover - older JAX
        if auto:
            raise  # partial-manual (auto axes) needs the jax.shard_map API
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)

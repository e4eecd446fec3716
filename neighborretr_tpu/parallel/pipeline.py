"""GPipe-style pipeline parallelism over a `stage` mesh axis.

Beyond-reference capability (the reference is DP-only, SURVEY §2.2): splits
a stacked transformer tower depth-wise across chips and streams microbatches
through the stages, so a backbone whose weights or activations outgrow one
chip (ViT-L/14 at 64 frames) trains across the mesh with each chip holding
only `layers/S` of the tower.

TPU-native design — one SPMD program, no host-side schedule:
  * The tower's stacked [layers, ...] parameter pytree (models/layers.py)
    reshapes to [S, layers/S, ...] and enters `shard_map` with its leading
    axis sharded over `stage`: each chip holds its contiguous layer slice.
  * The local batch splits into M microbatches.  A `lax.scan` over
    M + S − 1 ticks runs the classic GPipe schedule: every tick, each stage
    applies its layer slice to the microbatch it holds, then the activations
    rotate one stage forward via `lax.ppermute` (ICI neighbor exchange —
    the natural TPU topology for a ring of stages).  Per-sample attention
    biases travel with their microbatch through the same ppermute.
  * The last stage accumulates finished microbatches; a final `psum` over
    `stage` replicates the tower output (every other stage contributes
    zeros), returning the array to the GSPMD world for the loss math.
  * Differentiability is free: AD transposes ppermute to the reverse
    rotation and the scan to the reverse schedule, so the backward pass is
    itself a pipeline (cotangents enter at the last stage and flow back).
    Per-microbatch `jax.checkpoint` bounds the saved state to the tick
    carries — the standard GPipe activation-memory story.

The bubble fraction is (S−1)/(M+S−1): choose microbatches M ≳ 4·S.  During
bubble ticks idle stages compute on zeros (SPMD programs cannot skip work);
correctness is unaffected because only the last stage's tagged outputs are
collected.

Routing: `models/layers.transformer_apply` consults `current()` — a context
activated by `train/step.train_step` from static arguments
(cfg.train.pipeline_parallel + the mesh), so every trace under the same jit
key sees the same decision.  Towers whose depth S does not divide fall back
to the plain path (the 4-layer temporal tower under S=3); batch
divisibility errors raise.

Parameter placement: `pp_param_shardings` shards each tower's stacked
parameters (and therefore their Adam moments) over `stage` — the memory win
exists even on the non-pipelined paths (eval, bank fill), where GSPMD
gathers one layer slice per scan step, ZeRO-3 style.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class PipelineContext:
    mesh: Mesh
    stages: int
    microbatches: int
    data_axis: str = "data"
    stage_axis: str = "stage"


_ACTIVE: Optional[PipelineContext] = None


def current() -> Optional[PipelineContext]:
    return _ACTIVE


@contextlib.contextmanager
def activated(ctx: Optional[PipelineContext]):
    """Route transformer_apply through the pipeline while tracing.  The
    context derives from jit-static arguments only (cfg, mesh), so cached
    executables and their traces always agree."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = ctx
    try:
        yield
    finally:
        _ACTIVE = prev


def make_pp_mesh(shape, axes=("data", "stage")) -> Mesh:
    """2-D mesh for data + pipeline parallelism: batches shard over `data`,
    tower depth shards over `stage` (consecutive chips = consecutive layer
    slices, so ppermute's ring rides neighbor ICI links)."""
    from .mesh import _mesh_from_shape
    return _mesh_from_shape(tuple(shape), axes)


def pp_param_shardings(params, mesh: Mesh, stage_axis: str = "stage"):
    """Shard every stacked transformer tower over `stage` on its leading
    (layer) axis when the depth divides; replicate everything else."""
    S = mesh.shape[stage_axis]

    def spec_for(path, leaf):
        names = tuple(getattr(k, "key", None) for k in path)
        if ("transformer" in names and leaf.ndim >= 1
                and leaf.shape[0] % S == 0):
            return P(*([stage_axis] + [None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def shard_params_pp(params, mesh: Mesh, stage_axis: str = "stage"):
    return jax.tree.map(jax.device_put, params,
                        pp_param_shardings(params, mesh, stage_axis))


def make_pp_tp_mesh(shape, axes=("data", "stage", "model")) -> Mesh:
    """3-D mesh composing data, pipeline and tensor parallelism.  `model`
    is the innermost (fastest-ICI) axis — Megatron all-reduces are the most
    latency-sensitive collective; the stage ring rides the middle axis."""
    from .mesh import _mesh_from_shape
    return _mesh_from_shape(tuple(shape), axes)


def pp_tp_param_shardings(params, mesh: Mesh, stage_axis: str = "stage",
                          model_axis: str = "model"):
    """Combined shardings for a data×stage×model mesh: Megatron column/row
    sharding on the weight-matrix axes (mesh.tp_param_shardings) PLUS the
    stage sharding on each tower's leading layer axis.  The two never
    collide — TP shards trailing axes, the pipeline shards axis 0."""
    from .mesh import tp_param_shardings
    S = mesh.shape[stage_axis]
    tp = tp_param_shardings(params, mesh, model_axis)

    def combine(path, leaf, tpsh):
        names = tuple(getattr(k, "key", None) for k in path)
        spec = list(tpsh.spec) + [None] * (leaf.ndim - len(tpsh.spec))
        if ("transformer" in names and leaf.ndim >= 1
                and leaf.shape[0] % S == 0):
            spec[0] = stage_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(combine, params, tp)


def shard_params_pp_tp(params, mesh: Mesh):
    return jax.tree.map(jax.device_put, params,
                        pp_tp_param_shardings(params, mesh))


# version-portable shard_map shared with spmd.py (one place tracks the
# jax.shard_map API moves); the final psum replicates outputs over `stage`,
# which the replication checker cannot always prove through the where/scan
# structure — hence compat's check_vma/check_rep off
from .mesh import shard_map_compat as _shard_map  # noqa: E402


def supports(ctx: Optional[PipelineContext], n_layers: int, x) -> bool:
    """Can this tower run the pipeline under `ctx`?  Layer-count mismatch is
    a silent fallback (the 4-layer temporal tower under S=3 simply runs the
    plain replicated path); shape problems raise in the apply itself."""
    if ctx is None or ctx.stages <= 1:
        return False
    if ctx.stage_axis not in ctx.mesh.axis_names:
        return False
    if x.ndim != 3:
        return False
    return n_layers % ctx.stages == 0


def pipeline_transformer_apply(p, x, n_head: int, ctx: PipelineContext,
                               attn_bias=None, dtype=jnp.float32,
                               fused_attention=False, remat: bool = True,
                               remat_policy: str = "full"):
    """Run a stacked transformer tower as an S-stage GPipe pipeline.

    p: stacked [layers, ...] block pytree (models/layers.transformer_init).
    x: [N, L, D] global activations (sharded over `data` if the mesh has it).
    attn_bias: None, [1, 1, L, L] (constant — replicated to every stage), or
      per-sample [N, 1, *, L] (travels with its microbatch).
    Semantics identical to layers.transformer_apply modulo fp reordering;
    asserted in tests/test_pipeline.py.
    """
    from ..models import layers as L

    S, M = ctx.stages, ctx.microbatches
    mesh = ctx.mesh
    if mesh.shape.get(ctx.stage_axis) != S:
        # a mismatched context would otherwise die deep in shard_map with
        # an uneven-sharding or invalid-ppermute error naming neither knob
        raise ValueError(
            f"PipelineContext(stages={S}) does not match the mesh's "
            f"'{ctx.stage_axis}' axis of size "
            f"{mesh.shape.get(ctx.stage_axis)}")
    n_layers = L.num_layers(p)
    if n_layers % S:
        raise ValueError(f"{n_layers} layers do not divide into {S} stages")
    N = x.shape[0]
    dp = mesh.shape.get(ctx.data_axis, 1)
    if N % (dp * M):
        raise ValueError(
            f"rows {N} must divide by data×microbatches = {dp}×{M} "
            f"(pipeline_microbatches; got N_local {N // dp} per shard)")

    p_st = jax.tree.map(
        lambda a: a.reshape(S, n_layers // S, *a.shape[1:]), p)

    data_spec = (ctx.data_axis,) if ctx.data_axis in mesh.axis_names else (None,)
    x_spec = P(*data_spec)
    per_sample_bias = attn_bias is not None and attn_bias.shape[0] == N
    if attn_bias is not None and not per_sample_bias and attn_bias.shape[0] != 1:
        raise ValueError(f"attn_bias leading dim {attn_bias.shape[0]} must be "
                         f"1 or match rows {N}")
    bias_spec = x_spec if per_sample_bias else P()
    has_bias = attn_bias is not None

    def body(p_loc, x_loc, bias_loc):
        p_loc = jax.tree.map(lambda a: a[0], p_loc)      # [layers/S, ...]
        s = jax.lax.axis_index(ctx.stage_axis)
        Nl = x_loc.shape[0]
        mb = Nl // M
        mbs = x_loc.reshape(M, mb, *x_loc.shape[1:])
        b_mbs = (bias_loc.reshape(M, mb, *bias_loc.shape[1:])
                 if per_sample_bias else None)
        ring = [(i, (i + 1) % S) for i in range(S)]

        def stage_apply(x_mb, b_mb):
            if per_sample_bias:
                bias = b_mb
            else:
                bias = bias_loc if has_bias else None

            def blk(carry, layer_p):
                return L.block_apply(layer_p, carry, n_head, bias, dtype,
                                     fused_attention=fused_attention), None

            if remat:
                policy = L.REMAT_POLICIES[remat_policy]
                f = jax.checkpoint(blk, policy=policy() if policy else None)
            else:
                f = blk
            y, _ = jax.lax.scan(f, x_mb, p_loc)
            return y

        def tick(carry, t):
            state, bstate, outs = carry
            idx = jnp.clip(t, 0, M - 1)
            inp = jax.lax.dynamic_index_in_dim(mbs, idx, 0, keepdims=False)
            state = jnp.where(s == 0, inp, state)
            if per_sample_bias:
                binp = jax.lax.dynamic_index_in_dim(b_mbs, idx, 0,
                                                    keepdims=False)
                bstate = jnp.where(s == 0, binp, bstate)
            state = stage_apply(state, bstate)
            j = t - (S - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, state, jnp.clip(j, 0, M - 1), 0)
            outs = jnp.where(jnp.logical_and(s == S - 1, j >= 0), upd, outs)
            state = jax.lax.ppermute(state, ctx.stage_axis, ring)
            if per_sample_bias:
                bstate = jax.lax.ppermute(bstate, ctx.stage_axis, ring)
            return (state, bstate, outs), None

        state0 = jnp.zeros((mb,) + x_loc.shape[1:], x_loc.dtype)
        bstate0 = (jnp.zeros((mb,) + bias_loc.shape[1:], bias_loc.dtype)
                   if per_sample_bias else jnp.zeros((), x_loc.dtype))
        outs0 = jnp.zeros((M, mb) + x_loc.shape[1:], x_loc.dtype)
        (_, _, outs), _ = jax.lax.scan(
            tick, (state0, bstate0, outs0), jnp.arange(M + S - 1))
        # only the last stage wrote results; psum replicates them over stages
        out = jax.lax.psum(outs, ctx.stage_axis)
        return out.reshape(Nl, *x_loc.shape[1:])

    # constant biases ([1,1,L,L]) replicate to every stage via P(); the
    # no-bias case ships a scalar placeholder that body/stage_apply ignore
    bias_arg = attn_bias if has_bias else jnp.zeros((), x.dtype)
    manual = {a for a in (ctx.stage_axis, ctx.data_axis)
              if a in mesh.axis_names}
    return _shard_map(
        body, mesh,
        in_specs=(P(ctx.stage_axis), x_spec, bias_spec),
        out_specs=x_spec, manual_axes=manual,
    )(p_st, x, bias_arg)

"""BertAdam optimizer as an optax-style gradient transformation.

Faithful rebuild of the reference's optimizer stack
(models/optimization.py:76-210 + training/optimizer.py:12-86 + trainer.py:104):

  1. global grad-norm clip to 1.0 over ALL parameters (trainer.py:104),
  2. per-parameter grad-norm clip to 1.0 inside the step (optimization.py:181).
     NOTE: with both clips at the same max-norm, stage 2 can never bind —
     after the global clip every parameter's norm is already ≤ max_norm — so
     applying it per stacked-layer leaf (this tree stacks the 12 transformer
     layers into single leaves) is behaviorally identical to the reference's
     per-torch-Parameter loop,
  3. Adam moments WITHOUT bias correction,
  4. update = m / (sqrt(v) + eps) + weight_decay * p (decoupled),
  5. lr = base_lr(param group) * schedule(step / t_total, warmup) where `step`
     is the count of COMPLETED steps — the first update runs at multiplier
     schedule(0) (0 for warmup schedules), a faithful reference quirk,
  6. parameter groups: {decay, no-decay} × {clip, non-clip}; CLIP-branch lr is
     base_lr * coef_lr; no-decay = any param named bias / LayerNorm scale+bias,
  7. frozen leaves (the vision patch embed, module_clip.py:324-326) get zero
     updates.

Verified against hand-computed traces in tests/test_bertadam.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import OptimizerConfig

Params = Dict[str, Any]

def _path_keys(path) -> Tuple[str, ...]:
    return tuple(getattr(k, "key", str(k)) for k in path)


def is_frozen(path_keys: Tuple[str, ...]) -> bool:
    """visual patch embed is frozen (reference freezes visual.conv1)."""
    return path_keys[-1:] == ("patch_embed",) and "visual" in path_keys


def is_no_decay(path_keys: Tuple[str, ...]) -> bool:
    """Only bias leaves are no-decay — a faithful reference quirk.

    The reference's no_decay list is ['bias', 'LayerNorm.bias',
    'LayerNorm.weight'] matched as substrings of parameter names
    (training/optimizer.py:40-44), but the live model's LayerNorm modules
    are attr-named ln_1/ln_2/ln_pre/ln_post/ln_final/norm/norm1 — so
    'LayerNorm.weight' never matches anything and LN *scales are
    weight-decayed* in the reference.  Golden-tested against the reference's
    own grouping + BertAdam in tests/test_reference_parity.py.
    """
    return path_keys[-1] in ("b", "bias")


def is_clip_branch(path_keys: Tuple[str, ...]) -> bool:
    return len(path_keys) > 0 and path_keys[0] == "clip"


# ---------------------------------------------------------------------------
# schedules (optimization.py:17-73)
# ---------------------------------------------------------------------------

def warmup_cosine(x, warmup):
    # clamp past x=1: the raw cosine RISES again beyond t_total, which a
    # preempt-resumed run can reach (the interrupted epoch replays on top of
    # the preserved opt.step).  In-range behavior is the reference's exactly.
    x = jnp.minimum(x, 1.0)
    return jnp.where(x < warmup, x / warmup,
                     0.5 * (1.0 + jnp.cos(jnp.pi * x)))


def warmup_constant(x, warmup):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup):
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


SCHEDULES: Dict[str, Callable] = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


# ---------------------------------------------------------------------------
# transformation
# ---------------------------------------------------------------------------

class BertAdamState(NamedTuple):
    step: jnp.ndarray   # completed steps (int32 scalar)
    m: Any
    v: Any


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def clip_effective_norm(grads) -> jnp.ndarray:
    """global_norm over NON-frozen leaves only — the norm the clipping in
    bert_adam_update actually sees (frozen leaves contribute sq=0 there,
    mirroring the reference's requires_grad=False → grad None).  Use this
    for the logged grad_norm so it is comparable to max_grad_norm."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for path, g in flat if not is_frozen(_path_keys(path))))


def host_offload_supported() -> bool:
    """TPU/GPU backends carry pinned_host buffers across donated steps; the
    CPU backend normalizes output memory kinds back to 'device', which
    aborts the next donated call on a kind mismatch (probed jax 0.9)."""
    return jax.devices()[0].platform in ("tpu", "gpu")


def moments_sharding(memory_kind: str, mesh=None):
    """Replicated sharding in the given memory space: the carrier for
    host-offloaded moments (cfg.moments_placement='host').  With a mesh the
    moments replicate over it (the pure-DP layout; fsdp is rejected at
    validate time), else they pin to the default device."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        return NamedSharding(mesh, PartitionSpec(), memory_kind=memory_kind)
    from jax.sharding import SingleDeviceSharding
    return SingleDeviceSharding(jax.devices()[0], memory_kind=memory_kind)


def place_moments(state: "BertAdamState", placement: str,
                  mesh=None) -> "BertAdamState":
    """Move the carried m/v to their configured home (no-op for 'device' —
    the default placement rules already put them in HBM)."""
    if placement != "host":
        return state
    if not host_offload_supported():
        raise ValueError(
            "moments_placement='host' needs a TPU/GPU backend (the CPU "
            "backend cannot round-trip pinned_host buffers through donated "
            "steps — it would abort mid-training)")
    s = moments_sharding("pinned_host", mesh)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, s), t)
    return state._replace(m=put(state.m), v=put(state.v))


def bert_adam_init(params: Params,
                   moments_dtype: str = "float32") -> BertAdamState:
    dt = jnp.dtype(moments_dtype)
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=dt), params)
    return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                         v=jax.tree.map(jnp.copy, zeros))


def bert_adam_update(
    grads: Params,
    state: BertAdamState,
    params: Params,
    cfg: OptimizerConfig,
    t_total: int,
    mesh=None,
) -> Tuple[Params, BertAdamState]:
    """Returns (new_params, new_state).  Applies both clip stages internally.

    With cfg.moments_placement='host' the carried m/v arrive in pinned host
    memory: each leaf streams to device for the fp32 update and the new
    moments stream back (the update math itself is placement-independent —
    tests pin the two trajectories bitwise-equal).  `mesh` only selects the
    replicated-sharding carrier for those transfers."""
    host_moments = cfg.moments_placement == "host"
    if host_moments:
        dev_s = moments_sharding("device", mesh)
        host_s = moments_sharding("pinned_host", mesh)
    sched = SCHEDULES[cfg.schedule]
    progress = state.step.astype(jnp.float32) / float(t_total)
    lr_mult = sched(progress, cfg.warmup_proportion)

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    treedef = jax.tree.structure(grads)
    m_leaves = jax.tree.leaves(state.m)
    v_leaves = jax.tree.leaves(state.v)
    p_leaves = jax.tree.leaves(params)
    frozen = [is_frozen(_path_keys(path)) for path, _ in flat]

    # One read of the gradients yields both clip stages analytically:
    # per-leaf square sums → global norm → stage-1 coef; stage 2 then clips
    # ‖coef·g‖ = coef·√sq per leaf.  The combined scale folds into the
    # moment update below, so no scaled gradient copy is ever materialized
    # (one full HBM pass saved vs the naive two-stage form; the math is the
    # reference's exactly — frozen leaves contribute no gradient, matching
    # requires_grad=False → grad None).
    sq = [jnp.zeros(()) if fz
          else jnp.sum(jnp.square(g.astype(jnp.float32)))
          for (_, g), fz in zip(flat, frozen)]
    gnorm = jnp.sqrt(sum(sq))
    # max_grad_norm <= 0 disables BOTH clip stages (stage 2 already guards;
    # an unguarded stage 1 would compute coef = min(0/norm, 1) = 0 and
    # silently zero every gradient)
    coef = (jnp.minimum(cfg.max_grad_norm / (gnorm + 1e-6), 1.0)  # stage 1
            if cfg.max_grad_norm > 0 else jnp.ones(()))

    def leaf_update(path, g, sq_l, m, v, p):
        keys = _path_keys(path)
        if host_moments:
            m = jax.device_put(m, dev_s)
            v = jax.device_put(v, dev_s)
        g = g.astype(jnp.float32)
        scale = coef
        if cfg.max_grad_norm > 0:                 # stage 2 (optimization.py:181)
            pnorm = coef * jnp.sqrt(sq_l)
            scale = scale * jnp.minimum(
                cfg.max_grad_norm / (pnorm + 1e-6), 1.0)
        g = g * scale
        # moment math always in fp32; only the carried state is stored in
        # cfg.moments_dtype (bf16 halves optimizer HBM for ViT-L-class runs)
        new_m = cfg.b1 * m.astype(jnp.float32) + (1.0 - cfg.b1) * g
        new_v = cfg.b2 * v.astype(jnp.float32) + (1.0 - cfg.b2) * jnp.square(g)
        update = new_m / (jnp.sqrt(new_v) + cfg.eps)
        if not is_no_decay(keys) and cfg.weight_decay > 0:
            update = update + cfg.weight_decay * p
        lr = cfg.lr * (cfg.coef_lr if is_clip_branch(keys) else 1.0)
        new_p = p - lr * lr_mult * update
        new_m = new_m.astype(m.dtype)
        new_v = new_v.astype(v.dtype)
        if host_moments:
            new_m = jax.device_put(new_m, host_s)
            new_v = jax.device_put(new_v, host_s)
        return new_p.astype(p.dtype), new_m, new_v

    new_p, new_m, new_v = [], [], []
    for (path, g), sq_l, fz, m, v, p in zip(flat, sq, frozen, m_leaves,
                                            v_leaves, p_leaves):
        if fz:
            np_, nm, nv = p, m, v
        else:
            np_, nm, nv = leaf_update(path, g, sq_l, m, v, p)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    return (
        jax.tree.unflatten(treedef, new_p),
        BertAdamState(step=state.step + 1,
                      m=jax.tree.unflatten(treedef, new_m),
                      v=jax.tree.unflatten(treedef, new_v)),
    )


def current_lr(state: BertAdamState, cfg: OptimizerConfig, t_total: int) -> jnp.ndarray:
    sched = SCHEDULES[cfg.schedule]
    return cfg.lr * sched(state.step.astype(jnp.float32) / float(t_total),
                          cfg.warmup_proportion)

"""Explicit shard_map SPMD losses — the row-sharded "north-star" form.

The default multi-chip path lets GSPMD partition the gathered-batch loss
(train/step.py); it is correct and collective-optimal for small models, but
Pallas kernels cannot be auto-partitioned, so meshes fall back to the XLA
einsum paths.  This module provides the explicit form (SURVEY.md §2.2,
"phase B"):

  per shard (data axis, S shards, B = S·B_local):
    1. encode the LOCAL batch rows (fused attention kernel legal per shard),
    2. all_gather token features/masks (the reference's NCCL gather,
       modeling.py:273-280 — ~10 MB at B=128),
    3. compute the shard's ROW BLOCK of the token-interaction similarity and
       of the two memory-bank matrices with the FUSED Pallas kernel — the
       [B,T,B,V]-shaped work is what actually needs sharding,
    4. all_gather the tiny [B_local, B]/[B_local, M] results (≤1 MB).

  The gathered matrices and features are replicated, so the four losses are
  then computed with the exact single-chip code (losses/hubness.py) —
  bit-identical math, gradients flow back through the gathers (all_gather
  transposes to psum_scatter under AD).

Numerical equivalence with the GSPMD path is asserted in
tests/test_spmd.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import Config
from ..models import neighborretr as model

Params = Dict[str, Any]


# version-portable shard_map shared with pipeline.py (one place tracks the
# jax.shard_map API moves); the gathers make outputs replicated, which the
# replication checker cannot always prove — hence compat's checking off
from .mesh import shard_map_compat as _shard_map  # noqa: E402


def _resolve_kernels(cfg) -> Tuple[str, bool]:
    """(attention_impl for the per-shard encoder, use_pallas verdict).

    Unlike model.resolve_fused_attention's 'auto' (which requires a single
    device — GSPMD can't partition pallas_call), per-shard kernels are the
    POINT of explicit SPMD, so 'auto' resolves to the fused kernel on TPU.
    The kernels' bf16-only contract still holds: under
    compute_dtype='float32', 'auto' degrades to einsum (an EXPLICIT
    'fused'/'fused_block' raises in resolve_fused_attention, same as the
    single-chip path); explicit impls pass through untouched."""
    on_tpu = jax.default_backend() == "tpu"
    impl = cfg.model.attention_impl
    if impl == "auto":
        impl = ("fused" if on_tpu and cfg.model.compute_dtype == "bfloat16"
                else "einsum")
    use_pallas = (cfg.model.use_pallas == "on"
                  or (cfg.model.use_pallas == "auto" and on_tpu))
    return impl, use_pallas


def gather_features_and_rows(params: Params, cfg: Config,
                             batch: Dict[str, jnp.ndarray], bank,
                             axis: str = "data"):
    """The shard-local computation (runs inside shard_map).

    Returns replicated (t_feat, v_feat, t_mask, v_mask, s_local, bank_t2v,
    bank_v2t) — global shapes, identical on every shard.
    """
    mcfg = cfg.model
    attn_impl, use_pallas = _resolve_kernels(cfg)

    # 1. local encode (Pallas kernels per shard)
    import dataclasses
    enc_cfg = dataclasses.replace(mcfg, attention_impl=attn_impl)
    t_l, v_l = model.get_text_video_feat(
        params, enc_cfg, batch["text_ids"], batch["text_mask"],
        batch["video"], batch["video_mask"])
    tm_l = batch["text_mask"].astype(jnp.float32)
    vm_l = batch["video_mask"].astype(jnp.float32)

    # 2. feature gather (differentiable; transpose = psum_scatter)
    t_g = jax.lax.all_gather(t_l, axis, tiled=True)
    v_g = jax.lax.all_gather(v_l, axis, tiled=True)
    tm_g = jax.lax.all_gather(tm_l, axis, tiled=True)
    vm_g = jax.lax.all_gather(vm_l, axis, tiled=True)

    # 3. row blocks of the expensive token-interaction matrices.
    # The in-batch rows mirror step.py's gating exactly (XLA einsum for
    # short tokens, blocked kernel for T·V ≥ 2k): the GSPMD and explicit
    # paths must stay bit-equal, and a kernel-vs-einsum mismatch here would
    # diverge them on TPU.  The bank matrices keep the resolved verdict
    # (both paths use it there).
    sim_dtype = mcfg.sim_dtype
    long_tokens = t_l.shape[1] * v_g.shape[1] >= 2048
    s_rows = model.local_similarity(params, t_l, v_g, tm_l, vm_g,
                                    use_pallas if long_tokens else False,
                                    sim_dtype)                  # [B_l, B]
    bank_t2v_rows = model.local_similarity(
        params, t_l, bank.feat_v, tm_l, bank.mask_v, use_pallas,
        sim_dtype)                                              # [B_l, M]
    bank_v2t_rows = model.local_similarity(
        params, bank.feat_t, v_l, bank.mask_t, vm_l, use_pallas,
        sim_dtype).T                                            # [B_l, M]

    # 4. gather the tiny results → replicated global matrices
    s_local = jax.lax.all_gather(s_rows, axis, tiled=True)      # [B, B]
    bank_t2v = jax.lax.all_gather(bank_t2v_rows, axis, tiled=True)
    bank_v2t = jax.lax.all_gather(bank_v2t_rows, axis, tiled=True)
    return t_g, v_g, tm_g, vm_g, s_local, bank_t2v, bank_v2t


def compute_losses_spmd(params: Params, cfg: Config,
                        batch: Dict[str, jnp.ndarray], bank, key: jax.Array,
                        mesh: Mesh, axis: str = "data"):
    """Drop-in for train/step.compute_losses under an explicit mesh."""
    from ..losses import hubness

    if len(mesh.axis_names) > 1:
        # shard_mapping P(axis) over one axis of a multi-axis mesh would
        # re-encode the full batch once per replica group AND psum the P()
        # param cotangents over the WHOLE mesh — gradients scaled by the
        # replica factor, silently changing the effective LR.  The GSPMD
        # path handles hybrid/TP meshes correctly.
        raise ValueError(
            f"explicit_spmd requires a 1-D ('{axis}',) mesh; got axes "
            f"{mesh.axis_names} — use the GSPMD path on hybrid/multi-axis "
            "meshes")
    if axis not in mesh.axis_names:
        # a cfg.train.data_axis that doesn't name the mesh's axis would
        # otherwise die inside jit with an unbound-axis-name error
        raise ValueError(
            f"data_axis '{axis}' does not name the mesh axis "
            f"{mesh.axis_names} — the explicit-SPMD shard_map binds "
            "collectives to it by name")

    def body(params, batch, bank):
        return gather_features_and_rows(params, cfg, batch, bank, axis=axis)

    sharded = _shard_map(body, mesh, in_specs=(P(), P(axis), P()),
                         out_specs=P())
    (t_feat, v_feat, t_mask, v_mask,
     s_local, bank_t2v, bank_v2t) = sharded(params, batch, bank)

    lcfg = cfg.loss
    # global path + losses: tiny replicated compute, single-chip code verbatim
    g_t, g_v = model.merge_global_features(
        params, cfg.model, t_feat, v_feat, t_mask, v_mask,
        key if cfg.model.cluster_noise else None)
    s_global = model.global_level(params, g_t, g_v)

    uniform_loss = 0.5 * (
        hubness.uniform_regularization_loss(
            s_global, lcfg.temperature, lcfg.beta, lcfg.sinkhorn_iterations)
        + hubness.uniform_regularization_loss(
            s_global.T, lcfg.temperature, lcfg.beta, lcfg.sinkhorn_iterations))
    kl_loss = 0.5 * (hubness.kl_divergence_loss(s_global, s_local)
                     + hubness.kl_divergence_loss(s_global.T, s_local.T))
    t_w, v_w = hubness.centrality_weights(
        t_feat, v_feat, g_t, g_v, lcfg.centrality_scale)
    scale = model.logit_scale(params)
    centrality_loss = 0.5 * (
        hubness.centrality_weighting_loss(s_local * scale, t_w)
        + hubness.centrality_weighting_loss(s_local.T * scale, v_w))
    neighbor_loss = 0.5 * (
        hubness.neighbor_adjusting_loss(
            s_local, bank_v2t, lcfg.num_neighbors, lcfg.temperature)
        + hubness.neighbor_adjusting_loss(
            s_local.T, bank_t2v, lcfg.num_neighbors, lcfg.temperature))

    total = (centrality_loss
             + uniform_loss * lcfg.uniform_weight
             + neighbor_loss * lcfg.neighbor_weight
             + kl_loss * lcfg.kl_weight)
    aux = {
        "loss": total,
        "centrality_loss": centrality_loss,
        "uniform_loss": uniform_loss,
        "neighbor_loss": neighbor_loss,
        "kl_loss": kl_loss,
        "text_feat": jax.lax.stop_gradient(t_feat),
        "video_feat": jax.lax.stop_gradient(v_feat),
    }
    return total, aux

"""Jitted training step: forward, losses, optimizer, memory-bank refresh.

One SPMD program replaces the reference's per-rank forward + NCCL allgather +
DDP backward (modeling.py:273-280, trainer.py:66-129): arrays are globally
shaped, the batch is sharded over the `data` mesh axis at the call boundary,
and XLA inserts ICI collectives where einsums span the batch.  The loss math
operates on the global batch exactly like the reference's gathered-tensor
computation, so gradients match DDP's averaged gradients analytically.

Losses composed per modeling.py:314-360:
    total = centrality + w_u·uniform + w_n·neighbor + w_kl·KL
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Config
from ..losses import hubness
from ..models import neighborretr as model
from . import bertadam
from .memory_bank import MemoryBank, fifo_update

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Any
    opt: bertadam.BertAdamState
    bank: MemoryBank
    step: jnp.ndarray


def create_train_state(params: Params, bank: MemoryBank,
                       moments_dtype: str = "float32",
                       moments_placement: str = "device",
                       mesh=None) -> TrainState:
    opt = bertadam.bert_adam_init(params, moments_dtype=moments_dtype)
    opt = bertadam.place_moments(opt, moments_placement, mesh)
    return TrainState(params=params, opt=opt, bank=bank,
                      step=jnp.zeros((), jnp.int32))


def _maybe_device_augment(cfg: Config, batch: Dict[str, jnp.ndarray],
                          key: jax.Array) -> Dict[str, jnp.ndarray]:
    """On-chip RandAugment ahead of normalize_frames when
    --augment_backend device: the host then ships raw packed bytes and the
    augment math rides the accelerator (ops/device_augment.py).  The augment
    key folds from the step key, so resumes replay the same draws and the
    cluster-noise stream below is untouched."""
    if (cfg.data.augment_backend != "device" or not cfg.data.train_augment
            or not cfg.data.augment):
        return batch
    from ..ops.device_augment import augment_batch
    if batch["video"].dtype != jnp.uint8:
        raise TypeError(
            "--augment_backend device needs uint8 frames from the loader "
            f"(got {batch['video'].dtype}); the host pipeline must not "
            "normalize or augment first")
    video = augment_batch(batch["video"], batch["video_mask"],
                          jax.random.fold_in(key, 0x41554721),
                          cfg.data.augment)
    return dict(batch, video=video)


def _microbatched_features(params: Params, mcfg, batch: Dict[str, jnp.ndarray],
                           n: int):
    """Exact large-batch encoding in `n` sequential microbatches.

    The contrastive losses need the FULL B×B similarity matrix, so naive
    gradient accumulation over sub-batches changes the objective.  Instead
    the encoders run as a lax.map over microbatches with jax.checkpoint:
    forward keeps only the (small) output features per microbatch, and the
    backward pass re-runs one microbatch's encoder at a time, seeding it
    with the loss's feature cotangents — gradients identical to the
    monolithic encode (GradCache, Gao et al. 2021, expressed as map+remat
    instead of an explicit two-pass VJP).  Peak activation memory drops ~n×
    for one extra encoder forward.
    """
    B = batch["text_ids"].shape[0]

    def split(x):
        return x.reshape(n, B // n, *x.shape[1:])

    mbs = {k: split(batch[k])
           for k in ("text_ids", "text_mask", "video", "video_mask")}

    @jax.checkpoint
    def enc(p, mb):
        return model.get_text_video_feat(
            p, mcfg, mb["text_ids"], mb["text_mask"],
            mb["video"], mb["video_mask"])

    t, v = jax.lax.map(lambda mb: enc(params, mb), mbs)
    return t.reshape(B, *t.shape[2:]), v.reshape(B, *v.shape[2:])


def compute_losses(params: Params, cfg: Config, batch: Dict[str, jnp.ndarray],
                   bank: MemoryBank, key: jax.Array
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Global-batch loss; returns (total, aux dict incl. fresh features)."""
    mcfg, lcfg = cfg.model, cfg.loss
    if cfg.train.micro_batches > 1:
        text_feat, video_feat = _microbatched_features(
            params, mcfg, batch, cfg.train.micro_batches)
    else:
        text_feat, video_feat = model.get_text_video_feat(
            params, mcfg, batch["text_ids"], batch["text_mask"],
            batch["video"], batch["video_mask"])
    t_mask = batch["text_mask"].astype(jnp.float32)
    v_mask = batch["video_mask"].astype(jnp.float32)

    # Fused Pallas similarity pays off only where the [B,T,M,V] logits
    # intermediate is large — the memory-bank matrices (bench: 14.3 vs 15.9 ms
    # at 128x1920, plus ~300 MB HBM saved); the in-batch B×B matrix is faster
    # through XLA's einsum (7.7 vs 11.2 ms at 128x128), so it stays XLA.
    use_pallas_bank = model.resolve_use_pallas(mcfg)
    # local (token-interaction) similarity, v2t = S.T.  Short shapes force
    # the XLA einsum (faster at B×B); long-token shapes (T·V ≥ 2k) pass the
    # resolved verdict so the blocked kernel serves them unless the user
    # set use_pallas="off".
    long_tokens = text_feat.shape[1] * video_feat.shape[1] >= 2048
    s_local = model.local_similarity(
        params, text_feat, video_feat, t_mask, v_mask,
        use_pallas_bank if long_tokens else False,
        sim_dtype=mcfg.sim_dtype)  # same dtype as the bank matrices and the
    # explicit-SPMD path (spmd.py:90) — the two paths must stay bit-equal

    # global path: CTM merge → global similarity → uniform + KL
    g_t, g_v = model.merge_global_features(
        params, mcfg, text_feat, video_feat, t_mask, v_mask,
        key if mcfg.cluster_noise else None)
    s_global = model.global_level(params, g_t, g_v)

    uniform_loss = 0.5 * (
        hubness.uniform_regularization_loss(
            s_global, lcfg.temperature, lcfg.beta, lcfg.sinkhorn_iterations)
        + hubness.uniform_regularization_loss(
            s_global.T, lcfg.temperature, lcfg.beta, lcfg.sinkhorn_iterations))

    kl_loss = 0.5 * (hubness.kl_divergence_loss(s_global, s_local)
                     + hubness.kl_divergence_loss(s_global.T, s_local.T))

    # centrality-weighted contrastive
    t_w, v_w = hubness.centrality_weights(
        text_feat, video_feat, g_t, g_v, lcfg.centrality_scale)
    scale = model.logit_scale(params)
    centrality_loss = 0.5 * (
        hubness.centrality_weighting_loss(s_local * scale, t_w)
        + hubness.centrality_weighting_loss(s_local.T * scale, v_w))

    # neighbor adjusting vs the memory bank.  The bank matrices feed the
    # loss ONLY through a mean over the bank axis (until_module.py:181), so
    # the fused path computes similarity + that reduction in ONE kernel with
    # the bank features resident in HBM — the [B, M] matrices never
    # materialize (loss-side fusion per the north-star contract).
    if use_pallas_bank and model.bank_fusion_supported(mcfg):
        cent_t = model.bank_centrality(                    # mean_m S(text, bank_v)
            params, text_feat, bank.feat_v, t_mask, bank.mask_v,
            axis=1, sim_dtype=mcfg.sim_dtype)
        cent_v = model.bank_centrality(                    # mean_m S(bank_t, video)
            params, bank.feat_t, video_feat, bank.mask_t, v_mask,
            axis=0, sim_dtype=mcfg.sim_dtype)
        neighbor_loss = 0.5 * (
            hubness.neighbor_adjusting_loss_from_centrality(
                s_local, cent_v, lcfg.num_neighbors, lcfg.temperature)
            + hubness.neighbor_adjusting_loss_from_centrality(
                s_local.T, cent_t, lcfg.num_neighbors, lcfg.temperature))
    else:
        bank_t2v = model.local_similarity(
            params, text_feat, bank.feat_v, t_mask, bank.mask_v,
            use_pallas_bank, sim_dtype=mcfg.sim_dtype)                    # [B, M]
        bank_v2t = model.local_similarity(
            params, bank.feat_t, video_feat, bank.mask_t, v_mask,
            use_pallas_bank, sim_dtype=mcfg.sim_dtype).T                  # [B, M]
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
        "text_feat": jax.lax.stop_gradient(text_feat),
        "video_feat": jax.lax.stop_gradient(video_feat),
    }
    return total, aux


@functools.partial(jax.jit, static_argnames=("cfg", "t_total", "mesh"),
                   donate_argnames=("state",))
def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               key: jax.Array, cfg: Config, t_total: int,
               mesh=None) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step.  `mesh` (static): when provided together with
    cfg.train.explicit_spmd, the loss runs through the shard_map row-sharded
    path (parallel/spmd.py); otherwise GSPMD partitions the gathered form."""
    batch = _maybe_device_augment(cfg, batch, key)
    host_bank = cfg.train.bank_placement == "host"
    if host_bank:
        # bank parked in pinned host memory between steps: stream it to
        # HBM for the loss, push the FIFO result back out below
        from .memory_bank import bank_to_memory
        state = state._replace(bank=bank_to_memory(state.bank, "device",
                                                   mesh))
    if mesh is not None and cfg.train.explicit_spmd and mesh.devices.size > 1:
        from ..parallel.spmd import compute_losses_spmd
        loss_fn = functools.partial(compute_losses_spmd, mesh=mesh,
                                    axis=cfg.train.data_axis)
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, cfg, batch, state.bank, key)
    else:
        from ..parallel import pipeline as pp
        ctx = None
        if (mesh is not None and cfg.train.pipeline_parallel > 1
                and "stage" in mesh.axis_names):
            ctx = pp.PipelineContext(
                mesh=mesh, stages=cfg.train.pipeline_parallel,
                microbatches=(cfg.train.pipeline_microbatches
                              or 4 * cfg.train.pipeline_parallel),
                data_axis=cfg.train.data_axis)
        # the context routes transformer_apply at TRACE time and derives
        # only from jit-static args (cfg, mesh), so cached executables and
        # their traces always agree
        with pp.activated(ctx):
            grads, aux = jax.grad(compute_losses, has_aux=True)(
                state.params, cfg, batch, state.bank, key)

    new_params, new_opt = bertadam.bert_adam_update(
        grads, state.opt, state.params, cfg.optim, t_total, mesh=mesh)
    new_params = model.clamp_logit_scale(new_params, cfg.loss.max_logit_scale)

    # FIFO bank refresh with the freshly encoded batch (modeling.py:309-310)
    new_bank = fifo_update(
        state.bank, batch["idx"].astype(jnp.int32),
        aux.pop("text_feat"), aux.pop("video_feat"),
        batch["text_mask"].astype(jnp.float32),
        batch["video_mask"].astype(jnp.float32))
    if host_bank:
        from .memory_bank import bank_to_memory
        new_bank = bank_to_memory(new_bank, "pinned_host", mesh)

    metrics = dict(aux)
    # clip-effective norm (frozen patch_embed excluded), so the logged value
    # is comparable to max_grad_norm and to the reference's clip logs
    metrics["grad_norm"] = bertadam.clip_effective_norm(grads)
    metrics["logit_scale"] = model.logit_scale(new_params)

    return TrainState(params=new_params, opt=new_opt, bank=new_bank,
                      step=state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("bank",))
def fill_bank_step(params: Params, bank: MemoryBank,
                   batch: Dict[str, jnp.ndarray], cfg: Config,
                   offset, key=None) -> MemoryBank:
    """Epoch-start bank fill: encode one batch, write at `offset`
    (utils/memory_bank.py:124-211).  `offset` is a TRACED scalar —
    write_slice is a dynamic_update_slice — so the mb_batch fill batches
    share ONE compiled program instead of recompiling per offset.  `key`
    (optional) enables the device augment backend for the fill batches —
    the reference's bank loader IS a train loader, so its clips are
    augmented too (memory_bank.py:49-78)."""
    from .memory_bank import bank_to_memory, write_slice
    if key is not None:
        batch = _maybe_device_augment(cfg, batch, key)
    host_bank = cfg.train.bank_placement == "host"
    if host_bank:
        bank = bank_to_memory(bank, "device")
    text_feat, video_feat = model.get_text_video_feat(
        params, cfg.model, batch["text_ids"], batch["text_mask"],
        batch["video"], batch["video_mask"])
    out = write_slice(
        bank, offset, batch["idx"].astype(jnp.int32),
        text_feat, video_feat,
        batch["text_mask"].astype(jnp.float32),
        batch["video_mask"].astype(jnp.float32))
    return bank_to_memory(out, "pinned_host") if host_bank else out

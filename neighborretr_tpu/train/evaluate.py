"""Evaluation harness: feature cache → blocked similarity → R@K metrics.

Rebuilds the reference's two-phase evaluator (training/evaluator.py:21-292):

  1. Feature cache: iterate the test loader once, encoding text and video with
     jitted static-shape batch functions (trailing partial batches are padded
     and trimmed via the loader's `valid` flags).  For the multi-sentence
     protocol (MSVD) only one video row per caption group is kept — the rows at
     `cut_off_points - 1` (evaluator.py:146-156).
  2. Blocked similarity: jit-compiled [block × all-videos] similarity rows
     (reference: 64×64 double loop on GPU → here one row-block per call with
     the full video set resident on device).
  3. Metrics: rank-of-diagonal, or the 3-D multi-sentence variants with -inf
     padding per caption group (evaluator.py:216-260).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models import neighborretr as model
from . import metrics as M

Params = Dict[str, Any]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_batch(params, cfg: Config, text_ids, text_mask, video, video_mask):
    tf = model.get_text_feat(params, cfg.model, text_ids, text_mask)
    vf = model.get_video_feat(params, cfg.model, video, video_mask)
    return tf, vf


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sim_block(params, cfg: Config, t_feat, v_feat, t_mask, v_mask):
    return model.local_similarity(params, t_feat, v_feat, t_mask, v_mask,
                                  model.resolve_use_pallas(cfg.model))


def extract_features(params: Params, cfg: Config, loader, mesh=None
                     ) -> Tuple[jnp.ndarray, np.ndarray, jnp.ndarray, np.ndarray]:
    """Cache all text/video features.

    Feature tensors STAY ON DEVICE (device→host→device round-trips per eval
    cost seconds through remote-attached TPUs); padded/duplicate rows are
    dropped and dataset order restored with one device gather.  Masks are
    small and returned as numpy.  With a mesh, eval batches are sharded over
    the data axis so encoding runs data-parallel (the reference's multi-GPU
    eval gather, evaluator.py:158-189, without the reorder dance)."""
    if mesh is not None:
        from ..parallel.mesh import batch_sharding
        sharding = batch_sharding(mesh)

        def place(v):
            return jax.device_put(np.asarray(v), sharding)
    else:
        place = jnp.asarray
    t_feats, t_masks, v_feats, v_masks, ids, valids = [], [], [], [], [], []
    for batch in loader:
        tf, vf = _encode_batch(params, cfg,
                               place(batch["text_ids"]),
                               place(batch["text_mask"]),
                               place(batch["video"]),
                               place(batch["video_mask"]))
        t_feats.append(tf)
        v_feats.append(vf)
        t_masks.append(batch["text_mask"])
        v_masks.append(batch["video_mask"])
        ids.append(batch["idx"])
        valids.append(batch["valid"])

    ids = np.concatenate(ids)
    valid = np.concatenate(valids)
    # restore dataset order over the valid rows (evaluator.py:180-189)
    row_index = np.nonzero(valid)[0][np.argsort(ids[valid])]
    gather = jnp.asarray(row_index)
    t_feat = jnp.concatenate(t_feats)[gather]
    v_feat = jnp.concatenate(v_feats)[gather]
    t_mask = np.concatenate(t_masks)[row_index]
    v_mask = np.concatenate(v_masks)[row_index]
    return t_feat, t_mask, v_feat, v_mask


def similarity_matrix(params: Params, cfg: Config,
                      t_feat: np.ndarray, t_mask: np.ndarray,
                      v_feat: np.ndarray, v_mask: np.ndarray,
                      block: int = 128) -> np.ndarray:
    """Full [N_text, N_video] similarity.

    Features move to the device ONCE (host↔device transfer per block was the
    eval bottleneck: 2.4 s → ~0.1 s for 1000×1000 on a tunneled v5e).  The
    fused Pallas kernel never materializes the [N,T,N,V] logits, so it takes
    the whole matrix in one call; the XLA einsum path is row-blocked on
    device only when the logits intermediate would exceed ~2 GB."""
    n_t, T = t_feat.shape[:2]
    V = v_feat.shape[1]
    t_feat_d = jnp.asarray(t_feat)
    t_mask_d = jnp.asarray(t_mask)
    v_feat_d = jnp.asarray(v_feat)
    v_mask_d = jnp.asarray(v_mask)

    logits_bytes = n_t * T * v_feat.shape[0] * V * 4
    if (model.resolve_use_pallas(cfg.model)
            or logits_bytes <= 2 * 1024 ** 3):
        sim = _sim_block(params, cfg, t_feat_d, v_feat_d, t_mask_d, v_mask_d)
        return np.asarray(sim)

    rows = []
    pad = (-n_t) % block
    if pad:   # pad rows so a single block program compiles
        t_feat_d = jnp.concatenate(
            [t_feat_d, jnp.repeat(t_feat_d[-1:], pad, 0)])
        t_mask_d = jnp.concatenate(
            [t_mask_d, jnp.repeat(t_mask_d[-1:], pad, 0)])
    for s in range(0, n_t, block):
        sim = _sim_block(params, cfg, jax.lax.dynamic_slice_in_dim(
            t_feat_d, s, block), v_feat_d,
            jax.lax.dynamic_slice_in_dim(t_mask_d, s, block), v_mask_d)
        rows.append(np.asarray(sim)[: min(block, n_t - s)])
    return np.concatenate(rows, axis=0)


def reshape_multi_sentence(sim: np.ndarray, cut_off_points) -> np.ndarray:
    """[N_caps, V] → [V, max_caps, V] with -inf padding per caption group
    (evaluator.py:227-243; cut_off_points are exclusive end indices)."""
    ends = list(cut_off_points)
    starts = [0] + ends[:-1]
    max_len = max(e - s for s, e in zip(starts, ends))
    out = []
    for s, e in zip(starts, ends):
        pad = np.full((max_len - (e - s), sim.shape[1]), -np.inf)
        out.append(np.concatenate([sim[s:e], pad], axis=0))
    return np.stack(out, axis=0)


def evaluate(params: Params, cfg: Config, loader, dataset=None,
             logger=None, mesh=None
             ) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Full evaluation; returns (t2v_metrics, v2t_metrics)."""
    import time
    dataset = dataset if dataset is not None else loader.dataset
    multi = getattr(dataset, "multi_sentence_per_video", False)

    tic = time.time()
    t_feat, t_mask, v_feat, v_mask = extract_features(params, cfg, loader,
                                                      mesh=mesh)
    feat_time = time.time() - tic

    if multi:
        # keep one video per caption group: rows at cut_off_points - 1
        keep = np.asarray(dataset.cut_off_points) - 1
        v_feat = v_feat[keep]
        v_mask = v_mask[keep]

    tic = time.time()
    sim = similarity_matrix(params, cfg, t_feat, t_mask, v_feat, v_mask)
    sim_time = time.time() - tic

    if multi:
        # the reference reshapes the SAME caption-grouped matrix for both
        # directions (evaluator.py:219-243: v2t = sim.T.T)
        sim_3d = reshape_multi_sentence(sim, dataset.cut_off_points)
        t2v = M.tensor_text_to_video_metrics(sim_3d)
        v2t = M.compute_metrics(M.tensor_video_to_text_sim(sim_3d))
    else:
        t2v = M.compute_metrics(sim)
        v2t = M.compute_metrics(sim.T)

    if logger is not None:
        # per-phase timing breakdown (evaluator.py:266-271)
        logger.info("Eval timing: features %.1fs, similarity %.1fs "
                    "(%d texts x %d videos)", feat_time, sim_time,
                    sim.shape[0], sim.shape[1] if sim.ndim == 2 else sim.shape[-1])
        mean_r1 = (t2v["R1"] + v2t["R1"]) / 2
        logger.info("Mean R@1: %.4f", mean_r1)
        logger.info(M.format_metrics(t2v, "Text-to-Video: "))
        logger.info(M.format_metrics(v2t, "Video-to-Text: "))
    return t2v, v2t

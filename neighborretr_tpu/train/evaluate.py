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


def extract_features(params: Params, cfg: Config, loader
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cache all text/video features. Returns numpy (t_feat, t_mask, v_feat, v_mask)."""
    t_feats, t_masks, v_feats, v_masks, ids = [], [], [], [], []
    for batch in loader:
        tf, vf = _encode_batch(params, cfg,
                               jnp.asarray(batch["text_ids"]),
                               jnp.asarray(batch["text_mask"]),
                               jnp.asarray(batch["video"]),
                               jnp.asarray(batch["video_mask"]))
        valid = batch["valid"]
        t_feats.append(np.asarray(tf)[valid])
        t_masks.append(batch["text_mask"][valid])
        v_feats.append(np.asarray(vf)[valid])
        v_masks.append(batch["video_mask"][valid])
        ids.append(batch["idx"][valid])

    ids = np.concatenate(ids)
    order = np.argsort(ids)     # restore dataset order (evaluator.py:180-189)
    t_feat = np.concatenate(t_feats)[order]
    t_mask = np.concatenate(t_masks)[order]
    v_feat = np.concatenate(v_feats)[order]
    v_mask = np.concatenate(v_masks)[order]
    return t_feat, t_mask, v_feat, v_mask


def similarity_matrix(params: Params, cfg: Config,
                      t_feat: np.ndarray, t_mask: np.ndarray,
                      v_feat: np.ndarray, v_mask: np.ndarray,
                      block: int = 128) -> np.ndarray:
    """Full [N_text, N_video] similarity via row-blocked jitted calls.

    Rows are padded to the block size so only one program compiles."""
    n_t = t_feat.shape[0]
    v_feat_d = jnp.asarray(v_feat)
    v_mask_d = jnp.asarray(v_mask)
    rows = []
    for s in range(0, n_t, block):
        e = min(s + block, n_t)
        tf = t_feat[s:e]
        tm = t_mask[s:e]
        if e - s < block:   # pad to static shape
            pad = block - (e - s)
            tf = np.concatenate([tf, np.repeat(tf[-1:], pad, 0)])
            tm = np.concatenate([tm, np.repeat(tm[-1:], pad, 0)])
        sim = _sim_block(params, cfg, jnp.asarray(tf), v_feat_d,
                         jnp.asarray(tm), v_mask_d)
        rows.append(np.asarray(sim)[: e - s])
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
             logger=None) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Full evaluation; returns (t2v_metrics, v2t_metrics)."""
    import time
    dataset = dataset if dataset is not None else loader.dataset
    multi = getattr(dataset, "multi_sentence_per_video", False)

    tic = time.time()
    t_feat, t_mask, v_feat, v_mask = extract_features(params, cfg, loader)
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

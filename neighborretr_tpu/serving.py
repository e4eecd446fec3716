"""Retrieval serving: precomputed video index + free-text top-k search.

Deployment path beyond the reference (which only ships train/eval): encode a
video corpus ONCE into a compact on-disk index, then answer text queries
against it without touching the video pipeline again.  Ranking runs through
the same token-interaction similarity as eval (`models/neighborretr.py::
local_similarity`, the reference's `get_similarity_logits`,
modeling.py:625-632), so search scores are exactly the eval scores.

Index layout (npz):
  video_ids [N]      unicode video ids (dataset order, deduplicated)
  v_feat    [N,F,E]  temporal video features, fp16 (halved disk/HBM traffic;
                     scores stay within float rounding of eval — the MXU
                     computes in bf16 anyway)
  v_mask    [N,F]    frame validity
  meta      json     model/config fingerprint checked at query time
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .core.config import Config
from .data.text import encode_caption
from .train.evaluate import (_encode_text_batch, _encode_video_batch,
                             similarity_matrix_device)

Params = Dict[str, Any]


def _config_meta(cfg: Config) -> Dict[str, Any]:
    m = cfg.model
    return {"embed_dim": m.clip.embed_dim, "max_words": m.max_words,
            "max_frames": m.max_frames,
            "image_resolution": m.clip.image_resolution}


def build_video_index(params: Params, cfg: Config, loader,
                      dataset=None, logger=None) -> Dict[str, np.ndarray]:
    """Encode every unique video the loader yields (deduplicated by the
    stable per-video hash — multi-sentence datasets repeat each video once
    per caption, dataloader_msvd_retrieval.py semantics)."""
    dataset = dataset if dataset is not None else loader.dataset
    pairs = getattr(dataset, "pairs", None)
    seen = set()
    feats, masks, ids = [], [], []
    for batch in loader:
        keep = []                          # in-batch rows to retain
        for i, (row, ok) in enumerate(zip(batch["idx"], batch["valid"])):
            h = int(batch["video_hash"][i])
            if not ok or h in seen:
                continue
            seen.add(h)
            keep.append(i)
            ids.append(pairs[int(row)][0] if pairs is not None
                       else f"video{int(row)}")
        if not keep:
            continue
        vf = _encode_video_batch(params, cfg, jnp.asarray(batch["video"]),
                                 jnp.asarray(batch["video_mask"]))
        feats.append(np.asarray(vf, np.float16)[keep])
        masks.append(np.asarray(batch["video_mask"], np.float32)[keep])
        if logger is not None:
            logger.info("Indexed %d videos", len(ids))
    return {"video_ids": np.asarray(ids),
            "v_feat": np.concatenate(feats),
            "v_mask": np.concatenate(masks),
            "meta": np.frombuffer(
                json.dumps(_config_meta(cfg)).encode(), dtype=np.uint8)}


def save_index(path: str, index: Dict[str, np.ndarray]) -> None:
    np.savez(path, **index)


def load_index(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def _check_meta(index: Dict[str, np.ndarray], cfg: Config) -> None:
    if "meta" not in index:
        return
    stored = json.loads(bytes(index["meta"].tobytes()).decode())
    current = _config_meta(cfg)
    mismatched = {k: (v, current[k]) for k, v in stored.items()
                  if k in current and k != "max_words" and current[k] != v}
    if mismatched:
        raise ValueError(
            f"index was built with a different model config: {mismatched} "
            f"(index value, current value)")


def encode_queries(params: Params, cfg: Config, tokenizer,
                   queries: Sequence[str]) -> Tuple[jnp.ndarray, np.ndarray]:
    """Free-text queries → [Q, W, E] text features + [Q, W] mask (same
    CLS/SEP/truncate/pad pipeline as the datasets, data/text.py)."""
    enc = [encode_caption(tokenizer, q, cfg.model.max_words) for q in queries]
    ids = np.stack([e[0] for e in enc])
    mask = np.stack([e[1] for e in enc])
    t_feat = _encode_text_batch(params, cfg, jnp.asarray(ids),
                                jnp.asarray(mask))
    return t_feat, mask


def search(params: Params, cfg: Config, index: Dict[str, np.ndarray],
           tokenizer, queries: Sequence[str], topk: int = 5,
           ) -> List[List[Tuple[str, float]]]:
    """Top-k videos per query: [(video_id, similarity), ...] per query,
    ranked by the full token-interaction eval similarity."""
    _check_meta(index, cfg)
    t_feat, t_mask = encode_queries(params, cfg, tokenizer, queries)
    sim = np.asarray(similarity_matrix_device(
        params, cfg, t_feat, t_mask,
        jnp.asarray(index["v_feat"], jnp.float32),
        jnp.asarray(index["v_mask"], jnp.float32)))
    k = min(topk, sim.shape[1])
    video_ids = index["video_ids"]
    out = []
    for row in sim:
        top = np.argsort(-row)[:k]
        out.append([(str(video_ids[j]), float(row[j])) for j in top])
    return out

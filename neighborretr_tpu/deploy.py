"""AOT deployment bundles: the serving query program as a portable artifact.

`jax.export` serializes the END-TO-END query computation — text encoding
through the CLIP text tower, token-interaction similarity against the video
corpus (the reference's `get_similarity_logits`, modeling.py:625-632), and
device top-k — into one StableHLO artifact.  A production host deserializes
and runs it with BARE JAX: no framework code, no model definitions, no
Python tracing at load time, and the same artifact serves CPU and TPU
(multi-platform lowering).

This has no reference counterpart (the reference ships train/eval only);
it extends the serving layer (`serving.py`) with a deployment story that is
native to the XLA compilation model: the program IS the deliverable.

Bundle layout (a directory):
  query_program.bin   serialized jax.export.Exported
  params.npz          flat parameter leaves (core/checkpoint.py layout)
  index.npz           the video index (serving.build_video_index layout)
  meta.json           shapes, dtypes manifest, topk, platforms, fingerprint
  bpe_simple_vocab_16e6.txt.gz   tokenizer vocab (queries tokenize with any
                      CLIP BPE implementation; ids are the program's input)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.checkpoint import _atomic_savez, flatten_tree, path_key
from .core.config import Config

Params = Dict[str, Any]

_PROGRAM = "query_program.bin"
_PARAMS = "params.npz"
_INDEX = "index.npz"
_META = "meta.json"


def _sorted_flat(params: Params):
    """Deterministic flat view of the params pytree.

    Returns (sorted_keys, leaves_in_sorted_order, rebuild) where
    rebuild(leaves_sorted) reconstructs the original pytree — callable from
    inside a traced function (treedef and the permutation are Python
    constants).  Sorted-by-key order is the on-disk npz contract, so a
    loader can reproduce the exact input order from params.npz alone."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = [path_key(path) for path, _ in paths_leaves]
    leaves = [leaf for _, leaf in paths_leaves]
    order = sorted(range(len(keys)), key=keys.__getitem__)

    def rebuild(leaves_sorted):
        out = [None] * len(leaves_sorted)
        for pos, idx in enumerate(order):
            out[idx] = leaves_sorted[pos]
        return jax.tree_util.tree_unflatten(treedef, out)

    return [keys[i] for i in order], [leaves[i] for i in order], rebuild


def _pin_xla_paths(cfg: Config) -> Config:
    """Exported programs must be pure StableHLO: Pallas kernels lower to
    backend-specific custom calls that cannot cross platforms, so the
    XLA einsum paths are pinned (scores identical — the serving mesh mode
    relies on the same equivalence, serving.py::Searcher)."""
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, use_pallas="off",
                                       attention_impl="einsum", remat=False))


def export_query_program(params: Params, cfg: Config, n_videos: int,
                         query_batch: int, topk: int,
                         platforms: Sequence[str] = ("cpu", "tpu")):
    """jax.export the query program specialized to this deployment's shapes.

    Signature of the exported computation:
      (param_leaves_sorted, text_ids [Q,W] i32, text_mask [Q,W] f32,
       v_feat [N,F,E] f32, v_mask [N,F] f32) -> (values [Q,k], indices [Q,k])
    """
    from jax import export as jexport

    from .models import neighborretr as model

    if topk < 1 or topk > n_videos:
        raise ValueError(f"topk must be in [1, {n_videos}], got {topk}")
    if query_batch < 1:
        raise ValueError(f"query_batch must be >= 1, got {query_batch}")
    cfg = _pin_xla_paths(cfg)
    m = cfg.model
    keys, leaves, rebuild = _sorted_flat(params)

    def query(leaves_sorted, text_ids, text_mask, v_feat, v_mask):
        p = rebuild(leaves_sorted)
        t_feat = model.get_text_feat(p, m, text_ids, text_mask)
        sim = model.local_similarity(p, t_feat, v_feat, text_mask, v_mask,
                                     use_pallas=False)
        return jax.lax.top_k(sim, topk)

    specs = (
        [jax.ShapeDtypeStruct(np.shape(l), jnp.asarray(l).dtype)
         for l in leaves],
        jax.ShapeDtypeStruct((query_batch, m.max_words), jnp.int32),
        jax.ShapeDtypeStruct((query_batch, m.max_words), jnp.float32),
        jax.ShapeDtypeStruct((n_videos, m.max_frames, m.clip.embed_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((n_videos, m.max_frames), jnp.float32),
    )
    return jexport.export(jax.jit(query), platforms=tuple(platforms))(*specs)


def save_bundle(bundle_dir: str, params: Params, cfg: Config,
                index: Dict[str, np.ndarray], query_batch: int = 8,
                topk: int = 5,
                platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Export + write a complete deployment bundle directory."""
    from . import serving

    serving.check_meta(index, cfg, params)
    n_videos = int(index["v_mask"].shape[0])
    exported = export_query_program(params, cfg, n_videos, query_batch,
                                    topk, platforms)
    os.makedirs(bundle_dir, exist_ok=True)

    keys, leaves, _ = _sorted_flat(params)
    # npz stores bf16 leaves as fp32 (no portable npz bf16); the manifest
    # records the REAL dtype so the loader casts back before calling —
    # the exported program's input avals are exact
    dtypes = {k: str(jnp.asarray(l).dtype) for k, l in zip(keys, leaves)}
    _atomic_savez(os.path.join(bundle_dir, _PARAMS), flatten_tree(params))
    _atomic_savez(os.path.join(bundle_dir, _INDEX), index)
    with open(os.path.join(bundle_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())

    from .data.tokenizer import default_vocab_path
    vocab = default_vocab_path()
    if vocab and os.path.exists(vocab):
        import shutil
        shutil.copy(vocab, os.path.join(bundle_dir,
                                        os.path.basename(vocab)))

    meta = {"query_batch": int(query_batch), "topk": int(topk),
            "n_videos": n_videos, "max_words": int(cfg.model.max_words),
            "platforms": list(platforms), "param_dtypes": dtypes,
            "params_fingerprint": serving.params_fingerprint(params)}
    tmp = os.path.join(bundle_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(bundle_dir, _META))
    return bundle_dir


class Bundle:
    """A loaded deployment bundle: `search(ids, mask)` → (values, indices).

    Everything here runs on bare jax + numpy — deliberately no imports from
    the model/serving layers, so this class documents (and tests enforce,
    tests/test_deploy.py) that the artifact needs no framework code."""

    def __init__(self, exported, param_leaves: List[jnp.ndarray],
                 v_feat: jnp.ndarray, v_mask: jnp.ndarray,
                 video_ids: List[str], meta: Dict[str, Any]):
        self._exported = exported
        self._leaves = param_leaves
        self._v_feat, self._v_mask = v_feat, v_mask
        self.video_ids = video_ids
        self.meta = meta
        self.query_batch = int(meta["query_batch"])
        self.topk = int(meta["topk"])
        self.max_words = int(meta["max_words"])

    def __len__(self) -> int:
        return len(self.video_ids)

    def search_tokens(self, text_ids: np.ndarray, text_mask: np.ndarray,
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """[Q,W] token ids + mask → ([Q,k] scores, [Q,k] corpus indices).
        Q ≤ query_batch; shorter batches pad up (pad rows returned too —
        slice to your real Q)."""
        q = text_ids.shape[0]
        if q > self.query_batch:
            raise ValueError(f"got {q} queries; this bundle was exported "
                             f"for query_batch={self.query_batch}")
        pad = self.query_batch - q
        ids = np.zeros((self.query_batch, self.max_words), np.int32)
        mask = np.zeros((self.query_batch, self.max_words), np.float32)
        ids[:q] = text_ids
        mask[:q] = text_mask
        vals, idx = self._exported.call(self._leaves, jnp.asarray(ids),
                                        jnp.asarray(mask), self._v_feat,
                                        self._v_mask)
        return np.asarray(vals)[:q], np.asarray(idx)[:q]


def load_bundle(bundle_dir: str) -> Bundle:
    """Deserialize a bundle.  Touches only jax.export + numpy — no model
    code, no tracing; first call pays one XLA compile of the stored
    StableHLO for the local backend."""
    from jax import export as jexport

    with open(os.path.join(bundle_dir, _META)) as f:
        meta = json.load(f)
    with open(os.path.join(bundle_dir, _PROGRAM), "rb") as f:
        exported = jexport.deserialize(f.read())

    with np.load(os.path.join(bundle_dir, _PARAMS),
                 allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    dtypes = meta["param_dtypes"]
    leaves = [jnp.asarray(flat[k]).astype(dtypes[k]) for k in sorted(flat)]

    with np.load(os.path.join(bundle_dir, _INDEX),
                 allow_pickle=False) as data:
        index = {k: data[k] for k in data.files}
    if "v_scale" in index:   # int8 index: dequantize (serving.py layout)
        v_feat = (index["v_feat"].astype(np.float32)
                  * index["v_scale"].astype(np.float32)[..., None])
    else:
        v_feat = index["v_feat"].astype(np.float32)
    return Bundle(exported, leaves, jnp.asarray(v_feat),
                  jnp.asarray(index["v_mask"].astype(np.float32)),
                  [str(v) for v in index["video_ids"]], meta)

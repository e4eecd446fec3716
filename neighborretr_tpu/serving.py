"""Retrieval serving: precomputed video index + free-text top-k search.

Deployment path beyond the reference (which only ships train/eval): encode a
video corpus ONCE into a compact on-disk index, then answer text queries
against it without touching the video pipeline again.  Ranking runs through
the same token-interaction similarity as eval (`models/neighborretr.py::
local_similarity`, the reference's `get_similarity_logits`,
modeling.py:625-632); scores match eval to within the fp16 rounding of the
stored video features (the MXU computes in bf16 anyway).

Index layout (npz):
  video_ids [N]      unicode video ids (dataset order, deduplicated)
  v_feat    [N,F,E]  temporal video features: fp16 (default, halved
                     disk/HBM traffic) or int8 (quartered; symmetric
                     per-(video, frame) scales in `v_scale` [N,F] fp16 —
                     CLIP-style features are near-Gaussian per token, so a
                     per-token absmax scale keeps ranking intact)
  v_mask    [N,F]    frame validity
  meta      json     model-config + weights fingerprint checked at query time
"""

from __future__ import annotations

import functools
import hashlib
import json
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import Config
from .data.text import encode_caption
from .train.evaluate import (_encode_text_batch, _encode_video_batch,
                             similarity_matrix_device)

Params = Dict[str, Any]

# small always-present leaves whose exact bytes change under ANY training:
# enough to fingerprint which checkpoint produced the index (full-tree
# hashing would fetch ~600 MB; these are ~2 MB)
_FINGERPRINT_LEAVES = (("clip", "logit_scale"),
                       ("clip", "text", "text_projection"),
                       ("clip", "visual", "proj"))


def params_fingerprint(params: Params) -> str:
    """Backend-independent hash of a few weight leaves (exact bytes, so a
    TPU-built index verifies on CPU and vice versa)."""
    h = hashlib.blake2b(digest_size=16)
    for path in _FINGERPRINT_LEAVES:
        leaf = params
        for k in path:
            leaf = leaf[k]
        h.update("/".join(path).encode())
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def _config_meta(cfg: Config, params: Optional[Params] = None) -> Dict[str, Any]:
    m = cfg.model
    meta = {"embed_dim": m.clip.embed_dim, "max_words": m.max_words,
            "max_frames": m.max_frames,
            "image_resolution": m.clip.image_resolution}
    if params is not None:
        meta["params_fingerprint"] = params_fingerprint(params)
    return meta


def quantize_features(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int8 quantization with a per-token (last-axis) absmax
    scale: v ≈ q * scale[..., None].  Returns (q int8 [..., E],
    scale fp16 [...])."""
    scale = np.abs(v).max(axis=-1, keepdims=True).astype(np.float32) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.rint(v / scale), -127, 127).astype(np.int8)
    return q, scale[..., 0].astype(np.float16)


@functools.partial(jax.jit, donate_argnums=0)
def _write_rows(buf: jnp.ndarray, chunk: jnp.ndarray, off) -> jnp.ndarray:
    """Donated row-slab write (`off` traced → ONE compiled program serves
    every chunk of a staged upload)."""
    return jax.lax.dynamic_update_slice(
        buf, chunk, (off,) + (0,) * (buf.ndim - 1))


def staged_device_put(a: np.ndarray, rows: int,
                      yield_fn=None) -> jnp.ndarray:
    """H2D upload in row slabs instead of one monolithic transfer.

    A live /reload of a ~100 MB corpus as a single device_put occupies the
    transfer path for seconds (notably over throttled links), and every
    in-flight search queues behind it — the round-4 SLO table's 6 s p99
    excursion.  Slabbed, each transfer is a few MB; search programs
    submitted by other threads interleave between slabs, so the tail cost
    of a reload drops to ~one slab.  `yield_fn` (default: a GIL yield) runs
    between slabs.  rows<=0 or a single-slab fit falls back to one put."""
    n = a.shape[0]
    if rows <= 0 or rows >= n:
        return jnp.asarray(a)
    buf = jnp.zeros(a.shape, a.dtype)           # device alloc, no transfer
    offsets = list(range(0, n - rows + 1, rows))
    if offsets[-1] + rows < n:
        offsets.append(n - rows)                # overlap tail, same shape
    for off in offsets:
        chunk = jnp.asarray(np.ascontiguousarray(a[off:off + rows]))
        buf = _write_rows(buf, chunk, off)
        if yield_fn is not None:
            yield_fn()
        else:
            time.sleep(0)
    return buf


@jax.jit
def _dequant_f32(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]


def index_video_features(index: Dict[str, np.ndarray],
                         staged_rows: int = 0,
                         yield_fn=None) -> jnp.ndarray:
    """Device fp32 view of the stored features, dequantizing int8 indexes.

    The upload crosses in the STORED dtype (fp16/int8 — half/quarter the
    transfer of a host-side fp32 convert) and widens on device; with
    staged_rows > 0 it goes up in row slabs (see staged_device_put)."""
    q = staged_device_put(np.asarray(index["v_feat"]), staged_rows, yield_fn)
    if "v_scale" in index:
        return _dequant_f32(q, jnp.asarray(index["v_scale"]))
    return jax.jit(lambda a: a.astype(jnp.float32))(q)


def build_video_index(params: Params, cfg: Config, loader,
                      dataset=None, logger=None,
                      feature_dtype: str = "float16",
                      mesh=None, skip_ids=None) -> Dict[str, np.ndarray]:
    """Encode every unique video the loader yields (deduplicated by the
    stable per-video hash — multi-sentence datasets repeat each video once
    per caption, dataloader_msvd_retrieval.py semantics).

    feature_dtype: 'float16' (default) or 'int8' (halves the index again via
    quantize_features; ranking quality asserted in tests/test_serving.py).
    mesh: shard each encode batch over the mesh's first axis so the corpus
    ViT forwards run data-parallel (params replicate; the 'auto' kernel
    routing already picks the GSPMD-partitionable XLA paths on a mesh).
    skip_ids: video ids to leave out (incremental --append builds)."""
    if feature_dtype not in ("float16", "int8"):
        # validate BEFORE the corpus encode: a typo must fail in
        # microseconds, not after hours of ViT forwards
        raise ValueError(f"feature_dtype must be float16 or int8, "
                         f"got {feature_dtype!r}")
    if mesh is None:
        place = jnp.asarray
    else:
        from .parallel.mesh import batch_sharding, replicate_tree
        sharding = batch_sharding(mesh)
        params = replicate_tree(params, mesh)
        def place(v):
            return jax.device_put(np.asarray(v), sharding)
    skip_ids = frozenset(skip_ids or ())
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
            vid = (pairs[int(row)][0] if pairs is not None
                   else f"video{int(row)}")
            if vid in skip_ids:
                continue
            seen.add(h)
            keep.append(i)
            ids.append(vid)
        if not keep:
            continue
        # gather the unique rows BEFORE the ViT forward (multi-sentence
        # datasets repeat each video ~41×; encoding then slicing would waste
        # ~40/41 of the vision FLOPs).  Pad the gather back to the batch
        # size so the jitted encoder sees one static shape.
        B = batch["video"].shape[0]
        gather = np.asarray(keep + [keep[0]] * (B - len(keep)))
        vf = _encode_video_batch(params, cfg,
                                 place(batch["video"][gather]),
                                 place(batch["video_mask"][gather]))
        feats.append(np.asarray(vf, np.float16)[:len(keep)])
        masks.append(np.asarray(batch["video_mask"], np.float32)[keep])
        if logger is not None:
            logger.info("Indexed %d videos", len(ids))
    if not feats:
        raise ValueError(
            "no valid videos to index: the loader yielded nothing (empty "
            "split, or every row failed decoding)")
    index = {"video_ids": np.asarray(ids),
             "v_feat": np.concatenate(feats),
             "v_mask": np.concatenate(masks),
             "meta": np.frombuffer(
                 json.dumps(_config_meta(cfg, params)).encode(),
                 dtype=np.uint8)}
    if feature_dtype == "int8":
        # fp16 input is fine: the scale math is fp32 inside and the
        # division broadcasts up — no fp32 corpus copy needed
        index["v_feat"], index["v_scale"] = quantize_features(
            index["v_feat"])
    return index


def append_index(existing: Dict[str, np.ndarray],
                 new: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Merge a freshly-built index into an existing one (incremental corpus
    growth without re-encoding).  Both must come from the SAME config and
    weights (byte-equal meta — the fingerprint covers both) and the same
    feature dtype layout; rows of `new` whose video id already exists are
    dropped (existing features win: they were served already)."""
    if existing["meta"].tobytes() != new["meta"].tobytes():
        raise ValueError(
            "cannot append: the existing index was built with a different "
            "model config or checkpoint (meta mismatch) — rebuild instead")
    if ("v_scale" in existing) != ("v_scale" in new):
        raise ValueError("cannot append: feature_dtype differs from the "
                         "existing index (int8 vs float16)")
    have = {str(v) for v in existing["video_ids"]}
    fresh = [i for i, v in enumerate(new["video_ids"]) if str(v) not in have]
    if not fresh:
        return existing
    out = {"meta": existing["meta"],
           "video_ids": np.concatenate([existing["video_ids"],
                                        new["video_ids"][fresh]]),
           "v_feat": np.concatenate([existing["v_feat"],
                                     new["v_feat"][fresh]]),
           "v_mask": np.concatenate([existing["v_mask"],
                                     new["v_mask"][fresh]])}
    if "v_scale" in existing:
        out["v_scale"] = np.concatenate([existing["v_scale"],
                                         new["v_scale"][fresh]])
    return out


def index_path(path: str) -> str:
    """THE canonical on-disk index path for a user-supplied one — shared by
    save_index and the --append existence check (two rules would let an
    append load one file and write another)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_index(path: str, index: Dict[str, np.ndarray]) -> str:
    """Returns the actual path written.  Atomic (temp + rename): killing an
    hours-long rebuild mid-write cannot destroy the existing index."""
    from .core.checkpoint import _atomic_savez
    path = index_path(path)
    _atomic_savez(path, index)
    return path


def load_index(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def check_meta(index: Dict[str, np.ndarray], cfg: Config,
               params: Optional[Params] = None) -> None:
    """Reject an index built with a different model config — or, when
    `params` is given, with different WEIGHTS (the stored video features are
    meaningless against another checkpoint's text tower: the scores would be
    silently wrong, not shape-invalid).  Cheap enough to run before model
    init when params are not yet available (cli/search.py does both)."""
    if "meta" not in index:
        raise ValueError(
            "index has no 'meta' entry — not produced by build_video_index "
            "(or truncated); refusing to score against an unverifiable index")
    stored = json.loads(bytes(index["meta"].tobytes()).decode())
    current = _config_meta(cfg, params)
    mismatched = {k: (v, current[k]) for k, v in stored.items()
                  if k in current and k != "max_words" and current[k] != v}
    cfg_mismatch = {k: v for k, v in mismatched.items()
                    if k != "params_fingerprint"}
    if cfg_mismatch:
        raise ValueError(
            f"index was built with a different model config: {cfg_mismatch} "
            f"(index value, current value)")
    if "params_fingerprint" in mismatched:
        raise ValueError(
            "index was built with a DIFFERENT CHECKPOINT than the one loaded "
            "for this query (weights fingerprint mismatch) — rebuild the "
            "index with cli/index.py using the current checkpoint")


_check_meta = check_meta                     # backward-compat alias


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


@functools.partial(jax.jit, static_argnames=("kk", "n_valid"))
def _masked_topk(sim, kk: int, n_valid: int):
    """Device top-k over the first n_valid columns (pad columns → -inf)."""
    if n_valid < sim.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        sim = jnp.where(col < n_valid, sim, -jnp.inf)
    return jax.lax.top_k(sim, kk)               # sorted descending


class Searcher:
    """Persistent query engine over a loaded index (the daemon form of
    `search`, used by cli/serve.py): the corpus features live on device
    across requests (no per-query ~100 MB host→HBM upload), and query
    batches pad up to a multiple of `query_batch` so repeated requests hit
    the same compiled program instead of recompiling per query count.

    With a `mesh`, the corpus shards over the mesh's first axis (N rows
    padded up to the device count; queries and params replicate) — the
    serving analogue of data-parallel training, for corpora whose features
    outgrow one chip's HBM (~1M fp32-dequantized 12-frame videos per
    16 GB v5e chip).  GSPMD inserts the collectives; the Pallas similarity
    kernel doesn't auto-partition, so sharded mode pins the XLA einsum
    path (scores identical — tested)."""

    def __init__(self, params: Params, cfg: Config,
                 index: Dict[str, np.ndarray], tokenizer,
                 query_batch: int = 8, mesh=None,
                 staged_upload_rows: int = 0):
        if query_batch < 1:
            raise ValueError(f"query_batch must be >= 1, got {query_batch}")
        check_meta(index, cfg, params)
        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer
        self.video_ids = [str(v) for v in index["video_ids"]]
        self.query_batch = int(query_batch)
        self._mesh = mesh
        if mesh is None:
            self._params_sim, self._cfg_sim = params, cfg
            # staged_upload_rows > 0: slab the corpus H2D so a live /reload
            # doesn't park in-flight searches behind one monolithic transfer
            # (see staged_device_put; used by the reload path)
            self._v_feat = index_video_features(
                index, staged_rows=staged_upload_rows)
            self._v_mask = jnp.asarray(index["v_mask"], jnp.float32)
            self._replicate = None
        else:
            import dataclasses as dc

            from jax.sharding import NamedSharding, PartitionSpec
            # Pallas kernels don't auto-partition under GSPMD: pin the XLA
            # paths for the whole sharded query program (scores identical,
            # parity-tested against the kernels)
            self._cfg_sim = dc.replace(cfg, model=dc.replace(
                cfg.model, use_pallas="off", attention_impl="einsum"))
            pad = (-len(self.video_ids)) % mesh.devices.size

            def rows_sharded(a):  # pad rows (copies of row 0, ranked out
                # by the -inf column mask) so N splits evenly, then shard.
                # Upload in the STORED dtype — the fp32 view materializes
                # only on device, so host RAM and transfer stay at
                # fp16/int8 size for the big-corpus case this mode serves
                if pad:
                    a = np.concatenate([a, np.repeat(a[:1], pad, 0)])
                return jax.device_put(a, NamedSharding(
                    mesh, PartitionSpec(mesh.axis_names[0])))

            to_f32 = jax.jit(lambda a: a.astype(jnp.float32))
            if "v_scale" in index:
                q8 = rows_sharded(index["v_feat"])
                scale = rows_sharded(index["v_scale"].astype(np.float32))
                self._v_feat = jax.jit(
                    lambda q, s: q.astype(jnp.float32) * s[..., None])(
                        q8, scale)
            else:
                self._v_feat = to_f32(rows_sharded(index["v_feat"]))
            self._v_mask = to_f32(rows_sharded(
                np.asarray(index["v_mask"], np.float32)))
            self._replicate = NamedSharding(mesh, PartitionSpec())
            # ONE replicated copy serves text encode and similarity (a
            # second default-device copy would double param HBM on chip 0)
            self.params = self._params_sim = jax.device_put(
                params, self._replicate)

    def __len__(self) -> int:
        return len(self.video_ids)

    def warmup(self) -> None:
        """Pay the text-encode + similarity + top-k compiles before the
        first request (the daemon calls this before binding the port)."""
        self.search(["warmup"], topk=1)
        self.similarities(["warmup"])

    def _similarity(self, queries: Sequence[str]):
        """Device [Q_padded, N_padded] similarity for a padded query list."""
        padded = list(queries) + [""] * ((-len(queries)) % self.query_batch)
        if self._replicate is None:
            t_feat, t_mask = encode_queries(self.params, self.cfg,
                                            self.tokenizer, padded)
        else:
            # place token ids/masks replicated over the mesh BEFORE the
            # encode so the whole query program runs on one device set
            # (params are replicated; a default-device input would mix
            # device sets and fail to lower)
            enc = [encode_caption(self.tokenizer, q, self.cfg.model.max_words)
                   for q in padded]
            ids = jax.device_put(np.stack([e[0] for e in enc]),
                                 self._replicate)
            t_mask = jax.device_put(
                np.stack([e[1] for e in enc]).astype(np.float32),
                self._replicate)
            t_feat = _encode_text_batch(self._params_sim, self._cfg_sim,
                                        ids, t_mask)
        return similarity_matrix_device(self._params_sim, self._cfg_sim,
                                        t_feat, t_mask,
                                        self._v_feat, self._v_mask)

    def similarities(self, queries: Sequence[str]) -> np.ndarray:
        """[Q, N] similarity rows for free-text queries."""
        n = len(queries)
        if n == 0:
            return np.zeros((0, len(self.video_ids)), np.float32)
        return np.asarray(self._similarity(queries))[:n, :len(self.video_ids)]

    def search(self, queries: Sequence[str], topk: int = 5,
               ) -> List[List[Tuple[str, float]]]:
        """Top-k videos per query: [(video_id, similarity), ...] per query,
        ranked by the full token-interaction eval similarity.

        Top-k runs ON DEVICE (lax.top_k): only [Q, k] values+indices cross
        to the host, not the [Q, N] matrix — measured 112 → 72 ms per
        64-query request at N=10k over the tunnel (the full-matrix fetch +
        host argsort were over a third of the request)."""
        n = len(queries)
        k = max(min(topk, len(self.video_ids)), 0)
        if n == 0 or k == 0:
            return [[] for _ in queries]
        sim = self._similarity(queries)
        # bucket k (next power of two, min 8) so varying topk reuses a few
        # compiled top-k programs instead of one per distinct k
        kk = min(max(8, 1 << (k - 1).bit_length()), sim.shape[1])
        vals, idx = _masked_topk(sim, kk, len(self.video_ids))
        vals = np.asarray(vals)[:n, :k]
        idx = np.asarray(idx)[:n, :k]
        return [[(self.video_ids[j], float(v)) for j, v in zip(irow, vrow)]
                for irow, vrow in zip(idx, vals)]


def search(params: Params, cfg: Config, index: Dict[str, np.ndarray],
           tokenizer, queries: Sequence[str], topk: int = 5,
           ) -> List[List[Tuple[str, float]]]:
    """One-shot top-k search (cli/search.py); daemons keep a Searcher."""
    return Searcher(params, cfg, index, tokenizer,
                    query_batch=max(len(queries), 1)).search(queries, topk)


class _Pending:
    __slots__ = ("queries", "topk", "event", "results", "error")

    def __init__(self, queries: Sequence[str], topk: int):
        import threading
        self.queries = list(queries)
        self.topk = int(topk)
        self.event = threading.Event()
        self.results = None
        self.error: Optional[BaseException] = None


class BatchingDispatcher:
    """Cross-request dynamic batching over one Searcher.

    The daemon's handler threads each carry ONE request; dispatching them
    individually pays a full padded device program per request, so many
    small concurrent requests collapse throughput to (1 request's latency)⁻¹.
    This dispatcher coalesces whatever is queued — waiting at most
    `max_wait_ms` after the first arrival, up to `max_batch` queries — into
    ONE `searcher.search` call at the merged batch's max topk, then slices
    each request its own queries/topk.  Per-query scores are independent,
    so results are byte-identical to individual dispatch (tested).

    Under load the window never waits (the queue is non-empty when the
    device frees); when idle a lone request pays at most the window.
    `submit` blocks the calling thread; errors from the device propagate to
    every co-batched caller (queries are validated before submit — a failure
    here is systemic, not request-specific)."""

    def __init__(self, searcher, max_batch: Optional[int] = None,
                 max_wait_ms: float = 2.0):
        import queue
        import threading
        if max_batch is not None and max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.searcher = searcher
        # default cap: a few compile buckets' worth — big enough to merge a
        # burst, small enough to keep latency of the merged call bounded
        self.max_batch = int(max_batch or max(searcher.query_batch * 8, 64))
        self.max_wait = max(float(max_wait_ms), 0.0) / 1e3
        # merged batches round up to power-of-two multiples of the
        # searcher's compile bucket ("" padding, rows dropped on split):
        # log2 many compiled programs instead of one per multiple
        qb = int(searcher.query_batch)
        self.buckets = []
        b = qb
        while b < self.max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(self.max_batch)
        self._queue: "queue.SimpleQueue[Optional[_Pending]]" = \
            queue.SimpleQueue()
        self._carry: Optional[_Pending] = None   # dequeued but over-cap
        self._closed = False
        # observability (read by tests and the daemon's request log)
        self.batches = 0
        self.requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="nrtpu-serve-batcher")
        self._thread.start()

    def submit(self, queries: Sequence[str], topk: int
               ) -> List[List[Tuple[str, float]]]:
        if self._closed:
            raise RuntimeError("BatchingDispatcher is closed")
        p = _Pending(queries, topk)
        self._queue.put(p)
        # bounded waits: a submit racing close() (enqueued after the drain)
        # must surface an error, not block its handler thread forever
        while not p.event.wait(timeout=1.0):
            if self._closed and not p.event.is_set():
                raise RuntimeError("BatchingDispatcher closed mid-request")
        if p.error is not None:
            raise p.error
        return p.results

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=10)
        # fail any requests that were still queued (or raced the sentinel)
        import queue
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                p.error = RuntimeError("BatchingDispatcher closed")
                p.event.set()

    def _collect(self) -> Optional[List[_Pending]]:
        """One merged batch: block for the first request, then drain the
        queue until max_batch or the window closes.  A dequeued request
        that would push the merge past max_batch is carried into the NEXT
        batch (never re-ordered, never over-merged) — so a batch exceeds
        max_batch only when a single request does."""
        import queue
        import time
        first = self._carry if self._carry is not None else self._queue.get()
        self._carry = None
        if first is None:
            return None
        batch = [first]
        total = len(first.queries)
        deadline = time.monotonic() + self.max_wait
        while total < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                nxt = (self._queue.get_nowait() if remaining <= 0
                       else self._queue.get(timeout=remaining))
            except queue.Empty:
                break
            if nxt is None:           # close() while a batch is forming:
                self._queue.put(None)  # serve the batch, exit next round
                break
            if total + len(nxt.queries) > self.max_batch:
                self._carry = nxt     # would overflow: starts the next batch
                break
            batch.append(nxt)
            total += len(nxt.queries)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            merged: List[str] = []
            for p in batch:
                merged.extend(p.queries)
            n_real = len(merged)
            for b in self.buckets:       # round up to a compile bucket
                if b >= n_real:
                    merged.extend([""] * (b - n_real))
                    break
            try:
                hits = self.searcher.search(
                    merged, topk=max(p.topk for p in batch))
                off = 0
                for p in batch:
                    rows = hits[off:off + len(p.queries)]
                    p.results = [row[:p.topk] for row in rows]
                    off += len(p.queries)
            except BaseException as exc:  # propagate to every waiter
                for p in batch:
                    p.error = exc
            finally:
                self.batches += 1
                self.requests += len(batch)
                for p in batch:
                    p.event.set()

"""Checkpointing: params + optimizer state + step, flat-key npz format.

Unlike the reference (save-only state_dicts, no optimizer/step state —
main.py:161-187 — so runs cannot resume), checkpoints here capture the full
TrainState, enabling mid-run resume.  Rolling `best.npz` mirrors the
reference's best.pth tracking (main.py:354-365).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import numpy as np

_SEP = "//"


def path_key(path) -> str:
    """Canonical flat key for a pytree path — THE on-disk npz key format.
    Single definition: flatten_tree, unflatten_into, and deploy's sorted
    leaf manifest must all agree or checkpoint/bundle loads desynchronize."""
    return _SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path)


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = path_key(path)
        arr = np.asarray(leaf)
        if arr.dtype.name == "bfloat16":
            # npz has no portable bf16; fp32 holds bf16 exactly, and
            # unflatten_into casts back to the model leaf's dtype on load
            arr = arr.astype(np.float32)
        flat[key] = arr
    return flat


def unflatten_into(tree_like, flat: Dict[str, np.ndarray], strict: bool = True):
    """Rebuild a pytree with tree_like's structure from flat arrays.

    strict=False mirrors the reference's `load_state_dict(..., strict=False)`
    warm-start contract (main.py:60-66): leaves missing from the checkpoint
    or with mismatched shapes keep their current (init) values, extra
    checkpoint keys are ignored, and the diff is returned for logging.
    Returns the tree when strict, else (tree, report dict with
    'missing'/'mismatched'/'unexpected' key lists)."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree_like)
    treedef = jax.tree_util.tree_structure(tree_like)
    new_leaves = []
    seen = set()
    missing, mismatched, reshaped = [], [], []
    for path, leaf in leaves_with_path[0]:
        key = path_key(path)
        seen.add(key)
        if key not in flat:
            if strict:
                raise KeyError(f"checkpoint missing leaf: {key}")
            missing.append(key)
            new_leaves.append(leaf)
            continue
        arr = flat[key]
        if arr.shape != leaf.shape:
            if arr.size == np.asarray(leaf).size:
                # element-count match: a pure relayout of the same data.
                # These npz files are only ever produced by this framework,
                # whose historical layout changes are reshape-compatible
                # (e.g. attn in_proj [.., D, 3D] → [.., D, 3, D]), so the
                # flat element order is preserved — migrate in place.
                reshaped.append(f"{key} (ckpt {arr.shape} → model {leaf.shape})")
                new_leaves.append(
                    arr.reshape(leaf.shape).astype(np.asarray(leaf).dtype))
                continue
            if strict:
                raise ValueError(
                    f"shape mismatch for {key}: ckpt {arr.shape} vs model {leaf.shape}")
            mismatched.append(f"{key} (ckpt {arr.shape} vs model {leaf.shape})")
            new_leaves.append(leaf)
            continue
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if strict:
        return tree
    report = {"missing": missing, "mismatched": mismatched,
              "reshaped": reshaped, "unexpected": sorted(set(flat) - seen)}
    return tree, report


def _atomic_savez(path: str, payload: Dict[str, np.ndarray]) -> None:
    """np.savez via temp file + rename: a crash (or TPU preemption signal)
    mid-write can never leave a truncated npz at the real path — the
    previous best.npz/state survives until the new one is complete."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    try:
        # a file object, not a name: np.savez would append '.npz' to a name
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
            f.flush()
            os.fsync(f.fileno())  # survive host power loss, not just SIGKILL
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


class AsyncWriter:
    """Single background checkpoint writer.

    `submit(fn)` returns immediately; `fn` (a closure over already-fetched
    HOST arrays) runs on a daemon thread in submission order, so the npz
    serialization + disk write overlap the next training steps instead of
    stalling them.  `wait()` drains the queue and re-raises the first
    error — call it before READING any file a submitted write produces and
    at run teardown.  Beyond-reference: the reference's rank-0
    torch.save blocks the step loop (main.py:161-187)."""

    def __init__(self):
        import queue
        import threading
        # maxsize=1: at most one queued + one in-flight write, so slow disks
        # bound the extra host RAM to ~one TrainState copy (each submitted
        # closure pins its fetched host arrays until written)
        self._q = queue.Queue(maxsize=1)
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def _run(self):
        import logging
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                # every write is attempted — a transient failure (ENOSPC,
                # flaky NFS) must not silently drop all later checkpoints
                fn()
            except BaseException as e:  # first error surfaced by wait()
                logging.getLogger("neighborretr_tpu").exception(
                    "background checkpoint write failed")
                if self._error is None:
                    self._error = e
            finally:
                self._q.task_done()

    def submit(self, fn) -> None:
        if not self._thread.is_alive():
            # writer died (interpreter teardown edge) — fall back to sync
            fn()
            return
        self._q.put(fn)

    def wait(self) -> None:
        """Block until every submitted write finished; re-raise failures."""
        self._q.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def close(self) -> None:
        self.wait()
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join(timeout=60)


def save_params(path: str, params) -> None:
    _atomic_savez(path, flatten_tree(params))


def load_params(path: str, params_like, strict: bool = True):
    """strict=True → params; strict=False → (params, report) with the
    missing/mismatched/reshaped/unexpected leaf diff (reference
    main.py:60-66).  Accepts both a params-only npz (best.npz) and a full
    train-state npz (state_epochN.npz) — the latter's `params//` subtree is
    extracted automatically."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    if "opt_step" in flat and any(k.startswith(f"params{_SEP}") for k in flat):
        plen = len("params") + len(_SEP)
        flat = {k[plen:]: v for k, v in flat.items()
                if k.startswith(f"params{_SEP}")}
    return unflatten_into(params_like, flat, strict=strict)


def latest_resumable(output_dir: str):
    """Newest resumable TrainState in output_dir, or None.

    Scans state_preempt.npz + state_epoch*.npz and returns the path whose
    saved `step` is highest (a stale state_preempt.npz from an earlier
    interruption loses to a later epoch save).  Unreadable candidates are
    skipped — a file truncated by a hard kill must not block the restart
    (_atomic_savez makes that unlikely but not impossible across
    filesystems).  Powers `--resume auto`: a preempted job rescheduled with
    identical arguments continues by itself.  The reference cannot resume
    at all (SURVEY §5: save-only checkpoints)."""
    import glob

    candidates = sorted(
        glob.glob(os.path.join(output_dir, "state_epoch*.npz")))
    candidates.append(os.path.join(output_dir, "state_preempt.npz"))
    best_path, best_step = None, -1
    for path in candidates:
        if not os.path.exists(path):
            continue
        try:
            with np.load(path, allow_pickle=False) as data:
                step = int(data["step"])
        except Exception:
            continue
        # ties prefer the preempt file (it also carries any mid-epoch best
        # tracking that happened after the epoch save hit the same step)
        if step >= best_step:
            best_path, best_step = path, step
    # sharded (per-process) preempt save: candidate only when the full set
    # is present and step-consistent — _read_sharded_set validates that
    mpath = os.path.join(output_dir, "state_preempt" + MANIFEST_SUFFIX)
    if os.path.exists(mpath):
        got = _read_sharded_set(mpath, materialize=False)
        if got is not None and got[0] >= best_step:
            best_path, best_step = mpath, got[0]
    return best_path


def resolve_resume_auto(output_dir: str):
    """Multi-host-safe `--resume auto` resolution.

    Checkpoints are written by process 0 only, and even shared storage can
    expose renames to hosts at different times — so process 0 resolves via
    latest_resumable() and broadcasts the decision as (kind, epoch); every
    process reconstructs the path from its own output_dir.  Single-process
    runs skip the collective entirely."""
    import jax

    if jax.process_count() <= 1:
        return latest_resumable(output_dir)
    from jax.experimental import multihost_utils
    if jax.process_index() == 0:
        path = latest_resumable(output_dir)
        if path is None:
            enc = np.zeros((2,), np.int64)
        elif path.endswith(MANIFEST_SUFFIX):
            enc = np.array([3, 0], np.int64)
        elif os.path.basename(path) == "state_preempt.npz":
            enc = np.array([2, 0], np.int64)
        else:
            epoch = int(os.path.basename(path)[len("state_epoch"):-4])
            enc = np.array([1, epoch], np.int64)
    else:
        enc = np.zeros((2,), np.int64)
    kind, epoch = (int(x) for x in multihost_utils.broadcast_one_to_all(enc))
    if kind == 0:
        return None
    if kind == 3:
        return os.path.join(output_dir, "state_preempt" + MANIFEST_SUFFIX)
    return os.path.join(output_dir, "state_preempt.npz" if kind == 2
                        else f"state_epoch{epoch}.npz")


def save_train_state(path: str, state) -> None:
    """state: train.step.TrainState (params, opt(m, v, step), bank, step)."""
    payload = {}
    for name, tree in (("params", state.params), ("opt_m", state.opt.m),
                       ("opt_v", state.opt.v), ("bank", state.bank._asdict())):
        for k, v in flatten_tree(tree).items():
            payload[f"{name}{_SEP}{k}"] = v
    payload["opt_step"] = np.asarray(state.opt.step)
    payload["step"] = np.asarray(state.step)
    _atomic_savez(path, payload)


def _train_state_from_flat(flat: Dict[str, np.ndarray], state_like):
    from ..train.bertadam import BertAdamState
    from ..train.memory_bank import MemoryBank
    from ..train.step import TrainState

    def sub(prefix):
        plen = len(prefix) + len(_SEP)
        return {k[plen:]: v for k, v in flat.items()
                if k.startswith(prefix + _SEP)}

    params = unflatten_into(state_like.params, sub("params"))
    opt = BertAdamState(
        step=flat["opt_step"],
        m=unflatten_into(state_like.opt.m, sub("opt_m")),
        v=unflatten_into(state_like.opt.v, sub("opt_v")),
    )
    bank_like = state_like.bank._asdict()
    bank_flat = sub("bank")
    bank = MemoryBank(**{k: bank_flat[k].astype(np.asarray(v).dtype)
                         for k, v in bank_like.items()})
    return TrainState(params=params, opt=opt, bank=bank, step=flat["step"])


def load_train_state(path: str, state_like):
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    return _train_state_from_flat(flat, state_like)


# ---------------------------------------------------------------------------
# Sharded (per-process, collective-free) TrainState checkpoints
#
# The mid-epoch preemption story for process-SPANNING state (multi-host FSDP
# / tensor parallelism): a collective device→host fetch cannot be entered
# safely from a signal-initiated teardown (peers may already be dying), so
# each process instead writes ONLY its locally-addressable shards — one
# atomic npz per process plus a process-0 manifest — and resume reassembles
# the global arrays from the union of the shard files.  The reference has no
# counterpart (no failure handling at all, SURVEY §5).
# ---------------------------------------------------------------------------

MANIFEST_SUFFIX = ".manifest.json"


def _shard_bounds(index, shape) -> np.ndarray:
    """Global (start, stop) per dim of a shard's index tuple (int64 [ndim,2])."""
    out = []
    for sl, dim in zip(index, shape):
        out.append((0 if sl.start is None else int(sl.start),
                    dim if sl.stop is None else int(sl.stop)))
    return np.asarray(out, np.int64).reshape(len(shape), 2)


def _to_npz_dtype(arr: np.ndarray) -> np.ndarray:
    if arr.dtype.name == "bfloat16":   # npz has no portable bf16 (see
        return arr.astype(np.float32)  # flatten_tree); fp32 holds it exactly
    return arr


def save_sharded_train_state(output_dir: str, state,
                             tag: str = "state_preempt",
                             force_sharded: bool = False) -> str:
    """Collective-free per-process save; every process MUST call this (each
    writes `{tag}.shard{p}.npz`; process 0 adds `{tag}.manifest.json`).
    Replicated / fully-addressable leaves go to process 0's file only;
    process-spanning leaves contribute their local replica-0 shards (data +
    global bounds) — the union across files tiles each global array exactly
    once.  Returns this process's shard path.

    `force_sharded` routes non-replicated-but-fully-addressable leaves
    through the per-shard extraction anyway — single-process tests use it
    to exercise the exact shard-bounds + reassembly path at the bit level
    (tests/test_checkpoint.py::test_forced_sharded_reassembly_is_bitwise);
    production multi-host saves never need it."""
    import jax

    pidx, pcount = jax.process_index(), jax.process_count()
    payload = {}
    for name, tree in (("params", state.params), ("opt_m", state.opt.m),
                       ("opt_v", state.opt.v), ("bank", state.bank._asdict())):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = f"{name}{_SEP}{path_key(path)}"
            # Multi-process: EVERY non-fully-replicated jax.Array goes
            # through the per-shard branch.  `is_fully_addressable` is a
            # per-process view — a leaf living entirely on one host's
            # devices (e.g. pipeline-stage-local params) is fully
            # addressable on its OWNER but pidx==0 is the only writer of
            # 'full' payloads, so the owner would skip it and nobody would
            # write the data.  The 'full' fast path is therefore reserved
            # for replicated leaves and single-process runs; force_sharded
            # remains the single-process test hook for the shard machinery.
            if (not isinstance(leaf, jax.Array) or leaf.is_fully_replicated
                    or (pcount == 1 and not force_sharded)):
                if pidx == 0:        # replicated: local read, save once
                    payload[f"full{_SEP}{key}"] = _to_npz_dtype(
                        np.asarray(leaf))
                continue
            payload[f"shape{_SEP}{key}"] = np.asarray(leaf.shape, np.int64)
            for j, sh in enumerate(leaf.addressable_shards):
                if sh.replica_id != 0:
                    continue         # another replica owns this block
                payload[f"shdata{_SEP}{key}@{j}"] = _to_npz_dtype(
                    np.asarray(sh.data))
                payload[f"shidx{_SEP}{key}@{j}"] = _shard_bounds(
                    sh.index, leaf.shape)
    payload["opt_step"] = np.asarray(state.opt.step)
    payload["step"] = np.asarray(state.step)
    payload["process_count"] = np.asarray(pcount, np.int64)
    shard_path = os.path.join(output_dir, f"{tag}.shard{pidx}.npz")
    _atomic_savez(shard_path, payload)
    if pidx == 0:
        import glob as _glob
        import json
        import re
        mpath = os.path.join(output_dir, tag + MANIFEST_SUFFIX)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tag": tag, "step": int(np.asarray(state.step)),
                       "process_count": pcount}, f)
        os.replace(tmp, mpath)
        # Topology-change hygiene: a preempted job rescheduled with FEWER
        # processes would otherwise leave shard{>=pcount}.npz files from the
        # earlier save on shared storage.  _read_sharded_set already ignores
        # them (it opens exactly shard0..shard{pcount-1}), but stale
        # gigabyte-scale shards should not accumulate across reschedules.
        for fp in _glob.glob(os.path.join(output_dir, f"{tag}.shard*.npz")):
            m = re.fullmatch(re.escape(tag) + r"\.shard(\d+)\.npz",
                             os.path.basename(fp))
            if m and int(m.group(1)) >= pcount:
                try:
                    os.remove(fp)
                except OSError:
                    pass
    return shard_path


def _read_sharded_set(manifest_path: str, materialize: bool = True):
    """(step, flat dict of reassembled GLOBAL arrays) for a sharded save,
    or None if the set is incomplete/inconsistent (a skewed preemption can
    leave processes at different steps — such a set must not resume).

    materialize=False validates WITHOUT loading any tensor data: npz
    members are read lazily on key access, so touching only step /
    process_count / shape / shidx (all tiny int64 arrays) checks shard
    presence, step consistency, and exact tiling coverage at ~zero I/O.
    `latest_resumable` uses this for `--resume auto` resolution so a large
    params+moments+bank set is not reassembled into host buffers twice
    (once to learn the step, once to actually load)."""
    import json

    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
        tag = manifest["tag"]
        pcount = int(manifest["process_count"])
    except Exception:
        return None
    out_dir = os.path.dirname(manifest_path)
    # Exactly shard0..shard{pcount-1}: a topology change (reschedule with a
    # different process count) can leave stale higher-index shards from an
    # earlier save next to a fresh complete set — they must not poison it.
    files = [os.path.join(out_dir, f"{tag}.shard{i}.npz")
             for i in range(pcount)]
    if pcount < 1 or not all(os.path.exists(fp) for fp in files):
        return None
    flat: Dict[str, np.ndarray] = {}
    shapes: Dict[str, np.ndarray] = {}
    pieces: Dict[str, list] = {}
    steps = set()
    try:
        for fp in files:
            with np.load(fp, allow_pickle=False) as data:
                steps.add(int(data["step"]))
                if int(data["process_count"]) != pcount:
                    return None
                for k in data.files:
                    kind, _, rest = k.partition(_SEP)
                    if kind == "full":
                        if materialize:
                            flat[rest] = data[k]
                    elif kind == "shape":
                        shapes[rest] = data[k]
                    elif kind == "shdata":
                        base = rest.rsplit("@", 1)[0]
                        idx_key = f"shidx{_SEP}{rest}"
                        pieces.setdefault(base, []).append(
                            (data[idx_key],
                             data[k] if materialize else None))
                    elif kind in ("shidx",):
                        pass
                    elif materialize:
                        flat[k] = data[k]     # step/opt_step/process_count
    except Exception:
        return None
    if len(steps) != 1:
        return None                 # skewed save: processes disagree
    for key, shape in shapes.items():
        parts = pieces.get(key, [])
        if not parts:
            return None
        size = int(np.prod([int(d) for d in shape], dtype=np.int64))
        covered = 0
        buf = None
        for bounds, arr in parts:
            sl = tuple(slice(int(a), int(b)) for a, b in bounds)
            covered += int(np.prod([int(b) - int(a) for a, b in bounds],
                                   dtype=np.int64))
            if materialize:
                if buf is None:
                    buf = np.zeros(tuple(int(d) for d in shape), arr.dtype)
                buf[sl] = arr
        if covered != size:         # replica-0 shards tile exactly once,
            return None             # so covered size == global size
        if materialize:
            flat[key] = buf
    flat.pop("process_count", None)
    step = steps.pop()
    return (step, flat) if materialize else (step, None)


def load_sharded_train_state(manifest_path: str, state_like):
    """Resume from a per-process sharded save (path = the manifest json).
    Every process reassembles the full global arrays from all shard files
    (shared storage, as with every checkpoint here) — placement back onto
    the mesh happens in the caller's normal resume path."""
    got = _read_sharded_set(manifest_path)
    if got is None:
        raise ValueError(
            f"sharded checkpoint at {manifest_path} is incomplete or "
            "inconsistent (missing shard files or skewed steps)")
    _, flat = got
    return _train_state_from_flat(flat, state_like)

"""Epoch orchestration: bank fill → train epoch → eval → best tracking.

Rebuilds the reference's main-loop behavior (main.py:287-409 + trainer.py):
per epoch the memory bank is re-filled from `mb_batch` training batches
(memory_bank.py:80-229), the train epoch runs with loss logging every
`n_display` steps and mid-epoch validation every `n_display*3` steps with
best-checkpoint saving (trainer.py:147-202), then the per-epoch eval updates
best metrics and `best.npz` (main.py:333-365).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from ..core import checkpoint as ckpt
from ..core.config import Config
from ..data.device_prefetch import prefetch_to_device
from ..data.loader import BatchLoader
from ..models import neighborretr as model
from ..parallel import mesh as pmesh
from ..utils.logging import JsonlMetricsWriter, MetricLogger, setup_logger
from . import bertadam
from . import memory_bank as mb
from .evaluate import evaluate
from .metrics import BestMetricsTracker
from .step import create_train_state, fill_bank_step, train_step


class PreemptionGuard:
    """SIGTERM → checkpoint-and-exit at the next step boundary.

    TPU VMs deliver SIGTERM on maintenance events and preemptions (every host
    of a pod slice receives it); catching it and saving a full TrainState
    turns an eviction into a resumable pause (--resume_checkpoint
    state_preempt.npz).  The reference has no preemption story at all
    (SURVEY §5 "failure detection: none").  No-ops outside the main thread
    (e.g. when run_training is driven from a test thread)."""

    def __init__(self, enabled: bool = True):
        self.requested = False
        self.enabled = enabled
        self._prev = None
        self._installed = False

    def __enter__(self):
        if self.enabled:
            import signal
            try:
                self._prev = signal.signal(signal.SIGTERM, self._on_signal)
                self._installed = True
            except ValueError:          # not the main thread
                self.enabled = False
        return self

    def _on_signal(self, signum, frame):
        self.requested = True

    def __exit__(self, *exc):
        if self._installed:
            import signal
            # _prev is None when the pre-existing handler was installed
            # outside Python (signal.signal cannot return it) — SIG_DFL is
            # the best restorable approximation; leaving OUR handler bound
            # to a dead guard would make later SIGTERMs silent no-ops
            signal.signal(signal.SIGTERM,
                          self._prev if self._prev is not None
                          else signal.SIG_DFL)
            self._installed = False
        return False


def fill_memory_bank(params, cfg: Config, bank_loader: BatchLoader,
                     bank: mb.MemoryBank, mesh=None,
                     key=None) -> mb.MemoryBank:
    """Epoch-start fill: encode min(mb_batch, len(loader)) batches.  `key`
    (device augment backend only) seeds the on-chip RandAugment of the fill
    batches; each fill batch folds its index so clips draw independently."""
    import itertools
    if cfg.data.augment_backend != "device":
        key = None       # keep the 5-arg jit signature for host backends
    n_fill = min(cfg.train.mb_batch, len(bank_loader))
    batches = itertools.islice(iter(bank_loader), n_fill)
    for i, batch in enumerate(prefetch_to_device(batches, size=2, mesh=mesh)):
        bank = fill_bank_step(params, bank, batch, cfg,
                              i * cfg.train.batch_size,
                              key=None if key is None
                              else jax.random.fold_in(key, i))
    return bank


def run_training(cfg: Config, train_ds, test_ds, logger=None,
                 mesh=None, workers: Optional[int] = None):
    """Full training run; returns (final TrainState, BestMetricsTracker)."""
    # rank-gated: non-main processes log errors only (reference logger.py) —
    # otherwise N hosts duplicate every line and append to the same log.txt
    logger = logger or setup_logger(output_dir=cfg.train.output_dir,
                                    is_main=jax.process_index() == 0)
    workers = workers if workers is not None else cfg.data.workers

    # per-process data sharding on multi-host runs (every process assembles
    # its block of the same seeded global plan; see data/loader.py)
    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                worker_mode=cfg.data.worker_mode)
    train_loader = BatchLoader(train_ds, cfg.train.batch_size, shuffle=True,
                               drop_last=True, workers=workers,
                               seed=cfg.train.seed, **proc)
    bank_loader = BatchLoader(train_ds, cfg.train.batch_size, shuffle=True,
                              drop_last=True, workers=workers,
                              seed=cfg.train.seed + 7919, **proc)
    test_loader = BatchLoader(test_ds, cfg.train.batch_size_val,
                              shuffle=False, drop_last=False,
                              workers=workers, pad_to_batch=True, **proc)

    steps_per_epoch = len(train_loader)
    t_total = max(steps_per_epoch * cfg.train.epochs, 1)

    key = jax.random.PRNGKey(cfg.train.seed)
    params = model.init_params(key, cfg.model)
    if cfg.train.clip_checkpoint:
        from ..models.weights_io import load_openai_clip_into
        params = load_openai_clip_into(params, cfg.model,
                                       cfg.train.clip_checkpoint)
        logger.info("Loaded CLIP weights from %s", cfg.train.clip_checkpoint)
    if cfg.train.init_checkpoint:
        # strict=False warm start (reference --init_model, main.py:60-66):
        # native .npz loads partially with a logged diff; torch checkpoints
        # take the reference-migration path (weights_io)
        from ..models.weights_io import load_model_checkpoint_into
        params = load_model_checkpoint_into(
            params, cfg.model, cfg.train.init_checkpoint, strict=False,
            logger=logger)
        logger.info("Warm-started from %s", cfg.train.init_checkpoint)

    def make_bank():
        fresh = mb.create(cfg.train.memory_bank_capacity,
                          cfg.model.max_words, cfg.model.max_frames,
                          cfg.model.clip.embed_dim,
                          feat_dtype=cfg.train.bank_dtype)
        if mesh is not None:
            fresh = mb.MemoryBank(*pmesh.replicate_tree(tuple(fresh), mesh))
        return mb.place_bank(fresh, cfg.train.bank_placement, mesh)

    bank = make_bank()

    if mesh is not None:
        # params: replicated on DP meshes, Megatron-sharded when the mesh
        # has a `model` axis (--tensor_parallel), FSDP data-axis-sharded
        # under --fsdp; bank always replicates (make_bank already placed it)
        params = pmesh.place_params(params, mesh, fsdp=cfg.train.fsdp)

    state = create_train_state(params, bank,
                               moments_dtype=cfg.optim.moments_dtype,
                               moments_placement=cfg.optim.moments_placement,
                               mesh=mesh)
    tracker = BestMetricsTracker()
    best_path = os.path.join(cfg.train.output_dir, "best.npz")
    best_host = None     # host copy of the best params, held by EVERY process
    global_step = 0
    start_epoch = 0
    resume_skip = 0       # batches of start_epoch already consumed pre-resume

    # mid-run resume (full TrainState — impossible in the reference, which
    # saves parameter state_dicts only, main.py:161-187)
    if cfg.train.resume_checkpoint:
        if cfg.train.resume_checkpoint.endswith(ckpt.MANIFEST_SUFFIX):
            # per-process sharded preempt save (multi-host FSDP/TP mid-epoch
            # SIGTERM): reassemble the global arrays from the shard files
            state = ckpt.load_sharded_train_state(cfg.train.resume_checkpoint,
                                                  pmesh.fetch_to_host(state))
        else:
            state = ckpt.load_train_state(cfg.train.resume_checkpoint,
                                          pmesh.fetch_to_host(state))
        if mesh is not None:
            # params (and their optimizer moments) keep the mesh placement
            # rule — TP shardings on a data×model mesh, replicated otherwise
            state = state._replace(
                params=pmesh.place_params(state.params, mesh,
                                          fsdp=cfg.train.fsdp),
                opt=bertadam.place_moments(state.opt._replace(
                    step=jax.device_put(state.opt.step, pmesh.replicated(mesh)),
                    m=pmesh.place_params(state.opt.m, mesh,
                                         fsdp=cfg.train.fsdp),
                    v=pmesh.place_params(state.opt.v, mesh,
                                         fsdp=cfg.train.fsdp)),
                    cfg.optim.moments_placement, mesh),
                bank=mb.place_bank(
                    mb.MemoryBank(*(jax.device_put(x, pmesh.replicated(mesh))
                                    for x in state.bank)),
                    cfg.train.bank_placement, mesh),
                step=jax.device_put(state.step, pmesh.replicated(mesh)))
        else:
            # meshless resume: re-home the moments and bank (placement is
            # not recorded in the npz — the run config decides)
            state = state._replace(
                opt=bertadam.place_moments(state.opt,
                                           cfg.optim.moments_placement),
                bank=mb.place_bank(state.bank, cfg.train.bank_placement))
        global_step = int(state.step)
        start_epoch = min(global_step // max(steps_per_epoch, 1),
                          cfg.train.epochs)
        resume_skip = global_step - start_epoch * steps_per_epoch
        logger.info("Resumed from %s at step %d (epoch %d%s)",
                    cfg.train.resume_checkpoint, global_step, start_epoch,
                    f", batch {resume_skip}" if resume_skip else "")
        # restore best-metric tracking: without it the first post-resume
        # eval would clobber best.npz with params worse than the
        # pre-interruption best.  The restored state must be IDENTICAL on
        # every process — tracker.update() gates collectives (the best-params
        # fetch and the final-eval entry), so a process-0-only restore (the
        # json is written by process 0 and may live on a per-host disk)
        # would deadlock the mesh at the first divergent gate.  Process 0's
        # view is therefore broadcast to everyone.
        tracker_path = os.path.join(cfg.train.output_dir, "best_metrics.json")
        if jax.process_index() == 0 and os.path.exists(tracker_path):
            import json
            with open(tracker_path) as f:
                tracker.load_dict(json.load(f))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            r1s = multihost_utils.broadcast_one_to_all(np.asarray(
                [tracker.best_mean_r1, tracker.best_t2v_r1,
                 tracker.best_v2t_r1], np.float64))
            tracker.best_mean_r1, tracker.best_t2v_r1, tracker.best_v2t_r1 = (
                float(r1s[0]), float(r1s[1]), float(r1s[2]))
        if tracker.best_mean_r1 > 1e-5:
            logger.info("Restored best-metrics tracker (mean R@1 %.2f)",
                        tracker.best_mean_r1)

    jsonl = JsonlMetricsWriter(cfg.train.output_dir)
    guard = PreemptionGuard(
        enabled=cfg.train.save_checkpoints and cfg.train.save_on_preempt)
    # checkpoint npz writes happen on a background thread so the step loop
    # never stalls on disk IO; every read-back below waits for the queue
    writer = ckpt.AsyncWriter() if cfg.train.save_checkpoints else None
    try:
        with guard:
            state, tracker, best_host = _train_epochs(
                cfg, state, tracker, guard, train_loader, bank_loader,
                test_loader, test_ds, logger, mesh, key, t_total,
                steps_per_epoch, start_epoch, global_step, best_path,
                best_host, jsonl, writer, resume_skip=resume_skip)
        if guard.requested:
            return state, tracker
        if writer is not None:
            writer.wait()  # surface write errors; make best.npz readable

        # final test on the best checkpoint (main.py:389-409).  The gate must
        # be identical on every process (evaluate() runs SPMD collectives):
        # the in-memory best copy is captured by ALL processes at update
        # time, so it never depends on process-0-only disk state.  A disk
        # fallback covers the single-process resume case where best.npz
        # predates this run.
        best_params = best_host
        if best_params is None and jax.process_count() == 1 \
                and cfg.train.save_checkpoints and os.path.exists(best_path):
            best_params = ckpt.load_params(best_path,
                                           jax.device_get(state.params))
        if cfg.train.save_checkpoints and best_params is not None:
            if mesh is not None:
                best_params = pmesh.place_params(best_params, mesh,
                                                 fsdp=cfg.train.fsdp)
            logger.info("Final test on best checkpoint:")
            evaluate(best_params, cfg, test_loader, dataset=test_ds,
                     logger=logger, mesh=mesh)

        return state, tracker
    finally:
        if writer is not None:
            try:
                writer.close()
            except Exception:
                logger.exception("background checkpoint write failed")


def _train_epochs(cfg, state, tracker, guard, train_loader, bank_loader,
                  test_loader, test_ds, logger, mesh, key, t_total,
                  steps_per_epoch, start_epoch, global_step, best_path,
                  best_host, jsonl, writer=None, resume_skip=0):
    """Epoch loop body; returns early (with the preempt TrainState saved)
    when the guard catches SIGTERM."""

    def save_best(best_host_copy):
        """best.npz + best_metrics.json in ONE submitted closure, in that
        order: the tracker json claims a best that exists on disk only once
        the npz write completed — a crash between the two can lose the new
        best but can never record a phantom one (which would make a resumed
        run refuse to re-save it).  The tracker state is captured NOW so a
        later in-epoch update cannot leak into this write."""
        if jax.process_index() != 0:
            return
        import json
        tracker_dict = tracker.to_dict()
        best_r1 = tracker.best_mean_r1
        json_path = os.path.join(cfg.train.output_dir, "best_metrics.json")

        def write():
            ckpt.save_params(best_path, best_host_copy)
            with open(json_path, "w") as f:
                json.dump(tracker_dict, f)
            logger.info("Saved best checkpoint (mean R@1 %.2f)", best_r1)

        writer.submit(write)

    def save_preempt():
        path = os.path.join(cfg.train.output_dir, "state_preempt.npz")
        # Single-process state is fully addressable — read locally, write
        # one npz.  State with process-SPANNING shards would need a
        # process_allgather, which cannot be safely entered from a
        # signal-initiated teardown — each process instead writes its own
        # locally-addressable shards (collective-free,
        # core/checkpoint.py::save_sharded_train_state); resume reassembles
        # from the shard set and rejects skewed/incomplete sets.  In
        # practice EVERY multi-host run takes the sharded path, not just
        # FSDP/TP: the FIFO bank refresh consumes the data-sharded batch
        # features, so XLA leaves state.bank.feat_* sharded over `data`
        # across processes (measured in
        # tests/test_multiprocess.py::test_multihost_dp_midepoch_...).
        if state_needs_collective():
            shard_path = ckpt.save_sharded_train_state(
                cfg.train.output_dir, state)
            logger.info(
                "Preemption signal caught: saved this process's state "
                "shards to %s (resume with --resume auto once all %d "
                "processes have saved)", shard_path, jax.process_count())
            return
        state_host = pmesh.fetch_to_host(state)
        if jax.process_index() == 0:
            ckpt.save_train_state(path, state_host)
            logger.info(
                "Preemption signal caught: saved resumable TrainState to %s "
                "(continue with --resume_checkpoint)", path)

    def eval_and_track(epoch):
        """evaluate → jsonl → best tracking → best save: the ONE sequence
        behind both the mid-epoch and per-epoch validations (they must
        never diverge — the update() gate controls collectives)."""
        nonlocal best_host
        t2v, v2t = evaluate(state.params, cfg, test_loader, dataset=test_ds,
                            logger=logger, mesh=mesh)
        jsonl.write(kind="eval", step=global_step, epoch=epoch,
                    t2v={k: float(v) for k, v in t2v.items()},
                    v2t={k: float(v) for k, v in v2t.items()})
        if tracker.update(t2v, v2t) and cfg.train.save_checkpoints:
            # collective (TP shards may span processes) — all processes
            # fetch (each must hold the best copy for the final-test gate);
            # only process 0 writes (async: the fetched host copy is
            # immutable, the npz write overlaps the next training steps)
            best_host = pmesh.fetch_to_host(state.params)
            save_best(best_host)

    def state_needs_collective():
        return any(isinstance(x, jax.Array) and not x.is_fully_addressable
                   and not x.is_fully_replicated
                   for x in jax.tree.leaves(state))

    profiling = False   # ACROSS epochs: a profile window may span an epoch
                        # boundary (or the end of training) and must still
                        # be stopped so the trace is written

    def stop_profiler(reason):
        nonlocal profiling
        if profiling:
            jax.tree.map(lambda x: x.block_until_ready(), state.params)
            jax.profiler.stop_trace()
            profiling = False
            logger.info("Profiler trace written to %s (%s)",
                        cfg.train.profile_dir, reason)

    def preempt_exit():
        stop_profiler("stopped on preemption")
        save_preempt()
        return state, tracker, best_host

    for epoch in range(start_epoch, cfg.train.epochs):
        train_loader.set_epoch(epoch)
        bank_loader.set_epoch(epoch)
        skip = resume_skip if epoch == start_epoch else 0

        if skip:
            # EXACT mid-epoch continuation: the checkpointed bank already
            # holds this epoch's fill plus the consumed steps' FIFO pushes —
            # re-filling would clobber it.  Fast-forward the seeded batch
            # plan instead (the loader plan is a pure function of
            # (seed, epoch), step RNG keys fold from global_step, and the
            # optimizer schedule reads state.step), so the resumed run's
            # trajectory is IDENTICAL to the uninterrupted one
            # (tests/test_train_loop.py::test_mid_epoch_resume_is_exact).
            train_loader.skip_next_batches(skip)
            logger.info("Epoch %d: exact mid-epoch resume at batch %d/%d "
                        "(bank kept from the checkpoint)", epoch, skip,
                        steps_per_epoch)
        else:
            tic = time.time()
            # fill over an EMPTY bank: the uninterrupted flow cleared it at
            # the previous epoch's end, but epoch-boundary RESUME states may
            # carry stale tail slots (state_epochN is saved before the
            # clear; a preempt can land between the last step and the
            # clear) — and when the fill covers less than capacity
            # (len(bank_loader) < mb_batch) those tails would diverge the
            # resumed trajectory from the uninterrupted one
            empty = mb.create(cfg.train.memory_bank_capacity,
                              cfg.model.max_words, cfg.model.max_frames,
                              cfg.model.clip.embed_dim,
                              feat_dtype=cfg.train.bank_dtype)
            if mesh is not None:
                empty = mb.MemoryBank(*pmesh.replicate_tree(tuple(empty),
                                                            mesh))
            empty = mb.place_bank(empty, cfg.train.bank_placement, mesh)
            # fill-augment key: derived from (run key, epoch) on a stream
            # disjoint from the step keys (which fold global_step), so an
            # epoch-boundary resume re-fills with identical draws
            state = state._replace(bank=fill_memory_bank(
                state.params, cfg, bank_loader, empty, mesh,
                key=jax.random.fold_in(jax.random.fold_in(key, 0xBAFF),
                                       epoch)))
            logger.info("Epoch %d: memory bank filled in %.1fs", epoch,
                        time.time() - tic)
        if guard.requested:     # SIGTERM during the (minutes-long) bank fill
            return preempt_exit()

        meters = MetricLogger()
        epoch_tic = time.time()
        # async H2D: batches stream to HBM while the previous step computes
        # (double-buffered; sharded over the mesh's data axis when present)
        device_batches = prefetch_to_device(train_loader, size=2, mesh=mesh)

        # Host wait on the data pipeline (the reference's data-time meter,
        # trainer.py:68,121-144).  Steps dispatch asynchronously, so host
        # time blocked in next() == loader starvation: ~0 means the decode
        # pipeline keeps up with the chip; anything substantial says add
        # workers (or switch --worker_mode process on many-core hosts).
        data_wait = [0.0]

        def _timed(src):
            it_ = iter(src)
            while True:
                t0 = time.perf_counter()
                try:
                    b = next(it_)
                except StopIteration:
                    return
                data_wait[0] += time.perf_counter() - t0
                yield b

        data_wait_logged = 0.0
        # `it` is the ABSOLUTE in-epoch batch index (display / mid-epoch-eval
        # cadence then line up with the uninterrupted run after a skip)
        for it, batch in enumerate(_timed(device_batches), start=skip):
            # profiler window (SURVEY §5: jax.profiler replaces the
            # reference's ad-hoc wall-clock timing)
            if cfg.train.profile_dir and global_step == cfg.train.profile_steps[0]:
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            step_key = jax.random.fold_in(key, global_step)
            state, metrics = train_step(state, batch, step_key, cfg, t_total,
                                        mesh=mesh)
            global_step += 1
            if guard.requested:
                return preempt_exit()
            # `profiling` guards the resume case where global_step lands
            # inside the window: stop without start would raise
            if profiling and global_step >= cfg.train.profile_steps[1]:
                stop_profiler(f"steps {cfg.train.profile_steps[0]}-"
                              f"{global_step}")

            if (it % cfg.train.n_display) == 0:
                # DELIBERATE sampling: fetching the metric scalars forces a
                # host sync, which on a tunneled chip costs more than the
                # information is worth — meters average every n_display-th
                # step, not every step (deviation from trainer.py's running
                # means, documented).  ONE batched device_get, not a
                # round-trip per scalar
                host_metrics = jax.device_get(metrics)
                scalars = {k: float(v) for k, v in host_metrics.items()
                           if np.ndim(v) == 0}
                scalars["data_wait_s"] = data_wait[0] - data_wait_logged
                data_wait_logged = data_wait[0]
                meters.update(**scalars)
                jsonl.write(kind="train", step=global_step, epoch=epoch,
                            **{k: round(v, 6) for k, v in scalars.items()})
                done = it + 1
                # elapsed covers only THIS run's steps (post-skip)
                eta = ((time.time() - epoch_tic) / max(done - skip, 1)
                       * (steps_per_epoch - done))
                logger.info("Epoch %d/%d step %d/%d  %s  eta %.0fs",
                            epoch + 1, cfg.train.epochs, done,
                            steps_per_epoch, meters, eta)
                # HBM watermark every n_display*5 steps (the reference
                # prints peak CUDA memory on the same cadence,
                # trainer.py:164-165); backends without memory_stats
                # (CPU) simply skip
                if it % (cfg.train.n_display * 5) == 0:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    peak, limit = (stats.get("peak_bytes_in_use"),
                                   stats.get("bytes_limit"))
                    if peak:
                        logger.info(
                            "Device memory: peak %.2f GB%s", peak / 2**30,
                            f" of {limit / 2**30:.2f} GB" if limit else "")

            # mid-epoch validation (trainer.py:167-202): every n_display*3
            # steps and once near the start — but not on the epoch's final
            # step, where the per-epoch eval below would immediately repeat
            # it on unchanged params
            if cfg.train.mid_epoch_eval and it != steps_per_epoch - 1 and (
                    global_step % (cfg.train.n_display * 3) == 0
                    or global_step == 1):
                eval_and_track(epoch)
                if guard.requested:   # SIGTERM during the mid-epoch eval —
                    return preempt_exit()   # don't wait out another step

        # per-epoch eval + checkpoint (main.py:333-365)
        eval_and_track(epoch)
        # checkpoint IO is process-0 only (reference rank-0 saves,
        # main.py:161-187).  With process-spanning shards (multi-host
        # tensor parallelism) the host fetch is a COLLECTIVE, so every
        # process participates; replicated state reads locally, so
        # non-zero processes skip the (multi-GB) copy they would discard.
        if cfg.train.save_checkpoints:
            if state_needs_collective() or jax.process_index() == 0:
                state_host = pmesh.fetch_to_host(state)
            if jax.process_index() == 0:
                writer.submit(lambda s=state_host, e=epoch:
                              ckpt.save_train_state(
                                  os.path.join(cfg.train.output_dir,
                                               f"state_epoch{e}.npz"), s))

        if guard.requested:   # SIGTERM during the per-epoch eval/checkpoint
            return preempt_exit()

        # epoch-end bank clear (main.py:368-374): re-created next epoch
        cleared = mb.create(
            cfg.train.memory_bank_capacity, cfg.model.max_words,
            cfg.model.max_frames, cfg.model.clip.embed_dim,
            feat_dtype=cfg.train.bank_dtype)
        if mesh is not None:
            cleared = mb.MemoryBank(*pmesh.replicate_tree(tuple(cleared),
                                                          mesh))
        state = state._replace(
            bank=mb.place_bank(cleared, cfg.train.bank_placement, mesh))

    # a window whose stop step exceeds total steps still writes its trace
    stop_profiler("stopped at end of training")
    return state, tracker, best_host

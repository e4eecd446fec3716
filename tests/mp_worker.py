"""Multi-process CPU worker for tests/test_multiprocess.py.

Runs a tiny training slice (bank fill + 2 train steps) through the REAL
multi-host path: per-process BatchLoader sharding →
make_array_from_process_local_data → SPMD train_step over the global mesh.
Invoked as `python mp_worker.py <process_id> <num_processes> <port>`;
process counts of 1 (the single-controller reference) and 2 exercise the
same code, so losses must match bit-for-bit down to fp reduction order.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run():
    import jax
    import numpy as np  # noqa: F401
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()       # the 3 worker runs share compiles
    from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                              TrainConfig)
    from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
    from neighborretr_tpu.data.loader import BatchLoader
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.parallel import mesh as pmesh
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    B, W, F = 8, 8, 4
    cfg = Config(model=ModelConfig.tiny(max_words=W, max_frames=F),
                 loss=LossConfig(num_neighbors=3),
                 train=TrainConfig(batch_size=B, mb_batch=1))
    ds = SyntheticDataset(n=24, max_words=W, max_frames=F, resolution=32,
                          vocab_size=cfg.model.clip.vocab_size)
    loader = BatchLoader(ds, B, shuffle=True, drop_last=True, workers=2,
                         seed=3, prefetch=0,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())

    mesh = pmesh.make_mesh()
    params = pmesh.replicate_tree(
        model.init_params(jax.random.PRNGKey(0), cfg.model), mesh)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    bank = mb.MemoryBank(*pmesh.replicate_tree(tuple(bank), mesh))

    batches = [pmesh.shard_batch(b, mesh) for b in loader]
    bank = fill_bank_step(params, bank, batches[0], cfg, 0)
    state = create_train_state(params, bank)

    losses = []
    for b in batches[:2]:
        state, metrics = train_step(state, b, jax.random.PRNGKey(7), cfg, 10)
        losses.append(float(metrics["loss"]))
    print("LOSSES " + json.dumps(losses), flush=True)

    # multi-host evaluate(): per-process eval loader shards (pad_to_batch
    # exercises the padded-tail global plan) → SPMD feature cache → on-device
    # ranking; metrics must match the single-controller run exactly
    from neighborretr_tpu.train.evaluate import evaluate
    eval_loader = BatchLoader(ds, 16, shuffle=False, drop_last=False,
                              pad_to_batch=True, workers=2, prefetch=0,
                              process_index=jax.process_index(),
                              process_count=jax.process_count())
    t2v, v2t = evaluate(state.params, cfg, eval_loader, dataset=ds, mesh=mesh)
    print("EVAL " + json.dumps([t2v, v2t]), flush=True)

    # --resume auto across processes: only process 0 writes checkpoints,
    # so resolution must be broadcast — every process must land on the
    # SAME decision for an empty dir (None), an epoch save, and a newer
    # preempt save (core/checkpoint.py::resolve_resume_auto)
    import tempfile

    from neighborretr_tpu.core.checkpoint import (resolve_resume_auto,
                                                  save_train_state)
    outdir = os.path.join(tempfile.gettempdir(),
                          f"nrtpu_mp_resume_{os.environ.get('NRTPU_MP_TAG', '')}")
    if jax.process_index() == 0:
        # fresh dir: only process 0's scan feeds the broadcast, so this
        # cleanup cannot race the other processes' resolve calls
        import shutil
        shutil.rmtree(outdir, ignore_errors=True)
        os.makedirs(outdir)
    resolved = [resolve_resume_auto(outdir)]
    # fetch_to_host, not device_get: some state leaves span processes in the
    # 2-controller run (a collective — every process enters it together)
    host_state = pmesh.fetch_to_host(state)
    if jax.process_index() == 0:
        save_train_state(os.path.join(outdir, "state_epoch0.npz"), host_state)
    resolved.append(resolve_resume_auto(outdir))
    print("RESUME " + json.dumps(resolved), flush=True)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    run()


if __name__ == "__main__":
    main()

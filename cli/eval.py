"""Evaluation CLI: load a checkpoint, run retrieval eval on a dataset split.

    python -m cli.eval --datatype msrvtt --anno_path ... --video_path ... \
        --checkpoint outputs/msrvtt/best.npz --clip_checkpoint ViT-B-32.pt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# cheap import (pure dataclasses): single source for the backbone menu
from neighborretr_tpu.core.config import ClipConfig as _ClipConfig
_BACKBONE_CHOICES = _ClipConfig.backbone_names()


def main():
    p = argparse.ArgumentParser(description="NeighborRetr-TPU evaluation")
    p.add_argument("--datatype", default="msrvtt",
                   help="msrvtt/msvd/didemo/activitynet, or synthetic "
                        "(generated smoke data, implies --tiny without "
                        "--clip_checkpoint)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers for smoke runs")
    p.add_argument("--anno_path", default="")
    p.add_argument("--video_path", default="")
    p.add_argument("--subset", default=None)
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--checkpoint", default=None, help="best.npz params")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--batch_size_val", type=int, default=128)
    p.add_argument("--synthetic_size", type=int, default=None,
                   help="--datatype synthetic: eval set size (default "
                        "max(32, batch_size_val); same flag as cli/train)")
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth (must match the "
                        "checkpoint; args_parser.py:137)")
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--video_framerate", type=int, default=1)
    p.add_argument("--packed_dir", default="",
                   help="packed pre-decoded corpus (cli/pack_dataset.py)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--worker_mode", choices=["thread", "process"],
                   default="thread",
                   help="loader workers: threads (default) or forked "
                        "processes (scales Python-level augment cost on "
                        "many-core hosts)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="devices in the eval data mesh (None = all)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard tower weights over a `model` mesh axis of "
                        "this size (see cli/train.py)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port (see cli/train)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    from cli.common import init_distributed
    init_distributed(args)       # must precede ALL other JAX use

    import jax
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cli.common import (build_eval_dataset, load_eval_params,
                            resolve_eval_config)
    from neighborretr_tpu.data.loader import BatchLoader
    from neighborretr_tpu.train.evaluate import evaluate
    from neighborretr_tpu.utils.logging import setup_logger

    logger = setup_logger()
    cfg = resolve_eval_config(args, args.batch_size_val, logger)
    ds = build_eval_dataset(args, cfg, args.batch_size_val)
    # per-process loader sharding on multi-host runs (every process must
    # assemble only its LOCAL rows for make_array_from_process_local_data)
    loader = BatchLoader(ds, args.batch_size_val, shuffle=False,
                         drop_last=False, workers=args.workers,
                         worker_mode=args.worker_mode,
                         pad_to_batch=True,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    params = load_eval_params(args, cfg, logger)

    from neighborretr_tpu.parallel import mesh as pmesh
    mesh = None
    if len(jax.devices()) > 1 or args.num_devices or args.tensor_parallel > 1:
        if args.tensor_parallel > 1:
            n = args.num_devices or len(jax.devices())
            if n % args.tensor_parallel:
                # same contract as cli/train.py: an explicit TP request that
                # the visible devices can't satisfy is an error, not a no-op
                raise SystemExit(f"--tensor_parallel {args.tensor_parallel} "
                                 f"must divide the device count {n}")
            mesh = pmesh.make_tp_mesh((n // args.tensor_parallel,
                                       args.tensor_parallel))
            data_size = mesh.shape["data"]
        else:
            mesh = pmesh.make_mesh(num_devices=args.num_devices)
            data_size = mesh.devices.size
        if args.batch_size_val % data_size != 0:
            if args.tensor_parallel > 1:
                # an explicit TP request cannot silently degrade to
                # single-device eval (the whole point may be fitting a
                # backbone that OOMs unsharded)
                raise SystemExit(
                    f"--batch_size_val {args.batch_size_val} must be "
                    f"divisible by the data-mesh size {data_size} "
                    f"(devices / tensor_parallel) to use --tensor_parallel")
            logger.warning("batch_size_val %d not divisible by %d devices; "
                           "running single-device eval",
                           args.batch_size_val, data_size)
            mesh = None
        else:
            params = pmesh.place_params(params, mesh)

    evaluate(params, cfg, loader, dataset=ds, logger=logger, mesh=mesh)


if __name__ == "__main__":
    main()

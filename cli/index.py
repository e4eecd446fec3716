"""Build a video-feature retrieval index from a dataset split.

    python -m cli.index --datatype msrvtt --anno_path ... --video_path ... \
        --checkpoint outputs/msrvtt/best.npz --out msrvtt_index.npz

The index answers free-text queries via `cli/search.py` without re-decoding
or re-encoding any video (the serving path; see neighborretr_tpu/serving.py).
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
    p = argparse.ArgumentParser(description="Build a video retrieval index")
    p.add_argument("--datatype", default="msrvtt",
                   help="msrvtt/msvd/didemo/activitynet, or synthetic")
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers for smoke runs")
    p.add_argument("--anno_path", default="")
    p.add_argument("--video_path", default="")
    p.add_argument("--subset", default=None)
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--checkpoint", default=None,
                   help="best.npz / state_epochN.npz / reference best.pth")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--out", required=True, help="output index .npz path")
    p.add_argument("--feature_dtype", default="float16",
                   choices=["float16", "int8"],
                   help="stored feature precision: int8 quarters the index "
                        "size (symmetric per-frame-token scales)")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--synthetic_size", type=int, default=None,
                   help="--datatype synthetic: corpus size (default "
                        "max(32, batch_size); same flag as cli/train)")
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth (must match the "
                        "checkpoint; args_parser.py:137)")
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--video_framerate", type=int, default=1)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--worker_mode", choices=["thread", "process"],
                   default="thread",
                   help="loader workers: threads (default) or forked "
                        "processes (scales Python-level augment cost on "
                        "many-core hosts)")
    p.add_argument("--num_devices", type=int, default=1,
                   help="shard each encode batch over this many devices "
                        "(data-parallel corpus ViT forwards; batch_size "
                        "must divide). 1 = single device")
    p.add_argument("--append", action="store_true",
                   help="incremental build: if --out already exists, skip "
                        "its videos, encode only the new ones, and merge "
                        "(same checkpoint/config required)")
    args = p.parse_args()

    import jax
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cli.common import (build_eval_dataset, load_eval_params,
                            resolve_eval_config)
    from neighborretr_tpu import serving
    from neighborretr_tpu.data.loader import BatchLoader
    from neighborretr_tpu.utils.logging import setup_logger

    if jax.process_count() > 1:
        raise SystemExit(
            "cli/index.py builds the index in one process (the host-side "
            "dedup walks global batches); run it on a single controller")

    logger = setup_logger()
    cfg = resolve_eval_config(args, args.batch_size, logger)
    ds = build_eval_dataset(args, cfg, args.batch_size)
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                         workers=args.workers, worker_mode=args.worker_mode,
                         pad_to_batch=True)
    params = load_eval_params(args, cfg, logger)

    mesh = None
    if args.num_devices > 1:
        if args.batch_size % args.num_devices:
            raise SystemExit(f"--batch_size {args.batch_size} must divide "
                             f"over --num_devices {args.num_devices}")
        from neighborretr_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(num_devices=args.num_devices)
        logger.info("Encoding data-parallel over %d devices",
                    args.num_devices)

    existing = None
    out_path = serving.index_path(args.out)
    if args.append and os.path.exists(out_path):
        existing = serving.load_index(out_path)
        logger.info("Appending to %s (%d videos already indexed)",
                    out_path, len(existing["video_ids"]))
        if ("v_scale" in existing) != (args.feature_dtype == "int8"):
            raise SystemExit(
                "--feature_dtype differs from the existing index "
                f"({'int8' if 'v_scale' in existing else 'float16'}); "
                "match it or rebuild without --append")
        # wrong checkpoint/config must fail NOW, not after hours of ViT
        # forwards (append_index's meta comparison would catch it too late)
        serving.check_meta(existing, cfg, params)

    skip = ({str(v) for v in existing["video_ids"]}
            if existing is not None else None)
    try:
        index = serving.build_video_index(params, cfg, loader, dataset=ds,
                                          logger=logger,
                                          feature_dtype=args.feature_dtype,
                                          mesh=mesh, skip_ids=skip)
    except ValueError as e:
        if existing is not None and "no valid videos" in str(e):
            logger.info("No new videos to index; %s unchanged", out_path)
            return
        raise
    if existing is not None:
        before = len(existing["video_ids"])
        index = serving.append_index(existing, index)
        logger.info("Appended %d new videos",
                    len(index["video_ids"]) - before)
    written = serving.save_index(args.out, index)
    logger.info("Wrote %s: %d videos, %.1f MB", written,
                len(index["video_ids"]),
                os.path.getsize(written) / 1e6)


if __name__ == "__main__":
    main()

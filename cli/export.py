"""Export a deployment bundle: the AOT query program + weights + index.

    python -m cli.export --index msrvtt_index.npz \
        --checkpoint outputs/msrvtt/best.npz \
        --output bundle/ --query_batch 8 --topk 5

The bundle directory is self-contained (neighborretr_tpu.deploy): a serving
host deserializes `query_program.bin` with bare JAX and answers queries
without any framework code — same artifact on CPU and TPU.  No reference
counterpart (the reference ships train/eval only).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neighborretr_tpu.core.config import ClipConfig as _ClipConfig
_BACKBONE_CHOICES = _ClipConfig.backbone_names()


def main():
    p = argparse.ArgumentParser(description="Export AOT deployment bundle")
    p.add_argument("--index", required=True, help="index .npz from cli/index.py")
    p.add_argument("--output", required=True, help="bundle directory to write")
    p.add_argument("--query_batch", type=int, default=8,
                   help="queries per request the program is specialized to")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets (default cpu,tpu)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers (index built from a --tiny run)")
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--checkpoint", default=None,
                   help="best.npz / state_epochN.npz / reference best.pth")
    p.add_argument("--clip_checkpoint", default=None)
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth (must match the "
                        "checkpoint; args_parser.py:137)")
    args = p.parse_args()

    from neighborretr_tpu import deploy, serving
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    from neighborretr_tpu.utils.logging import setup_logger

    from cli.common import load_query_model

    enable_compilation_cache()
    logger = setup_logger()
    index = serving.load_index(args.index)
    cfg, params = load_query_model(args, index, logger)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    out = deploy.save_bundle(args.output, params, cfg, index,
                             query_batch=args.query_batch, topk=args.topk,
                             platforms=platforms)
    n = int(index["v_mask"].shape[0])
    logger.info("Wrote bundle %s: %d videos, query_batch=%d, topk=%d, "
                "platforms=%s", out, n, args.query_batch, args.topk,
                ",".join(platforms))


if __name__ == "__main__":
    main()

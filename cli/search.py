"""Free-text video search against a precomputed index (cli/index.py).

    python -m cli.search --index msrvtt_index.npz \
        --checkpoint outputs/msrvtt/best.npz \
        --query "a man is cooking pasta" --query "dog catching a frisbee"

Queries also stream from stdin (one per line) when no --query is given.
Scores are the eval-time token-interaction similarities (serving.search).
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
    p = argparse.ArgumentParser(description="Free-text video search")
    p.add_argument("--index", required=True, help="index .npz from cli/index.py")
    p.add_argument("--query", action="append", default=None,
                   help="query text (repeatable); omit to read stdin lines")
    p.add_argument("--topk", type=int, default=5)
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

    queries = args.query or [ln.strip() for ln in sys.stdin if ln.strip()]
    if not queries:
        raise SystemExit("no queries (pass --query or pipe lines on stdin)")

    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from neighborretr_tpu import serving
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    from neighborretr_tpu.utils.logging import setup_logger

    from cli.common import load_query_model

    logger = setup_logger()
    index = serving.load_index(args.index)
    cfg, params = load_query_model(args, index, logger)

    results = serving.search(params, cfg, index, ClipTokenizer(), queries,
                             topk=args.topk)
    for q, hits in zip(queries, results):
        print(f"query: {q}")
        for rank, (vid, score) in enumerate(hits, 1):
            print(f"  {rank}. {vid}  ({score:.4f})")


if __name__ == "__main__":
    main()

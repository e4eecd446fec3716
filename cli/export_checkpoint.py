"""Export a trained checkpoint to the reference's torch state-dict layout.

    python -m cli.export_checkpoint --checkpoint outputs/run/best.npz \
        --out pytorch_model.bin

The output loads into the reference NeighborRetr (modeling.py:46) via
load_state_dict(strict=False) / its --init_model path — the back-migration
direction of weights_io (tests/test_reference_parity.py proves the loaded
torch model reproduces our similarity matrix).
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
    p = argparse.ArgumentParser(
        description="Export to reference (torch) checkpoint layout")
    p.add_argument("--checkpoint", required=True,
                   help="our params checkpoint (best.npz or state_epochN.npz)")
    p.add_argument("--out", required=True, help="output .bin/.pth path")
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth (must match the "
                        "checkpoint; args_parser.py:137)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-tower architecture (smoke checkpoints)")
    args = p.parse_args()

    import jax
    from neighborretr_tpu.core import checkpoint as ckpt
    from neighborretr_tpu.core.config import ClipConfig, ModelConfig
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.models.weights_io import save_reference_checkpoint

    if args.tiny:
        cfg = ModelConfig.tiny(max_words=args.max_words,
                               max_frames=args.max_frames,
                               temporal_layers=args.num_hidden_layers)
    else:
        clip_cfg = ClipConfig.from_name(args.base_encoder)
        cfg = ModelConfig(clip=clip_cfg, max_words=args.max_words,
                          max_frames=args.max_frames,
                          temporal_layers=args.num_hidden_layers)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    params = ckpt.load_params(args.checkpoint, params)
    save_reference_checkpoint(params, cfg, args.out)
    print(f"Exported {args.checkpoint} -> {args.out} "
          f"(reference state-dict layout)")


if __name__ == "__main__":
    main()

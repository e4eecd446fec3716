"""Temporal (frame-aggregation) transformer.

Rebuilds the reference's video feature aggregator (modeling.py:601-623):
frame position embeddings added to per-frame CLIP CLS features, a 4-layer
pre-LN transformer under a key-padding mask (bias value -1e6, modeling.py:613),
then a residual connection back to the un-aggregated frame features.

At init, the frame position embeddings are seeded from CLIP's text positional
embedding and the transformer layers from the first `temporal_layers` text
resblocks (modeling.py:199-220); see weights_io.seed_temporal_from_clip.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import layers as L

Params = Dict[str, Any]


def init_temporal(key, cfg: ModelConfig) -> Params:
    k_pos, k_tf = jax.random.split(key)
    width = cfg.width
    return {
        # full context_length rows so CLIP's text positional embedding can seed
        # it verbatim; only the first max_frames rows are ever read.
        "frame_position_embeddings": L.normal_init(
            k_pos, (cfg.clip.context_length, width), std=0.02),
        "transformer": L.transformer_init(k_tf, width, cfg.temporal_layers),
    }


def aggregate_video_features(p: Params, cfg: ModelConfig,
                             video_feat: jnp.ndarray, video_mask: jnp.ndarray,
                             dtype=jnp.bfloat16,
                             fused_attention=False) -> jnp.ndarray:
    """[B, F, D] per-frame features + [B, F] mask → [B, F, D] temporal features."""
    B, F, D = video_feat.shape
    original = video_feat
    x = video_feat.astype(dtype) + p["frame_position_embeddings"][:F].astype(dtype)
    # key-padding bias with the reference's -1e6 fill (modeling.py:613)
    bias = jnp.where(video_mask[:, None, None, :] > 0, 0.0, -1e6).astype(jnp.float32)
    heads = cfg.clip.transformer_heads
    x = L.transformer_apply(p["transformer"], x, heads, bias, dtype=dtype,
                            fused_attention=fused_attention)
    return (x + original.astype(dtype)).astype(video_feat.dtype)

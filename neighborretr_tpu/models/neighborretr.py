"""NeighborRetr model: CLIP dual encoder + temporal transformer + token
weighting + hierarchical token merging, as pure functions over one pytree.

Parameter tree layout (all fp32 leaves):

    {"clip": {"text", "visual", "logit_scale"},
     "temporal": {...},
     "text_weight_fc"/"video_weight_fc":   token-weight MLPs for local_level,
     "text_weight_fc1"/"video_weight_fc1": global-level weight MLPs — applied to
         single merged tokens where softmax(1)=1, so they are forward no-ops;
         kept for parameter-set parity with the reference (modeling.py:518-522).
         The reference's *_fc0/*_intra nets are dead code and are dropped.
     "text_merge"/"video_merge": CTM+TCBlock stacks}

Reference parity anchors: modeling.py:46-220 (init), 483-539 (similarity
levels), 541-623 (feature extraction).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.similarity import interaction_similarity, global_similarity
from . import clip as clip_mod
from . import ctm
from . import layers as L
from . import temporal as temporal_mod

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_weight_mlp(key, dim: int) -> Params:
    """Linear(d→2d) → ReLU → Linear(2d→1), normal(0.02) init (modeling.py:148-153
    + the model-wide _init_weights normal(0,0.02) at modeling.py:648-659)."""
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {"w": L.normal_init(k1, (dim, 2 * dim), std=0.02),
                "b": jnp.zeros((2 * dim,), jnp.float32)},
        "fc2": {"w": L.normal_init(k2, (2 * dim, 1), std=0.02),
                "b": jnp.zeros((1,), jnp.float32)},
    }


def init_params(key, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 9)
    width = cfg.width
    params = {
        "clip": clip_mod.init_clip(keys[0], cfg.clip),
        "temporal": temporal_mod.init_temporal(keys[1], cfg),
        "text_weight_fc": _init_weight_mlp(keys[2], width),
        "video_weight_fc": _init_weight_mlp(keys[3], width),
        "text_weight_fc1": _init_weight_mlp(keys[4], width),
        "video_weight_fc1": _init_weight_mlp(keys[5], width),
        "text_merge": ctm.init_merge_stack(keys[6], width),
        "video_merge": ctm.init_merge_stack(keys[7], width),
    }
    # seed frame position embeddings / temporal layers from the CLIP text tower
    # (modeling.py:199-220)
    params = seed_temporal_from_clip(params, cfg)
    return params


def seed_temporal_from_clip(params: Params, cfg: ModelConfig) -> Params:
    """Copy CLIP text positional embedding → frame position embeddings, and the
    first `temporal_layers` text resblocks → temporal transformer.

    Copy-on-write like clamp_logit_scale: the caller's tree is never
    mutated (weights_io.load_openai_clip_into only shallow-copies the top
    level, and callers may hold the pre-seed tree to diff against)."""
    text = params["clip"]["text"]
    temporal = dict(params["temporal"])
    temporal["frame_position_embeddings"] = (
        jnp.copy(text["positional_embedding"]))
    # jnp.copy each leaf: an identity slice would alias the text tower's
    # buffers and break XLA donation (same buffer donated twice)
    temporal["transformer"] = jax.tree.map(
        jnp.copy, L.slice_layers(text["transformer"], cfg.temporal_layers))
    out = dict(params)
    out["temporal"] = temporal
    return out


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------

def get_text_feat(params: Params, cfg: ModelConfig, text_ids, text_mask,
                  dtype=None, remat=None) -> jnp.ndarray:
    """[B, W] ids/mask → [B, W, E] full projected token hidden (fp32)."""
    dtype = dtype or jnp.dtype(cfg.compute_dtype)
    remat = cfg.remat if remat is None else remat
    _, hidden = clip_mod.encode_text(params["clip"]["text"], cfg.clip,
                                     text_ids, text_mask, dtype=dtype,
                                     remat=remat, unroll=cfg.unroll_layers,
                                     remat_policy=cfg.remat_policy,
                                     fused_attention=resolve_fused_attention(cfg))
    return hidden.astype(jnp.float32)


def get_video_feat(params: Params, cfg: ModelConfig, video, video_mask,
                   dtype=None, remat=None) -> jnp.ndarray:
    """[B, F, H, W, 3] frames + [B, F] mask → [B, F, E] temporal features.

    uint8 pixels are CLIP-normalized on device (host ships raw bytes — 4× less
    PCIe/ICI traffic than fp32); float inputs are assumed pre-normalized.
    """
    dtype = dtype or jnp.dtype(cfg.compute_dtype)
    if video.dtype == jnp.uint8:
        from ..data.video import normalize_frames
        video = normalize_frames(video, dtype=dtype)
    remat = cfg.remat if remat is None else remat
    B, F = video_mask.shape
    frames = video.reshape((B * F,) + video.shape[2:])

    def encode_frames(fr, chunk_remat):
        cls_feat, _ = clip_mod.encode_image(
            params["clip"]["visual"], cfg.clip, fr, dtype=dtype,
            remat=chunk_remat, unroll=cfg.unroll_layers,
            remat_policy=cfg.remat_policy,
            fused_attention=resolve_fused_attention(cfg),
            remat_skip_last=cfg.remat_skip_last, project_hidden=False)
        return cls_feat

    chunk = cfg.video_chunk_frames
    if chunk and B * F > chunk:
        # sequential frame chunks, each fully rematerialized: activations
        # are bounded by one chunk and no per-layer scan boundaries are
        # saved (config.video_chunk_frames) — per-layer remat inside the
        # chunk is off since the chunk's recompute already fits.  A chunk
        # that does not divide B·F pads the frame axis UP to a multiple
        # (pad rows dropped after): rounding DOWN to a divisor could
        # degrade to chunk=1 — B·F serialized single-frame calls — when
        # B·F is prime or has only small factors.
        total = B * F
        pad = (-total) % chunk
        if pad:
            frames = jnp.concatenate(
                [frames, jnp.zeros((pad,) + frames.shape[1:], frames.dtype)])
        chunked = frames.reshape(
            ((total + pad) // chunk, chunk) + frames.shape[1:])
        cls_feat = jax.lax.map(
            jax.checkpoint(lambda fr: encode_frames(fr, False)), chunked)
        cls_feat = cls_feat.reshape(
            (total + pad,) + cls_feat.shape[2:])[:total]
    else:
        cls_feat = encode_frames(frames, remat)
    frame_feat = cls_feat.reshape(B, F, -1).astype(jnp.float32)
    return temporal_mod.aggregate_video_features(
        params["temporal"], cfg, frame_feat, video_mask, dtype=dtype,
        fused_attention=resolve_fused_attention(cfg))


def get_text_video_feat(params: Params, cfg: ModelConfig, text_ids, text_mask,
                        video, video_mask, dtype=None, remat=None):
    return (get_text_feat(params, cfg, text_ids, text_mask, dtype, remat),
            get_video_feat(params, cfg, video, video_mask, dtype, remat))


# ---------------------------------------------------------------------------
# similarity levels
# ---------------------------------------------------------------------------

def token_weights(p_mlp: Params, feat: jnp.ndarray,
                  mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Masked softmax token weights (modeling.py:485-492)."""
    h = jax.nn.relu(L.linear(p_mlp["fc1"], feat.astype(jnp.float32)))
    w = L.linear(p_mlp["fc2"], h).squeeze(-1)
    if mask is not None:
        w = jnp.where(mask > 0, w, -9e15)
    return jax.nn.softmax(w, axis=-1)


def resolve_fused_attention(cfg: ModelConfig):
    """'auto' → the fully-fused attention-sublayer kernel iff running on a
    single TPU chip (on CPU the kernels would run in slow interpret mode; on
    a mesh the XLA einsum path partitions under GSPMD without shard_map).

    Returns False (einsum), True (frame-local attention kernel) or "block"
    (qkv+attention+out in one kernel — see ops/pallas_block_attention.py).

    PRECISION CONTRACT: both Pallas kernels run their MXU dots in bf16 by
    design (fp32 softmax/LN islands).  Under compute_dtype='float32' the
    only faithful implementation is the XLA einsum path — 'auto' falls back
    to it, and requesting a fused kernel explicitly raises.
    """
    if cfg.attention_impl in ("fused_block", "fused"):
        if cfg.compute_dtype != "bfloat16":
            raise ValueError(
                f"attention_impl='{cfg.attention_impl}' computes its MXU "
                "dots in bfloat16 by design; with compute_dtype="
                f"'{cfg.compute_dtype}' use attention_impl='einsum' (or "
                "switch compute_dtype to 'bfloat16')")
        return "block" if cfg.attention_impl == "fused_block" else True
    if cfg.attention_impl == "einsum":
        return False
    if (jax.default_backend() == "tpu" and jax.device_count() == 1
            and cfg.compute_dtype == "bfloat16"):
        return "block"
    return False


def resolve_use_pallas(cfg: ModelConfig) -> bool:
    """'auto' → fused Pallas kernel iff running on a single TPU chip.

    Under a multi-device mesh the XLA einsum path is used instead: it is
    partitionable by GSPMD without a shard_map wrapper, which keeps the
    similarity matrix row-sharded over the data axis automatically.
    """
    if cfg.use_pallas == "on":
        return True
    if cfg.use_pallas == "off":
        return False
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def local_similarity(params: Params, t_feat, v_feat, t_mask, v_mask,
                     use_pallas: bool = False,
                     sim_dtype: str = "float32") -> jnp.ndarray:
    """The reference's local_level; returns S with v2t = S.T.

    sim_dtype: MXU operand dtype for the fused kernel's dots ("bfloat16" on
    the training path, fp32 accumulation either way); the XLA einsum path
    and the eval harness stay fp32.

    Long-token shapes (T·V ≥ ~2k, the 64-word/64-frame configs) route to the
    chunked XLA form: the fused kernel's backward register-spills there
    (pallas_similarity._choose_bwd_blocks), and the one-shot einsum's
    [A,T,B,V] logits would not fit HBM against a production-size bank.
    """
    tw = token_weights(params["text_weight_fc"], t_feat, t_mask)
    vw = token_weights(params["video_weight_fc"], v_feat, v_mask)
    T, V = t_feat.shape[1], v_feat.shape[1]
    if T * V >= 2048:
        # 64w/64f recipes: the blocked two-level kernel (v-chunk grid axis)
        # replaces the flat kernel (which register-spills here); callers pass
        # the resolve_use_pallas(cfg) verdict, so an explicit
        # use_pallas="off" really does route to the chunked XLA form
        if use_pallas:
            from ..ops.pallas_similarity_blocked import (
                pallas_interaction_similarity_blocked)
            return pallas_interaction_similarity_blocked(
                t_feat, v_feat, t_mask, v_mask, tw, vw,
                compute_dtype=sim_dtype)
        from ..ops.similarity import interaction_similarity_chunked
        return interaction_similarity_chunked(t_feat, v_feat, t_mask, v_mask,
                                              tw, vw)
    if use_pallas:
        from ..ops.pallas_similarity import pallas_interaction_similarity
        return pallas_interaction_similarity(t_feat, v_feat, t_mask, v_mask,
                                             tw, vw, compute_dtype=sim_dtype)
    return interaction_similarity(t_feat, v_feat, t_mask, v_mask, tw, vw)


def bank_fusion_supported(cfg: ModelConfig) -> bool:
    """The fused similarity→mean kernel (loss-side fusion) currently covers
    the flat-kernel shapes; long-token (T·V ≥ 2048) configs use the blocked
    kernel which emits the full matrix (its mean is cheap there anyway)."""
    return cfg.max_words * cfg.max_frames < 2048


def bank_centrality(params: Params, t_feat, v_feat, t_mask, v_mask,
                    axis: int = 1, sim_dtype: str = "float32") -> jnp.ndarray:
    """Fused bank centrality: mean of the token-interaction similarity over
    `axis` (1 → per-text row mean against a video bank, 0 → per-video column
    mean against a text bank) WITHOUT materializing the [B, M] matrix — the
    neighbor loss's only use of it (until_module.py:181)."""
    from ..ops.pallas_similarity import pallas_interaction_mean
    tw = token_weights(params["text_weight_fc"], t_feat, t_mask)
    vw = token_weights(params["video_weight_fc"], v_feat, v_mask)
    return pallas_interaction_mean(t_feat, v_feat, t_mask, v_mask, tw, vw,
                                   axis=axis, compute_dtype=sim_dtype)


def merge_global_features(params: Params, cfg: ModelConfig, t_feat, v_feat,
                          t_mask, v_mask, key: Optional[jax.Array] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage CTM merge per modality → [B, 1, E] global tokens.

    key=None → deterministic DPC-KNN (no density tie-break noise)."""
    k_t, k_v = jax.random.split(key) if key is not None else (None, None)
    g_t = ctm.merge_to_global(params["text_merge"], t_feat, t_mask,
                              cfg.text_merge_sizes, cfg.ctm_k, cfg.ctm_heads, k_t)
    g_v = ctm.merge_to_global(params["video_merge"], v_feat, v_mask,
                              cfg.video_merge_sizes, cfg.ctm_k, cfg.ctm_heads, k_v)
    return g_t, g_v


def global_level(params: Params, t_global: jnp.ndarray,
                 v_global: jnp.ndarray) -> jnp.ndarray:
    """Global similarity over merged tokens (modeling.py:516-539): the
    `*_fc1` weight nets produce softmax token weights (NO mask — all merged
    tokens are real), then unnormalized token-interaction.  Single-token
    merges (the default config) reduce to a plain dot where the weight nets
    are forward no-ops."""
    T1, V1 = t_global.shape[1], v_global.shape[1]
    if T1 == 1 and V1 == 1:
        return global_similarity(t_global, v_global)
    tw = token_weights(params["text_weight_fc1"], t_global, None)
    vw = token_weights(params["video_weight_fc1"], v_global, None)
    return global_similarity(t_global, v_global, tw, vw)


def get_similarity_logits(params: Params, t_feat, v_feat, t_mask, v_mask,
                          use_pallas: bool = False):
    """Eval-time API (modeling.py:625-632): local similarity and its transpose."""
    s = local_similarity(params, t_feat, v_feat, t_mask, v_mask, use_pallas)
    return s, s.T


def logit_scale(params: Params) -> jnp.ndarray:
    """exp(logit_scale).  The parameter itself is clamped to ln(max_scale)
    after each optimizer step (trainer.py:112-119), not in the forward."""
    return jnp.exp(params["clip"]["logit_scale"])


def clamp_logit_scale(params: Params, max_scale: float = 100.0) -> Params:
    """Post-step parameter clamp (trainer.py:112-119)."""
    clamped = jnp.minimum(params["clip"]["logit_scale"],
                          jnp.log(jnp.asarray(max_scale, jnp.float32)))
    params = dict(params)
    params["clip"] = dict(params["clip"])
    params["clip"]["logit_scale"] = clamped
    return params

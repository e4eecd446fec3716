"""CLIP dual encoder (text + vision towers) as pure functions over pytrees.

Behavioral spec from the reference (cited for parity checking, not copied):
  * text encoder: token embed + positional embed → 12-layer pre-LN transformer
    under a combined causal∧key-padding mask → ln_final @ text_projection,
    returning the full projected hidden [B, L, embed_dim] and the EoT-token
    feature (module_clip.py:521-555).
  * vision encoder: patch embed (stride=patch conv, no bias) → CLS + positional
    embed → ln_pre → transformer → ln_post @ proj, returning the projected CLS
    token per image (module_clip.py:303-345, 499-519).
  * `visual.conv1` (here: patch_embed) is frozen (module_clip.py:324-326);
    freezing is applied via the optimizer mask, see train/bertadam.py.
  * The reference's `token_embedding.requires_grad = False` (module_clip.py:409)
    is a no-op on parameters — token embeddings DO train; we keep them trainable.

TPU-first choices: the patch conv is a reshape+matmul (MXU path, no conv op);
inputs are NHWC; towers run in bf16 with fp32 LayerNorm/softmax islands.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ClipConfig
from . import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_text_tower(key, cfg: ClipConfig) -> Params:
    k_tok, k_pos, k_tf, k_proj = jax.random.split(key, 4)
    width = cfg.transformer_width
    return {
        "token_embedding": L.normal_init(k_tok, (cfg.vocab_size, width), std=0.02),
        "positional_embedding": L.normal_init(k_pos, (cfg.context_length, width), std=0.01),
        "transformer": L.transformer_init(k_tf, width, cfg.transformer_layers),
        "ln_final": L.layer_norm_init(width),
        "text_projection": L.normal_init(k_proj, (width, cfg.embed_dim), std=width ** -0.5),
    }


def init_vision_tower(key, cfg: ClipConfig) -> Params:
    k_conv, k_cls, k_pos, k_tf, k_proj = jax.random.split(key, 5)
    width = cfg.vision_width
    patch_dim = cfg.vision_patch_size * cfg.vision_patch_size * 3
    scale = width ** -0.5
    n_pos = cfg.grid_size * cfg.grid_size + 1
    return {
        # [P*P*3, width] — flattened (kh, kw, c) patch pixels → width
        "patch_embed": L.normal_init(k_conv, (patch_dim, width), std=scale),
        "class_embedding": scale * jax.random.normal(k_cls, (width,), jnp.float32),
        "positional_embedding": scale * jax.random.normal(k_pos, (n_pos, width), jnp.float32),
        "ln_pre": L.layer_norm_init(width),
        "transformer": L.transformer_init(k_tf, width, cfg.vision_layers),
        "ln_post": L.layer_norm_init(width),
        "proj": scale * jax.random.normal(k_proj, (width, cfg.embed_dim), jnp.float32),
    }


def init_clip(key, cfg: ClipConfig) -> Params:
    k_t, k_v = jax.random.split(key)
    return {
        "text": init_text_tower(k_t, cfg),
        "visual": init_vision_tower(k_v, cfg),
        # reference random-init is 1.0 (module_clip.py:404: ones([])), i.e.
        # exp scale e≈2.72 — NOT OpenAI's ln(1/0.07); checkpoint loads
        # overwrite this with the trained value (≈ln(100))
        "logit_scale": jnp.ones((), jnp.float32),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def encode_text(p: Params, cfg: ClipConfig, text_ids: jnp.ndarray,
                text_mask: jnp.ndarray, dtype=jnp.bfloat16,
                remat: bool = False, unroll: bool = False,
                remat_policy: str = "full",
                fused_attention: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode tokenized text.

    Args:
      text_ids:  [B, L] int32 token ids (0-padded, EoT has the max id in row).
      text_mask: [B, L] {0,1} validity mask.
    Returns:
      (eot_feat [B, E], hidden [B, L, E]) — full projected hidden like the
      reference's `encode_text(..., return_hidden=True)`.
    """
    B, Lq = text_ids.shape
    x = p["token_embedding"][text_ids].astype(dtype)
    x = x + p["positional_embedding"][:Lq].astype(dtype)

    # causal ∧ key-padding combined bias: where key invalid → -inf, else causal
    bias = L.causal_bias(Lq) + L.padding_bias(text_mask)

    x = L.transformer_apply(p["transformer"], x, cfg.transformer_heads, bias,
                            dtype=dtype, remat=remat, unroll=unroll,
                            remat_policy=remat_policy,
                            fused_attention=fused_attention)
    hidden = L.layer_norm(p["ln_final"], x).astype(dtype) @ p["text_projection"].astype(dtype)
    # EoT token = highest token id per row (module_clip.py:551-552)
    eot_idx = jnp.argmax(text_ids, axis=-1)
    eot = hidden[jnp.arange(B), eot_idx]
    return eot, hidden


def encode_image(p: Params, cfg: ClipConfig, images: jnp.ndarray,
                 dtype=jnp.bfloat16, remat: bool = False, unroll: bool = False,
                 remat_policy: str = "full", fused_attention: bool = False,
                 remat_skip_last: int = 0,
                 project_hidden: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode images (video frames).

    Args:
      images: [N, H, W, 3] float32/bf16 normalized pixels (NHWC).
      project_hidden: when False, only the CLS token goes through ln_post/proj
        and `hidden` is returned as None — the model only consumes per-frame
        CLS features (modeling.py:552-567), so the [N, 1+G*G, E] projection
        (+ its backward) is dead work on the training path.
    Returns:
      (cls_feat [N, E], hidden [N, 1+G*G, E] or None) — projected CLS token
      and the full projected hidden, mirroring the reference's
      `encode_image(..., return_hidden=True)`.
    """
    N, H, W, _ = images.shape
    P = cfg.vision_patch_size
    gh, gw = H // P, W // P
    # patch embedding as a strided VALID conv (XLA's implicit-im2col TPU
    # lowering): 4.2 ms vs 8.0 ms for the manual patchify-transpose+matmul
    # at the bench shape — the [..., 3]-lane relayout is what the transpose
    # formulation pays.  The pytree keeps the flattened [P·P·3, width]
    # matmul layout (checkpoint mapping unchanged); the HWIO reshape is free.
    # patch_embed is FROZEN (the reference freezes visual.conv1,
    # module_clip.py:324-326; the optimizer also masks it) — stop_gradient
    # tells autodiff so: no weight-grad conv, no patchify residuals.
    pe = jax.lax.stop_gradient(p["patch_embed"])
    w = pe.reshape(P, P, 3, -1).astype(dtype)          # (kh, kw, c) → HWIO
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), w, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # [N, gh, gw, width]
    x = x.reshape(N, gh * gw, -1)

    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype), (N, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"].astype(dtype)
    x = L.layer_norm(p["ln_pre"], x)

    x = L.transformer_apply(p["transformer"], x, cfg.vision_heads, None,
                            dtype=dtype, remat=remat, unroll=unroll,
                            remat_policy=remat_policy,
                            fused_attention=fused_attention,
                            remat_skip_last=remat_skip_last)
    if not project_hidden:
        cls_tok = L.layer_norm(p["ln_post"], x[:, 0:1, :])[:, 0, :]
        return cls_tok.astype(dtype) @ p["proj"].astype(dtype), None
    hidden = L.layer_norm(p["ln_post"], x).astype(dtype) @ p["proj"].astype(dtype)
    return hidden[:, 0, :], hidden

"""Hierarchical token merging: CTM (Clustering Token Mixer) + TC cross-attention.

Rebuilds the reference's global-representation path (cluster.py:670-965,
modeling.py:446-481): two stages per modality of

    CTM:   residual 1-D token conv (k=3, no bias) → LayerNorm → score head →
           exp(masked score) merge weights → DPC-KNN clustering → weighted merge
    TCB:   cross-attention of merged query tokens over the pre-merge tokens,
           with the pre-merge token scores added to the attention logits
           (cluster.py:879-885), residual from the pre-norm queries.

Stage 1 sees the padding mask; merged tokens are all valid so stage 2 runs
unmasked (merge_tokens sets mask=None, cluster.py:556).  The reference's
idx_token/agg_weight provenance tracking never influences the output features
(only 'x' and 'token_score' are consumed downstream), so it is dropped here.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.cluster import cluster_dpc_knn, merge_tokens
from . import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv1d_init(key, channels: int, kernel: int, bias: bool) -> Params:
    """torch Conv1d default (kaiming-uniform) equivalent; kernel [K, C_in, C_out]."""
    bound = 1.0 / math.sqrt(channels * kernel)
    k1, k2 = jax.random.split(key)
    p: Params = {"w": jax.random.uniform(k1, (kernel, channels, channels),
                                         jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (channels,), jnp.float32, -bound, bound)
    return p


def _linear_torch_default_init(key, in_dim: int, out_dim: int) -> Params:
    """torch nn.Linear default init: kaiming-uniform(a=√5) weight and
    uniform bias, both bounded by 1/√fan_in."""
    bound = 1.0 / math.sqrt(in_dim)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(k2, (out_dim,), jnp.float32,
                                    -bound, bound)}


def init_ctm(key, dim: int) -> Params:
    k_conv, k_score = jax.random.split(key)
    return {
        "conv": _conv1d_init(k_conv, dim, 3, bias=False),
        "norm": L.layer_norm_init(dim),
        # torch Linear DEFAULTS, not trunc_normal: the reference's CTM never
        # re-initializes itself (cluster.py applies _init_weights only inside
        # TCAttention/TCBlock at :743/:816/:920; CTM at :670-717 does not),
        # so its score head keeps kaiming-uniform weight + uniform bias
        "score": _linear_torch_default_init(k_score, dim, 1),
    }


def init_tc_block(key, dim: int) -> Params:
    kq, kkv, kp = jax.random.split(key, 3)
    return {
        "norm1": L.layer_norm_init(dim),
        "q": {"w": L.trunc_normal_init(kq, (dim, dim), std=0.02),
              "b": jnp.zeros((dim,), jnp.float32)},
        "kv": {"w": L.trunc_normal_init(kkv, (dim, 2 * dim), std=0.02),
               "b": jnp.zeros((2 * dim,), jnp.float32)},
        "proj": {"w": L.trunc_normal_init(kp, (dim, dim), std=0.02),
                 "b": jnp.zeros((dim,), jnp.float32)},
    }


def init_merge_stack(key, dim: int) -> Params:
    """One modality's two-stage (CTM, TCBlock) stack (modeling.py:186-197)."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    return {
        "ctm0": init_ctm(k0, dim), "block0": init_tc_block(k1, dim),
        "ctm1": init_ctm(k2, dim), "block1": init_tc_block(k3, dim),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def token_conv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Residual 1-D conv over the token axis: x + conv(x) (cluster.py:648-663)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["w"],
        window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return x + y.astype(x.dtype)


def ctm_apply(
    p: Params,
    x: jnp.ndarray,                     # [B, N, C]
    cluster_num: int,
    k: int,
    key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,  # [B, N] {0,1} or None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (merged [B, cluster_num, C], kv_tokens [B, N, C], token_score [B, N])."""
    x = token_conv(p["conv"], x)
    x = L.layer_norm(p["norm"], x)
    score = L.linear(p["score"], x).squeeze(-1)           # [B, N]
    if mask is not None:
        score_masked = jnp.where(mask > 0, score, -jnp.inf)
    else:
        score_masked = score
    token_weight = jnp.exp(score_masked)[..., None]        # [B, N, 1]

    # clamp like cluster_dpc_knn does internally: at most N clusters exist;
    # an unclamped count would make merge_tokens emit phantom all-zero
    # merged tokens past index N
    cluster_num = min(cluster_num, x.shape[1])
    idx_cluster = cluster_dpc_knn(x, cluster_num, k, key, token_mask=mask)
    merged = merge_tokens(x, idx_cluster, cluster_num, token_weight)
    return merged, x, score_masked


def tc_block_apply(
    p: Params,
    q_tokens: jnp.ndarray,    # [B, Nq, C] merged tokens (queries)
    kv_tokens: jnp.ndarray,   # [B, Nkv, C] pre-merge tokens (keys/values)
    kv_score: jnp.ndarray,    # [B, Nkv] token scores added to attn logits
    num_heads: int,
) -> jnp.ndarray:
    B, Nq, C = q_tokens.shape
    head_dim = C // num_heads
    q_in = L.layer_norm(p["norm1"], q_tokens)
    kv_in = L.layer_norm(p["norm1"], kv_tokens)

    q = L.linear(p["q"], q_in).reshape(B, Nq, num_heads, head_dim).transpose(0, 2, 1, 3)
    kv = L.linear(p["kv"], kv_in)
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(B, -1, num_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, num_heads, head_dim).transpose(0, 2, 1, 3)

    scale = head_dim ** -0.5
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + kv_score.astype(jnp.float32)[:, None, None, :]
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    out = L.linear(p["proj"], out)
    return q_tokens + out   # residual from pre-norm queries (cluster.py:957)


def merge_to_global(
    p: Params,                # init_merge_stack params
    feat: jnp.ndarray,        # [B, N, C] token features
    mask: Optional[jnp.ndarray],   # [B, N] {0,1}
    sizes: Tuple[int, int],   # static cluster counts per stage
    k: int,
    num_heads: int,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Two-stage merge to `sizes[1]` global tokens (typically 1).

    key=None → deterministic clustering (no density tie-break noise)."""
    k0, k1 = jax.random.split(key) if key is not None else (None, None)
    merged0, kv0, score0 = ctm_apply(p["ctm0"], feat, sizes[0], k, k0, mask)
    x0 = tc_block_apply(p["block0"], merged0, kv0, score0, num_heads)

    merged1, kv1, score1 = ctm_apply(p["ctm1"], x0, sizes[1], k, k1, None)
    x1 = tc_block_apply(p["block1"], merged1, kv1, score1, num_heads)
    return x1

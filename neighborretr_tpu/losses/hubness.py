"""The four hubness-aware training objectives, as pure functions.

Rebuilt from the reference's loss modules (until_module.py:56-359) and their
call sites (modeling.py:314-444).  Each function takes explicit arrays and
returns a scalar fp32 loss; all are row-decomposable (except the Sinkhorn
target computation) so they shard cleanly over a data mesh.

Replicated reference quirks (documented in SURVEY.md §7):
  * `uniform_regularization_loss(similarity, logit_scale=temperature, beta)` —
    the --temperature flag (3.0) is passed as the logit scale
    (modeling.py:440-441); --ot_temperature is dead.
  * min-max normalization in the neighbor loss takes min/max over positions
    *outside* the extended mask (until_module.py:77-82 `torch.where(mask==0,
    sim, ±9e15)` keeps sim where mask==0).
  * positive-weight diagonal forced to 1.0 after masking (until_module.py:157).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.sinkhorn import sinkhorn_targets

BIG = 9e15


def _log_softmax(x):
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# Centrality Weighting Loss (L_Wti, until_module.py:294-328)
# ---------------------------------------------------------------------------

def centrality_weighting_loss(similarity: jnp.ndarray,
                              weights: jnp.ndarray) -> jnp.ndarray:
    """-mean(diag(log_softmax(S)) * w).  `similarity` is pre-scaled by the
    CLIP logit scale at the call site (modeling.py:372-377)."""
    logp = _log_softmax(similarity)
    diag = jnp.diagonal(logp)
    return -jnp.mean(diag * weights.astype(jnp.float32))


def centrality_weights(
    text_feat: jnp.ndarray,          # [B, T, D]
    video_feat: jnp.ndarray,         # [B, V, D]
    global_text_feat: jnp.ndarray,   # [B, T1, D] (T1=1 at default config)
    global_video_feat: jnp.ndarray,  # [B, V1, D]
    centrality_scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """exp(scale · mean_j <ĝ_i, token_j>) over ALL batch tokens
    (modeling.py:403-430 reshapes token feats to [B·T, D] before the matmul).

    Multi-token globals (64-word/64-frame configs merge to 3/6 tokens):
    centralities are additionally averaged over the global tokens, yielding
    [B] weights.  DOCUMENTED DEVIATION: the reference keeps the per-token
    [B, n1] weights (its squeeze(1) is a no-op for n1>1) and then CRASHES in
    CentralityWeightingLoss on the [B]×[B, n1] broadcast — its own
    ActivityNet recipe (README.md:113-133) hits this; averaging is the
    minimal consistent completion of Eq. 3's "centrality of entity i".
    """

    from ..ops.similarity import l2_normalize as norm

    B, T, D = text_feat.shape
    t_tokens = norm(text_feat.reshape(-1, D).astype(jnp.float32))
    v_tokens = norm(video_feat.reshape(-1, D).astype(jnp.float32))
    g_t = norm(global_text_feat.astype(jnp.float32))   # [B, T1, D]
    g_v = norm(global_video_feat.astype(jnp.float32))
    # mean_j <g, t̂_j> = <g, mean_j t̂_j>; then mean over the global tokens
    t_centrality = jnp.mean(g_t @ jnp.mean(t_tokens, axis=0), axis=-1)  # [B]
    v_centrality = jnp.mean(g_v @ jnp.mean(v_tokens, axis=0), axis=-1)
    return (jnp.exp(t_centrality * centrality_scale),
            jnp.exp(v_centrality * centrality_scale))


# ---------------------------------------------------------------------------
# Neighbor Adjusting Loss (L_Nbi, until_module.py:56-211)
# ---------------------------------------------------------------------------

def _minmax_normalize(similarity: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Reference quirk: min/max are taken over positions with mask == 0."""
    masked_min = jnp.where(mask == 0.0, similarity, BIG)
    min_vals = jnp.min(masked_min, axis=-1, keepdims=True)
    masked_max = jnp.where(mask == 0.0, similarity, -BIG)
    max_vals = jnp.max(masked_max, axis=-1, keepdims=True)
    # B == num_neighbors + 2 leaves exactly ONE unmasked position per row:
    # min == max and the reference NaNs the whole loss from step 1
    # (until_module.py:78-84, 0/0).  Guard the denominator — parity
    # everywhere the reference is finite, finite where it is not
    # (documented in PARITY.md deviations).
    denom = max_vals - min_vals
    return (similarity - min_vals) / jnp.where(denom > 0.0, denom, 1.0)


def neighbor_masks(similarity: jnp.ndarray,
                   num_neighbors: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k neighbor mask (diagonal excluded) and extended mask (diag ∪ top-k).

    Row indices are assumed to coincide with column indices (square batch
    matrix), matching the reference (until_module.py:88-129).
    """
    B = similarity.shape[0]
    # at most B-1 off-diagonal neighbors exist (static clamp for tiny batches)
    num_neighbors = min(num_neighbors, B - 1)
    eye = jnp.eye(B, dtype=jnp.float32)
    sim_no_self = jnp.where(eye == 0.0, similarity, -BIG)
    _, topk_idx = jax.lax.top_k(sim_no_self, num_neighbors)   # [B, k]
    neighbor = jnp.zeros((B, B), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], topk_idx.shape)
    neighbor = neighbor.at[rows, topk_idx].set(1.0)
    extended = jnp.maximum(neighbor, eye)
    return neighbor, extended


def neighbor_adjusting_loss(
    similarity: jnp.ndarray,          # [B, B] cross-modal similarity
    memory_bank_matrix: jnp.ndarray,  # [B, M] entity-vs-bank similarity
    num_neighbors: int,
    temperature: float,
) -> jnp.ndarray:
    # column-entity centrality from the bank: row-mean of [B, M] — the ONLY
    # use of the bank matrix (until_module.py:181); the fused-kernel path
    # computes this mean in-kernel and calls the _from_centrality form
    centrality = jnp.mean(memory_bank_matrix.astype(jnp.float32), axis=-1)
    return neighbor_adjusting_loss_from_centrality(
        similarity, centrality, num_neighbors, temperature)


def neighbor_adjusting_loss_from_centrality(
    similarity: jnp.ndarray,   # [B, B] cross-modal similarity
    centrality: jnp.ndarray,   # [B] column-entity bank centrality
    num_neighbors: int,
    temperature: float,
) -> jnp.ndarray:
    similarity = similarity.astype(jnp.float32)
    B = similarity.shape[0]
    neighbor, extended = neighbor_masks(similarity, num_neighbors)

    centrality = jnp.broadcast_to(centrality.astype(jnp.float32)[None, :],
                                  (B, B))

    norm_sim = _minmax_normalize(similarity, extended)
    norm_cent = _minmax_normalize(centrality, extended)

    adjusted = jnp.where(neighbor == 1.0, norm_sim - norm_cent, -BIG)

    pos_w = jax.nn.softmax(adjusted * temperature, axis=-1)
    pos_w = jnp.where(neighbor == 1.0, pos_w, 0.0)
    pos_w = jnp.where(jnp.eye(B, dtype=bool), 1.0, pos_w)

    masked_sim = jnp.where(extended == 1.0, similarity, -BIG)
    logp = _log_softmax(masked_sim) * pos_w
    per_row = -jnp.sum(logp, axis=-1) / jnp.sum(pos_w, axis=-1)
    return jnp.mean(per_row)


# ---------------------------------------------------------------------------
# Uniform Regularization Loss (L_Opt, until_module.py:214-291)
# ---------------------------------------------------------------------------

def uniform_regularization_loss(
    similarity: jnp.ndarray,
    logit_scale: float,         # receives --temperature (3.0) via call-site aliasing
    beta: float,
    num_iterations: int = 50,
) -> jnp.ndarray:
    targets = sinkhorn_targets(similarity, beta, num_iterations)
    logp = _log_softmax(similarity * logit_scale) * targets
    return jnp.mean(-jnp.sum(logp, axis=-1))


# ---------------------------------------------------------------------------
# KL Divergence Loss (L_KL, until_module.py:331-359)
# ---------------------------------------------------------------------------

def kl_divergence_loss(global_similarity: jnp.ndarray,
                       local_similarity: jnp.ndarray) -> jnp.ndarray:
    """F.kl_div(log_softmax(global), softmax(local), reduction='mean') — note
    the ELEMENTWISE mean over B·B entries, not batchmean."""
    log_q = _log_softmax(global_similarity)
    p = jax.nn.softmax(local_similarity.astype(jnp.float32), axis=-1)
    # xlogy convention: p·log p = 0 where p == 0
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    return jnp.mean(plogp - p * log_q)

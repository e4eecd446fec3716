"""DPC-KNN token clustering and weighted token merging, XLA-native.

Rebuilds the reference's `cluster_dpc_knn` / `merge_tokens` (cluster.py:453-561)
with static shapes and functional scatter/segment ops:

  * pairwise distances → k-NN local density with a seeded random tie-break
    (the reference adds U[0,1)·1e-6 noise, cluster.py:483-484 — here the PRNG
    key is threaded explicitly for determinism),
  * density-peak scoring (min distance to any higher-density point × density),
  * top-`cluster_num` centers, nearest-center assignment with centers pinned to
    their own cluster,
  * exp-score-weighted cluster averaging via `segment_sum` (the reference's
    `index_add_`).

Everything runs under stop_gradient for the assignment (the reference wraps
clustering in no_grad; gradients flow only through the merge weights/features).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """Euclidean cdist over [B, N, C] → [B, N, N], scaled by 1/sqrt(C).

    Uses the MXU-friendly |a|²+|b|²-2ab expansion rather than materializing
    [B, N, N, C] differences.  Cancellation puts ~1e-3 absolute error on
    *near-zero* distances after the sqrt; this is below the algorithm's own
    deliberate 1e-6 density tie-break noise in effect (densities use d², whose
    error stays ~1e-6) and does not perturb cluster assignments of separated
    tokens.
    """
    sq = jnp.sum(jnp.square(x), axis=-1)
    # full-precision matmul: the distance matrix drives density *rankings*,
    # so bf16/tf32-reduced accumulation is not acceptable here
    inner = jnp.einsum("bnc,bmc->bnm", x, x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * inner
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    return d / (x.shape[-1] ** 0.5)


def cluster_dpc_knn(
    x: jnp.ndarray,                 # [B, N, C]
    cluster_num: int,
    k: int,
    key: Optional[jax.Array] = None,
    token_mask: Optional[jnp.ndarray] = None,   # [B, N] {0,1}
) -> jnp.ndarray:
    """Returns idx_cluster [B, N] int32 — cluster id per token.

    key=None skips the reference's U[0,1)·1e-6 density tie-break noise
    (cluster.py:483-484): fully deterministic clustering for eval and for
    golden parity against the reference with its noise patched out."""
    x = jax.lax.stop_gradient(x.astype(jnp.float32))
    B, N, C = x.shape
    # static clamps for tiny token counts (k-NN density needs k ≤ N and at
    # most N clusters exist)
    k = min(k, N)
    cluster_num = min(cluster_num, N)

    dist = pairwise_dist(x)
    if token_mask is not None:
        valid = token_mask > 0
        # distances TO empty tokens (column axis only) pushed past the
        # global max; invalid ROWS keep true distances — their density
        # is zeroed by token_mask below, matching the reference exactly
        global_max = jnp.max(dist)
        dist = dist * valid[:, None, :] + (global_max + 1.0) * (~valid[:, None, :])

    # local density from k nearest (smallest distances): topk of -dist
    neg_nearest, _ = jax.lax.top_k(-dist, k)              # [B, N, k]
    density = jnp.exp(-jnp.mean(jnp.square(neg_nearest), axis=-1))
    if key is not None:
        density = density + jax.random.uniform(key, density.shape, jnp.float32) * 1e-6
    if token_mask is not None:
        density = density * token_mask.astype(jnp.float32)

    # distance indicator: min distance to any higher-density token
    higher = (density[:, None, :] > density[:, :, None]).astype(jnp.float32)
    dist_max = jnp.max(dist.reshape(B, -1), axis=-1)[:, None, None]
    dist_to_parent = jnp.min(dist * higher + dist_max * (1.0 - higher), axis=-1)

    score = dist_to_parent * density
    _, index_down = jax.lax.top_k(score, cluster_num)      # [B, cluster_num]

    # assign each token to nearest center
    center_dist = jnp.take_along_axis(dist, index_down[:, :, None], axis=1)  # [B, K, N]
    idx_cluster = jnp.argmin(center_dist, axis=1).astype(jnp.int32)          # [B, N]

    # pin centers to their own cluster id
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    cluster_ids = jnp.broadcast_to(
        jnp.arange(cluster_num, dtype=jnp.int32)[None, :], index_down.shape)
    idx_cluster = idx_cluster.at[batch_idx, index_down].set(cluster_ids)
    return idx_cluster


def merge_tokens(
    x: jnp.ndarray,            # [B, N, C]
    idx_cluster: jnp.ndarray,  # [B, N] int32
    cluster_num: int,
    token_weight: jnp.ndarray,  # [B, N, 1] nonnegative
) -> jnp.ndarray:
    """Weighted average of tokens per cluster → [B, cluster_num, C]."""
    B, N, C = x.shape
    idx_cluster = jax.lax.stop_gradient(idx_cluster)
    flat_idx = (idx_cluster + jnp.arange(B, dtype=jnp.int32)[:, None] * cluster_num
                ).reshape(B * N)

    w = token_weight.reshape(B * N, 1)
    all_weight = jax.ops.segment_sum(w, flat_idx, num_segments=B * cluster_num) + 1e-6
    norm_w = w / all_weight[flat_idx]

    source = (x.reshape(B * N, C) * norm_w).astype(x.dtype)
    merged = jax.ops.segment_sum(source, flat_idx, num_segments=B * cluster_num)
    return merged.reshape(B, cluster_num, C)

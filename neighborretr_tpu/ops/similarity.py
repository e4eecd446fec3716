"""Token-interaction similarity — the framework's hot kernel.

Computes the reference's `local_level` cross-modal similarity
(modeling.py:483-514): for every (text a, video b) pair, all-pairs token
logits max-reduced per direction and combined with learned token weights:

    S[a,b] = 0.5 * ( Σ_t  max_v <t̂_a,t , v̂_b,v> · tw[a,t]
                   + Σ_v  max_t <t̂_a,t , v̂_b,v> · vw[b,v] )

where t̂/v̂ are L2-normalized tokens and masked token logits are *zeroed by
multiplication* (not -inf) before the max — an exact reference behavior
(modeling.py:500-501) that matters when all logits are negative.

The XLA implementation below reshapes to one large [A*T, B*V] matmul (MXU) and
reduces; a fused Pallas kernel with identical semantics lives in
ops/pallas_similarity.py and is selected via `use_pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch.nn.functional.normalize semantics (norm clamped below by eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def interaction_similarity(
    t_feat: jnp.ndarray,   # [A, T, D]
    v_feat: jnp.ndarray,   # [B, V, D]
    t_mask: jnp.ndarray,   # [A, T] {0,1}
    v_mask: jnp.ndarray,   # [B, V] {0,1}
    t_weight: jnp.ndarray,  # [A, T] softmax token weights
    v_weight: jnp.ndarray,  # [B, V]
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Symmetric-averaged similarity matrix [A, B].

    The reference's v2t matrix is exactly the transpose of this
    (modeling.py:512-514), so callers take S and S.T.
    """
    A, T, D = t_feat.shape
    B, V, _ = v_feat.shape
    tn = l2_normalize(t_feat).astype(dtype)
    vn = l2_normalize(v_feat).astype(dtype)

    # one big MXU matmul: [A*T, D] @ [D, B*V] → [A, T, B, V]
    logits = jax.lax.dot_general(
        tn.reshape(A * T, D), vn.reshape(B * V, D),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(A, T, B, V)

    # multiplicative masking (zeros, not -inf) — reference semantics
    logits = logits * t_mask.astype(jnp.float32)[:, :, None, None]
    logits = logits * v_mask.astype(jnp.float32)[None, None, :, :]

    t2v = jnp.max(logits, axis=3)                       # [A, T, B]
    sim_t = jnp.einsum("atb,at->ab", t2v, t_weight.astype(jnp.float32))

    v2t = jnp.max(logits, axis=1)                       # [A, B, V]
    sim_v = jnp.einsum("abv,bv->ab", v2t, v_weight.astype(jnp.float32))

    return 0.5 * (sim_t + sim_v)


def global_similarity(t_global: jnp.ndarray, v_global: jnp.ndarray) -> jnp.ndarray:
    """Global-level similarity for single-token merged features.

    The reference's `global_level` (modeling.py:516-539) applies weight nets to
    single tokens; a softmax over one element is identically 1, so the math
    reduces to a plain (unnormalized!) dot product with the symmetric average a
    no-op. We implement exactly that reduction.
    """
    t = jnp.squeeze(t_global, axis=1)   # [A, D]
    v = jnp.squeeze(v_global, axis=1)   # [B, D]
    return jax.lax.dot_general(
        t, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

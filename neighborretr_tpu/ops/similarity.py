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

from typing import Optional

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


def interaction_similarity_chunked(
    t_feat: jnp.ndarray,   # [A, T, D]
    v_feat: jnp.ndarray,   # [B, V, D]
    t_mask: jnp.ndarray,
    v_mask: jnp.ndarray,
    t_weight: jnp.ndarray,
    v_weight: jnp.ndarray,
    chunk: int = 128,
) -> jnp.ndarray:
    """interaction_similarity computed in video-side column chunks under
    lax.map, bounding the [A, T, chunk, V] logits intermediate.

    Serves the long-token configs (e.g. 64 words × 64 frames against a
    1920-entry memory bank, where the full [A,T,B,V] tensor would be >100 GB
    and the fused Pallas kernel's backward register-spills — see
    pallas_similarity._choose_bwd_blocks).  Differentiable (lax.map is a
    scan); ~`B/chunk` sequential steps.
    """
    B = v_feat.shape[0]
    nc = (B + chunk - 1) // chunk
    pad = nc * chunk - B

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x

    vf = pad0(v_feat).reshape(nc, chunk, *v_feat.shape[1:])
    vm = pad0(v_mask).reshape(nc, chunk, v_mask.shape[1])
    vw = pad0(v_weight).reshape(nc, chunk, v_weight.shape[1])

    def one_chunk(args):
        vf_c, vm_c, vw_c = args
        return interaction_similarity(t_feat, vf_c, t_mask, vm_c,
                                      t_weight, vw_c)            # [A, chunk]

    cols = jax.lax.map(one_chunk, (vf, vm, vw))                  # [nc, A, chunk]
    sim = jnp.transpose(cols, (1, 0, 2)).reshape(t_feat.shape[0], nc * chunk)
    return sim[:, :B]


def global_similarity(t_global: jnp.ndarray, v_global: jnp.ndarray,
                      t_weight: Optional[jnp.ndarray] = None,
                      v_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global-level similarity over merged tokens (modeling.py:516-539).

    The reference's `global_level` is token-interaction over the MERGED
    tokens with the `*_fc1` weight nets — but unlike `local_level` it applies
    NO mask and does NOT normalize the features.  At the default config the
    CTM stacks merge to a single token per modality (24→4→1, 12→3→1), where
    softmax(1)=1 and max-over-1 are identities and everything reduces to a
    plain unnormalized dot; longer configs (e.g. the 64-word/64-frame
    ActivityNet recipe: 64→11→3 text, 64→16→6 video tokens) take the general
    path.

    t_weight/v_weight: softmax token weights [A, T1] / [B, V1] from the
    `*_fc1` nets; None is valid only for single-token inputs.
    """
    A, T1, D = t_global.shape
    B, V1, _ = v_global.shape
    if T1 == 1 and V1 == 1:
        t = jnp.squeeze(t_global, axis=1)   # [A, D]
        v = jnp.squeeze(v_global, axis=1)   # [B, D]
        return jax.lax.dot_general(
            t, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    t = t_global.astype(jnp.float32)
    v = v_global.astype(jnp.float32)
    logits = jax.lax.dot_general(                      # [A, T1, B, V1]
        t.reshape(A * T1, D), v.reshape(B * V1, D),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(A, T1, B, V1)
    t2v = jnp.max(logits, axis=3)                      # [A, T1, B]
    sim_t = jnp.einsum("atb,at->ab", t2v, t_weight.astype(jnp.float32))
    v2t = jnp.max(logits, axis=1)                      # [A, B, V1]
    sim_v = jnp.einsum("abv,bv->ab", v2t, v_weight.astype(jnp.float32))
    return 0.5 * (sim_t + sim_v)

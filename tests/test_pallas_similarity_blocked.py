"""Blocked long-token similarity kernel vs the XLA reference path
(interpret mode on CPU; the TPU compiles the same kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.ops.pallas_similarity_blocked import (
    pallas_interaction_similarity_blocked)
from neighborretr_tpu.ops.similarity import (interaction_similarity,
                                             interaction_similarity_chunked)


def _inputs(rng, A, B, T, V, D):
    t_feat = jnp.asarray(rng.normal(size=(A, T, D)).astype(np.float32))
    v_feat = jnp.asarray(rng.normal(size=(B, V, D)).astype(np.float32))
    t_mask = np.ones((A, T), np.float32)
    v_mask = np.ones((B, V), np.float32)
    t_mask[0, T // 2:] = 0                     # padded tokens exercised
    v_mask[-1, V - 1] = 0
    tw = rng.uniform(0.1, 1.0, size=(A, T)).astype(np.float32)
    tw /= tw.sum(-1, keepdims=True)
    vw = rng.uniform(0.1, 1.0, size=(B, V)).astype(np.float32)
    vw /= vw.sum(-1, keepdims=True)
    return (t_feat, v_feat, jnp.asarray(t_mask), jnp.asarray(v_mask),
            jnp.asarray(tw), jnp.asarray(vw))


SHAPES = [
    (8, 16, 24, 12, 32),    # default-recipe token shape
    (8, 16, 64, 64, 32),    # the 64w/64f long-token recipe shape
    (4, 24, 64, 64, 32),    # non-multiple batch dims (padding paths)
    (8, 16, 7, 5, 32),      # odd token counts (VC divisor search)
]


@pytest.mark.parametrize("A,B,T,V,D", SHAPES)
def test_forward_matches_xla(rng, A, B, T, V, D):
    args = _inputs(rng, A, B, T, V, D)
    ref = interaction_similarity(*args)
    out = pallas_interaction_similarity_blocked(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_chunked_path(rng):
    """Same numbers as the sequential chunked XLA fallback it replaces."""
    args = _inputs(rng, 8, 16, 64, 64, 32)
    ref = interaction_similarity_chunked(*args)
    out = pallas_interaction_similarity_blocked(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("A,B,T,V,D", [(8, 16, 24, 12, 32),
                                       (8, 16, 64, 64, 16),
                                       (4, 24, 33, 16, 16)])
def test_gradients_match_xla(rng, A, B, T, V, D):
    args = _inputs(rng, A, B, T, V, D)
    probe = jnp.asarray(rng.normal(size=(A, B)).astype(np.float32))

    def loss_ref(tf, vf, tw, vw):
        return jnp.sum(interaction_similarity(
            tf, vf, args[2], args[3], tw, vw) * probe)

    def loss_ker(tf, vf, tw, vw):
        return jnp.sum(pallas_interaction_similarity_blocked(
            tf, vf, args[2], args[3], tw, vw, interpret=True) * probe)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        args[0], args[1], args[4], args[5])
    grads_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(
        args[0], args[1], args[4], args[5])
    for gr, gk, name in zip(grads_ref, grads_ker,
                            ("t_feat", "v_feat", "t_weight", "v_weight")):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_gradient_tie_routing_first_argmax(rng):
    """Duplicate token features force max ties; gradients must route to the
    FIRST argmax (torch max backward semantics) — matching the flat Pallas
    kernel, NOT the XLA path (jnp.max splits tie gradients equally; both
    kernels replicate torch, the parity target)."""
    from neighborretr_tpu.ops.pallas_similarity import (
        pallas_interaction_similarity)
    A, B, T, V, D = 4, 8, 8, 6, 16
    t_feat = rng.normal(size=(A, T, D)).astype(np.float32)
    v_feat = rng.normal(size=(B, V, D)).astype(np.float32)
    v_feat[:, 3] = v_feat[:, 1]              # tie over v
    t_feat[:, 5] = t_feat[:, 2]              # tie over t
    t_mask = jnp.ones((A, T)); v_mask = jnp.ones((B, V))
    tw = jnp.full((A, T), 1.0 / T); vw = jnp.full((B, V), 1.0 / V)
    t_feat = jnp.asarray(t_feat); v_feat = jnp.asarray(v_feat)

    def loss(fn):
        def f(tf, vf):
            return jnp.sum(fn(tf, vf, t_mask, v_mask, tw, vw))
        return f

    g_ref = jax.grad(loss(lambda *a: pallas_interaction_similarity(
        *a, interpret=True)), argnums=(0, 1))(t_feat, v_feat)
    g_ker = jax.grad(loss(lambda *a: pallas_interaction_similarity_blocked(
        *a, interpret=True)), argnums=(0, 1))(t_feat, v_feat)
    np.testing.assert_allclose(np.asarray(g_ker[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ker[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-6)


def test_gradient_tie_routing_across_chunks(rng, monkeypatch):
    """Force NC=2 v-chunks and tie the max across the chunk boundary: the
    winner must be the FIRST v (in chunk 0), exercising the strict-> running
    max update in _fwd_kernel that single-chunk shapes never reach."""
    from neighborretr_tpu.ops import pallas_similarity_blocked as blk
    from neighborretr_tpu.ops.pallas_similarity import (
        pallas_interaction_similarity)
    A, B, T, V, D = 4, 8, 8, 8, 16
    monkeypatch.setattr(blk, "_choose_blocks",
                        lambda *a: (4, 8, V // 2))      # BA=4, BB=8, VC=4
    t_feat = rng.normal(size=(A, T, D)).astype(np.float32)
    v_feat = rng.normal(size=(B, V, D)).astype(np.float32)
    v_feat[:, 6] = v_feat[:, 1]     # tie spanning chunk 0 (v=1) ↔ chunk 1 (v=6)
    t_mask = jnp.ones((A, T)); v_mask = jnp.ones((B, V))
    tw = jnp.full((A, T), 1.0 / T); vw = jnp.full((B, V), 1.0 / V)
    t_feat = jnp.asarray(t_feat); v_feat = jnp.asarray(v_feat)

    def loss(fn):
        def f(tf, vf):
            return jnp.sum(fn(tf, vf, t_mask, v_mask, tw, vw))
        return f

    out_b = blk.pallas_interaction_similarity_blocked(
        t_feat, v_feat, t_mask, v_mask, tw, vw, interpret=True)
    out_f = pallas_interaction_similarity(
        t_feat, v_feat, t_mask, v_mask, tw, vw, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f),
                               rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(loss(lambda *a: pallas_interaction_similarity(
        *a, interpret=True)), argnums=(0, 1))(t_feat, v_feat)
    g_ker = jax.grad(loss(lambda *a: blk.pallas_interaction_similarity_blocked(
        *a, interpret=True)), argnums=(0, 1))(t_feat, v_feat)
    np.testing.assert_allclose(np.asarray(g_ker[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ker[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-6)


def test_blocked_bfloat16_compute_dtype(rng):
    """The training path passes compute_dtype='bfloat16'
    (models/neighborretr.py sim_dtype) — forward and gradients must stay
    within bf16 tolerance of the fp32 kernel and remain finite."""
    A, B, T, V, D = 8, 16, 64, 64, 32
    args = _inputs(rng, A, B, T, V, D)

    out32 = pallas_interaction_similarity_blocked(*args, interpret=True)
    out16 = pallas_interaction_similarity_blocked(
        *args, interpret=True, compute_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)

    def loss(tf, vf):
        return jnp.sum(pallas_interaction_similarity_blocked(
            tf, vf, args[2], args[3], args[4], args[5],
            interpret=True, compute_dtype="bfloat16"))

    g = jax.grad(loss, argnums=(0, 1))(args[0], args[1])
    for gx in g:
        assert np.isfinite(np.asarray(gx)).all()
        assert float(jnp.abs(gx).sum()) > 0

"""Pallas fused similarity vs the XLA reference path — forward and gradients.

Runs in interpret mode on CPU; the same kernel compiles on TPU (exercised by
bench.py with NEIGHBORRETR_PALLAS=1).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.ops.pallas_similarity import pallas_interaction_similarity
from neighborretr_tpu.ops.similarity import interaction_similarity


def make_inputs(rng, A, B, T, V, D):
    tf = rng.normal(size=(A, T, D)).astype(np.float32)
    vf = rng.normal(size=(B, V, D)).astype(np.float32)
    tm = (rng.uniform(size=(A, T)) > 0.25).astype(np.float32)
    vm = (rng.uniform(size=(B, V)) > 0.25).astype(np.float32)
    tm[:, 0] = 1
    vm[:, 0] = 1
    tw = rng.dirichlet(np.ones(T), size=A).astype(np.float32)
    vw = rng.dirichlet(np.ones(V), size=B).astype(np.float32)
    return tuple(jnp.array(x) for x in (tf, vf, tm, vm, tw, vw))


@pytest.mark.parametrize("A,B,T,V,D", [
    (8, 8, 6, 4, 32),
    (16, 24, 5, 3, 16),     # non-square, odd T/V
])
def test_forward_matches_xla(rng, A, B, T, V, D):
    args = make_inputs(rng, A, B, T, V, D)
    want = interaction_similarity(*args)
    got = pallas_interaction_similarity(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla(rng):
    A, B, T, V, D = 8, 8, 5, 3, 16
    tf, vf, tm, vm, tw, vw = make_inputs(rng, A, B, T, V, D)

    def loss_xla(tf, vf, tw, vw):
        return jnp.sum(jnp.sin(interaction_similarity(tf, vf, tm, vm, tw, vw)))

    def loss_pallas(tf, vf, tw, vw):
        return jnp.sum(jnp.sin(pallas_interaction_similarity(
            tf, vf, tm, vm, tw, vw, interpret=True)))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(tf, vf, tw, vw)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(tf, vf, tw, vw)
    names = ["d_text_feat", "d_video_feat", "d_text_weight", "d_video_weight"]
    for name, a, b in zip(names, g_xla, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_padding_path(rng):
    """Shapes that are not multiples of the block sizes go through padding."""
    A, B, T, V, D = 10, 17, 4, 3, 8
    args = make_inputs(rng, A, B, T, V, D)
    want = interaction_similarity(*args)
    got = pallas_interaction_similarity(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_bf16_compute_close_to_fp32(rng):
    """compute_dtype=bfloat16 (training path) stays within bf16 rounding of
    the fp32 kernel, for values and feature gradients."""
    import jax
    A, B, T, V, D = 6, 10, 5, 4, 32
    tf = jnp.asarray(rng.standard_normal((A, T, D)).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((B, V, D)).astype(np.float32))
    tm = jnp.ones((A, T), jnp.float32)
    vm = jnp.ones((B, V), jnp.float32)
    tw = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((A, T)).astype(np.float32)), -1)
    vw = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((B, V)).astype(np.float32)), -1)

    def s32(tf, vf):
        return pallas_interaction_similarity(tf, vf, tm, vm, tw, vw,
                                             interpret=True)

    def s16(tf, vf):
        return pallas_interaction_similarity(tf, vf, tm, vm, tw, vw,
                                             interpret=True,
                                             compute_dtype="bfloat16")

    np.testing.assert_allclose(np.asarray(s16(tf, vf)),
                               np.asarray(s32(tf, vf)), atol=2e-2)
    g32 = jax.grad(lambda a, b: jnp.sum(s32(a, b) ** 2), argnums=(0, 1))(tf, vf)
    g16 = jax.grad(lambda a, b: jnp.sum(s16(a, b) ** 2), argnums=(0, 1))(tf, vf)
    for a, b in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-2)


# ---------------------------------------------------------------------------
# fused similarity → mean (loss-side fusion: bank centrality without the
# [B, M] matrix)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("A,B,T,V,D", [(8, 16, 12, 6, 32),
                                       (5, 19, 24, 12, 32)])
def test_interaction_mean_forward(axis, A, B, T, V, D):
    from neighborretr_tpu.ops.pallas_similarity import pallas_interaction_mean
    rng = np.random.default_rng(0)
    args = make_inputs(rng, A, B, T, V, D)
    # axis=1: [A] row means; axis=0: [B] column means
    ref = jnp.mean(interaction_similarity(*args), axis=axis)
    out = pallas_interaction_mean(*args, axis=axis, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("axis", [0, 1])
def test_interaction_mean_gradients(axis):
    from neighborretr_tpu.ops.pallas_similarity import pallas_interaction_mean
    A, B, T, V, D = 8, 16, 12, 6, 32
    rng = np.random.default_rng(1)
    tf, vf, tm, vm, tw, vw = make_inputs(rng, A, B, T, V, D)
    probe = jnp.asarray(rng.normal(size=(A if axis == 1 else B,))
                        .astype(np.float32))

    def loss_ref(tf, vf, tw, vw):
        m = jnp.mean(interaction_similarity(tf, vf, tm, vm, tw, vw),
                     axis=axis)
        return jnp.sum(m * probe)

    def loss_ker(tf, vf, tw, vw):
        m = pallas_interaction_mean(tf, vf, tm, vm, tw, vw, axis=axis,
                                    interpret=True)
        return jnp.sum(m * probe)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(tf, vf, tw, vw)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(tf, vf, tw, vw)
    for r, k, name in zip(gr, gk, ("t_feat", "v_feat", "t_weight", "v_weight")):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-4, atol=1e-6, err_msg=name)

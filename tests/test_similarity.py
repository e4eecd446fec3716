"""Token-interaction similarity vs a direct torch transcription of the
reference's local_level math (modeling.py:483-514)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from neighborretr_tpu.ops.similarity import (
    global_similarity, interaction_similarity, l2_normalize)


def _local_level_oracle(tf, vf, tm, vm, tw, vw):
    tf = F.normalize(torch.tensor(tf, dtype=torch.float64), dim=-1)
    vf = F.normalize(torch.tensor(vf, dtype=torch.float64), dim=-1)
    tm = torch.tensor(tm, dtype=torch.float64)
    vm = torch.tensor(vm, dtype=torch.float64)
    tw = torch.tensor(tw, dtype=torch.float64)
    vw = torch.tensor(vw, dtype=torch.float64)

    logits = torch.einsum("atd,bvd->abtv", tf, vf)
    logits = torch.einsum("abtv,at->abtv", logits, tm)
    logits = torch.einsum("abtv,bv->abtv", logits, vm)
    t2v = logits.max(dim=-1)[0]
    sim_t = torch.einsum("abt,at->ab", t2v, tw)
    v2t = logits.max(dim=-2)[0]
    sim_v = torch.einsum("abv,bv->ab", v2t, vw)
    return ((sim_t + sim_v) / 2.0).numpy()


def test_interaction_similarity_vs_oracle(rng):
    A, B, T, V, D = 5, 7, 6, 4, 16
    tf = rng.normal(size=(A, T, D)).astype(np.float32)
    vf = rng.normal(size=(B, V, D)).astype(np.float32)
    tm = (rng.uniform(size=(A, T)) > 0.3).astype(np.float32)
    vm = (rng.uniform(size=(B, V)) > 0.3).astype(np.float32)
    tm[:, 0] = 1.0
    vm[:, 0] = 1.0
    tw = rng.dirichlet(np.ones(T), size=A).astype(np.float32)
    vw = rng.dirichlet(np.ones(V), size=B).astype(np.float32)

    expected = _local_level_oracle(tf, vf, tm, vm, tw, vw)
    got = np.asarray(interaction_similarity(
        jnp.array(tf), jnp.array(vf), jnp.array(tm), jnp.array(vm),
        jnp.array(tw), jnp.array(vw)))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_masked_tokens_zeroed_not_neginf(rng):
    """Reference zeroes masked logits by multiplication — when all real logits
    are negative, the max picks up the 0 from masked slots.  Verify we match
    that exact (quirky) behavior."""
    A, B, T, V, D = 1, 1, 2, 2, 4
    tf = -np.ones((A, T, D), np.float32)
    vf = np.ones((B, V, D), np.float32)   # all real sims = -1
    tm = np.array([[1, 1]], np.float32)
    vm = np.array([[1, 0]], np.float32)   # one masked video token → 0 column
    tw = np.array([[0.5, 0.5]], np.float32)
    vw = np.array([[1.0, 0.0]], np.float32)
    got = np.asarray(interaction_similarity(
        jnp.array(tf), jnp.array(vf), jnp.array(tm), jnp.array(vm),
        jnp.array(tw), jnp.array(vw)))
    # t2v: max over v of (-1, 0) = 0 per t → Σ 0·tw = 0
    # v2t: max over t = -1 at valid v → Σ (-1)·1.0 = -1
    np.testing.assert_allclose(got, np.array([[-0.5]]), atol=1e-6)


def test_l2_normalize_matches_torch(rng):
    x = rng.normal(size=(3, 4, 8)).astype(np.float32)
    expected = F.normalize(torch.tensor(x), dim=-1).numpy()
    got = np.asarray(l2_normalize(jnp.array(x)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_global_similarity_is_plain_dot(rng):
    t = rng.normal(size=(4, 1, 8)).astype(np.float32)
    v = rng.normal(size=(5, 1, 8)).astype(np.float32)
    got = np.asarray(global_similarity(jnp.array(t), jnp.array(v)))
    np.testing.assert_allclose(got, t[:, 0] @ v[:, 0].T, atol=1e-5)


def test_chunked_matches_full(rng):
    from neighborretr_tpu.ops.similarity import interaction_similarity_chunked
    A, B, T, V, D = 6, 19, 5, 4, 16
    tf = jnp.asarray(rng.standard_normal((A, T, D)).astype(np.float32))
    vf = jnp.asarray(rng.standard_normal((B, V, D)).astype(np.float32))
    tm = jnp.asarray((rng.random((A, T)) > 0.2).astype(np.float32))
    vm = jnp.asarray((rng.random((B, V)) > 0.2).astype(np.float32))
    tw = jax.nn.softmax(jnp.asarray(rng.standard_normal((A, T)).astype(np.float32)), -1)
    vw = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, V)).astype(np.float32)), -1)

    full = interaction_similarity(tf, vf, tm, vm, tw, vw)
    chunked = interaction_similarity_chunked(tf, vf, tm, vm, tw, vw, chunk=7)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

    # gradients flow through the scan
    g_full = jax.grad(lambda a, b: jnp.sum(jnp.square(
        interaction_similarity(a, b, tm, vm, tw, vw))), argnums=(0, 1))(tf, vf)
    g_chk = jax.grad(lambda a, b: jnp.sum(jnp.square(
        interaction_similarity_chunked(a, b, tm, vm, tw, vw, chunk=7))),
        argnums=(0, 1))(tf, vf)
    for a, b in zip(g_chk, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

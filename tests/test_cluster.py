"""DPC-KNN clustering and token merging tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neighborretr_tpu.ops.cluster import cluster_dpc_knn, merge_tokens, pairwise_dist


def test_pairwise_dist_matches_numpy(rng):
    x = rng.normal(size=(2, 6, 8)).astype(np.float32)
    d = np.asarray(pairwise_dist(jnp.array(x)))
    for b in range(2):
        expected = np.sqrt(((x[b][:, None] - x[b][None, :]) ** 2).sum(-1)) / np.sqrt(8)
        # |a|²+|b|²-2ab cancellation bounds near-zero distances at ~1e-3 abs;
        # squared distances (what densities consume) stay at ~1e-6
        np.testing.assert_allclose(d[b], expected, atol=2e-3)
        np.testing.assert_allclose(d[b] ** 2, expected ** 2, atol=1e-5)


def test_cluster_centers_pinned_and_nearest(rng):
    x = rng.normal(size=(3, 12, 8)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    idx = np.asarray(cluster_dpc_knn(jnp.array(x), cluster_num=4, k=3, key=key))
    assert idx.shape == (3, 12)
    assert idx.min() >= 0 and idx.max() < 4
    # every cluster id appears (centers pin to their own id)
    for b in range(3):
        assert set(np.unique(idx[b])) <= set(range(4))
        assert len(np.unique(idx[b])) == 4


def test_cluster_separated_blobs():
    """Two well-separated blobs must split into the two clusters."""
    a = np.random.default_rng(1).normal(size=(1, 4, 8)).astype(np.float32) * 0.01
    b = a + 100.0
    x = np.concatenate([a, b], axis=1)
    idx = np.asarray(cluster_dpc_knn(jnp.array(x), cluster_num=2, k=2,
                                     key=jax.random.PRNGKey(0)))[0]
    assert len(set(idx[:4])) == 1
    assert len(set(idx[4:])) == 1
    assert idx[0] != idx[4]


def test_cluster_mask_excludes_padding(rng):
    x = rng.normal(size=(1, 8, 4)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], np.float32)
    idx = np.asarray(cluster_dpc_knn(jnp.array(x), cluster_num=2, k=2,
                                     key=jax.random.PRNGKey(0),
                                     token_mask=jnp.array(mask)))[0]
    # centers must be drawn from valid tokens: both cluster ids present among
    # valid positions
    assert set(idx[:5]) == {0, 1}


def test_merge_tokens_weighted_average(rng):
    """Oracle: exp-weighted mean per cluster (cluster.py:512-561 math)."""
    B, N, C, K = 2, 6, 4, 2
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    w = rng.uniform(0.1, 2.0, size=(B, N, 1)).astype(np.float32)
    idx = rng.integers(0, K, size=(B, N)).astype(np.int32)
    # ensure every cluster non-empty
    idx[:, 0] = 0
    idx[:, 1] = 1

    merged = np.asarray(merge_tokens(jnp.array(x), jnp.array(idx), K, jnp.array(w)))
    for b in range(B):
        for c in range(K):
            sel = idx[b] == c
            tot = w[b][sel].sum() + 1e-6
            expected = (x[b][sel] * (w[b][sel] / tot)).sum(0)
            np.testing.assert_allclose(merged[b, c], expected, atol=1e-5)


def test_merge_gradient_flows(rng):
    B, N, C, K = 1, 5, 3, 2
    x = jnp.array(rng.normal(size=(B, N, C)).astype(np.float32))
    w = jnp.array(rng.uniform(0.5, 1.5, size=(B, N, 1)).astype(np.float32))
    idx = jnp.zeros((B, N), jnp.int32)

    g = jax.grad(lambda xx: jnp.sum(merge_tokens(xx, idx, K, w)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0

"""Unit tests for the four hubness-aware losses against independent oracles.

Oracles are written in numpy/torch directly from the documented math
(SURVEY.md §2.1 item 8 / reference until_module.py:56-359), not by importing
reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from neighborretr_tpu.losses import hubness
from neighborretr_tpu.ops.sinkhorn import sinkhorn_transport_plan, sinkhorn_targets


def test_centrality_weighting_loss_hand_case():
    s = jnp.array([[2.0, 0.0], [1.0, 3.0]])
    w = jnp.array([1.5, 0.5])
    logp = np.log(np.exp([[2.0, 0.0], [1.0, 3.0]])
                  / np.exp([[2.0, 0.0], [1.0, 3.0]]).sum(1, keepdims=True))
    expected = -np.mean(np.diag(logp) * np.array([1.5, 0.5]))
    got = hubness.centrality_weighting_loss(s, w)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_centrality_weights_oracle(rng):
    B, T, V, D = 4, 5, 3, 8
    tf = rng.normal(size=(B, T, D)).astype(np.float32)
    vf = rng.normal(size=(B, V, D)).astype(np.float32)
    gt = rng.normal(size=(B, 1, D)).astype(np.float32)
    gv = rng.normal(size=(B, 1, D)).astype(np.float32)
    scale = 0.3

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    t_tok = norm(tf.reshape(-1, D))
    g_t = norm(gt[:, 0])
    exp_t = np.exp(np.mean(g_t @ t_tok.T, axis=-1) * scale)
    v_tok = norm(vf.reshape(-1, D))
    g_v = norm(gv[:, 0])
    exp_v = np.exp(np.mean(g_v @ v_tok.T, axis=-1) * scale)

    tw, vw = hubness.centrality_weights(jnp.array(tf), jnp.array(vf),
                                        jnp.array(gt), jnp.array(gv), scale)
    np.testing.assert_allclose(tw, exp_t, rtol=1e-3)
    np.testing.assert_allclose(vw, exp_v, rtol=1e-3)


def _neighbor_loss_torch_oracle(sim, bank, k, temp):
    """Direct transcription of the documented neighbor-loss math into torch."""
    sim = torch.tensor(sim, dtype=torch.float64)
    bank = torch.tensor(bank, dtype=torch.float64)
    B = sim.shape[0]
    eye = torch.eye(B, dtype=torch.float64)

    no_self = torch.where(eye == 0.0, sim, torch.tensor(-9e15, dtype=torch.float64))
    neighbor = torch.zeros((B, B), dtype=torch.float64)
    _, idx = torch.sort(no_self, dim=-1, descending=True)
    top = idx[:, :k].flatten()
    rows = torch.arange(B).unsqueeze(1).expand(-1, k).flatten()
    neighbor[rows, top] = 1.0
    extended = eye.clone()
    extended[rows, top] = 1.0

    centrality = bank.sum(-1) / bank.shape[-1]
    centrality = centrality.unsqueeze(0).repeat(B, 1)

    def mm_norm(x, mask):
        mn = torch.where(mask == 0.0, x, torch.tensor(9e15, dtype=torch.float64)
                         ).min(-1, keepdim=True)[0]
        mx = torch.where(mask == 0.0, x, torch.tensor(-9e15, dtype=torch.float64)
                         ).max(-1, keepdim=True)[0]
        return (x - mn) / (mx - mn)

    ns = mm_norm(sim, extended)
    nc = mm_norm(centrality, extended)
    adjusted = torch.where(neighbor == 1.0, ns - nc,
                           torch.tensor(-9e15, dtype=torch.float64))
    pw = torch.softmax(adjusted * temp, dim=-1)
    pw = torch.where(neighbor == 1.0, pw, torch.tensor(0.0, dtype=torch.float64))
    pw.fill_diagonal_(1.0)
    masked = torch.where(extended == 1.0, sim,
                         torch.tensor(-9e15, dtype=torch.float64))
    lp = F.log_softmax(masked, dim=-1) * pw
    lp = -lp.sum(-1) / pw.sum(-1)
    return lp.mean().item()


@pytest.mark.smoke
def test_neighbor_adjusting_loss_vs_oracle(rng):
    B, M, k, temp = 12, 20, 4, 3.0
    sim = rng.normal(size=(B, B)).astype(np.float32)
    bank = rng.normal(size=(B, M)).astype(np.float32)
    expected = _neighbor_loss_torch_oracle(sim, bank, k, temp)
    got = hubness.neighbor_adjusting_loss(jnp.array(sim), jnp.array(bank), k, temp)
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_sinkhorn_marginals(rng):
    """Transport plan must satisfy ~uniform marginals: each row/col sums to
    1/(m+n) × total mass structure of the reference's norm choice."""
    m, n = 8, 8
    scores = rng.normal(size=(m, n)).astype(np.float32)
    q = np.asarray(sinkhorn_transport_plan(jnp.array(scores), 50))
    # Z = scores + u ⊕ v - norm with norm = -log(m+n): the final v-update makes
    # exp(scores+u+v) columns sum to 1/(m+n), and the -norm shift rescales both
    # marginals to 1 (columns exactly, rows to convergence tolerance).
    np.testing.assert_allclose(q.sum(axis=0), np.ones(n), atol=1e-5)
    np.testing.assert_allclose(q.sum(axis=1), np.ones(m), atol=1e-3)


def test_sinkhorn_targets_identity_interp(rng):
    scores = rng.normal(size=(6, 6)).astype(np.float32)
    beta = 0.7
    q = np.asarray(sinkhorn_transport_plan(jnp.array(scores), 50))
    t = np.asarray(sinkhorn_targets(jnp.array(scores), beta, 50))
    np.testing.assert_allclose(t, beta * q + (1 - beta) * np.eye(6), rtol=1e-6)


def test_sinkhorn_no_gradient(rng):
    """The plan is constant w.r.t. scores (reference computes it in no_grad)."""
    scores = jnp.array(rng.normal(size=(4, 4)).astype(np.float32))
    g = jax.grad(lambda s: jnp.sum(sinkhorn_transport_plan(s, 10)))(scores)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_uniform_loss_vs_torch_oracle(rng):
    sim = rng.normal(size=(6, 6)).astype(np.float32)
    beta, temp = 0.7, 3.0
    targets = np.asarray(sinkhorn_targets(jnp.array(sim), beta, 50))
    lp = F.log_softmax(torch.tensor(sim, dtype=torch.float64) * temp, dim=-1)
    expected = (-(lp * torch.tensor(targets, dtype=torch.float64)).sum(-1)).mean().item()
    got = hubness.uniform_regularization_loss(jnp.array(sim), temp, beta, 50)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_kl_divergence_vs_torch(rng):
    g = rng.normal(size=(5, 5)).astype(np.float32)
    l = rng.normal(size=(5, 5)).astype(np.float32)
    expected = F.kl_div(
        F.log_softmax(torch.tensor(g, dtype=torch.float64), dim=-1),
        F.softmax(torch.tensor(l, dtype=torch.float64), dim=-1),
        reduction="mean").item()
    got = hubness.kl_divergence_loss(jnp.array(g), jnp.array(l))
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_neighbor_masks_topk_and_diag(rng):
    B, k = 10, 3
    sim = rng.normal(size=(B, B)).astype(np.float32)
    neighbor, extended = hubness.neighbor_masks(jnp.array(sim), k)
    neighbor, extended = np.asarray(neighbor), np.asarray(extended)
    assert neighbor.sum() == B * k
    assert np.all(np.diag(neighbor) == 0)
    assert np.all(np.diag(extended) == 1)
    # each row's neighbors are its k largest off-diagonal sims
    for i in range(B):
        row = sim[i].copy()
        row[i] = -np.inf
        top = set(np.argsort(-row)[:k])
        assert set(np.nonzero(neighbor[i])[0]) == top


def test_neighbor_loss_finite_at_batch_equals_k_plus_2(rng):
    """B == num_neighbors + 2 leaves ONE unmasked position per extended-mask
    row, so the reference's min-max normalization is 0/0 and the loss NaNs
    from step 1 (until_module.py:78-84).  Our guarded denominator keeps it
    finite (PARITY.md documented deviation); parity holds wherever the
    reference is finite (the torch-oracle tests above)."""
    for B, k in ((22, 20), (6, 4)):
        sim = jnp.asarray(rng.normal(size=(B, B)).astype(np.float32))
        bank = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
        loss = hubness.neighbor_adjusting_loss(sim, bank, num_neighbors=k,
                                               temperature=3.0)
        assert np.isfinite(float(loss)), (B, k)

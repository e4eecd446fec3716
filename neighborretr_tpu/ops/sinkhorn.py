"""Log-space Sinkhorn optimal transport (uniform-regularization targets).

Rebuilds the reference's `sinkhorn_algorithm` (until_module.py:223-266):
uniform marginals log_mu = log_nu = -log(m+n), 50 dual iterations in log space,
transport plan Z = scores + u ⊕ v - log(m+n).  The whole computation runs under
stop_gradient (the reference computes Z inside torch.no_grad, so the exp'd plan
is a constant w.r.t. the similarity graph), and the returned target is the
β-interpolation with the identity matrix (Eq. 10): β·Q + (1-β)·I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn_transport_plan(scores: jnp.ndarray, num_iterations: int = 50) -> jnp.ndarray:
    """Transport plan Q = exp(Z) for uniform marginals; constant w.r.t. scores."""
    scores = jax.lax.stop_gradient(scores.astype(jnp.float32))
    m, n = scores.shape
    norm = -jnp.log(jnp.asarray(float(m + n), jnp.float32))
    log_mu = jnp.full((m,), norm, jnp.float32)
    log_nu = jnp.full((n,), norm, jnp.float32)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(scores + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(scores + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(
        0, num_iterations, body,
        (jnp.zeros((m,), jnp.float32), jnp.zeros((n,), jnp.float32)),
    )
    z = scores + u[:, None] + v[None, :] - norm
    return jnp.exp(z)


def sinkhorn_targets(scores: jnp.ndarray, beta: float,
                     num_iterations: int = 50) -> jnp.ndarray:
    """β·Q + (1-β)·I — the uniform-regularization soft targets."""
    q = sinkhorn_transport_plan(scores, num_iterations)
    eye = jnp.eye(scores.shape[0], scores.shape[1], dtype=jnp.float32)
    return beta * q + (1.0 - beta) * eye

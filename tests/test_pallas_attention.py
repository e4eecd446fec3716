"""Fused frame-local attention kernel vs the XLA attention path.

Runs the Pallas kernel in interpret mode on CPU; the same code compiles on
TPU (scripts/pallas_tpu_check.py exercises the compiled path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.models import layers as L
from neighborretr_tpu.ops.pallas_attention import (_pick_fb,
                                                   fused_frame_attention)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _params(rng, D):
    def t(*shape):
        return jnp.asarray(rng.normal(scale=0.05, size=shape).astype(np.float32))
    return {
        "in_proj": {"w": t(D, 3, D), "b": t(3, D)},
        "out_proj": {"w": t(D, D), "b": t(D)},
    }


@pytest.mark.parametrize("N,Lq,H,hd", [(8, 10, 4, 16), (6, 7, 2, 32)])
def test_forward_matches_xla(rng, N, Lq, H, hd):
    D = H * hd
    p = _params(rng, D)
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))
    ref = L.mha(p, x, H, None, dtype=jnp.float32, fused=False)
    got = L.mha(p, x, H, None, dtype=jnp.float32, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gradients_match_xla(rng):
    N, Lq, H, hd = 4, 6, 2, 16
    D = H * hd
    p = _params(rng, D)
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))

    def loss(fused):
        def f(p, x):
            return jnp.sum(jnp.sin(L.mha(p, x, H, None, jnp.float32, fused)))
        return jax.value_and_grad(f, argnums=(0, 1))(p, x)

    (v_ref, g_ref), (v_got, g_got) = loss(False), loss(True)
    assert abs(float(v_ref) - float(v_got)) < 1e-2
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=5e-2)


def test_frame_locality(rng):
    """Attention must NOT leak across frames: changing frame 1 leaves frame 0's
    output untouched."""
    N, Lq, H, hd = 4, 5, 2, 16
    D = H * hd
    qkv = jnp.asarray(rng.normal(size=(N, Lq, 3 * D)).astype(np.float32))
    out1 = fused_frame_attention(qkv, H, interpret=True)
    qkv2 = qkv.at[1].set(rng.normal(size=(Lq, 3 * D)).astype(np.float32))
    out2 = fused_frame_attention(qkv2, H, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))


def test_pick_fb_divides():
    for n in (768, 96, 7, 12):
        fb = _pick_fb(n, 50)
        assert n % fb == 0


def test_biased_matches_xla_causal_padding(rng):
    """Text-tower path: causal∧padding additive bias through the fused kernel
    must match the XLA masked attention."""
    N, Lq, H, hd = 6, 10, 2, 16
    D = H * hd
    p = _params(rng, D)
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))
    mask = (rng.random((N, Lq)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    bias = L.causal_bias(Lq) + L.padding_bias(jnp.asarray(mask))

    def f(p, x, fused):
        return jnp.sum(jnp.sin(L.mha(p, x, H, bias, jnp.float32, fused)
                               * mask[:, :, None]))

    (v_ref, g_ref) = jax.value_and_grad(f, argnums=(0, 1))(p, x, False)
    (v_got, g_got) = jax.value_and_grad(f, argnums=(0, 1))(p, x, True)
    assert abs(float(v_ref[0] if isinstance(v_ref, tuple) else v_ref)
               - float(v_got[0] if isinstance(v_got, tuple) else v_got)) < 1e-2
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=5e-2)

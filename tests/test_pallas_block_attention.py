"""Fused attention-sublayer kernel vs the XLA einsum path (interpret mode).

Checks the forward and every cotangent (input, qkv/out weights and biases)
of ops/pallas_block_attention.fused_attention_sublayer against
layers.mha(fused=False) on the same parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.models import layers as L
from neighborretr_tpu.ops.pallas_block_attention import fused_attention_sublayer

N, SEQ, D, H = 8, 16, 128, 2


@pytest.fixture(scope="module")
def setup(rng=None):
    rng = np.random.default_rng(0)
    p = L.mha_init(jax.random.PRNGKey(0), D)
    h = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    return p, h


def _einsum_sublayer(p, h):
    return L.mha(p, h, H, None, dtype=jnp.float32, fused=False)


def _kernel_sublayer(p, h):
    return fused_attention_sublayer(
        h, *L.packed_qkv_weights(p["in_proj"]),
        p["out_proj"]["w"], p["out_proj"]["b"], H, interpret=True)


def test_forward_parity(setup):
    p, h = setup
    want = _einsum_sublayer(p, h)
    got = _kernel_sublayer(p, h)
    # kernel computes in bf16 with fp32 accumulation; einsum path here in fp32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_gradient_parity(setup):
    p, h = setup
    g_out = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, SEQ, D)).astype(np.float32))

    def loss_einsum(p, h):
        return jnp.sum(_einsum_sublayer(p, h) * g_out)

    def loss_kernel(p, h):
        return jnp.sum(_kernel_sublayer(p, h) * g_out)

    gp_w, gh_w = jax.grad(loss_einsum, argnums=(0, 1))(p, h)
    gp_k, gh_k = jax.grad(loss_kernel, argnums=(0, 1))(p, h)

    np.testing.assert_allclose(np.asarray(gh_k), np.asarray(gh_w),
                               atol=8e-2, rtol=8e-2)
    for path in (("in_proj", "w"), ("in_proj", "b"),
                 ("out_proj", "w"), ("out_proj", "b")):
        a = np.asarray(gp_k[path[0]][path[1]], np.float64)
        b = np.asarray(gp_w[path[0]][path[1]], np.float64)
        # weight grads accumulate over N*SEQ rows — compare with a scale-aware
        # tolerance (bf16 operands on the kernel side)
        denom = max(np.abs(b).max(), 1e-6)
        assert np.max(np.abs(a - b)) / denom < 6e-2, path


def test_block_apply_block_impl_matches_einsum(setup):
    """block_apply(fused_attention='block') ≈ block_apply(einsum)."""
    p_blk = L.block_init(jax.random.PRNGKey(2), D)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    want = L.block_apply(p_blk, x, H, None, dtype=jnp.float32,
                         fused_attention=False)
    got = L.block_apply(p_blk, x, H, None, dtype=jnp.float32,
                        fused_attention="block")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2, rtol=6e-2)


def test_biased_sublayer_matches_einsum(setup):
    """Per-sequence biased path (text causal∧padding) vs einsum mha."""
    p, h = setup
    rng = np.random.default_rng(7)
    # causal + key-padding bias per sequence
    causal = L.causal_bias(SEQ)                       # [1, 1, SEQ, SEQ]
    mask = (rng.random((N, SEQ)) > 0.25).astype(np.float32)
    mask[:, 0] = 1
    bias4 = causal + L.padding_bias(jnp.asarray(mask))  # [N, 1, SEQ, SEQ]

    want = L.mha(p, h, H, bias4, dtype=jnp.float32, fused=False)
    got = fused_attention_sublayer(
        h, *L.packed_qkv_weights(p["in_proj"]),
        p["out_proj"]["w"], p["out_proj"]["b"], H,
        bias=jnp.broadcast_to(bias4.astype(jnp.float32),
                              (N, 1, SEQ, SEQ))[:, 0],
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2, rtol=6e-2)

    g_out = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    gh_w = jax.grad(lambda x: jnp.sum(
        L.mha(p, x, H, bias4, dtype=jnp.float32, fused=False) * g_out))(h)
    gh_k = jax.grad(lambda x: jnp.sum(fused_attention_sublayer(
        x, *L.packed_qkv_weights(p["in_proj"]),
        p["out_proj"]["w"], p["out_proj"]["b"], H,
        bias=jnp.broadcast_to(bias4.astype(jnp.float32),
                              (N, 1, SEQ, SEQ))[:, 0],
        interpret=True) * g_out))(h)
    np.testing.assert_allclose(np.asarray(gh_k), np.asarray(gh_w),
                               atol=8e-2, rtol=8e-2)


def test_block_apply_biased_block_impl_matches_einsum(setup):
    p_blk = L.block_init(jax.random.PRNGKey(5), D)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    mask = np.ones((N, SEQ), np.float32)
    mask[:, SEQ // 2:] = 0
    bias = L.causal_bias(SEQ) + L.padding_bias(jnp.asarray(mask))
    want = L.block_apply(p_blk, x, H, bias, dtype=jnp.float32,
                         fused_attention=False)
    got = L.block_apply(p_blk, x, H, bias, dtype=jnp.float32,
                        fused_attention="block")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=6e-2, rtol=6e-2)


def test_ln_fused_residual_full_gradient_parity():
    """fused_ln_attention_residual vs layer_norm+mha+residual autodiff:
    forward and every cotangent including the in-kernel LN backward."""
    from neighborretr_tpu.ops.pallas_block_attention import (
        fused_ln_attention_residual)

    p_blk = L.block_init(jax.random.PRNGKey(9), D)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    g_out = jnp.asarray(rng.standard_normal((N, SEQ, D)).astype(np.float32))
    # non-trivial LN params so dscale/dbias are meaningfully tested
    p_blk["ln_1"]["scale"] = jnp.asarray(
        1.0 + 0.3 * rng.standard_normal(D).astype(np.float32))
    p_blk["ln_1"]["bias"] = jnp.asarray(
        0.1 * rng.standard_normal(D).astype(np.float32))

    def ref(p, x):
        h = L.layer_norm(p["ln_1"], x)
        return x + L.mha(p["attn"], h, H, None, dtype=jnp.float32, fused=False)

    def ker(p, x):
        return fused_ln_attention_residual(
            x, p["ln_1"]["scale"], p["ln_1"]["bias"],
            *L.packed_qkv_weights(p["attn"]["in_proj"]),
            p["attn"]["out_proj"]["w"], p["attn"]["out_proj"]["b"], H,
            interpret=True)

    np.testing.assert_allclose(np.asarray(ker(p_blk, x)),
                               np.asarray(ref(p_blk, x)), atol=6e-2, rtol=6e-2)

    gp_r, gx_r = jax.grad(lambda p, x: jnp.sum(ref(p, x) * g_out),
                          argnums=(0, 1))(p_blk, x)
    gp_k, gx_k = jax.grad(lambda p, x: jnp.sum(ker(p, x) * g_out),
                          argnums=(0, 1))(p_blk, x)

    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               atol=1e-1, rtol=1e-1)
    for path in (("ln_1", "scale"), ("ln_1", "bias"),
                 ("attn", "in_proj"), ("attn", "out_proj")):
        a = gp_k[path[0]][path[1]]
        b = gp_r[path[0]][path[1]]
        for leaf_a, leaf_b in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la = np.asarray(leaf_a, np.float64)
            lb = np.asarray(leaf_b, np.float64)
            denom = max(np.abs(lb).max(), 1e-6)
            assert np.max(np.abs(la - lb)) / denom < 6e-2, path


def test_ln_eps_matches_layers_default():
    """The fused sublayer kernel hardcodes its LN epsilon; it must equal
    layers.layer_norm's default or the fused and einsum paths silently
    normalize differently."""
    import inspect

    from neighborretr_tpu.models.layers import layer_norm
    from neighborretr_tpu.ops.pallas_block_attention import _LN_EPS
    default_eps = inspect.signature(layer_norm).parameters["eps"].default
    assert default_eps == _LN_EPS

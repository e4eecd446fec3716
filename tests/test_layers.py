"""Layer parity tests against torch oracles (torch used only as a test oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neighborretr_tpu.models import layers as L


def test_layer_norm_matches_torch(rng):
    dim = 16
    x = rng.normal(size=(3, 5, dim)).astype(np.float32)
    scale = rng.normal(size=(dim,)).astype(np.float32)
    bias = rng.normal(size=(dim,)).astype(np.float32)

    ln = torch.nn.LayerNorm(dim, eps=1e-5)
    with torch.no_grad():
        ln.weight.copy_(torch.tensor(scale))
        ln.bias.copy_(torch.tensor(bias))
    expected = ln(torch.tensor(x)).detach().numpy()

    got = np.asarray(L.layer_norm({"scale": jnp.array(scale),
                                   "bias": jnp.array(bias)}, jnp.array(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_quick_gelu_matches_reference_formula(rng):
    x = rng.normal(size=(100,)).astype(np.float32)
    expected = x * (1 / (1 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(np.asarray(L.quick_gelu(jnp.array(x))),
                               expected, atol=1e-6)


def test_mha_matches_torch_multihead(rng):
    """Packed-qkv self-attention vs torch.nn.MultiheadAttention."""
    D, H, B, T = 32, 4, 2, 7
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    mha_t = torch.nn.MultiheadAttention(D, H, batch_first=True)
    with torch.no_grad():
        in_w = mha_t.in_proj_weight.numpy().copy()      # [3D, D]
        in_b = mha_t.in_proj_bias.numpy().copy()
        out_w = mha_t.out_proj.weight.numpy().copy()    # [D, D]
        out_b = mha_t.out_proj.bias.numpy().copy()

    p = {
        "in_proj": {"w": jnp.array(in_w.T.copy().reshape(D, 3, D)),
                    "b": jnp.array(in_b.reshape(3, D))},
        "out_proj": {"w": jnp.array(out_w.T), "b": jnp.array(out_b)},
    }
    got = np.asarray(L.mha(p, jnp.array(x), H))
    expected = mha_t(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                     need_weights=False)[0].detach().numpy()
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_mha_with_additive_mask_matches_torch(rng):
    D, H, B, T = 16, 2, 2, 5
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0]], np.float32)

    mha_t = torch.nn.MultiheadAttention(D, H, batch_first=True)
    with torch.no_grad():
        in_w = mha_t.in_proj_weight.numpy().copy()
        in_b = mha_t.in_proj_bias.numpy().copy()
        out_w = mha_t.out_proj.weight.numpy().copy()
        out_b = mha_t.out_proj.bias.numpy().copy()

    p = {
        "in_proj": {"w": jnp.array(in_w.T.copy().reshape(D, 3, D)),
                    "b": jnp.array(in_b.reshape(3, D))},
        "out_proj": {"w": jnp.array(out_w.T), "b": jnp.array(out_b)},
    }
    bias = L.padding_bias(jnp.array(mask))
    got = np.asarray(L.mha(p, jnp.array(x), H, attn_bias=bias))
    expected = mha_t(
        torch.tensor(x), torch.tensor(x), torch.tensor(x),
        key_padding_mask=torch.tensor(mask == 0),
        need_weights=False)[0].detach().numpy()
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_transformer_scan_equals_loop(rng):
    """Scanned stack must equal sequentially applied blocks."""
    D, H, layers, B, T = 16, 2, 3, 2, 4
    key = jax.random.PRNGKey(0)
    p = L.transformer_init(key, D, layers)
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))

    got = L.transformer_apply(p, x, H)
    y = x
    for i in range(layers):
        layer_p = jax.tree.map(lambda a: a[i], p)
        y = L.block_apply(layer_p, y, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y), atol=1e-5)
    assert L.num_layers(p) == layers


def test_causal_bias_shape_and_values():
    b = np.asarray(L.causal_bias(4))[0, 0]
    assert b.shape == (4, 4)
    i, j = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    assert np.all(b[j > i] < -1e8)
    assert np.all(b[j <= i] == 0)


def test_fused_attention_vmem_guard():
    """Sequences whose backward tile overflows Mosaic's ~100 MB scoped VMEM
    demote to the XLA path (measured boundary on v5e: ViT-L/14's L=257/H=16
    compiles, ViT-L/14@336px's L=577/H=16 OOMs by 0.6 MB)."""
    from neighborretr_tpu.models.layers import _fused_attention_fits
    assert _fused_attention_fits(50, 12)        # ViT-B/32
    assert _fused_attention_fits(197, 12)       # ViT-B/16
    assert _fused_attention_fits(257, 16)       # ViT-L/14
    assert not _fused_attention_fits(577, 16)   # ViT-L/14@336px

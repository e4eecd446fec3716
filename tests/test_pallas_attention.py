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


# ---------------------------------------------------------------------------
# query-row-chunked large-L path (ViT-L/14@336px shapes)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("Lq,R", [(40, 16), (32, 8), (24, 24)])
def test_chunked_forward_matches_xla(rng, monkeypatch, Lq, R):
    """NRTPU_ATTN_ROW_CHUNK forces the chunked kernels at CPU-sized shapes —
    including a non-divisible L (padded edge chunk) and R == L (one chunk)."""
    monkeypatch.setenv("NRTPU_ATTN_ROW_CHUNK", str(R))
    N, H, hd = 4, 2, 16
    D = H * hd
    p = _params(rng, D)
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))
    ref = L.mha(p, x, H, None, dtype=jnp.float32, fused=False)
    got = L.mha(p, x, H, None, dtype=jnp.float32, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_chunked_matches_single_tile_kernel(rng, monkeypatch):
    """Chunking is a pure tiling change: same ops/order per query row, so the
    chunked forward must agree with the single-tile kernel tightly."""
    N, Lq, H, hd = 4, 20, 2, 16
    D = H * hd
    qkv = jnp.asarray(rng.normal(size=(N, Lq, 3 * D)).astype(np.float32))
    ref = fused_frame_attention(qkv, H, interpret=True)
    monkeypatch.setenv("NRTPU_ATTN_ROW_CHUNK", "8")
    got = fused_frame_attention(qkv, H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_chunked_gradients_match_xla(rng, monkeypatch):
    """Backward: dq rows partition across chunks, dk/dv accumulate across the
    revisited full-rows block — against the XLA path, with a padded edge
    chunk (L=22, R=8 → chunks of 8/8/6)."""
    monkeypatch.setenv("NRTPU_ATTN_ROW_CHUNK", "8")
    N, Lq, H, hd = 3, 22, 2, 16
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


def test_block_apply_demotes_to_chunked_not_xla(rng, monkeypatch):
    """Past the single-tile VMEM bound, the sublayer kernel demotes ONE level
    to the plain fused kernel's chunked path (not to XLA), and the result
    still matches the XLA sublayer."""
    import neighborretr_tpu.ops.pallas_attention as pa
    from neighborretr_tpu.models.layers import block_init, block_apply
    # limit chosen so the single-tile bound FAILS (H*L^2 = 3200 > 2000) but
    # the chunked one fits (H*8*L = 640 <= 1000)
    monkeypatch.setattr(pa, "PROBS_TILE_LIMIT", 2000)
    monkeypatch.setenv("NRTPU_ATTN_ROW_CHUNK", "8")
    calls = []
    orig = pa._attention_core_rows

    def spy(qkv, meta):
        calls.append(meta)
        return orig(qkv, meta)

    monkeypatch.setattr(pa, "_attention_core_rows", spy)
    N, Lq, H = 2, 40, 2
    D = H * 16
    p = block_init(jax.random.PRNGKey(0), D)
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))
    got = block_apply(p, x, H, None, jnp.float32, fused_attention="block")
    assert calls, "expected the chunked kernel path"
    ref = block_apply(p, x, H, None, jnp.float32, fused_attention=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pick_row_chunk_vit_l_336():
    from neighborretr_tpu.ops.pallas_attention import (_pick_row_chunk,
                                                       chunked_attention_fits)
    # VMEM cap gives r_max=128 → 5 chunks; R shrinks to 120 so the edge
    # chunk pads 23 rows instead of 63 (600 computed rows, not 640)
    assert _pick_row_chunk(577, 16) == 120
    assert chunked_attention_fits(577, 16, 1024)
    assert not chunked_attention_fits(600_000, 16, 1024)


@pytest.mark.parametrize("bad", ["0", "-8", "20"])
def test_row_chunk_env_validated(monkeypatch, bad):
    """'0' (a natural 'disable' spelling) and sublane-misaligned values must
    raise up front, not surface as ZeroDivisionError / Mosaic rejections."""
    from neighborretr_tpu.ops.pallas_attention import _pick_row_chunk
    monkeypatch.setenv("NRTPU_ATTN_ROW_CHUNK", bad)
    with pytest.raises(ValueError, match="NRTPU_ATTN_ROW_CHUNK"):
        _pick_row_chunk(64, 2)


def test_oversized_unbiased_sequence_raises_cleanly(rng, monkeypatch):
    """A direct fused caller past BOTH fused bounds gets a ValueError naming
    the XLA fallback instead of a Mosaic compile crash (limits shrunk so the
    case is constructible at CPU size)."""
    import neighborretr_tpu.ops.pallas_attention as pa
    monkeypatch.setattr(pa, "PROBS_TILE_LIMIT", 64)  # single-tile fails
    monkeypatch.setattr(pa, "chunked_attention_fits", lambda *a: False)
    qkv = jnp.asarray(rng.normal(size=(2, 16, 3 * 32)).astype(np.float32))
    with pytest.raises(ValueError, match="attention_impl='einsum'"):
        pa.fused_frame_attention(qkv, 2, interpret=True)

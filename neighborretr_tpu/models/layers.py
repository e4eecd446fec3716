"""Pure-functional neural net layers over parameter pytrees.

TPU-first design notes:
  * Parameters live in plain nested dicts (pytrees); every apply function is
    ``f(params, inputs) -> outputs`` so it composes with jit/grad/shard_map.
  * Transformer stacks store per-layer parameters stacked on a leading axis and
    run under ``jax.lax.scan`` — one traced block, O(1) compile time in depth.
  * Matmul-heavy compute runs in a configurable dtype (bf16 on TPU) while
    LayerNorm and softmax stay in fp32, mirroring the reference's fp16-with-
    fp32-LayerNorm-islands policy (module_clip.py:241-247).
  * Attention masks are additive fp32 biases with static shapes.

Behavioral contract with the reference:
  * QuickGELU: x * sigmoid(1.702 x)           (module_clip.py:256)
  * Pre-LN residual attention blocks           (module_clip.py:258-287)
  * torch.nn.MultiheadAttention packed qkv semantics — stored here as
    [D, 3, D] (q/k/v on their own axis) so tensor-parallel column sharding
    stays q/k/v- and head-aligned; the torch [3D, D] layout maps in/out
    losslessly (weights_io)
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype=dtype)


def trunc_normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    """Truncated normal on [-2std, 2std] (cluster.py:21-84 trunc_normal_)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype=dtype)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_erf(x):
    """Exact-erf GELU (until_module.py:20-25)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_core(x, scale, bias, eps):
    y, _, _ = _layer_norm_fwd_math(x, scale, bias, eps)
    return y


def _layer_norm_fwd_math(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x32 - mean) * rstd * scale.astype(jnp.float32)
         + bias.astype(jnp.float32))
    return y.astype(x.dtype), mean, rstd


def _layer_norm_fwd(x, scale, bias, eps):
    y, mean, rstd = _layer_norm_fwd_math(x, scale, bias, eps)
    # save only x (original dtype), mean and rstd — JAX autodiff of the fp32
    # island otherwise saves several fp32 copies of x per call, which
    # dominates backward HBM traffic at [B·F·L, D] scales
    return y, (x, scale, mean, rstd)


def _layer_norm_bwd(eps, res, dy):
    x, scale, mean, rstd = res
    dy32 = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd
    g = dy32 * scale.astype(jnp.float32)
    dscale = jnp.sum(dy32 * xhat, axis=tuple(range(x.ndim - 1)))
    dbias = jnp.sum(dy32, axis=tuple(range(x.ndim - 1)))
    dx = rstd * (g - jnp.mean(g, axis=-1, keepdims=True)
                 - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_layer_norm_core.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm(p: Params, x, eps: float = 1e-5):
    """LayerNorm computed in fp32 regardless of input dtype (fp32 island);
    custom VJP keeps the backward residuals compact."""
    return _layer_norm_core(x, p["scale"], p["bias"], eps)


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def linear(p: Params, x, dtype=None):
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = x @ w
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def linear_init(key, d_in: int, d_out: int, std: Optional[float] = None,
                bias: bool = True) -> Params:
    if std is None:
        std = d_in ** -0.5
    p: Params = {"w": normal_init(key, (d_in, d_out), std=std)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


# ---------------------------------------------------------------------------
# multi-head attention (packed qkv, torch.nn.MultiheadAttention layout)
# ---------------------------------------------------------------------------

def mha_init(key, d_model: int, attn_std: Optional[float] = None,
             proj_std: Optional[float] = None) -> Params:
    k1, k2 = jax.random.split(key)
    attn_std = attn_std if attn_std is not None else d_model ** -0.5
    proj_std = proj_std if proj_std is not None else d_model ** -0.5
    return {
        # packed [D, 3, D] so a single matmul produces q,k,v (axis 1 indexes
        # q/k/v; the torch checkpoint's [3D, D] in_proj_weight transposes and
        # unflattens into this).  Keeping q/k/v on their OWN axis instead of
        # a flat 3D output axis matters under tensor parallelism: the last
        # axis column-shards over the `model` mesh axis per-projection, so
        # each shard holds whole heads of q, k AND v — a flat 3D axis sharded
        # contiguously would straddle the q|k|v boundaries for tp ∤ 3 and
        # force GSPMD to reshard the activation after the split.
        "in_proj": {"w": normal_init(k1, (d_model, 3, d_model), std=attn_std),
                    "b": jnp.zeros((3, d_model), jnp.float32)},
        "out_proj": {"w": normal_init(k2, (d_model, d_model), std=proj_std),
                     "b": jnp.zeros((d_model,), jnp.float32)},
    }


def qkv_linear(p: Params, x, dtype=None):
    """Packed q/k/v projection: [B, L, D] → [B, L, 3, D] through the
    [D, 3, D] in_proj weight (one MXU matmul; XLA folds the trailing dims
    into a [D, 3D] contraction)."""
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jnp.einsum("bld,dce->blce", x, w)
    return y + b.astype(y.dtype)


def packed_qkv_weights(p: Params):
    """in_proj as the flat packed ([D, 3D], [3D]) layout the Pallas kernels
    consume (free reshape on the unsharded single-chip path)."""
    w, b = p["w"], p["b"]
    return w.reshape(w.shape[0], -1), b.reshape(-1)


def mha(p: Params, x, n_head: int, attn_bias=None, dtype=jnp.float32,
        fused: bool = False):
    """Self-attention over [B, L, D].

    attn_bias: optional additive fp32 bias broadcastable to [B, 1, L, L]
    (e.g. causal and/or padding masks with -inf at disallowed positions).
    fused: use the frame-local Pallas kernel — consumes the packed qkv
    directly, keeps logits/probs in VMEM; biased sequences route through
    its biased variant with the additive bias streamed per tile.
    """
    B, L, D = x.shape
    if fused:
        from ..ops.pallas_attention import fused_frame_attention
        qkv = qkv_linear(p["in_proj"], x, dtype=dtype).reshape(B, L, 3 * D)
        bias = None
        if attn_bias is not None:
            # [B|1, 1, L, L] additive bias → per-sequence [B, L, L]
            bias = jnp.broadcast_to(attn_bias.astype(jnp.float32),
                                    (B, 1, L, L))[:, 0]
        out = fused_frame_attention(
            qkv, n_head, bias=bias,
            interpret=jax.default_backend() != "tpu")
        return linear(p["out_proj"], out.astype(dtype), dtype=dtype)
    head_dim = D // n_head
    qkv = qkv_linear(p["in_proj"], x, dtype=dtype)      # [B, L, 3, D]
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    # heads stay in the layout position ([B, L, H, hd]); the einsums carry the
    # head axis as a batch dim so XLA folds the relayout into the matmuls
    # instead of materializing four [B, H, L, hd] transpose copies per layer
    def heads(t):
        return t.reshape(B, L, n_head, head_dim)

    q, k, v = heads(q), heads(k), heads(v)
    scale = head_dim ** -0.5
    # logits in fp32 for a stable softmax island
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(dtype))
    out = out.reshape(B, L, D)
    return linear(p["out_proj"], out, dtype=dtype)


# ---------------------------------------------------------------------------
# residual attention block + stacked transformer
# ---------------------------------------------------------------------------

def block_init(key, d_model: int, layers_for_std: int = 12) -> Params:
    """One pre-LN residual attention block (CLIP init scales,
    module_clip.py:431-440)."""
    k1, k2, k3 = jax.random.split(key, 3)
    proj_std = (d_model ** -0.5) * ((2 * layers_for_std) ** -0.5)
    fc_std = (2 * d_model) ** -0.5
    return {
        "ln_1": layer_norm_init(d_model),
        "attn": mha_init(k1, d_model, attn_std=d_model ** -0.5, proj_std=proj_std),
        "ln_2": layer_norm_init(d_model),
        "mlp": {
            "c_fc": linear_init(k2, d_model, 4 * d_model, std=fc_std),
            "c_proj": linear_init(k3, 4 * d_model, d_model, std=proj_std),
        },
    }


def _fused_attention_fits(L: int, n_head: int) -> bool:
    """Scoped-VMEM guard for the single-tile fused attention kernels: the
    backward tile holds several live fp32 [H, L, L] probs-sized buffers, and
    Mosaic's per-kernel stack is capped at ~100 MB.  Measured boundary on
    v5e: L=257/H=16 (ViT-L/14) compiles; L=577/H=16 (ViT-L/14@336px)
    overflows by 0.6 MB even at one frame per grid cell.  Sequences past
    this bound demote ONE level — the plain fused kernel's unbiased path
    covers them by chunking the query rows (ops/pallas_attention.py::
    _attention_core_rows); only biased long sequences (none exist in any
    config: text/temporal are ≤64 tokens) fall back to XLA."""
    from ..ops.pallas_attention import PROBS_TILE_LIMIT
    return n_head * L * L <= PROBS_TILE_LIMIT


def block_apply(p: Params, x, n_head: int, attn_bias=None, dtype=jnp.float32,
                fused_attention=False):
    """fused_attention: False = XLA einsum path, True = frame-local Pallas
    attention kernel, "block" = fully-fused sublayer kernel (qkv proj +
    attention + out proj in one Pallas call).  Biased sequences (text
    causal∧padding, temporal key-padding) route through the kernels' biased
    variants — the same fused path, with the additive bias streamed per
    tile."""
    from jax.ad_checkpoint import checkpoint_name as ckpt
    if fused_attention and not _fused_attention_fits(x.shape[1], n_head):
        # past the single-tile bound the sublayer ("block") kernel can't
        # serve; the plain fused kernel still can via its query-row-chunked
        # unbiased path — only a biased long sequence must go to XLA
        from ..ops.pallas_attention import chunked_attention_fits
        if attn_bias is None and chunked_attention_fits(
                x.shape[1], n_head, x.shape[2]):
            fused_attention = True
        else:
            fused_attention = False
    if fused_attention == "block":
        # whole pre-LN attention sublayer (LN1 + qkv + attention + out proj
        # + residual) in one Pallas kernel — x touches HBM once
        from ..ops.pallas_block_attention import fused_ln_attention_residual
        bias = None
        if attn_bias is not None:
            B, L = x.shape[0], x.shape[1]
            bias = jnp.broadcast_to(attn_bias.astype(jnp.float32),
                                    (B, 1, L, L))[:, 0]
        in_w, in_b = packed_qkv_weights(p["attn"]["in_proj"])
        x = ckpt(fused_ln_attention_residual(
            x.astype(dtype), p["ln_1"]["scale"], p["ln_1"]["bias"],
            in_w, in_b,
            p["attn"]["out_proj"]["w"], p["attn"]["out_proj"]["b"], n_head,
            bias=bias, interpret=jax.default_backend() != "tpu"),
            "attn_out")
    else:
        attn_out = mha(p["attn"], layer_norm(p["ln_1"], x), n_head,
                       attn_bias, dtype, fused=bool(fused_attention))
        x = x + ckpt(attn_out, "attn_out")
    h = linear(p["mlp"]["c_fc"], layer_norm(p["ln_2"], x), dtype=dtype)
    h = ckpt(quick_gelu(h), "mlp_hidden")
    x = x + ckpt(linear(p["mlp"]["c_proj"], h, dtype=dtype), "mlp_out")
    return x


def transformer_init(key, d_model: int, layers: int) -> Params:
    """Stack of blocks with parameters stacked on a leading `layers` axis."""
    keys = jax.random.split(key, layers)
    blocks = [block_init(k, d_model, layers_for_std=layers) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


REMAT_POLICIES = {
    # full: save only the layer carry; recompute the whole block in backward
    # (cheapest memory, +1 forward of FLOPs in the backward pass)
    "full": None,
    # dots: save the three big matmul outputs per block (attn out, GELU'd MLP
    # hidden, MLP out); recompute LayerNorms/attention internals only.
    # Measured SLOWER than "full" on v5e at the bench shape (328 vs 306 ms):
    # the stacked mlp_hidden saves cost more HBM traffic than the recompute.
    "dots": lambda: jax.checkpoint_policies.save_only_these_names(
        "attn_out", "mlp_hidden", "mlp_out"),
    # attn: save ONLY the attention sublayer output (59 MB/layer at the bench
    # shape) — the backward then never re-runs the attention kernel, which
    # full-block remat otherwise recomputes a 3rd time per layer.
    "attn": lambda: jax.checkpoint_policies.save_only_these_names("attn_out"),
}


def transformer_apply(p: Params, x, n_head: int, attn_bias=None,
                      dtype=jnp.float32, remat: bool = False,
                      unroll: bool = False, remat_policy: str = "full",
                      fused_attention=False,
                      remat_skip_last: int = 0):
    """Run stacked blocks.

    Default: lax.scan — one traced block, O(1) compile time in depth.
    unroll=True: Python loop over layer slices — larger program, but XLA can
    schedule/fuse across layer boundaries (worth it for shallow stacks when
    chasing utilization; measure before enabling).

    When a pipeline context is active (train/step.py activates it from
    cfg.train.pipeline_parallel, a jit-static quantity) and this tower's
    depth divides the stage count, the stack runs as a GPipe pipeline over
    the mesh's `stage` axis instead (parallel/pipeline.py); towers that
    don't divide fall back to this plain path.
    """
    from ..parallel import pipeline as pp
    ctx = pp.current()
    if ctx is not None and pp.supports(ctx, num_layers(p), x):
        # unroll/remat_skip_last are scan-structure knobs of THIS path; the
        # pipeline has its own schedule (per-microbatch checkpoint), so
        # only the remat policy carries over
        return pp.pipeline_transformer_apply(
            p, x, n_head, ctx, attn_bias=attn_bias, dtype=dtype,
            fused_attention=fused_attention, remat=remat,
            remat_policy=remat_policy)

    def body(carry, layer_p):
        y = block_apply(layer_p, carry, n_head, attn_bias, dtype,
                        fused_attention=fused_attention)
        return y, None

    if remat:
        policy = REMAT_POLICIES[remat_policy]
        ckpt_body = jax.checkpoint(body, policy=policy() if policy else None)
    else:
        ckpt_body = body

    if unroll:
        n = num_layers(p)
        skip = _remat_skip_last(remat_skip_last)
        for i in range(n):
            # hybrid remat: save-all for the last `skip` layers (their
            # activations die soonest in the backward pass, so saving them
            # trades the least HBM for skipped recompute)
            f = body if (remat and i >= n - skip) else ckpt_body
            x, _ = f(x, jax.tree.map(lambda a: a[i], p))
        return x
    y, _ = jax.lax.scan(ckpt_body, x, p)
    return y


def _remat_skip_last(default: int = 0) -> int:
    import os
    return int(os.environ.get("NRTPU_REMAT_SKIP_LAST", str(default)))


def num_layers(p: Params) -> int:
    return jax.tree.leaves(p)[0].shape[0]


def slice_layers(p: Params, n: int) -> Params:
    """First n layers of a stacked transformer pytree."""
    return jax.tree.map(lambda a: a[:n], p)


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

NEG_INF = -1e9


def causal_bias(L: int) -> jnp.ndarray:
    """[1, 1, L, L] additive causal mask (module_clip.py:build_attention_mask)."""
    i = jnp.arange(L)[:, None]
    j = jnp.arange(L)[None, :]
    m = jnp.where(j > i, NEG_INF, 0.0).astype(jnp.float32)
    return m[None, None]


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L] {0,1} key-padding mask → [B, 1, 1, L] additive bias."""
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)

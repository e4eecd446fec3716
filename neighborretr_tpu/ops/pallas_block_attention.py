"""Fully-fused pre-LN attention sublayer (Pallas TPU kernels).

The production entry point is `fused_ln_attention_residual`:

    y = x + AttnSublayer(LayerNorm(x))

in ONE kernel — fp32-island LayerNorm, qkv projection, frame-local
multi-head attention, output projection, and the residual add.  `x` is read
from HBM exactly once per sublayer; the post-LN hidden, qkv, logits and
probs never leave VMEM.  `fused_attention_sublayer` (qkv→attn→out on a
pre-normalized input, no residual) remains as the tested building block.
Both have biased variants serving the text tower's causal∧padding mask and
the temporal tower's key-padding mask; layers.block_apply routes all three
towers here under attention_impl="block" ("auto" on a single TPU chip).

Motivation (measured on v5e, ViT-B/32 12-frame config): with only the
frame-local attention kernel (ops/pallas_attention.py) the attention
sublayer — qkv matmul, kernel, out matmul — cost 88 ms fwd+bwd of a 221 ms
batch-64 train step (40%), at ~⅓ the MXU efficiency of the MLP; the losses
are HBM round-trips around the kernel and the XLA↔kernel boundaries.
Fusing the projections took 289 → 319 pairs/s; folding LN1+residual in took
338 → 349 at batch 96.  Per grid cell (FB frames), the qkv projection is a
[FB·L, D] × [D, 3D] MXU matmul — large and efficient; weight blocks use
constant index maps so Mosaic keeps them resident in VMEM across the grid.

Backward: custom VJP, tile-local recompute of LN/qkv/probs/attn_out (an A/B
that saved the qkv tile as a residual instead measured SLOWER — 320 vs 338 —
the extra HBM write disrupts an already-balanced pipeline), standard
softmax/attention/LN backward, then
    dW_qkv += hᵀ dqkv,  dW_out += attn_outᵀ dy,  dscale += Σ dh·x̂,  db += Σ,
accumulated across grid cells in fp32 output blocks (constant index maps,
zero-initialized at cell 0 — same pattern as ops/pallas_similarity.py's
backward).  Weight cotangents are cast to the primal (bf16) dtype at the
wrapper, matching what XLA's einsum path produces for bf16 operands.

Semantics identical to layer_norm + layers.mha(fused=False) + residual,
modulo fp rounding; validated fwd+grad in
tests/test_pallas_block_attention.py (interpret on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import (_frame_diag_bias, _merge_heads, _pick_fb,
                               _split_heads, _tile_bias, _attn_bwd_tile)


def _qkv_tile(h_ref, wqkv_ref, bqkv_ref, rows, D):
    """[rows, D] bf16 × [D, 3D] bf16 → qkv bf16 [rows, 3D] (fp32 accum)."""
    h2 = h_ref[:].reshape(rows, D)
    qkv = jax.lax.dot_general(
        h2, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)
    return h2, qkv.astype(jnp.bfloat16)


def _attn_tile(qkv16, rows, L, H, hd, D, bias=None):
    """Frame-local attention on a packed qkv tile → (q3, k3, v3, probs,
    attn_out2 [rows, D] bf16).  bias: [rows, rows] additive (defaults to the
    pure frame-block-diagonal mask)."""
    scale = hd ** -0.5
    q3, k3, v3 = _split_heads(qkv16, rows, D, H, hd)
    if bias is None:
        bias = _frame_diag_bias(rows, L)
    logits = jax.lax.dot_general(
        (q3.astype(jnp.float32) * scale).astype(jnp.bfloat16), k3,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits + bias[None], axis=-1)      # fp32 [H,rows,rows]
    out3 = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [H, rows, hd]
    attn_out2 = _merge_heads(out3, rows, D, H).astype(jnp.bfloat16)
    return q3, k3, v3, probs, attn_out2


def _fwd_kernel(h_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, y_ref,
                *, L: int, H: int, hd: int):
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    _, qkv16 = _qkv_tile(h_ref, wqkv_ref, bqkv_ref, rows, D)
    _, _, _, _, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D)
    y = jax.lax.dot_general(
        attn_out2, wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bout_ref[:].astype(jnp.float32)
    y_ref[:] = y.reshape(FB, L, D).astype(y_ref.dtype)


def _bwd_kernel(h_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, g_ref,
                dh_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                *, L: int, H: int, hd: int):
    i = pl.program_id(0)
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    scale = hd ** -0.5

    h2, qkv16 = _qkv_tile(h_ref, wqkv_ref, bqkv_ref, rows, D)
    q3, k3, v3, probs, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D)
    g = g_ref[:].reshape(rows, D).astype(jnp.float32)         # dy
    g16 = g.astype(jnp.bfloat16)

    # ---- out projection backward ----
    dwout = jax.lax.dot_general(                               # attn_outᵀ g
        attn_out2, g16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [D, D]
    dbout = jnp.sum(g, axis=0, keepdims=True)                  # [1, D]
    dattn2 = jax.lax.dot_general(                              # g @ W_outᵀ
        g16, wout_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [rows, D]
    g3 = _split_heads(dattn2.astype(jnp.bfloat16), rows, D, H, hd,
                      n_parts=1)[0]                            # [H, rows, hd]

    # ---- attention backward (softmax vjp, then q/k/v) ----
    dqkv = _attn_bwd_tile(q3, k3, v3, probs, g3, H, scale)     # [rows, 3D] f32

    # ---- qkv projection backward ----
    dqkv16 = dqkv.astype(jnp.bfloat16)
    dh = jax.lax.dot_general(                                  # dqkv @ W_qkvᵀ
        dqkv16, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [rows, D]
    dwqkv = jax.lax.dot_general(                               # h2ᵀ dqkv
        h2, dqkv16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [D, 3D]
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)               # [1, 3D]

    dh_ref[:] = dh.reshape(FB, L, D).astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    dwqkv_ref[:] += dwqkv
    dbqkv_ref[:] += dbqkv
    dwout_ref[:] += dwout
    dbout_ref[:] += dbout


def _fwd_kernel_biased(h_ref, bias_ref, wqkv_ref, bqkv_ref, wout_ref,
                       bout_ref, y_ref, *, L: int, H: int, hd: int):
    """Per-sequence additive bias variant (text causal∧padding, temporal
    key-padding masks); bias_ref [FB, L, L] tiles into the block-diagonal."""
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    _, qkv16 = _qkv_tile(h_ref, wqkv_ref, bqkv_ref, rows, D)
    bias = _tile_bias(bias_ref, FB, L)
    _, _, _, _, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D, bias)
    y = jax.lax.dot_general(
        attn_out2, wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bout_ref[:].astype(jnp.float32)
    y_ref[:] = y.reshape(FB, L, D).astype(y_ref.dtype)


def _bwd_kernel_biased(h_ref, bias_ref, wqkv_ref, bqkv_ref, wout_ref,
                       bout_ref, g_ref, dh_ref, dwqkv_ref, dbqkv_ref,
                       dwout_ref, dbout_ref, *, L: int, H: int, hd: int):
    i = pl.program_id(0)
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    scale = hd ** -0.5

    h2, qkv16 = _qkv_tile(h_ref, wqkv_ref, bqkv_ref, rows, D)
    bias = _tile_bias(bias_ref, FB, L)
    q3, k3, v3, probs, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D, bias)
    g = g_ref[:].reshape(rows, D).astype(jnp.float32)
    g16 = g.astype(jnp.bfloat16)

    dwout = jax.lax.dot_general(
        attn_out2, g16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbout = jnp.sum(g, axis=0, keepdims=True)
    dattn2 = jax.lax.dot_general(
        g16, wout_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    g3 = _split_heads(dattn2.astype(jnp.bfloat16), rows, D, H, hd,
                      n_parts=1)[0]

    dqkv = _attn_bwd_tile(q3, k3, v3, probs, g3, H, scale)

    dqkv16 = dqkv.astype(jnp.bfloat16)
    dh = jax.lax.dot_general(
        dqkv16, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwqkv = jax.lax.dot_general(
        h2, dqkv16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)

    dh_ref[:] = dh.reshape(FB, L, D).astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    dwqkv_ref[:] += dwqkv
    dbqkv_ref[:] += dbqkv
    dwout_ref[:] += dwout
    dbout_ref[:] += dbout


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

def _weight_specs(D):
    return [
        pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _block_attention_core(h, wqkv, bqkv, wout, bout, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    kernel = functools.partial(_fwd_kernel, L=L, H=H, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + _weight_specs(D),
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), h.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * L * D * (4 * D) + 4 * N * FB * L * L * D,
            transcendentals=N * FB * L * L,
            bytes_accessed=2 * N * L * D * 2 + 8 * D * D),
    )(h, wqkv, bqkv, wout, bout)


def _block_attention_fwd(h, wqkv, bqkv, wout, bout, meta):
    return _block_attention_core(h, wqkv, bqkv, wout, bout, meta), (
        h, wqkv, bqkv, wout, bout)


def _block_attention_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    h, wqkv, bqkv, wout, bout = res
    kernel = functools.partial(_bwd_kernel, L=L, H=H, hd=hd)
    dh, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + _weight_specs(D)
        + [pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(D),
        out_shape=[
            jax.ShapeDtypeStruct((N, L, D), h.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h, wqkv, bqkv, wout, bout, g)
    return (dh, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwout.astype(wout.dtype), dbout.astype(bout.dtype))


_block_attention_core.defvjp(_block_attention_fwd, _block_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _block_attention_biased_core(h, bias, wqkv, bqkv, wout, bout, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    kernel = functools.partial(_fwd_kernel_biased, L=L, H=H, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + _weight_specs(D),
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), h.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h, bias, wqkv, bqkv, wout, bout)


def _block_attention_biased_fwd(h, bias, wqkv, bqkv, wout, bout, meta):
    return _block_attention_biased_core(h, bias, wqkv, bqkv, wout, bout,
                                        meta), (h, bias, wqkv, bqkv, wout,
                                                bout)


def _block_attention_biased_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    h, bias, wqkv, bqkv, wout, bout = res
    kernel = functools.partial(_bwd_kernel_biased, L=L, H=H, hd=hd)
    dh, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + _weight_specs(D)
        + [pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(D),
        out_shape=[
            jax.ShapeDtypeStruct((N, L, D), h.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h, bias, wqkv, bqkv, wout, bout, g)
    # the bias is mask-derived — no cotangent owed
    return (dh, jnp.zeros_like(bias), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(bqkv.dtype), dwout.astype(wout.dtype),
            dbout.astype(bout.dtype))


_block_attention_biased_core.defvjp(_block_attention_biased_fwd,
                                    _block_attention_biased_bwd)


# ---------------------------------------------------------------------------
# LN1 + residual folded in: y = x + Attn(LN(x)) in one kernel
# ---------------------------------------------------------------------------

_LN_EPS = 1e-5   # layers.layer_norm default


def _ln_tile(x_ref, gs_ref, gb_ref, rows, D):
    """In-kernel fp32-island LayerNorm of the x tile → (x32, xhat, rstd, h16)."""
    x32 = x_ref[:].reshape(rows, D).astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * rstd
    h32 = xhat * gs_ref[:].astype(jnp.float32) + gb_ref[:].astype(jnp.float32)
    return x32, xhat, rstd, h32.astype(jnp.bfloat16)


def _qkv_from_h16(h16, wqkv_ref, bqkv_ref):
    qkv = jax.lax.dot_general(
        h16, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (qkv + bqkv_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)


def _make_fwd_ln_kernel(biased: bool):
    def kernel(*refs, L: int, H: int, hd: int):
        if biased:
            (x_ref, bias_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, y_ref) = refs
        else:
            (x_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
             y_ref) = refs
        FB = x_ref.shape[0]
        rows = FB * L
        D = H * hd
        x32, _, _, h16 = _ln_tile(x_ref, gs_ref, gb_ref, rows, D)
        qkv16 = _qkv_from_h16(h16, wqkv_ref, bqkv_ref)
        bias = _tile_bias(bias_ref, FB, L) if biased else None
        _, _, _, _, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D, bias)
        y = jax.lax.dot_general(
            attn_out2, wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + bout_ref[:].astype(jnp.float32) + x32          # residual
        y_ref[:] = y.reshape(FB, L, D).astype(y_ref.dtype)
    return kernel


def _make_bwd_ln_kernel(biased: bool):
    def kernel(*refs, L: int, H: int, hd: int):
        if biased:
            (x_ref, bias_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wout_ref,
             bout_ref, g_ref, dx_ref, dgs_ref, dgb_ref, dwqkv_ref, dbqkv_ref,
             dwout_ref, dbout_ref) = refs
        else:
            (x_ref, gs_ref, gb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
             g_ref, dx_ref, dgs_ref, dgb_ref, dwqkv_ref, dbqkv_ref,
             dwout_ref, dbout_ref) = refs
        i = pl.program_id(0)
        FB = x_ref.shape[0]
        rows = FB * L
        D = H * hd
        scale = hd ** -0.5

        _, xhat, rstd, h16 = _ln_tile(x_ref, gs_ref, gb_ref, rows, D)
        qkv16 = _qkv_from_h16(h16, wqkv_ref, bqkv_ref)
        bias = _tile_bias(bias_ref, FB, L) if biased else None
        q3, k3, v3, probs, attn_out2 = _attn_tile(qkv16, rows, L, H, hd, D,
                                                  bias)
        g = g_ref[:].reshape(rows, D).astype(jnp.float32)        # dy
        g16 = g.astype(jnp.bfloat16)

        dwout = jax.lax.dot_general(
            attn_out2, g16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbout = jnp.sum(g, axis=0, keepdims=True)
        dattn2 = jax.lax.dot_general(
            g16, wout_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        g3 = _split_heads(dattn2.astype(jnp.bfloat16), rows, D, H, hd,
                          n_parts=1)[0]

        dqkv = _attn_bwd_tile(q3, k3, v3, probs, g3, H, scale)      # f32

        dqkv16 = dqkv.astype(jnp.bfloat16)
        dh = jax.lax.dot_general(                                # [rows, D] f32
            dqkv16, wqkv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwqkv = jax.lax.dot_general(
            h16, dqkv16, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)

        # LayerNorm backward (layers._layer_norm_bwd math) + residual
        dgs = jnp.sum(dh * xhat, axis=0, keepdims=True)          # [1, D]
        dgb = jnp.sum(dh, axis=0, keepdims=True)
        gdh = dh * gs_ref[:].astype(jnp.float32)
        dx_ln = rstd * (gdh - jnp.mean(gdh, axis=-1, keepdims=True)
                        - xhat * jnp.mean(gdh * xhat, axis=-1, keepdims=True))
        dx = g + dx_ln
        dx_ref[:] = dx.reshape(FB, L, D).astype(dx_ref.dtype)

        @pl.when(i == 0)
        def _():
            dgs_ref[:] = jnp.zeros_like(dgs_ref)
            dgb_ref[:] = jnp.zeros_like(dgb_ref)
            dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
            dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
            dwout_ref[:] = jnp.zeros_like(dwout_ref)
            dbout_ref[:] = jnp.zeros_like(dbout_ref)

        dgs_ref[:] += dgs
        dgb_ref[:] += dgb
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwout_ref[:] += dwout
        dbout_ref[:] += dbout
    return kernel


def _ln_param_specs(D):
    return [
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _ln_core_call(x, bias, gs, gb, wqkv, bqkv, wout, bout, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    biased = bias is not None
    x_spec = [pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)]
    bias_spec = ([pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] if biased else [])
    kernel = functools.partial(_make_fwd_ln_kernel(biased), L=L, H=H, hd=hd)
    args = (x,) + ((bias,) if biased else ()) + (gs, gb, wqkv, bqkv, wout,
                                                bout)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=x_spec + bias_spec + _ln_param_specs(D) + _weight_specs(D),
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ln_block_core(x, gs, gb, wqkv, bqkv, wout, bout, meta):
    return _ln_core_call(x, None, gs, gb, wqkv, bqkv, wout, bout, meta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _ln_block_biased_core(x, bias, gs, gb, wqkv, bqkv, wout, bout, meta):
    return _ln_core_call(x, bias, gs, gb, wqkv, bqkv, wout, bout, meta)


def _ln_bwd_call(x, bias, gs, gb, wqkv, bqkv, wout, bout, g, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    biased = bias is not None
    x_spec = [pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)]
    bias_spec = ([pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] if biased else [])
    kernel = functools.partial(_make_bwd_ln_kernel(biased), L=L, H=H, hd=hd)
    args = (x,) + ((bias,) if biased else ()) + (gs, gb, wqkv, bqkv, wout,
                                                bout, g)
    dx, dgs, dgb, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=(x_spec + bias_spec + _ln_param_specs(D) + _weight_specs(D)
                  + x_spec),
        out_specs=[x_spec[0]] + _ln_param_specs(D) + _weight_specs(D),
        out_shape=[
            jax.ShapeDtypeStruct((N, L, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return (dx, dgs.astype(gs.dtype), dgb.astype(gb.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwout.astype(wout.dtype), dbout.astype(bout.dtype))


def _ln_block_fwd(x, gs, gb, wqkv, bqkv, wout, bout, meta):
    y = _ln_block_core(x, gs, gb, wqkv, bqkv, wout, bout, meta)
    return y, (x, gs, gb, wqkv, bqkv, wout, bout)


def _ln_block_bwd(meta, res, g):
    x, gs, gb, wqkv, bqkv, wout, bout = res
    return _ln_bwd_call(x, None, gs, gb, wqkv, bqkv, wout, bout, g, meta)


_ln_block_core.defvjp(_ln_block_fwd, _ln_block_bwd)


def _ln_block_biased_fwd(x, bias, gs, gb, wqkv, bqkv, wout, bout, meta):
    y = _ln_block_biased_core(x, bias, gs, gb, wqkv, bqkv, wout, bout, meta)
    return y, (x, bias, gs, gb, wqkv, bqkv, wout, bout)


def _ln_block_biased_bwd(meta, res, g):
    x, bias, gs, gb, wqkv, bqkv, wout, bout = res
    out = _ln_bwd_call(x, bias, gs, gb, wqkv, bqkv, wout, bout, g, meta)
    return (out[0], jnp.zeros_like(bias)) + out[1:]


_ln_block_biased_core.defvjp(_ln_block_biased_fwd, _ln_block_biased_bwd)


def fused_ln_attention_residual(x: jnp.ndarray, ln_scale, ln_bias,
                                wqkv, bqkv, wout, bout, n_head: int,
                                bias=None,
                                interpret: bool = False) -> jnp.ndarray:
    """y = x + Attn(LN(x)) — the complete pre-LN attention sublayer in one
    kernel (LN fp32 island, qkv proj, frame-local attention, out proj,
    residual).  x is read from HBM exactly once; the post-LN hidden and qkv
    never exist outside VMEM."""
    import os
    N, L, D = x.shape
    hd = D // n_head
    FB = _pick_fb(N, L, int(os.environ.get("NRTPU_BLOCK_FB_ROWS", "200")))
    meta = (N, L, n_head, hd, FB, interpret)
    x16 = x.astype(jnp.bfloat16)
    args = (ln_scale.reshape(1, -1), ln_bias.reshape(1, -1),
            wqkv.astype(jnp.bfloat16), bqkv.reshape(1, -1),
            wout.astype(jnp.bfloat16), bout.reshape(1, -1))
    if bias is None:
        return _ln_block_core(x16, *args, meta).astype(x.dtype)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (N, L, L))
    return _ln_block_biased_core(x16, bias, *args, meta).astype(x.dtype)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def fused_attention_sublayer(h: jnp.ndarray, wqkv: jnp.ndarray,
                             bqkv: jnp.ndarray, wout: jnp.ndarray,
                             bout: jnp.ndarray, n_head: int,
                             bias=None,
                             interpret: bool = False) -> jnp.ndarray:
    """Whole attention sublayer on packed inputs.

    Args:
      h:    [N, L, D] post-LN1 hidden (any float dtype; computed in bf16).
      wqkv: [D, 3D] input-major qkv projection, bqkv: [3D].
      wout: [D, D] output projection, bout: [D].
      bias: optional per-sequence additive attention bias broadcastable to
        [N, L, L] fp32 (causal∧padding masks; constant — no cotangent).
    Returns [N, L, D] sublayer output (pre-residual), dtype of `h`.
    """
    import os
    N, L, D = h.shape
    hd = D // n_head
    # own blocking default: with the projections fused in, per-cell work is
    # dominated by the [FB·L, D]×[D, 3D] matmul, so bigger cells amortize
    # grid overhead better than in the attention-only kernel (v5e A/B:
    # FB=4 323 pairs/s vs FB=2 316 at batch 64); override for probing.
    FB = _pick_fb(N, L, int(os.environ.get("NRTPU_BLOCK_FB_ROWS", "200")))
    meta = (N, L, n_head, hd, FB, interpret)
    args = (h.astype(jnp.bfloat16), wqkv.astype(jnp.bfloat16),
            bqkv.reshape(1, -1), wout.astype(jnp.bfloat16),
            bout.reshape(1, -1))
    if bias is None:
        return _block_attention_core(*args, meta).astype(h.dtype)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (N, L, L))
    return _block_attention_biased_core(
        args[0], bias, *args[1:], meta).astype(h.dtype)

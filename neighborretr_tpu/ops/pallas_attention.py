"""Fused frame-local multi-head attention (Pallas TPU kernel).

Motivation (measured on v5e): XLA attention over per-frame 50-token sequences
costs ~65% of the whole CLIP-ViT encoder forward — the [B·H, 50, 50] logits
batch decomposes into thousands of tiny (50×64)·(64×50) matmuls that are
latency-bound on the MXU, and the fp32 logits/probs tensors pad 50→128 lanes
(2.56×) through HBM.

This kernel restores MXU efficiency by batching FB frames per grid cell into
ONE (FB·L × 64)·(64 × FB·L) matmul per head and masking the off-frame blocks
(frame-block-diagonal attention).  The ~FB× extra multiply-adds are free next
to the latency the small-matmul formulation wastes; logits/probs never leave
VMEM, and q/k/v are consumed directly from the packed [N, L, 3D] qkv matmul
output — no per-head transpose copies at all.

Gradients via jax.custom_vjp with a tile-local backward (each grid cell owns
its frames, so there is no cross-tile accumulation): recompute probs, then
standard softmax/attention backward, assembled per head into the packed
[N, L, 3D] dqkv layout.

Semantics: for each frame n and head h,
    out[n, :, h] = softmax(scale · q_h k_hᵀ) v_h
identical to ops/layers.mha with attn_bias=None (validated in
tests/test_pallas_attention.py against the XLA path, fwd + grad).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _pick_fb(n_frames: int, L: int, target_rows: int = 384) -> int:
    """Frames per grid cell: biggest divisor of N with FB·L near target."""
    best = 1
    for fb in (16, 12, 8, 6, 4, 3, 2, 1):
        if n_frames % fb == 0 and fb * L <= target_rows:
            best = fb
            break
    return best


def _frame_diag_bias(rows: int, L: int, n_stack: int = 1) -> jnp.ndarray:
    """[n_stack·rows, rows] additive bias: 0 within a frame's L×L diagonal
    block, NEG_INF elsewhere (row r of stack copy s maps to frame
    (r mod rows) // L) — one tensor covers all heads stacked along rows."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_stack * rows, rows), 0)
    r = jax.lax.rem(r, rows) // L
    c = jax.lax.broadcasted_iota(jnp.int32, (n_stack * rows, rows), 1) // L
    return jnp.where(r == c, 0.0, NEG_INF).astype(jnp.float32)


def _fwd_kernel(qkv_ref, out_ref, *, L: int, H: int, hd: int, scale: float):
    FB = qkv_ref.shape[0]
    rows = FB * L
    D = H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)

    logits = []
    for h in range(H):
        q = (qkv[:, h * hd:(h + 1) * hd] * scale).astype(jnp.bfloat16)
        k = qkv[:, D + h * hd:D + (h + 1) * hd].astype(jnp.bfloat16)
        logits.append(jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    l_all = jnp.concatenate(logits, axis=0) + _frame_diag_bias(rows, L, H)
    p_all = jax.nn.softmax(l_all, axis=-1).astype(jnp.bfloat16)

    outs = []
    for h in range(H):
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd].astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            p_all[h * rows:(h + 1) * rows, :], v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    out = jnp.concatenate(outs, axis=1)                     # [rows, D]
    out_ref[:] = out.reshape(FB, L, D).astype(out_ref.dtype)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, L: int, H: int, hd: int,
                scale: float):
    FB = qkv_ref.shape[0]
    rows = FB * L
    D = H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    g = g_ref[:].reshape(rows, D).astype(jnp.bfloat16)

    # recompute all-head probs (stacked rows, one softmax) and the
    # dprobs stack, then ONE softmax-backward over the whole stack
    logits, dprobs = [], []
    for h in range(H):
        q = (qkv[:, h * hd:(h + 1) * hd] * scale).astype(jnp.bfloat16)
        k = qkv[:, D + h * hd:D + (h + 1) * hd].astype(jnp.bfloat16)
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd].astype(jnp.bfloat16)
        logits.append(jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        dprobs.append(jax.lax.dot_general(                   # g_h @ vᵀ
            g[:, h * hd:(h + 1) * hd], v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    l_all = jnp.concatenate(logits, axis=0) + _frame_diag_bias(rows, L, H)
    p_all = jax.nn.softmax(l_all, axis=-1)                   # fp32 [H*rows, rows]
    dp_all = jnp.concatenate(dprobs, axis=0)
    # softmax backward: dlogits = p * (dp - Σ_k dp·p); fold the q-side scale
    dl_all = (p_all * (dp_all - jnp.sum(dp_all * p_all, axis=-1,
                                        keepdims=True)) * scale
              ).astype(jnp.bfloat16)
    p_all = p_all.astype(jnp.bfloat16)

    dqs, dks, dvs = [], [], []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd].astype(jnp.bfloat16)
        k = qkv[:, D + h * hd:D + (h + 1) * hd].astype(jnp.bfloat16)
        sl = slice(h * rows, (h + 1) * rows)
        dvs.append(jax.lax.dot_general(                      # probsᵀ @ g_h
            p_all[sl, :], g[:, h * hd:(h + 1) * hd],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dqs.append(jax.lax.dot_general(
            dl_all[sl, :], k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            dl_all[sl, :], q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    dqkv = jnp.concatenate(dqs + dks + dvs, axis=1)          # [rows, 3D]
    dqkv_ref[:] = dqkv.reshape(FB, L, 3 * D).astype(dqkv_ref.dtype)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _attention_core(qkv, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    kernel = functools.partial(_fwd_kernel, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, 3 * D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), qkv.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * FB * L * L * D, transcendentals=N * FB * L * L,
            bytes_accessed=N * L * 3 * D * 2 * 2),
    )(qkv)


def _attention_fwd(qkv, meta):
    return _attention_core(qkv, meta), (qkv,)


def _attention_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    (qkv,) = res
    kernel = functools.partial(_bwd_kernel, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    dqkv = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[
            pl.BlockSpec((FB, L, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FB, L, 3 * D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, 3 * D), qkv.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qkv, g)
    return (dqkv,)


_attention_core.defvjp(_attention_fwd, _attention_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def fused_frame_attention(qkv: jnp.ndarray, n_head: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Self-attention over packed qkv [N, L, 3D] → [N, L, D].

    No attention bias/mask support — this is the unmasked per-frame vision
    path (every one of the L tokens is real).  For masked/causal attention
    use the XLA path in models/layers.mha.
    """
    N, L, threeD = qkv.shape
    D = threeD // 3
    hd = D // n_head
    FB = _pick_fb(N, L)
    meta = (N, L, n_head, hd, FB, interpret)
    return _attention_core(qkv, meta)

"""Fused frame-local multi-head attention (Pallas TPU kernel).

Motivation (measured on v5e): XLA attention over per-frame 50-token sequences
costs ~65% of the whole CLIP-ViT encoder forward — the [B·H, 50, 50] logits
batch decomposes into thousands of tiny (50×64)·(64×50) matmuls that are
latency-bound on the MXU, and the fp32 logits/probs tensors pad 50→128 lanes
(2.56×) through HBM.

This kernel restores MXU efficiency by batching FB frames per grid cell into
ONE batched 3D dot over all heads, (H, FB·L, 64)·(H, 64, FB·L), masking the
off-frame blocks (frame-block-diagonal attention).  The ~FB× extra
multiply-adds are free next to the latency the small-matmul formulation
wastes; logits/probs never leave VMEM, and q/k/v are consumed directly from
the packed [N, L, 3D] qkv matmul output — no head-transpose HBM copies.
FB=2 measured optimal on v5e (see _pick_fb); a sweep of larger grid cells,
head-stacked softmax, and per-head dots all measured equal or worse.

Gradients via jax.custom_vjp with a tile-local backward (each grid cell owns
its frames, so there is no cross-tile accumulation): recompute probs, then
standard softmax/attention backward, assembled per head into the packed
[N, L, 3D] dqkv layout.

Semantics: for each frame n and head h,
    out[n, :, h] = softmax(scale · q_h k_hᵀ + bias_n) v_h
with optional per-sequence additive bias (the text tower's causal∧padding
mask) — identical to ops/layers.mha (validated in
tests/test_pallas_attention.py against the XLA path, fwd + grad).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Scoped-VMEM bound for the single-tile kernels: the backward holds several
# live fp32 [H, rows, rows] probs-sized buffers and Mosaic's per-kernel stack
# is ~100 MB.  Measured boundary on v5e: L=257/H=16 compiles, L=577/H=16
# overflows by 0.6 MB (models/layers.py::_fused_attention_fits uses the same
# constant).  Past it, the unbiased path switches to the query-row-chunked
# kernels below instead of giving up the fused path.
PROBS_TILE_LIMIT = 2_500_000


def _pick_row_chunk(L: int, n_head: int) -> int:
    """Query-row chunk R for the large-L path.  The VMEM cap — the
    [H, R, L] probs tile within HALF the single-tile bound (the backward
    holds ~2 live probs-sized fp32 buffers per chunk) — fixes the minimum
    chunk COUNT; R is then the smallest multiple of 8 reaching that count,
    which minimizes the padded rows the edge chunk computes.
    ViT-L/14@336px (L=577, H=16): cap 128 → 5 chunks → R=120 (600 computed
    rows, not 640 — 6% less attention work than the max-R choice).  The R=8
    floor is within budget for every shape chunked_attention_fits admits
    (routing guards on it).  NRTPU_ATTN_ROW_CHUNK overrides (and, in
    fused_frame_attention, forces the chunked path — used by the parity
    tests to exercise it at CPU-sized shapes)."""
    import os
    env = os.environ.get("NRTPU_ATTN_ROW_CHUNK")
    if env:
        r = int(env)
        if r <= 0 or r % 8:
            raise ValueError(
                "NRTPU_ATTN_ROW_CHUNK must be a positive multiple of 8 "
                f"(TPU sublane granularity); got {env!r}")
        return r
    budget = PROBS_TILE_LIMIT // 2
    r_max = max(8, min(L, budget // (n_head * L)) // 8 * 8)
    n_chunks = math.ceil(L / r_max)
    rows_per_chunk = math.ceil(L / n_chunks)
    return max(8, math.ceil(rows_per_chunk / 8) * 8)


def chunked_attention_fits(L: int, n_head: int, d_model: int) -> bool:
    """Can the query-row-chunked kernels serve sequence length L?  Needs an
    R≥8 chunk whose [H, R, L] probs tile stays within half the single-tile
    budget, and the backward's full-rows residents — the k/v input blocks
    plus their head-split bf16 copies (~8·L·D bytes) and the fp32 [L, 2D]
    dk/dv accumulator (8·L·D) — to fit well under the ~100 MB VMEM limit."""
    return (n_head * 8 * L <= PROBS_TILE_LIMIT // 2
            and L * d_model * 16 <= 32 * 1024 * 1024)


def _pick_fb(n_frames: int, L: int, target_rows: int = None) -> int:
    """Frames per grid cell: biggest divisor of N with FB·L ≤ target rows.

    The block-diagonal FLOP waste grows with FB while per-op overhead shrinks;
    with Mosaic's batched 3D dots the sweet spot is small (lane padding of the
    [rows, rows] logits is ~1.28× for any FB·L ≥ 128).  Override with
    NRTPU_ATTN_FB_ROWS for A/B probing."""
    import os
    if target_rows is None:
        # measured on v5e at L=50: FB=2 (rows 100) 11.6 ms/layer fwd+bwd,
        # FB=4 12.0, FB=8 13.1-16.5 — small blocks win once dots are batched
        target_rows = int(os.environ.get("NRTPU_ATTN_FB_ROWS", "112"))
    best = 1
    for fb in (16, 12, 8, 6, 4, 3, 2, 1):
        if n_frames % fb == 0 and fb * L <= target_rows:
            best = fb
            break
    return best


def _frame_diag_bias(rows: int, L: int) -> jnp.ndarray:
    """[rows, rows] additive bias: 0 within a frame's L×L diagonal block,
    NEG_INF elsewhere (row r maps to frame r // L)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // L
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // L
    return jnp.where(r == c, 0.0, NEG_INF).astype(jnp.float32)


def _split_heads(x, rows, D, H, hd, n_parts: int = 3):
    """[rows, n_parts·D] → n_parts tensors [H, rows, hd] (bf16), built by
    stacking per-head lane slices along a new leading axis — feeds Mosaic's
    batched 3D dot so each attention matmul is ONE op instead of H.

    NRTPU_SPLIT_HEADS=transpose swaps the 3·H slice-concats for one
    minor-dim reshape + transpose per part (A/B probe for the relayout cost
    — the identified gap between the kernel forward and its FLOP bound).
    NEGATIVE RESULT (v5e, 2026-08): Mosaic cannot lower the lane-split
    reshape vector<rows×3D> → vector<rows×3H×hd> in compiled mode (works in
    interpret only) — the slice-concat relayout stands as the best known
    formulation; the remaining fwd gap vs the FLOP bound is this relayout
    plus the fp32 softmax VPU work."""
    import os
    if os.environ.get("NRTPU_SPLIT_HEADS") == "transpose":
        x3 = x.astype(jnp.bfloat16).reshape(rows, n_parts * H, hd)
        x3 = x3.transpose(1, 0, 2)                 # [n_parts·H, rows, hd]
        return [x3[p * H:(p + 1) * H] for p in range(n_parts)]
    outs = []
    for part in range(n_parts):
        base = part * D
        heads = [x[:, base + h * hd: base + (h + 1) * hd].astype(jnp.bfloat16)[None]
                 for h in range(H)]
        outs.append(jnp.concatenate(heads, axis=0))
    return outs


def _merge_heads(out3, rows, D, H):
    """[H, rows, hd] → [rows, D]: the inverse relayout (same A/B switch)."""
    import os
    if os.environ.get("NRTPU_SPLIT_HEADS") == "transpose":
        return out3.transpose(1, 0, 2).reshape(rows, D)
    return jnp.concatenate([out3[h] for h in range(H)], axis=1)


def _tile_bias(bias_ref, FB: int, L: int) -> jnp.ndarray:
    """Per-sequence additive bias [FB, L, L] → block-diagonal [FB·L, FB·L]
    (NEG_INF off-diagonal), built with Mosaic-legal concats only."""
    if bias_ref is None:
        return _frame_diag_bias(FB * L, L)
    row_blocks = []
    for f in range(FB):
        pieces = []
        if f > 0:
            pieces.append(jnp.full((L, f * L), NEG_INF, jnp.float32))
        pieces.append(bias_ref[f].astype(jnp.float32))
        if f < FB - 1:
            pieces.append(jnp.full((L, (FB - 1 - f) * L), NEG_INF, jnp.float32))
        row_blocks.append(jnp.concatenate(pieces, axis=1) if len(pieces) > 1
                          else pieces[0])
    return jnp.concatenate(row_blocks, axis=0)


def _attn_logits(q3, k3, scale: float):
    """The logits dot every kernel here shares: q3 [H, R, hd] × k3 [H, L, hd]
    → fp32 [H, R, L] as ONE batched bf16 MXU dot (scale folded into q in
    fp32 before the cast — the fp32 softmax island starts at the output)."""
    return jax.lax.dot_general(
        (q3.astype(jnp.float32) * scale).astype(jnp.bfloat16), k3,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _attn_probs(qkv, bias, H: int, hd: int, scale: float):
    """Shared square attention-forward tile: packed [rows, 3D] qkv +
    additive bias → (q3, k3, v3 [H, rows, hd] bf16, probs fp32).  Logits
    math lives in _attn_logits (also used by the rectangular chunked
    kernels); this wrapper adds the head split and the bias."""
    rows = qkv.shape[0]
    D = H * hd
    q3, k3, v3 = _split_heads(qkv, rows, D, H, hd)          # each [H, rows, hd]
    probs = jax.nn.softmax(_attn_logits(q3, k3, scale) + bias[None], axis=-1)
    return q3, k3, v3, probs


def _attn_out_tile(probs, v3, rows: int, D: int, H: int):
    """probs [H, rows, rows] fp32 × v3 → merged [rows, D] fp32."""
    out3 = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, rows, hd]
    return _merge_heads(out3, rows, D, H)


def _attn_bwd_rect(q3, k3, v3, probs, g3, scale: float):
    """The single source of the softmax+attention backward math (softmax
    vjp: dlogits = p·(dp − Σ_k dp·p)) for every backward kernel in this
    module and in pallas_block_attention — rectangular form: q3/g3
    [H, R, hd] against k3/v3 [H, L, hd], probs [H, R, L] →
    (dq3 [H, R, hd], dk3 [H, L, hd], dv3 [H, L, hd]) fp32."""
    p16 = probs.astype(jnp.bfloat16)
    dv3 = jax.lax.dot_general(                               # probsᵀ @ g
        p16, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, L, hd]
    dprobs = jax.lax.dot_general(                            # g @ vᵀ
        g3, v3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, R, L]
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    dl16 = (dlogits * scale).astype(jnp.bfloat16)
    dq3 = jax.lax.dot_general(
        dl16, k3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, R, hd]
    dk3 = jax.lax.dot_general(
        dl16, q3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, L, hd]
    return dq3, dk3, dv3


def _attn_bwd_tile(q3, k3, v3, probs, g3, H: int, scale: float):
    """Square wrapper over _attn_bwd_rect: cotangent g3 [H, rows, hd] w.r.t.
    the attention output → packed dqkv [rows, 3D] fp32 (the layout the
    single-tile kernels write back)."""
    dq3, dk3, dv3 = _attn_bwd_rect(q3, k3, v3, probs, g3, scale)
    return jnp.concatenate(
        [dq3[h] for h in range(H)] + [dk3[h] for h in range(H)]
        + [dv3[h] for h in range(H)], axis=1)                # [rows, 3D] f32


def _fwd_kernel(qkv_ref, out_ref, *, L: int, H: int, hd: int, scale: float):
    FB = qkv_ref.shape[0]
    rows, D = FB * L, H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    _, _, v3, probs = _attn_probs(qkv, _frame_diag_bias(rows, L), H, hd, scale)
    out = _attn_out_tile(probs, v3, rows, D, H)
    out_ref[:] = out.reshape(FB, L, D).astype(out_ref.dtype)


def _bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, L: int, H: int, hd: int,
                scale: float):
    FB = qkv_ref.shape[0]
    rows, D = FB * L, H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    g3 = _split_heads(g_ref[:].reshape(rows, D), rows, D, H, hd, n_parts=1)[0]
    q3, k3, v3, probs = _attn_probs(qkv, _frame_diag_bias(rows, L), H, hd,
                                    scale)
    dqkv = _attn_bwd_tile(q3, k3, v3, probs, g3, H, scale)
    dqkv_ref[:] = dqkv.reshape(FB, L, 3 * D).astype(dqkv_ref.dtype)


def _fwd_kernel_biased(qkv_ref, bias_ref, out_ref, *, L: int, H: int,
                       hd: int, scale: float):
    FB = qkv_ref.shape[0]
    rows, D = FB * L, H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    _, _, v3, probs = _attn_probs(qkv, _tile_bias(bias_ref, FB, L), H, hd,
                                  scale)
    out = _attn_out_tile(probs, v3, rows, D, H)
    out_ref[:] = out.reshape(FB, L, D).astype(out_ref.dtype)


def _bwd_kernel_biased(qkv_ref, bias_ref, g_ref, dqkv_ref, *, L: int, H: int,
                       hd: int, scale: float):
    FB = qkv_ref.shape[0]
    rows, D = FB * L, H * hd
    qkv = qkv_ref[:].reshape(rows, 3 * D)
    g3 = _split_heads(g_ref[:].reshape(rows, D), rows, D, H, hd, n_parts=1)[0]
    q3, k3, v3, probs = _attn_probs(qkv, _tile_bias(bias_ref, FB, L), H, hd,
                                    scale)
    dqkv = _attn_bwd_tile(q3, k3, v3, probs, g3, H, scale)
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


def _bwd_fb(N: int, L: int, FB_fwd: int) -> int:
    """Backward block size: defaults to the forward's; override with
    NRTPU_ATTN_BWD_ROWS (the backward runs ~2.5x the ops per tile, so its
    grid-overhead/FLOP-waste optimum can differ)."""
    import os
    rows = os.environ.get("NRTPU_ATTN_BWD_ROWS")
    if rows is None:
        return FB_fwd
    return _pick_fb(N, L, int(rows))


def _attention_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    FB = _bwd_fb(N, L, FB)
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
# query-row-chunked variant (large L — e.g. ViT-L/14@336px, 577 tokens/frame)
#
# Past PROBS_TILE_LIMIT the [H, L, L] probs buffers of the single-tile
# kernels overflow Mosaic's scoped-VMEM stack, so the grid gains a second
# dimension over query-row chunks of R: each cell recomputes softmax over the
# FULL key axis for its R rows (keys never chunk, so the math is exact — no
# online-softmax running stats), writes its dq rows, and accumulates its dk/dv
# contributions into a full-rows fp32 block revisited across the chunk axis.
# Unbiased only: at FB=1 the frame-diagonal bias is identically zero, and the
# biased (text) sequences are ≤64 tokens — they never reach this path.
# ---------------------------------------------------------------------------

def _fwd_kernel_rows(k_ref, v_ref, q_ref, out_ref, *, L: int, H: int,
                     hd: int, scale: float):
    D = H * hd
    R = q_ref.shape[1]
    k3 = _split_heads(k_ref[0], L, D, H, hd, n_parts=1)[0]
    v3 = _split_heads(v_ref[0], L, D, H, hd, n_parts=1)[0]
    q3 = _split_heads(q_ref[0], R, D, H, hd, n_parts=1)[0]
    probs = jax.nn.softmax(_attn_logits(q3, k3, scale), axis=-1)  # [H, R, L]
    out = _attn_out_tile(probs, v3, R, D, H)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel_rows(k_ref, v_ref, q_ref, g_ref, dq_ref, dkv_ref, *, L: int,
                     H: int, hd: int, scale: float):
    c = pl.program_id(1)
    D = H * hd
    R = q_ref.shape[1]
    k3 = _split_heads(k_ref[0], L, D, H, hd, n_parts=1)[0]
    v3 = _split_heads(v_ref[0], L, D, H, hd, n_parts=1)[0]
    # zero the edge chunk's padding rows (q AND cotangent) BEFORE the head
    # split — 2-D lane broadcasts only (3-D middle-axis broadcasts abort
    # Mosaic lowering).  Zeroed q makes the dead rows' probs a finite
    # uniform row (out-of-bounds reads may be NaN-filled), zeroed g then
    # cancels their dk/dv contributions exactly; their dq garbage is
    # write-masked by the blocked out spec.
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + c * R
    q2 = jnp.where(row < L, q_ref[0], 0).astype(q_ref.dtype)
    q3 = _split_heads(q2, R, D, H, hd, n_parts=1)[0]
    g2 = jnp.where(row < L, g_ref[0], 0).astype(g_ref.dtype)
    g3 = _split_heads(g2, R, D, H, hd, n_parts=1)[0]
    probs = jax.nn.softmax(_attn_logits(q3, k3, scale), axis=-1)  # [H, R, L]
    dq3, dk3, dv3 = _attn_bwd_rect(q3, k3, v3, probs, g3, scale)
    dq_ref[0] = _merge_heads(dq3, R, D, H).astype(dq_ref.dtype)
    dkv = jnp.concatenate([_merge_heads(dk3, L, D, H),
                           _merge_heads(dv3, L, D, H)], axis=1)  # [L, 2D]

    @pl.when(c == 0)
    def _init():
        dkv_ref[0] = dkv

    @pl.when(c > 0)
    def _accum():
        dkv_ref[0] = dkv_ref[0] + dkv


def _rows_kv_q_specs(L: int, R: int, D: int):
    """In-specs viewing ONE packed [N, L, 3D] qkv array three ways: the full
    k and v column blocks (resident across the chunk axis) and the per-chunk
    q row block — the kernels never read the q columns of the full block or
    the k/v columns of the chunk, so narrowed views cut that DMA traffic."""
    return [
        pl.BlockSpec((1, L, D), lambda n, c: (n, 0, 1),
                     memory_space=pltpu.VMEM),               # k columns
        pl.BlockSpec((1, L, D), lambda n, c: (n, 0, 2),
                     memory_space=pltpu.VMEM),               # v columns
        pl.BlockSpec((1, R, D), lambda n, c: (n, c, 0),
                     memory_space=pltpu.VMEM),               # q row chunk
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _attention_core_rows(qkv, meta):
    N, L, H, hd, R, interpret = meta
    D = H * hd
    kernel = functools.partial(_fwd_kernel_rows, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(N, pl.cdiv(L, R)),
        in_specs=_rows_kv_q_specs(L, R, D),
        out_specs=pl.BlockSpec((1, R, D), lambda n, c: (n, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), qkv.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # no cross-chunk dependence in the forward — both grid axes are
            # Megacore-splittable
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * N * L * L * D, transcendentals=N * L * L,
            bytes_accessed=N * L * 4 * D * 2),
    )(qkv, qkv, qkv)


def _attention_rows_fwd(qkv, meta):
    return _attention_core_rows(qkv, meta), (qkv,)


def _attention_rows_bwd(meta, res, g):
    N, L, H, hd, R, interpret = meta
    D = H * hd
    (qkv,) = res
    kernel = functools.partial(_bwd_kernel_rows, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    dq, dkv = pl.pallas_call(
        kernel,
        grid=(N, pl.cdiv(L, R)),
        in_specs=_rows_kv_q_specs(L, R, D) + [
            pl.BlockSpec((1, R, D), lambda n, c: (n, c, 0),
                         memory_space=pltpu.VMEM),           # cotangent rows
        ],
        out_specs=[
            pl.BlockSpec((1, R, D), lambda n, c: (n, c, 0),
                         memory_space=pltpu.VMEM),
            # dk/dv accumulate across the chunk axis in fp32 (the block is
            # revisited — index map constant in c — so Mosaic keeps it
            # resident until the last chunk)
            pl.BlockSpec((1, L, 2 * D), lambda n, c: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, L, D), qkv.dtype),
            jax.ShapeDtypeStruct((N, L, 2 * D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(qkv, qkv, qkv, g)
    return (jnp.concatenate([dq, dkv.astype(qkv.dtype)], axis=-1),)


_attention_core_rows.defvjp(_attention_rows_fwd, _attention_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _attention_core_biased(qkv, bias, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    kernel = functools.partial(_fwd_kernel_biased, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[
            pl.BlockSpec((FB, L, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), qkv.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qkv, bias)


def _attention_biased_fwd(qkv, bias, meta):
    return _attention_core_biased(qkv, bias, meta), (qkv, bias)


def _attention_biased_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    qkv, bias = res
    FB = _bwd_fb(N, L, FB)      # same block-size policy/override as unbiased
    kernel = functools.partial(_bwd_kernel_biased, L=L, H=H, hd=hd,
                               scale=hd ** -0.5)
    dqkv = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[
            pl.BlockSpec((FB, L, 3 * D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, L, L), lambda i: (i, 0, 0),
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
    )(qkv, bias, g)
    # the bias is a mask-derived constant — no cotangent needed
    return dqkv, jnp.zeros_like(bias)


_attention_core_biased.defvjp(_attention_biased_fwd, _attention_biased_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def fused_frame_attention(qkv: jnp.ndarray, n_head: int,
                          bias=None,
                          interpret: bool = False) -> jnp.ndarray:
    """Self-attention over packed qkv [N, L, 3D] → [N, L, D].

    bias: optional per-sequence additive attention bias [N, L, L] fp32 (e.g.
    the text tower's causal∧padding mask; treated as a constant — no
    cotangent).  None = the unmasked per-frame vision path.
    """
    import os
    N, L, threeD = qkv.shape
    D = threeD // 3
    hd = D // n_head
    FB = _pick_fb(N, L)
    if bias is None:
        # sequences whose probs tile overflows scoped VMEM (ViT-L/14@336px:
        # L=577) take the query-row-chunked kernels; NRTPU_ATTN_ROW_CHUNK
        # forces that path at any L (parity tests / A-B probing)
        forced = bool(os.environ.get("NRTPU_ATTN_ROW_CHUNK"))
        if forced or n_head * (FB * L) ** 2 > PROBS_TILE_LIMIT:
            if not forced and not chunked_attention_fits(L, n_head, D):
                # don't hand Mosaic a tile we know overflows — callers that
                # want auto-demotion guard via _fused_attention_fits /
                # chunked_attention_fits; direct callers get a clear error
                raise ValueError(
                    f"sequence length {L} (H={n_head}, D={D}) exceeds both "
                    "the single-tile and query-row-chunked fused-attention "
                    "VMEM bounds — use the XLA path "
                    "(attention_impl='einsum')")
            R = _pick_row_chunk(L, n_head)
            return _attention_core_rows(qkv, (N, L, n_head, hd, R, interpret))
        return _attention_core(qkv, (N, L, n_head, hd, FB, interpret))
    meta = (N, L, n_head, hd, FB, interpret)
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (N, L, L))
    return _attention_core_biased(qkv, bias, meta)

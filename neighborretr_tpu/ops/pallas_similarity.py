"""Fused Pallas TPU kernel for token-interaction similarity.

Semantics identical to ops/similarity.interaction_similarity (the reference's
local_level, modeling.py:483-514) but the [A, T, B, V] logits tensor never
touches HBM: each (row-block, col-block) tile computes its logits on the MXU
in VMEM, reduces max-over-V / max-over-T in-register, and writes only the
[BA, BB] similarity tile.  This matters most for the memory-bank neighbor
matrices ([B_global × bank] — hundreds of MB materialized in the XLA path).

Mosaic layout rules shape the whole design (TPU vectors are tiled
(sublane, lane); only leading-dim reshapes are layout-preserving):

  * text tokens t-major:   tn3 [T, A, D]  → in-kernel [T*BA, D] (leading
    collapse, lane dim D unchanged) so max-over-t is an elementwise max over
    T contiguous [BA, cols] row slices;
  * video tokens v-major:  vn3 [V, B, D]  → in-kernel [V*BB, D] so
    max-over-v is an elementwise max over V contiguous [rows, BB] column
    slices with BB lanes;
  * padding masks are FOLDED INTO THE FEATURES outside the kernel
    (multiplicative zero masking commutes with the dot product), eliminating
    in-kernel mask row/column vectors entirely;
  * token weights enter as [T, A, 1] / [V, B] blocks and are applied via
    per-slice lane/sublane broadcasts — never via lane-collapsing reshapes
    (vector<64x24> → vector<1536x1> is what Mosaic rejects).

Training support via jax.custom_vjp: the backward recomputes tile logits and
routes gradients through first-argmax indicators (torch max backward routes
ties to the first index), in two passes — one accumulating text-side grads
over column tiles, one accumulating video-side grads over row tiles.

Numerics are validated against the XLA path and jax.grad in
tests/test_pallas_similarity.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .similarity import l2_normalize


def _choose_blocks(A: int, B: int, T: int, V: int, D: int,
                   vmem_budget: int = 6 * 1024 * 1024) -> Tuple[int, int]:
    """Pick (BA, BB) so the fp32 logits tile [BA*T, V*BB] fits the budget
    (the largest single buffer; operands and accumulators ride the rest of
    the ~16 MB VMEM with input double-buffering)."""
    BB = 128 if B >= 128 else max(8, B)
    # no bigger than needed for the row count: a remainder eval batch of
    # A=10 should pad to a 16-row tile, not 64.  Powers of two only, so the
    # budget-halving below never leaves the sublane-aligned set
    BA = next(c for c in (8, 16, 32, 64) if c >= min(A, 64))
    while BA > 8 and BA * T * V * BB * 4 > vmem_budget:
        BA //= 2
    return BA, BB


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tile_logits(tn_ref, vn_ref, dot_dtype=jnp.float32):
    """[T*BA, D] x [V*BB, D] -> fp32 logits [T*BA, V*BB] (one MXU matmul).

    dot_dtype=bf16 casts the operands per tile before the dot (fp32
    accumulation either way) — ~4x MXU rate on v5e.  Forward and backward
    cast identically, so the recomputed logits (and thus first-argmax tie
    routing) stay bit-consistent across passes.
    """
    T, BA, D = tn_ref.shape
    V, BB, _ = vn_ref.shape
    tn = tn_ref[:].reshape(T * BA, D).astype(dot_dtype)  # leading collapse: legal
    vn = vn_ref[:].reshape(V * BB, D).astype(dot_dtype)
    logits = jax.lax.dot_general(
        tn, vn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return tn, vn, logits


def _max_over_v(logits, V, BB):
    m1 = logits[:, 0:BB]
    for v in range(1, V):
        m1 = jnp.maximum(m1, logits[:, v * BB:(v + 1) * BB])
    return m1                                    # [T*BA, BB]


def _max_over_t(logits, T, BA):
    m2 = logits[0:BA, :]
    for t in range(1, T):
        m2 = jnp.maximum(m2, logits[t * BA:(t + 1) * BA, :])
    return m2                                    # [BA, V*BB]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tn_ref, vn_ref, tw_ref, vw_ref, out_ref, *, T: int, V: int,
                dot_dtype=jnp.float32):
    BA, BB = out_ref.shape
    _, _, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)

    # t2v: max over v, then Σ_t weighted by tw[t] ([BA, 1] lane broadcast)
    m1 = _max_over_v(logits, V, BB)
    s_t = m1[0:BA, :] * tw_ref[0]
    for t in range(1, T):
        s_t = s_t + m1[t * BA:(t + 1) * BA, :] * tw_ref[t]

    # v2t: max over t, then Σ_v weighted by vw[v] ([1, BB] sublane broadcast)
    m2 = _max_over_t(logits, T, BA)
    s_v = m2[:, 0:BB] * vw_ref[0:1, :]
    for v in range(1, V):
        s_v = s_v + m2[:, v * BB:(v + 1) * BB] * vw_ref[v:v + 1, :]

    out_ref[:] = 0.5 * (s_t + s_v)


def _fwd_pallas(tn3, vn3, tw3, vw2, *, A, B, T, V, D, BA, BB, interpret,
                dot_dtype=jnp.float32):
    grid = (A // BA, B // BB)
    kernel = functools.partial(_fwd_kernel, T=T, V=V, dot_dtype=dot_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, BA, D), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB, D), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BA, BB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, B), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * T * B * V * D, transcendentals=0,
            bytes_accessed=(A * T * D + B * V * D) * 4 + A * B * 4),
    )(tn3, vn3, tw3, vw2)


# ---------------------------------------------------------------------------
# backward kernels (recompute logits per tile; first-argmax tie routing)
# ---------------------------------------------------------------------------

def _t2v_coeff(g, tw_ref, T):
    """coeff1 [T*BA, BB] = 0.5·g(row)·tw(row), g repeated per t."""
    g_rows = jnp.concatenate([g] * T, axis=0)                    # [T*BA, BB]
    tw_rows = jnp.concatenate([tw_ref[t] for t in range(T)], axis=0)
    return g_rows, 0.5 * g_rows * tw_rows


def _v2t_coeff(g, vw_ref, V):
    """coeff2 [BA, V*BB] = 0.5·g(col)·vw(col), built by per-v lane concat."""
    return jnp.concatenate(
        [0.5 * g * vw_ref[v:v + 1, :] for v in range(V)], axis=1)


def _bwd_text_kernel(tn_ref, vn_ref, tw_ref, vw_ref, g_ref,
                     dtn_ref, dtw_ref, *, T: int, V: int,
                     dot_dtype=jnp.float32):
    """Grid (I, J): accumulates text-side grads over column tiles j."""
    j = pl.program_id(1)
    BA, BB = g_ref.shape
    D = tn_ref.shape[-1]
    tn, vn, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)
    g = g_ref[:].astype(jnp.float32)

    m1 = _max_over_v(logits, V, BB)
    m2 = _max_over_t(logits, T, BA)

    # ---- t2v direction: first-argmax over v; dtn += Σ_v d1_v @ vn_v ----
    g_rows, coeff1 = _t2v_coeff(g, tw_ref, T)
    dtn_flat = jnp.zeros((T * BA, D), jnp.float32)
    taken = jnp.zeros((T * BA, BB), jnp.bool_)
    for v in range(V):
        sl = logits[:, v * BB:(v + 1) * BB]
        eq = (sl == m1) & (~taken)
        taken = taken | eq
        d1_v = jnp.where(eq, coeff1, 0.0).astype(dot_dtype)      # [T*BA, BB]
        dtn_flat = dtn_flat + jax.lax.dot_general(
            d1_v, vn[v * BB:(v + 1) * BB, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dtw_rows = 0.5 * jnp.sum(g_rows * m1, axis=1, keepdims=True)  # [T*BA, 1]

    # ---- v2t direction: first-argmax over t; per-t [BA, V*BB] @ vn ----
    coeff2 = _v2t_coeff(g, vw_ref, V)
    taken_t = jnp.zeros((BA, V * BB), jnp.bool_)
    adds = []
    for t in range(T):
        sl = logits[t * BA:(t + 1) * BA, :]
        eq = (sl == m2) & (~taken_t)
        taken_t = taken_t | eq
        d2_t = jnp.where(eq, coeff2, 0.0).astype(dot_dtype)      # [BA, V*BB]
        adds.append(jax.lax.dot_general(
            d2_t, vn, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[None])           # [1, BA, D]

    dtn3 = dtn_flat.reshape(T, BA, D) + jnp.concatenate(adds, axis=0)
    dtw3 = dtw_rows.reshape(T, BA, 1)

    @pl.when(j == 0)
    def _():
        dtn_ref[:] = jnp.zeros_like(dtn_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)

    dtn_ref[:] += dtn3
    dtw_ref[:] += dtw3


def _bwd_video_kernel(tn_ref, vn_ref, tw_ref, vw_ref, g_ref,
                      dvn_ref, dvw_ref, *, T: int, V: int,
                      dot_dtype=jnp.float32):
    """Grid (J, I): accumulates video-side grads over row tiles i."""
    i = pl.program_id(1)
    BA, BB = g_ref.shape
    D = tn_ref.shape[-1]
    tn, vn, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)
    g = g_ref[:].astype(jnp.float32)

    m1 = _max_over_v(logits, V, BB)
    m2 = _max_over_t(logits, T, BA)

    # ---- t2v direction: dvn_v += d1_vᵀ @ tn (contract over rows) ----
    _, coeff1 = _t2v_coeff(g, tw_ref, T)
    taken = jnp.zeros((T * BA, BB), jnp.bool_)
    parts = []
    for v in range(V):
        sl = logits[:, v * BB:(v + 1) * BB]
        eq = (sl == m1) & (~taken)
        taken = taken | eq
        d1_v = jnp.where(eq, coeff1, 0.0).astype(dot_dtype)
        parts.append(jax.lax.dot_general(
            d1_v, tn, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))                 # [BB, D]
    dvn_flat = jnp.concatenate(parts, axis=0)                    # [V*BB, D]

    # ---- v2t direction: dvn += Σ_t d2_tᵀ @ tn_t; dvw per-v column sums ----
    coeff2 = _v2t_coeff(g, vw_ref, V)
    taken_t = jnp.zeros((BA, V * BB), jnp.bool_)
    for t in range(T):
        sl = logits[t * BA:(t + 1) * BA, :]
        eq = (sl == m2) & (~taken_t)
        taken_t = taken_t | eq
        d2_t = jnp.where(eq, coeff2, 0.0).astype(dot_dtype)      # [BA, V*BB]
        dvn_flat = dvn_flat + jax.lax.dot_general(
            d2_t, tn[t * BA:(t + 1) * BA, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [V*BB, D]

    dvw_parts = [0.5 * jnp.sum(g * m2[:, v * BB:(v + 1) * BB],
                               axis=0, keepdims=True)            # [1, BB]
                 for v in range(V)]
    dvn3 = dvn_flat.reshape(V, BB, D)
    dvw2 = jnp.concatenate(dvw_parts, axis=0)                    # [V, BB]

    @pl.when(i == 0)
    def _():
        dvn_ref[:] = jnp.zeros_like(dvn_ref)
        dvw_ref[:] = jnp.zeros_like(dvw_ref)

    dvn_ref[:] += dvn3
    dvw_ref[:] += dvw2


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _similarity_core(tn3, vn3, tw3, vw2, meta):
    A, B, T, V, D, BA, BB, interpret, dtype_str = meta
    return _fwd_pallas(tn3, vn3, tw3, vw2, A=A, B=B, T=T, V=V,
                       D=D, BA=BA, BB=BB, interpret=interpret,
                       dot_dtype=jnp.dtype(dtype_str))


def _similarity_fwd(tn3, vn3, tw3, vw2, meta):
    out = _similarity_core(tn3, vn3, tw3, vw2, meta)
    return out, (tn3, vn3, tw3, vw2)


def _choose_bwd_blocks(A: int, B: int, T: int, V: int) -> Tuple[int, int]:
    """Backward tiles hold logits + indicator temporaries + grad accumulators
    + double-buffered operands; shrink the ROW block only (the column block
    must stay 128-divisible or full-extent for the 2D operands g/vw per
    Mosaic block rules) and rely on the raised vmem_limit_bytes for the
    rest.  KNOWN LIMIT: at long-token shapes (T·V ≥ ~4k) the unrolled t/v
    loops spill registers regardless of BA — callers route those shapes to
    ops.similarity.interaction_similarity_chunked instead (see
    models.neighborretr.local_similarity)."""
    BB = 128 if B >= 128 else max(8, B)
    BA = 16 if A >= 16 else max(8, A)
    while BA > 8 and BA * T * V * BB * 4 > (3 << 20):
        BA //= 2
    return BA, BB


def _similarity_bwd(meta, res, g):
    A, B, T, V, D, _, _, interpret, dtype_str = meta
    dot_dtype = jnp.dtype(dtype_str)
    BA, BB = _choose_bwd_blocks(A, B, T, V)
    # the padded extents are multiples of the FORWARD blocks — the backward
    # blocks must divide them or grid coverage silently drops rows/columns
    while A % BA:
        BA //= 2
    while B % BB:
        BB //= 2
    tn3, vn3, tw3, vw2 = res
    g = g.astype(jnp.float32)

    common_specs = [
        pl.BlockSpec((T, BA, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, BB, D), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, BA, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, BB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((BA, BB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    dtn3, dtw3 = pl.pallas_call(
        functools.partial(_bwd_text_kernel, T=T, V=V, dot_dtype=dot_dtype),
        grid=(A // BA, B // BB),
        in_specs=common_specs,
        out_specs=[
            pl.BlockSpec((T, BA, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, A, D), jnp.float32),
            jax.ShapeDtypeStruct((T, A, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(tn3, vn3, tw3, vw2, g)

    # column-tile-major grid: swap index-map argument order
    video_specs = [
        pl.BlockSpec((T, BA, D), lambda j, i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, BB, D), lambda j, i: (0, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, BA, 1), lambda j, i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, BB), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((BA, BB), lambda j, i: (i, j), memory_space=pltpu.VMEM),
    ]
    dvn3, dvw2 = pl.pallas_call(
        functools.partial(_bwd_video_kernel, T=T, V=V, dot_dtype=dot_dtype),
        grid=(B // BB, A // BA),
        in_specs=video_specs,
        out_specs=[
            pl.BlockSpec((V, BB, D), lambda j, i: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, B, D), jnp.float32),
            jax.ShapeDtypeStruct((V, B), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(tn3, vn3, tw3, vw2, g)

    return dtn3, dvn3, dtw3, dvw2


_similarity_core.defvjp(_similarity_fwd, _similarity_bwd)


# ---------------------------------------------------------------------------
# fused similarity → mean reduction (the loss-side fusion)
#
# The [B, M] memory-bank matrices feed the neighbor loss ONLY through a
# mean over the bank axis (until_module.py:181: memory_centrality =
# matrix.sum(-1)/size).  These kernels emit that mean directly, so the bank
# matrices never materialize in HBM at all — the bank features stream from
# HBM through the tile computation into a [N, 1] accumulator.  The backward
# reuses the full [A, B] gradient kernels with the rank-1 cotangent
# g/|reduced axis| (a ~1 MB array at the 128×1920 recipe — nothing like the
# [A, T, B, V] logits object).
# ---------------------------------------------------------------------------

def _fwd_rowmean_kernel(tn_ref, vn_ref, tw_ref, vw_ref, out_ref,
                        *, T: int, V: int, n_real: int, axis: int,
                        dot_dtype=jnp.float32):
    """axis=1: out[i] += Σ_j tile (grid (i, j));
    axis=0: out[j] += Σ_i tile (grid (j, i)).  Padded rows/cols masked."""
    k = pl.program_id(1)
    BA = tw_ref.shape[1]
    BB = vw_ref.shape[1]
    _, _, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)

    m1 = _max_over_v(logits, V, BB)
    s_t = m1[0:BA, :] * tw_ref[0]
    for t in range(1, T):
        s_t = s_t + m1[t * BA:(t + 1) * BA, :] * tw_ref[t]
    m2 = _max_over_t(logits, T, BA)
    s_v = m2[:, 0:BB] * vw_ref[0:1, :]
    for v in range(1, V):
        s_v = s_v + m2[:, v * BB:(v + 1) * BB] * vw_ref[v:v + 1, :]
    tile = 0.5 * (s_t + s_v)                                  # [BA, BB]

    # mask padded positions of the REDUCED axis, then reduce it
    pos = jax.lax.broadcasted_iota(jnp.int32, (BA, BB), axis)
    tile = jnp.where(pos + k * (BB if axis == 1 else BA) < n_real, tile, 0.0)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    # axis=1 → [BA, 1] into a (BA, 1) block; axis=0 → [1, BB] into a (1, BB)
    # block (keepdims sums match the block layouts — no lane↔sublane moves)
    out_ref[:] += jnp.sum(tile, axis=axis, keepdims=True)


def _rowmean_meta(meta):
    A, B, T, V, D, BA, BB, interpret, dtype_str, A_real, B_real, axis = meta
    return (A, B, T, V, D, BA, BB, interpret, dtype_str), (A_real, B_real,
                                                           axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rowmean_core(tn3, vn3, tw3, vw2, meta):
    (A, B, T, V, D, BA, BB, interpret, dtype_str), (A_real, B_real, axis) = \
        _rowmean_meta(meta)
    n_real = B_real if axis == 1 else A_real
    n_out = A if axis == 1 else B
    if axis == 1:
        grid = (A // BA, B // BB)
        imap_t = lambda i, j: (0, i, 0)          # noqa: E731
        imap_v = lambda i, j: (0, j, 0)          # noqa: E731
        out_spec = pl.BlockSpec((BA, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (B // BB, A // BA)
        imap_t = lambda j, i: (0, i, 0)          # noqa: E731
        imap_v = lambda j, i: (0, j, 0)          # noqa: E731
        out_spec = pl.BlockSpec((1, BB), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        functools.partial(_fwd_rowmean_kernel, T=T, V=V, n_real=n_real,
                          axis=axis, dot_dtype=jnp.dtype(dtype_str)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, BA, D), imap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB, D), imap_v, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, 1), imap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda *a: imap_v(*a)[:2],
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_out, 1) if axis == 1 else (1, n_out), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(tn3, vn3, tw3, vw2)
    return (sums[:, 0] if axis == 1 else sums[0, :]) / n_real


def _rowmean_fwd(tn3, vn3, tw3, vw2, meta):
    return _rowmean_core(tn3, vn3, tw3, vw2, meta), (tn3, vn3, tw3, vw2)


def _rowmean_bwd(meta, res, g):
    sim_meta, (A_real, B_real, axis) = _rowmean_meta(meta)
    A, B = sim_meta[0], sim_meta[1]
    n_real = B_real if axis == 1 else A_real
    row = jax.lax.broadcasted_iota(jnp.int32, (A, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (A, B), 1)
    valid = (row < A_real) & (col < B_real)
    g = g.astype(jnp.float32) / n_real
    g_full = jnp.where(valid, g[:, None] if axis == 1 else g[None, :], 0.0)
    return _similarity_bwd(sim_meta, res, g_full)


_rowmean_core.defvjp(_rowmean_fwd, _rowmean_bwd)


def pallas_interaction_mean(
    t_feat, v_feat, t_mask, v_mask, t_weight, v_weight,
    axis: int = 1,
    interpret: bool = False,
    compute_dtype: str = "float32",
):
    """Mean of the interaction similarity matrix over `axis` without
    materializing it: axis=1 → [A] row means, axis=0 → [B] column means.
    Differentiable; the cotangent re-expands to the rank-1 [A, B] form."""
    A, T, D = t_feat.shape
    B, V, _ = v_feat.shape

    tn = l2_normalize(t_feat).astype(jnp.float32) * \
        t_mask.astype(jnp.float32)[:, :, None]
    vn = l2_normalize(v_feat).astype(jnp.float32) * \
        v_mask.astype(jnp.float32)[:, :, None]

    BA, BB = _choose_blocks(A, B, T, V, D)
    A_pad = ((A + BA - 1) // BA) * BA
    B_pad = ((B + BB - 1) // BB) * BB

    tn3 = _pad_to(tn, A_pad, 0).transpose(1, 0, 2)
    tw3 = _pad_to(t_weight.astype(jnp.float32), A_pad, 0).T[:, :, None]
    vn3 = _pad_to(vn, B_pad, 0).transpose(1, 0, 2)
    vw2 = _pad_to(v_weight.astype(jnp.float32), B_pad, 0).T

    meta = (A_pad, B_pad, T, V, D, BA, BB, interpret, compute_dtype, A, B,
            axis)
    out = _rowmean_core(tn3, vn3, tw3, vw2, meta)
    return out[:A] if axis == 1 else out[:B]


# ---------------------------------------------------------------------------
# public API — drop-in for ops.similarity.interaction_similarity
# ---------------------------------------------------------------------------

def pallas_interaction_similarity(
    t_feat, v_feat, t_mask, v_mask, t_weight, v_weight,
    interpret: bool = False,
    compute_dtype: str = "float32",
):
    """Fused similarity [A, B]; differentiable w.r.t. features and weights.

    The padding masks are folded into the normalized features before the
    kernel (multiplicative zero masking — exact reference semantics,
    modeling.py:500-501); gradients w.r.t. features pick up the mask factor
    through this outer multiply automatically.

    compute_dtype: "bfloat16" casts the token operands per tile before the
    MXU dots (fp32 accumulation) — ~4x the matmul rate for <0.5% relative
    error on unit-norm similarities.  Training-path option; eval keeps fp32.
    """
    A, T, D = t_feat.shape
    B, V, _ = v_feat.shape

    tn = l2_normalize(t_feat).astype(jnp.float32) * \
        t_mask.astype(jnp.float32)[:, :, None]
    vn = l2_normalize(v_feat).astype(jnp.float32) * \
        v_mask.astype(jnp.float32)[:, :, None]

    BA, BB = _choose_blocks(A, B, T, V, D)
    A_pad = ((A + BA - 1) // BA) * BA
    B_pad = ((B + BB - 1) // BB) * BB

    tn3 = _pad_to(tn, A_pad, 0).transpose(1, 0, 2)       # [T, A_pad, D]
    tw3 = _pad_to(t_weight.astype(jnp.float32), A_pad, 0).T[:, :, None]
    vn3 = _pad_to(vn, B_pad, 0).transpose(1, 0, 2)       # [V, B_pad, D]
    vw2 = _pad_to(v_weight.astype(jnp.float32), B_pad, 0).T   # [V, B_pad]

    meta = (A_pad, B_pad, T, V, D, BA, BB, interpret, compute_dtype)
    out = _similarity_core(tn3, vn3, tw3, vw2, meta)
    return out[:A, :B]

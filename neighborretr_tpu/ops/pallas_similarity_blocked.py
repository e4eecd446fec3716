"""Blocked (two-level) Pallas TPU kernel for token-interaction similarity at
long-token shapes — the 64-word/64-frame recipes (reference README.md:113-133)
where the flat kernel in pallas_similarity.py register-spills (its t/v loops
fully unroll: T·V ≥ ~2k → thousands of slice ops per tile).

Same semantics as ops.similarity.interaction_similarity (the reference's
local_level, modeling.py:483-514).  Differences from the flat kernel:

  * the VIDEO TOKEN axis becomes a third grid dimension: each (row-tile i,
    col-tile j) walks V/VC chunks, so VMEM holds a [T·BA, VC·BB] logits slab
    instead of [T·BA, V·BB] — shapes like T=V=64 × bank 1920 fit;
  * running max-over-v (and its FIRST-argmax winner index, torch max tie
    semantics) carried in scratch across chunk steps; max-over-t is complete
    within each chunk (all T rows are resident) so the v2t sum accumulates
    chunk-locally;
  * the backward saves (m1, winner) [T, A, B] from the forward instead of
    re-deriving the cross-chunk argmax: the t2v indicator becomes the pure
    elementwise test `winner == global_v`, making every backward grid step
    order-independent — both gradient directions collapse to ONE
    [T·BA, VC·BB] × [VC·BB, D] MXU dot per step (the flat kernel needed
    T + V separate dots);
  * v2t routing (max over t) is chunk-local and recomputed in the backward
    from the same dot dtype, so tie routing stays bit-consistent.

Residual cost: 2 × [T, A, B] fp32 in HBM (63 MB each at the ActivityNet
recipe's 128×1920 bank matrix) — microseconds of HBM traffic versus the
multi-GB [A, T, B, V] tensor the XLA path would materialize.

Validated against the XLA path and jax.grad in
tests/test_pallas_similarity_blocked.py (interpret on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_similarity import _max_over_v, _pad_to, _tile_logits
from .similarity import l2_normalize


def _choose_blocks(A: int, B: int, T: int, V: int, D: int
                   ) -> Tuple[int, int, int]:
    """(BA, BB, VC): row/col tile and v-chunk.  The logits slab
    [T·BA, VC·BB] and the vn chunk [VC·BB, D] are the big VMEM tenants;
    keep each ≤ ~2 MB.  VC must divide V (grid coverage)."""
    BB = 128 if B >= 128 else max(8, B)
    BA = 8 if A >= 8 else A
    budget = 2 * 1024 * 1024
    best = 1
    for vc in range(1, V + 1):
        if V % vc:
            continue
        if T * BA * vc * BB * 4 <= budget and vc * BB * D * 4 <= budget:
            best = vc
    return BA, BB, best


# tile logits + chunk max-over-v are the flat kernel's helpers verbatim
# (pallas_similarity._tile_logits / _max_over_v) — imported, not re-defined.


def _chunk_first_v(logits, m1c, VC, BB):
    """FIRST v index achieving m1c (reverse-order overwrite) → [T*BA, BB]."""
    win = jnp.full(m1c.shape, float(VC - 1), jnp.float32)
    for v in range(VC - 2, -1, -1):
        win = jnp.where(logits[:, v * BB:(v + 1) * BB] == m1c, float(v), win)
    return win


def _row_t_index(T, BA, C):
    """[T*BA, C] fp32: the t index of each row group (leading-dim iota//BA —
    replaces T-unrolled loops: t is the sublane-group coordinate)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (T * BA, C), 0)
    return (r // BA).astype(jnp.float32)


def _chunk_max_t(logits, T, BA):
    """Max over t row groups → [BA, C].  Leading-dim expand [T*BA, C] →
    [T, BA, C] is layout-preserving; the axis-0 reduction compiles to one
    Mosaic reduce instead of T unrolled maximums."""
    C = logits.shape[1]
    return jnp.max(logits.reshape(T, BA, C), axis=0)


def _chunk_first_t(logits, m2, T, BA):
    """FIRST t index achieving m2 → [BA, C] (min over matching t)."""
    C = logits.shape[1]
    t_idx = _row_t_index(T, BA, C)
    cand = jnp.where(logits == _rep_rows(m2, T, BA, C), t_idx, float(T))
    return jnp.min(cand.reshape(T, BA, C), axis=0)


def _rep_rows(x, T, BA, C):
    """[BA, C] → [T*BA, C] by broadcasting over the t row groups (one
    broadcast + leading collapse — replaces T-piece concats)."""
    return jnp.broadcast_to(x[None], (T, BA, C)).reshape(T * BA, C)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(tn_ref, vn_ref, tw_ref, vw_ref, *refs,
                T: int, VC: int, NC: int, dot_dtype, save_residuals: bool):
    if save_residuals:
        out_ref, m1_ref, win_ref, m1_acc, win_acc, sv_acc = refs
    else:
        out_ref, m1_acc, win_acc, sv_acc = refs
    c = pl.program_id(2)
    BA, BB = out_ref.shape

    @pl.when(c == 0)
    def _():
        m1_acc[:] = jnp.full_like(m1_acc, -jnp.inf)
        win_acc[:] = jnp.zeros_like(win_acc)
        sv_acc[:] = jnp.zeros_like(sv_acc)

    _, _, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)

    # running max-over-v with first-argmax winner (strict > keeps first)
    m1c = _max_over_v(logits, VC, BB)
    m1_prev = m1_acc[:]
    m1_acc[:] = jnp.maximum(m1_prev, m1c)
    winc = _chunk_first_v(logits, m1c, VC, BB)
    win_acc[:] = jnp.where(m1c > m1_prev,
                           winc + jnp.float32(VC) * c.astype(jnp.float32),
                           win_acc[:])

    # v2t is complete within the chunk: accumulate its weighted sum
    m2 = _chunk_max_t(logits, T, BA)
    sv = sv_acc[:]
    for v in range(VC):
        sv = sv + m2[:, v * BB:(v + 1) * BB] * vw_ref[v:v + 1, :]
    sv_acc[:] = sv

    @pl.when(c == NC - 1)
    def _():
        m1 = m1_acc[:]
        tw_flat = tw_ref[:].reshape(T * BA, 1)
        s_t = jnp.sum((m1 * tw_flat).reshape(T, BA, BB), axis=0)
        out_ref[:] = 0.5 * (s_t + sv_acc[:])
        if save_residuals:
            m1_ref[:] = m1.reshape(m1_ref.shape)
            win_ref[:] = win_acc[:].reshape(win_ref.shape)


def _fwd_pallas(tn3, vn3, tw3, vw2, *, A, B, T, V, D, BA, BB, VC,
                interpret, dot_dtype, save_residuals):
    NC = V // VC
    grid = (A // BA, B // BB, NC)
    kernel = functools.partial(_fwd_kernel, T=T, VC=VC, NC=NC,
                               dot_dtype=dot_dtype,
                               save_residuals=save_residuals)
    out_specs = [pl.BlockSpec((BA, BB), lambda i, j, c: (i, j),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((A, B), jnp.float32)]
    if save_residuals:
        out_specs += [
            pl.BlockSpec((T, BA, BB), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, BB), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [jax.ShapeDtypeStruct((T, A, B), jnp.float32),
                      jax.ShapeDtypeStruct((T, A, B), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, BA, D), lambda i, j, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, BB, D), lambda i, j, c: (c, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, 1), lambda i, j, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, BB), lambda i, j, c: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((T * BA, BB), jnp.float32),   # m1 running max
            pltpu.VMEM((T * BA, BB), jnp.float32),   # winner v index
            pltpu.VMEM((BA, BB), jnp.float32),       # v2t partial sum
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * A * T * B * V * D, transcendentals=0,
            bytes_accessed=((A * T * D + B * V * D) * 4 + A * B * 4
                            + (2 * T * A * B * 4 if save_residuals else 0))),
    )(tn3, vn3, tw3, vw2)


# ---------------------------------------------------------------------------
# backward (order-free: t2v routed by the saved winner index; v2t chunk-local)
# ---------------------------------------------------------------------------

def _coeffs(g, tw_ref, vw_ref, T, VC, BA, BB):
    """coeff1 [T*BA, BB] = 0.5·g·tw (rows per t);
    coeff2 [BA, VC*BB] = 0.5·g·vw (lane slices per v)."""
    tw_flat = tw_ref[:].reshape(T * BA, 1)
    coeff1 = 0.5 * _rep_rows(g, T, BA, BB) * tw_flat
    coeff2 = jnp.concatenate(
        [0.5 * g * vw_ref[v:v + 1, :] for v in range(VC)], axis=1)
    return coeff1, coeff2


def _grad_slab(logits, g, tw_ref, vw_ref, win, c, T, VC, BA, BB):
    """D = D1 + D2 [T*BA, VC*BB]: per-logit cotangents for both directions.

    D1 (t2v): winner-routed — (win == global v) picks exactly the forward's
    first-argmax column, no recompute consistency needed.
    D2 (v2t): chunk-local first-argmax over t from recomputed logits.
    All T-extent structure is built by broadcast/iota over the row groups,
    not unrolled loops (compile-time and VPU-op-count critical at T=64)."""
    coeff1, coeff2 = _coeffs(g, tw_ref, vw_ref, T, VC, BA, BB)
    c_f = c.astype(jnp.float32) * jnp.float32(VC)
    d1 = jnp.concatenate(
        [jnp.where(win == c_f + float(v), coeff1, 0.0) for v in range(VC)],
        axis=1)

    C = VC * BB
    m2 = _chunk_max_t(logits, T, BA)
    win2 = _chunk_first_t(logits, m2, T, BA)
    d2 = jnp.where(_rep_rows(win2, T, BA, C) == _row_t_index(T, BA, C),
                   _rep_rows(coeff2, T, BA, C), 0.0)
    return d1 + d2, m2


def _bwd_text_kernel(tn_ref, vn_ref, tw_ref, vw_ref, g_ref, win_ref,
                     dtn_ref, *, T: int, VC: int, dot_dtype):
    """Grid (i, j, c): accumulates text-side grads over (j, c).

    The m1 residual is NOT an input: dtw (the only consumer) is one
    [A,B]×[T,A,B] einsum computed XLA-side in _blocked_bwd, so neither
    backward pass streams the [T, A, B] max tensor through VMEM (~0.5 GB of
    reads per pass at the 64w/64f bank-1920 recipe)."""
    j, c = pl.program_id(1), pl.program_id(2)
    BA, BB = g_ref.shape
    _, vn, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)
    g = g_ref[:].astype(jnp.float32)
    win = win_ref[:].reshape(T * BA, BB)

    d, _ = _grad_slab(logits, g, tw_ref, vw_ref, win, c, T, VC, BA, BB)
    contrib = jax.lax.dot_general(
        d.astype(dot_dtype), vn,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T*BA, D]

    @pl.when((j == 0) & (c == 0))
    def _():
        dtn_ref[:] = jnp.zeros_like(dtn_ref)

    dtn_ref[:] += contrib.reshape(dtn_ref.shape)


def _bwd_video_kernel(tn_ref, vn_ref, tw_ref, vw_ref, g_ref, win_ref,
                      dvn_ref, dvw_ref, *, T: int, VC: int, dot_dtype):
    """Grid (j, c, i): accumulates video-side grads over i."""
    c, i = pl.program_id(1), pl.program_id(2)
    BA, BB = g_ref.shape
    tn, _, logits = _tile_logits(tn_ref, vn_ref, dot_dtype)
    g = g_ref[:].astype(jnp.float32)
    win = win_ref[:].reshape(T * BA, BB)

    d, m2 = _grad_slab(logits, g, tw_ref, vw_ref, win, c, T, VC, BA, BB)
    contrib = jax.lax.dot_general(
        d.astype(dot_dtype), tn,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [VC*BB, D]

    @pl.when(i == 0)
    def _():
        dvn_ref[:] = jnp.zeros_like(dvn_ref)
        dvw_ref[:] = jnp.zeros_like(dvw_ref)

    dvn_ref[:] += contrib.reshape(dvn_ref.shape)
    dvw_ref[:] += jnp.concatenate(
        [0.5 * jnp.sum(g * m2[:, v * BB:(v + 1) * BB], axis=0, keepdims=True)
         for v in range(VC)], axis=0)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _blocked_core(tn3, vn3, tw3, vw2, meta):
    A, B, T, V, D, BA, BB, VC, interpret, dtype_str = meta
    (out,) = _fwd_pallas(tn3, vn3, tw3, vw2, A=A, B=B, T=T, V=V, D=D,
                         BA=BA, BB=BB, VC=VC, interpret=interpret,
                         dot_dtype=jnp.dtype(dtype_str),
                         save_residuals=False)
    return out


def _blocked_fwd(tn3, vn3, tw3, vw2, meta):
    A, B, T, V, D, BA, BB, VC, interpret, dtype_str = meta
    out, m1, win = _fwd_pallas(tn3, vn3, tw3, vw2, A=A, B=B, T=T, V=V, D=D,
                               BA=BA, BB=BB, VC=VC, interpret=interpret,
                               dot_dtype=jnp.dtype(dtype_str),
                               save_residuals=True)
    return out, (tn3, vn3, tw3, vw2, m1, win)


def _blocked_bwd(meta, res, g):
    A, B, T, V, D, BA, BB, VC, interpret, dtype_str = meta
    dot_dtype = jnp.dtype(dtype_str)
    NC = V // VC
    tn3, vn3, tw3, vw2, m1, win = res
    g = g.astype(jnp.float32)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel", "arbitrary", "arbitrary"))

    in_arrays = (tn3, vn3, tw3, vw2, g, win)

    def specs(imap_t, imap_v, imap_g, imap_m):
        return [
            pl.BlockSpec((T, BA, D), imap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, BB, D), imap_v, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, 1), imap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, BB), lambda *a: imap_v(*a)[:2],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, BB), imap_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, BA, BB), imap_m, memory_space=pltpu.VMEM),
        ]

    # dtw consumes m1 through a single reduction — one XLA einsum instead of
    # streaming the [T, A, B] residual through the kernels' VMEM pipelines
    dtw3 = 0.5 * jnp.einsum("ab,tab->ta", g, m1)[:, :, None]

    (dtn3,) = pl.pallas_call(
        functools.partial(_bwd_text_kernel, T=T, VC=VC, dot_dtype=dot_dtype),
        grid=(A // BA, B // BB, NC),
        in_specs=specs(lambda i, j, c: (0, i, 0),
                       lambda i, j, c: (c, j, 0),
                       lambda i, j, c: (i, j),
                       lambda i, j, c: (0, i, j)),
        out_specs=[
            pl.BlockSpec((T, BA, D), lambda i, j, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, A, D), jnp.float32)],
        interpret=interpret,
        compiler_params=params,
    )(*in_arrays)

    dvn3, dvw2 = pl.pallas_call(
        functools.partial(_bwd_video_kernel, T=T, VC=VC, dot_dtype=dot_dtype),
        grid=(B // BB, NC, A // BA),
        in_specs=specs(lambda j, c, i: (0, i, 0),
                       lambda j, c, i: (c, j, 0),
                       lambda j, c, i: (i, j),
                       lambda j, c, i: (0, i, j)),
        out_specs=[
            pl.BlockSpec((VC, BB, D), lambda j, c, i: (c, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, BB), lambda j, c, i: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((V, B, D), jnp.float32),
                   jax.ShapeDtypeStruct((V, B), jnp.float32)],
        interpret=interpret,
        compiler_params=params,
    )(*in_arrays)

    return dtn3, dvn3, dtw3, dvw2


_blocked_core.defvjp(_blocked_fwd, _blocked_bwd)


# ---------------------------------------------------------------------------
# public API — drop-in for ops.similarity.interaction_similarity
# ---------------------------------------------------------------------------

def pallas_interaction_similarity_blocked(
    t_feat, v_feat, t_mask, v_mask, t_weight, v_weight,
    interpret: bool = False,
    compute_dtype: str = "float32",
):
    """Fused similarity [A, B] for long-token shapes; differentiable w.r.t.
    features and weights.  Masks fold into the normalized features outside
    the kernel (multiplicative zero masking — exact reference semantics,
    modeling.py:500-501)."""
    A, T, D = t_feat.shape
    B, V, _ = v_feat.shape

    tn = l2_normalize(t_feat).astype(jnp.float32) * \
        t_mask.astype(jnp.float32)[:, :, None]
    vn = l2_normalize(v_feat).astype(jnp.float32) * \
        v_mask.astype(jnp.float32)[:, :, None]

    BA, BB, VC = _choose_blocks(A, B, T, V, D)
    A_pad = ((A + BA - 1) // BA) * BA
    B_pad = ((B + BB - 1) // BB) * BB

    tn3 = _pad_to(tn, A_pad, 0).transpose(1, 0, 2)            # [T, A_pad, D]
    tw3 = _pad_to(t_weight.astype(jnp.float32), A_pad, 0).T[:, :, None]
    vn3 = _pad_to(vn, B_pad, 0).transpose(1, 0, 2)            # [V, B_pad, D]
    vw2 = _pad_to(v_weight.astype(jnp.float32), B_pad, 0).T   # [V, B_pad]

    meta = (A_pad, B_pad, T, V, D, BA, BB, VC, interpret, compute_dtype)
    out = _blocked_core(tn3, vn3, tw3, vw2, meta)
    return out[:A, :B]

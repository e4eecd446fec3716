"""Fused Pallas TPU kernel for token-interaction similarity.

Semantics identical to ops/similarity.interaction_similarity (the reference's
local_level, modeling.py:483-514) but the [A, T, B, V] logits tensor never
touches HBM: each (row-block, col-block) tile computes its logits on the MXU
in VMEM, reduces max-over-V / max-over-T in-register, and writes only the
[BA, BB] similarity tile.  This matters most for the memory-bank neighbor
matrices ([B_global × bank] — hundreds of MB materialized in the XLA path).

Layout choices (TPU tiling rules):
  * text tokens a-major:   tn [A*T, D]   (row = a*T + t)
  * video tokens v-major:  vn [V, B, D]  → in-kernel [V*B_blk, D]
    so max-over-v is an elementwise max over V contiguous [rows, BB] column
    slices with BB=128 lanes, and max-over-t is a leading-axis reshape.

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


def _choose_blocks(A: int, B: int, T: int, V: int,
                   vmem_budget: int = 10 * 1024 * 1024) -> Tuple[int, int]:
    """Pick (BA, BB) so the fp32 logits tile fits the VMEM budget."""
    BB = 128 if B >= 128 else max(8, B)
    BA = 64
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


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tn_ref, vn_ref, tm_ref, vm_ref, tw_ref, vw_ref, out_ref,
                *, T: int, V: int):
    BA = out_ref.shape[0]
    BB = out_ref.shape[1]
    D = tn_ref.shape[-1]

    tn = tn_ref[:].reshape(BA * T, D)
    vn = vn_ref[:].reshape(V * BB, D)
    logits = jax.lax.dot_general(
        tn, vn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [BA*T, V*BB]

    tm = tm_ref[:].reshape(BA * T, 1).astype(jnp.float32)
    vm = vm_ref[:].reshape(1, V * BB).astype(jnp.float32)
    logits = logits * tm * vm

    # t2v: elementwise max over the V column slices → [BA*T, BB]
    m1 = logits[:, 0:BB]
    for v in range(1, V):
        m1 = jnp.maximum(m1, logits[:, v * BB:(v + 1) * BB])
    m1 = m1 * tw_ref[:].reshape(BA * T, 1).astype(jnp.float32)
    s_t = jnp.sum(m1.reshape(BA, T, BB), axis=1)          # [BA, BB]

    # v2t: max over T via leading-axis reshape → [BA, V*BB]
    m2 = jnp.max(logits.reshape(BA, T, V * BB), axis=1)
    m2 = m2 * vw_ref[:].reshape(1, V * BB).astype(jnp.float32)
    s_v = m2[:, 0:BB]
    for v in range(1, V):
        s_v = s_v + m2[:, v * BB:(v + 1) * BB]

    out_ref[:] = 0.5 * (s_t + s_v)


def _fwd_pallas(tn, vn_vm, tm, vm_vm, tw, vw_vm, *, A, B, T, V, D,
                BA, BB, interpret):
    grid = (A // BA, B // BB)
    kernel = functools.partial(_fwd_kernel, T=T, V=V)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BA, T, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB, D), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BA, BB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, B), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * T * B * V * D, transcendentals=0,
            bytes_accessed=(A * T * D + B * V * D) * 2 + A * B * 4),
    )(tn.reshape(A, T, D), vn_vm, tm, vm_vm, tw, vw_vm)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _recompute_tile(tn_ref, vn_ref, tm_ref, vm_ref, T, V):
    BA = tn_ref.shape[0]
    BB = vn_ref.shape[1]
    D = tn_ref.shape[-1]
    tn = tn_ref[:].reshape(BA * T, D)
    vn = vn_ref[:].reshape(V * BB, D)
    logits = jax.lax.dot_general(
        tn, vn, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    tm = tm_ref[:].reshape(BA * T, 1).astype(jnp.float32)
    vm = vm_ref[:].reshape(1, V * BB).astype(jnp.float32)
    return tn, vn, logits * tm * vm, tm, vm


def _dlogits_tile(logits, g_tile, tw_ref, vw_ref, T, V, BA, BB):
    """dL/dlogits for one tile (both directions), [BA*T, V*BB] fp32."""
    rows = BA * T
    # ---- t2v: first-argmax over v ----
    m1 = logits[:, 0:BB]
    for v in range(1, V):
        m1 = jnp.maximum(m1, logits[:, v * BB:(v + 1) * BB])
    g_rows = jnp.broadcast_to(
        g_tile.reshape(BA, 1, BB), (BA, T, BB)).reshape(rows, BB)
    tw_rows = tw_ref[:].reshape(rows, 1).astype(jnp.float32)
    coeff1 = 0.5 * g_rows * tw_rows                        # [rows, BB]

    d1_slices = []
    taken = jnp.zeros((rows, BB), jnp.bool_)
    for v in range(V):
        sl = logits[:, v * BB:(v + 1) * BB]
        eq = (sl == m1) & (~taken)
        taken = taken | eq
        d1_slices.append(jnp.where(eq, coeff1, 0.0))
    d1 = jnp.concatenate(d1_slices, axis=1)                # [rows, V*BB]

    # ---- v2t: first-argmax over t (static slice loop — no middle-axis cumsum) ----
    logits3 = logits.reshape(BA, T, V * BB)
    m2 = jnp.max(logits3, axis=1)                          # [BA, V*BB]
    vw_cols = vw_ref[:].reshape(1, V * BB).astype(jnp.float32)
    g_cols = jnp.concatenate([g_tile] * V, axis=1)         # [BA, V*BB] v-major
    coeff2 = 0.5 * g_cols * vw_cols                        # [BA, V*BB]

    taken_t = jnp.zeros((BA, V * BB), jnp.bool_)
    d2_slices = []
    for t in range(T):
        sl = logits3[:, t, :]
        eq = (sl == m2) & (~taken_t)
        taken_t = taken_t | eq
        d2_slices.append(jnp.where(eq, coeff2, 0.0))
    d2 = jnp.stack(d2_slices, axis=1).reshape(BA * T, V * BB)

    return d1 + d2, m1, m2


def _bwd_text_kernel(tn_ref, vn_ref, tm_ref, vm_ref, tw_ref, vw_ref, g_ref,
                     dtn_ref, dtw_ref, *, T: int, V: int):
    """Grid (I, J): accumulates text-side grads over column tiles j."""
    j = pl.program_id(1)
    BA = g_ref.shape[0]
    BB = g_ref.shape[1]
    tn, vn, logits, tm, vm = _recompute_tile(tn_ref, vn_ref, tm_ref, vm_ref, T, V)
    dlog, m1, _ = _dlogits_tile(logits, g_ref[:], tw_ref, vw_ref, T, V, BA, BB)
    dlog = dlog * tm * vm   # chain through mask multiplication

    dtn = jax.lax.dot_general(
        dlog, vn, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [BA*T, D]
    g_rows = jnp.broadcast_to(
        g_ref[:].reshape(BA, 1, BB), (BA, T, BB)).reshape(BA * T, BB)
    dtw = 0.5 * jnp.sum(g_rows * m1, axis=1)               # [BA*T]

    @pl.when(j == 0)
    def _():
        dtn_ref[:] = jnp.zeros_like(dtn_ref)
        dtw_ref[:] = jnp.zeros_like(dtw_ref)

    dtn_ref[:] += dtn.reshape(dtn_ref.shape)
    dtw_ref[:] += dtw.reshape(dtw_ref.shape)


def _bwd_video_kernel(tn_ref, vn_ref, tm_ref, vm_ref, tw_ref, vw_ref, g_ref,
                      dvn_ref, dvw_ref, *, T: int, V: int):
    """Grid (J, I): accumulates video-side grads over row tiles i."""
    i = pl.program_id(1)
    BA = g_ref.shape[0]
    BB = g_ref.shape[1]
    tn, vn, logits, tm, vm = _recompute_tile(tn_ref, vn_ref, tm_ref, vm_ref, T, V)
    dlog, _, m2 = _dlogits_tile(logits, g_ref[:], tw_ref, vw_ref, T, V, BA, BB)
    dlog = dlog * tm * vm

    dvn = jax.lax.dot_general(
        dlog, tn, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [V*BB, D]
    g_cols = jnp.concatenate([g_ref[:]] * V, axis=1)       # [BA, V*BB]
    dvw = 0.5 * jnp.sum(g_cols * m2, axis=0)               # [V*BB]

    @pl.when(i == 0)
    def _():
        dvn_ref[:] = jnp.zeros_like(dvn_ref)
        dvw_ref[:] = jnp.zeros_like(dvw_ref)

    dvn_ref[:] += dvn.reshape(dvn_ref.shape)
    dvw_ref[:] += dvw.reshape(dvw_ref.shape)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _similarity_core(tn, vn_vm, tm, vm_vm, tw, vw_vm, meta):
    A, B, T, V, D, BA, BB, interpret = meta
    return _fwd_pallas(tn, vn_vm, tm, vm_vm, tw, vw_vm, A=A, B=B, T=T, V=V,
                       D=D, BA=BA, BB=BB, interpret=interpret)


def _similarity_fwd(tn, vn_vm, tm, vm_vm, tw, vw_vm, meta):
    out = _similarity_core(tn, vn_vm, tm, vm_vm, tw, vw_vm, meta)
    return out, (tn, vn_vm, tm, vm_vm, tw, vw_vm)


def _similarity_bwd(meta, res, g):
    A, B, T, V, D, BA, BB, interpret = meta
    tn, vn_vm, tm, vm_vm, tw, vw_vm = res
    g = g.astype(jnp.float32)

    text_kernel = functools.partial(_bwd_text_kernel, T=T, V=V)
    dtn, dtw = pl.pallas_call(
        text_kernel,
        grid=(A // BA, B // BB),
        in_specs=[
            pl.BlockSpec((BA, T, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB, D), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, BB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BA, T, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A, T, D), jnp.float32),
            jax.ShapeDtypeStruct((A, T), jnp.float32),
        ],
        interpret=interpret,
    )(tn.reshape(A, T, D), vn_vm, tm, vm_vm, tw, vw_vm, g)

    video_kernel = functools.partial(_bwd_video_kernel, T=T, V=V)
    dvn_vm, dvw_vm = pl.pallas_call(
        video_kernel,
        grid=(B // BB, A // BA),
        in_specs=[
            pl.BlockSpec((BA, T, D), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB, D), lambda j, i: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, T), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BA, BB), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((V, BB, D), lambda j, i: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, BB), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, B, D), jnp.float32),
            jax.ShapeDtypeStruct((V, B), jnp.float32),
        ],
        interpret=interpret,
    )(tn.reshape(A, T, D), vn_vm, tm, vm_vm, tw, vw_vm, g)

    # masks are data, not parameters — zero cotangents
    return (dtn.reshape(A, T, D), dvn_vm, jnp.zeros_like(tm),
            jnp.zeros_like(vm_vm), dtw.reshape(A, T), dvw_vm)


_similarity_core.defvjp(_similarity_fwd, _similarity_bwd)


# ---------------------------------------------------------------------------
# public API — drop-in for ops.similarity.interaction_similarity
# ---------------------------------------------------------------------------

def pallas_interaction_similarity(
    t_feat, v_feat, t_mask, v_mask, t_weight, v_weight,
    interpret: bool = False,
):
    """Fused similarity [A, B]; differentiable w.r.t. features and weights."""
    A, T, D = t_feat.shape
    B, V, _ = v_feat.shape

    tn = l2_normalize(t_feat).astype(jnp.float32)
    vn = l2_normalize(v_feat).astype(jnp.float32)

    BA, BB = _choose_blocks(A, B, T, V)
    A_pad = ((A + BA - 1) // BA) * BA
    B_pad = ((B + BB - 1) // BB) * BB

    tn = _pad_to(tn, A_pad, 0)
    tm = _pad_to(t_mask.astype(jnp.float32), A_pad, 0)
    tw = _pad_to(t_weight.astype(jnp.float32), A_pad, 0)
    vn = _pad_to(vn, B_pad, 0)
    vm = _pad_to(v_mask.astype(jnp.float32), B_pad, 0)
    vw = _pad_to(v_weight.astype(jnp.float32), B_pad, 0)

    vn_vm = vn.transpose(1, 0, 2)      # [V, B_pad, D] v-major columns
    vm_vm = vm.T                       # [V, B_pad]
    vw_vm = vw.T

    meta = (A_pad, B_pad, T, V, D, BA, BB, interpret)
    out = _similarity_core(tn, vn_vm, tm, vm_vm, tw, vw_vm, meta)
    return out[:A, :B]

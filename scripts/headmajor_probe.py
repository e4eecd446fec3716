"""A/B probe: head-major attention sublayer kernel vs the production one.

The production kernel (ops/pallas_block_attention.py) computes qkv as one
[rows, D] x [D, 3D] matmul and then relayouts lanes into [H, rows, hd]
per-head tensors via 3·H slice-concats (`_split_heads`) — the identified
gap between the kernel forward and its FLOP bound (VERDICT weak #5).  The
head-major formulation removes the relayout entirely: the wrapper reshapes
the weights ONCE to [H, D, hd] per part, and the kernel computes each part
directly in head-major layout with a batched 3D dot over a leading-dim
broadcast of the hidden tile:

    q3 = dot_general(bcast(h, [H, rows, D]), wq3[H, D, hd])   # batch H

Same FLOPs as the packed matmul (it is the same matmul, sliced per head);
the lane-relayout disappears; the merge side folds into the output
projection the same way (batched dot + axis-0 sum).  Backward mirrors it:
dq/dk/dv stay head-major, weight grads are emitted as [H, D, hd] blocks
and re-assembled by XLA outside the kernel.

Run on TPU: python scripts/headmajor_probe.py [N] [L]
Prints per-formulation fwd and fwd+bwd times and max deviations.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from neighborretr_tpu.ops.pallas_attention import _frame_diag_bias, _pick_fb
from neighborretr_tpu.ops.pallas_block_attention import (
    fused_attention_sublayer)


# ---------------------------------------------------------------------------
# head-major kernel
# ---------------------------------------------------------------------------

def _hm_attn(h16, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
             rows, L, H, hd):
    """Head-major qkv + frame-local attention: returns (q3, k3, v3, probs,
    out3 [H, rows, hd]).

    The per-part biases come in as three separate [H, rows, hd] refs,
    pre-broadcast XLA-side: both slicing a [3H, 1, hd] array at a non-zero
    dim-0 offset AND sublane-broadcasting 1 -> rows in 3D crash Mosaic
    (vector_extract_rule / limits > dim on the size-1 sublane axis)."""
    scale = hd ** -0.5
    hb = jnp.broadcast_to(h16[None], (H, rows, H * hd))

    def part(w_ref, b_ref):
        y = jax.lax.dot_general(
            hb, w_ref[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [H, rows, hd]
        return (y + b_ref[:]).astype(jnp.bfloat16)

    q3 = part(wq_ref, bq_ref)
    k3 = part(wk_ref, bk_ref)
    v3 = part(wv_ref, bv_ref)
    bias = _frame_diag_bias(rows, L)
    logits = jax.lax.dot_general(
        (q3.astype(jnp.float32) * scale).astype(jnp.bfloat16), k3,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits + bias[None], axis=-1)
    out3 = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, rows, hd]
    return q3, k3, v3, probs, out3


def _hm_fwd_kernel(h_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wout3_ref, bout_ref, y_ref, *, L, H, hd):
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    h16 = h_ref[:].reshape(rows, D)
    _, _, _, _, out3 = _hm_attn(h16, wq_ref, wk_ref, wv_ref,
                                bq_ref, bk_ref, bv_ref, rows, L, H, hd)
    # out proj folded head-major: y = sum_h out3[h] @ wout3[h]
    y3 = jax.lax.dot_general(
        out3.astype(jnp.bfloat16), wout3_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [H, rows, D]
    y = jnp.sum(y3, axis=0) + bout_ref[:].astype(jnp.float32)
    y_ref[:] = y.reshape(FB, L, D).astype(y_ref.dtype)


def _hm_bwd_kernel(h_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   wout3_ref, bout_ref, g_ref, dh_ref, dwq_ref, dwk_ref,
                   dwv_ref, dbq_ref, dbk_ref, dbv_ref, dwout3_ref, dbout_ref,
                   *, L, H, hd):
    i = pl.program_id(0)
    FB = h_ref.shape[0]
    rows = FB * L
    D = H * hd
    scale = hd ** -0.5

    h16 = h_ref[:].reshape(rows, D)
    q3, k3, v3, probs, out3 = _hm_attn(h16, wq_ref, wk_ref, wv_ref,
                                       bq_ref, bk_ref, bv_ref, rows, L, H, hd)
    o16 = out3.astype(jnp.bfloat16)
    g = g_ref[:].reshape(rows, D).astype(jnp.float32)
    g16 = g.astype(jnp.bfloat16)
    gb = jnp.broadcast_to(g16[None], (H, rows, D))

    # out projection backward (head-major)
    dwout3 = jax.lax.dot_general(                            # [H, hd, D]
        o16, gb, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dbout = jnp.sum(g, axis=0, keepdims=True)
    g3 = jax.lax.dot_general(                                # g @ wout3ᵀ
        gb, wout3_ref[:], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)  # [H,rows,hd]

    # attention backward
    p16 = probs.astype(jnp.bfloat16)
    dv3 = jax.lax.dot_general(
        p16, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dprobs = jax.lax.dot_general(
        g3, v3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    dl16 = (dlogits * scale).astype(jnp.bfloat16)
    dq3 = jax.lax.dot_general(
        dl16, k3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk3 = jax.lax.dot_general(
        dl16, q3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # qkv projection backward, all in head-major layouts
    hb = jnp.broadcast_to(h16[None], (H, rows, D))
    dh = jnp.zeros((rows, D), jnp.float32)
    for dx3, w_ref, dw_ref, p in ((dq3, wq_ref, dwq_ref, 0),
                                  (dk3, wk_ref, dwk_ref, 1),
                                  (dv3, wv_ref, dwv_ref, 2)):
        dx16 = dx3.astype(jnp.bfloat16)
        dh3 = jax.lax.dot_general(                           # [H, rows, D]
            dx16, w_ref[:], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dh = dh + jnp.sum(dh3, axis=0)
        dw = jax.lax.dot_general(                            # [H, D, hd]
            hb, dx16, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _(dw_ref=dw_ref):
            dw_ref[:] = jnp.zeros_like(dw_ref)
        dw_ref[:] += dw

    dh_ref[:] = dh.reshape(FB, L, D).astype(dh_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dbk_ref[:] = jnp.zeros_like(dbk_ref)
        dbv_ref[:] = jnp.zeros_like(dbv_ref)
        dwout3_ref[:] = jnp.zeros_like(dwout3_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)

    dbq_ref[:] += jnp.sum(dq3, axis=1, keepdims=True)        # [H, 1, hd]
    dbk_ref[:] += jnp.sum(dk3, axis=1, keepdims=True)
    dbv_ref[:] += jnp.sum(dv3, axis=1, keepdims=True)
    dwout3_ref[:] += dwout3
    dbout_ref[:] += dbout


def _hm_weights(wqkv, bqkv, wout, H, hd, rows):
    """[D, 3D]/[3D]/[D, D] → head-major blocks (XLA-side, once per call).

    Biases are materialized at [H, rows, hd] fp32 because Mosaic cannot
    sublane-broadcast a 3D size-1 middle axis in-kernel."""
    D = H * hd
    w3 = wqkv.astype(jnp.bfloat16).reshape(D, 3, H, hd)
    wq = w3[:, 0].transpose(1, 0, 2)                         # [H, D, hd]
    wk = w3[:, 1].transpose(1, 0, 2)
    wv = w3[:, 2].transpose(1, 0, 2)
    bq, bk, bv = (jnp.broadcast_to(b.reshape(H, 1, hd), (H, rows, hd))
                  for b in jnp.split(bqkv.astype(jnp.float32), 3))
    wout3 = wout.astype(jnp.bfloat16).reshape(H, hd, D)
    return wq, wk, wv, bq, bk, bv, wout3


def _hm_specs(H, hd, D, rows):
    c = lambda i: (0, 0, 0)
    w = pl.BlockSpec((H, D, hd), c, memory_space=pltpu.VMEM)
    b = pl.BlockSpec((H, rows, hd), c, memory_space=pltpu.VMEM)
    return [
        w, w, w, b, b, b,
        pl.BlockSpec((H, hd, D), c, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def headmajor_sublayer(h, wqkv, bqkv, wout, bout, meta):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    rows = FB * L
    wq, wk, wv, bq, bk, bv, wout3 = _hm_weights(wqkv, bqkv, wout, H, hd, rows)
    kernel = functools.partial(_hm_fwd_kernel, L=L, H=H, hd=hd)
    return pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _hm_specs(H, hd, D, rows),
        out_specs=pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L, D), h.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h.astype(jnp.bfloat16), wq, wk, wv, bq, bk, bv, wout3,
      bout.reshape(1, -1))


def _hm_fwd(h, wqkv, bqkv, wout, bout, meta):
    return headmajor_sublayer(h, wqkv, bqkv, wout, bout, meta), (
        h, wqkv, bqkv, wout, bout)


def _hm_bwd(meta, res, g):
    N, L, H, hd, FB, interpret = meta
    D = H * hd
    h, wqkv, bqkv, wout, bout = res
    rows = FB * L
    wq, wk, wv, bq, bk, bv, wout3 = _hm_weights(wqkv, bqkv, wout, H, hd, rows)
    kernel = functools.partial(_hm_bwd_kernel, L=L, H=H, hd=hd)
    tile = pl.BlockSpec((FB, L, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    c3 = lambda i: (0, 0, 0)
    wspec = pl.BlockSpec((H, D, hd), c3, memory_space=pltpu.VMEM)
    b1spec = pl.BlockSpec((H, 1, hd), c3, memory_space=pltpu.VMEM)
    (dh, dwq, dwk, dwv, dbq, dbk, dbv, dwout3, dbout) = pl.pallas_call(
        kernel,
        grid=(N // FB,),
        in_specs=[tile] + _hm_specs(H, hd, D, rows) + [tile],
        out_specs=[tile, wspec, wspec, wspec, b1spec, b1spec, b1spec,
                   pl.BlockSpec((H, hd, D), c3, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, D), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((N, L, D), h.dtype),
            jax.ShapeDtypeStruct((H, D, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, D, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, D, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, 1, hd), jnp.float32),
            jax.ShapeDtypeStruct((H, hd, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(h.astype(jnp.bfloat16), wq, wk, wv, bq, bk, bv, wout3,
      bout.reshape(1, -1), g)
    # reassemble packed weight grads (XLA-side)
    dwqkv = jnp.concatenate(
        [dw.transpose(1, 0, 2).reshape(D, D) for dw in (dwq, dwk, dwv)],
        axis=1).astype(wqkv.dtype)
    dbqkv = jnp.concatenate(
        [db.reshape(H * hd) for db in (dbq, dbk, dbv)]).astype(bqkv.dtype)
    dwout = dwout3.reshape(D, D).astype(wout.dtype)
    return (dh, dwqkv, dbqkv, dwout, dbout.reshape(-1).astype(bout.dtype))


headmajor_sublayer.defvjp(_hm_fwd, _hm_bwd)


# ---------------------------------------------------------------------------
# probe
# ---------------------------------------------------------------------------

def main():
    interpret = jax.devices()[0].platform == "cpu"
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1152   # batch96 x 12 frames
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    H, hd = 8, 64
    D = H * hd
    FB = _pick_fb(N, L, int(os.environ.get("NRTPU_BLOCK_FB_ROWS", "200")))
    print(f"N={N} L={L} D={D} H={H} FB={FB} interpret={interpret}",
          flush=True)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(0, 1, (N, L, D)).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(0, .02, (D, 3 * D)).astype(np.float32))
    bqkv = jnp.asarray(rng.normal(0, .02, (3 * D,)).astype(np.float32))
    wout = jnp.asarray(rng.normal(0, .02, (D, D)).astype(np.float32))
    bout = jnp.asarray(rng.normal(0, .02, (D,)).astype(np.float32))
    meta = (N, L, H, hd, FB, interpret)

    def loss_base(h, wqkv, bqkv, wout, bout):
        return jnp.sum(fused_attention_sublayer(
            h, wqkv, bqkv, wout, bout, H, interpret=interpret)
            .astype(jnp.float32))

    def loss_hm(h, wqkv, bqkv, wout, bout):
        return jnp.sum(headmajor_sublayer(h, wqkv, bqkv, wout, bout, meta)
                       .astype(jnp.float32))

    args = (h, wqkv, bqkv, wout, bout)
    fb = jax.jit(jax.grad(loss_base, argnums=(0, 1, 2, 3, 4)))
    fh = jax.jit(jax.grad(loss_hm, argnums=(0, 1, 2, 3, 4)))
    yb = jax.jit(lambda *a: fused_attention_sublayer(
        *a, H, interpret=interpret))(*args)
    yh = jax.jit(lambda *a: headmajor_sublayer(*a, meta))(*args)
    dev = float(jnp.max(jnp.abs(yb.astype(jnp.float32)
                                - yh.astype(jnp.float32))))
    sc = float(jnp.max(jnp.abs(yb)))
    print(f"fwd max|Δ|={dev:.3e} (scale {sc:.2f})", flush=True)
    gb = fb(*args)
    gh = fh(*args)
    for name, a, b in zip(("dh", "dwqkv", "dbqkv", "dwout", "dbout"), gb, gh):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) or 1.0
        print(f"  {name}: max|Δ|={d:.3e} rel={d/s:.2e}", flush=True)

    if interpret:
        return

    def timeit(fn, reps=20):
        fn(*args)
        r = jax.block_until_ready(fn(*args))
        tic = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - tic) / reps * 1e3

    fwd_b = jax.jit(lambda *a: jnp.sum(fused_attention_sublayer(
        *a, H, interpret=interpret).astype(jnp.float32)))
    fwd_h = jax.jit(lambda *a: jnp.sum(headmajor_sublayer(*a, meta)
                                       .astype(jnp.float32)))
    vg_b = jax.jit(jax.value_and_grad(loss_base, argnums=(0, 1, 2, 3, 4)))
    vg_h = jax.jit(jax.value_and_grad(loss_hm, argnums=(0, 1, 2, 3, 4)))
    print(f"fwd     base {timeit(fwd_b):7.3f} ms   headmajor "
          f"{timeit(fwd_h):7.3f} ms", flush=True)
    print(f"fwd+bwd base {timeit(vg_b):7.3f} ms   headmajor "
          f"{timeit(vg_h):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

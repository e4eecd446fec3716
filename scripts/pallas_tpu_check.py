"""Compile + numerics check of the fused similarity kernel on a real TPU.

Compares forward and gradients against the XLA path at both the in-batch
(B×B) and memory-bank (B×M) shapes, then times both paths.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

from neighborretr_tpu.ops.similarity import interaction_similarity
from neighborretr_tpu.ops.pallas_similarity import pallas_interaction_similarity


def check(A, B, T, V, D, tag):
    rng = np.random.default_rng(0)
    tf = jnp.asarray(rng.normal(size=(A, T, D)).astype(np.float32))
    vf = jnp.asarray(rng.normal(size=(B, V, D)).astype(np.float32))
    tm = jnp.asarray((rng.random((A, T)) > 0.2).astype(np.float32))
    vm = jnp.asarray((rng.random((B, V)) > 0.2).astype(np.float32))
    tw = jax.nn.softmax(jnp.asarray(rng.normal(size=(A, T)).astype(np.float32)))
    vw = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, V)).astype(np.float32)))

    def loss_x(tf, vf, tw, vw):
        return jnp.sum(jnp.sin(interaction_similarity(tf, vf, tm, vm, tw, vw)))

    def loss_p(tf, vf, tw, vw):
        return jnp.sum(jnp.sin(pallas_interaction_similarity(tf, vf, tm, vm, tw, vw)))

    fx = jax.jit(jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3)))
    fp = jax.jit(jax.value_and_grad(loss_p, argnums=(0, 1, 2, 3)))

    vx, gx = fx(tf, vf, tw, vw)
    vp, gp = fp(tf, vf, tw, vw)
    err_v = abs(float(vx) - float(vp))
    err_g = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gx, gp))
    print(f"[{tag}] value err {err_v:.2e}  max grad err {err_g:.2e}", flush=True)
    assert err_v < 1e-2 and err_g < 1e-3, "MISMATCH"

    for name, fn in (("xla", fx), ("pallas", fp)):
        v, g = fn(tf, vf, tw, vw)
        _ = float(v)
        tic = time.perf_counter()
        for _ in range(5):
            v, g = fn(tf, vf, tw, vw)
        _ = float(v)
        dt = (time.perf_counter() - tic) / 5
        print(f"[{tag}] {name}: {dt*1e3:.2f} ms/fwd+bwd", flush=True)


def bench_attention(N=768, L=50, H=12, hd=64):
    """Micro-bench fused vs XLA attention at the bench shape (batch 64 x 12f)."""
    import numpy as np
    from neighborretr_tpu.models import layers as Lmod
    rng = np.random.default_rng(0)
    D = H * hd
    p = {"in_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, 3, D)).astype(np.float32)),
                     "b": jnp.zeros((3, D), jnp.float32)},
         "out_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, D)).astype(np.float32)),
                      "b": jnp.zeros((D,), jnp.float32)}}
    x = jnp.asarray(rng.normal(size=(N, L, D)).astype(np.float32))

    for name, fused in (("xla", False), ("fused", True)):
        def f(p, x, fused=fused):
            return jnp.sum(Lmod.mha(p, x, H, None, jnp.bfloat16, fused)
                           .astype(jnp.float32))
        fn = jax.jit(jax.value_and_grad(f))
        v, g = fn(p, x)
        _ = float(v)
        tic = time.perf_counter()
        for _ in range(8):
            v, g = fn(p, x)
        _ = float(v)
        dt = (time.perf_counter() - tic) / 8
        print(f"[attn {N}x{L} H{H}] {name}: {dt*1e3:.2f} ms/fwd+bwd", flush=True)


def bench_block_attention(N=768, L=50, H=12, hd=64):
    """Fused SUBLAYER kernel (qkv+attn+out) vs einsum mha at the bench shape."""
    from neighborretr_tpu.models import layers as Lmod
    from neighborretr_tpu.ops.pallas_block_attention import fused_attention_sublayer
    rng = np.random.default_rng(0)
    D = H * hd
    p = {"in_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, 3, D)).astype(np.float32)),
                     "b": jnp.zeros((3, D), jnp.float32)},
         "out_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, D)).astype(np.float32)),
                      "b": jnp.zeros((D,), jnp.float32)}}
    h = jnp.asarray(rng.normal(size=(N, L, D)).astype(np.float32))

    def f_kernel(p, h):
        return jnp.sum(fused_attention_sublayer(
            h, *Lmod.packed_qkv_weights(p["in_proj"]),
            p["out_proj"]["w"], p["out_proj"]["b"], H).astype(jnp.float32))

    def f_xla(p, h):
        return jnp.sum(Lmod.mha(p, h, H, None, jnp.bfloat16, fused=False)
                       .astype(jnp.float32))

    gk = jax.jit(jax.grad(f_kernel))(p, h)
    gx = jax.jit(jax.grad(f_xla))(p, h)
    for k1 in ("in_proj", "out_proj"):
        for k2 in ("w", "b"):
            err = float(jnp.max(jnp.abs(gk[k1][k2].astype(jnp.float32)
                                        - gx[k1][k2].astype(jnp.float32))))
            ref = float(jnp.max(jnp.abs(gx[k1][k2]))) or 1.0
            print(f"[block] grad {k1}.{k2} rel err {err/ref:.4f}", flush=True)
            assert err / ref < 0.05, (k1, k2)
    for name, f in (("kernel", f_kernel), ("xla", f_xla)):
        fn = jax.jit(jax.value_and_grad(f))
        v, g = fn(p, h)
        _ = float(v)
        tic = time.perf_counter()
        for _ in range(8):
            v, g = fn(p, h)
        _ = float(v)
        print(f"[block {N}x{L} H{H}] {name}: "
              f"{(time.perf_counter()-tic)/8*1e3:.2f} ms/f+b", flush=True)


if __name__ == "__main__":
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)
    import sys as _sys
    if "attn" in _sys.argv:
        bench_attention()
    elif "block" in _sys.argv:
        bench_block_attention()
    else:
        check(128, 128, 24, 12, 512, "batch 128x128")
        check(128, 1920, 24, 12, 512, "bank 128x1920")
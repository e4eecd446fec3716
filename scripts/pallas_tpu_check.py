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


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    check(128, 128, 24, 12, 512, "batch 128x128")
    check(128, 1920, 24, 12, 512, "bank 128x1920")

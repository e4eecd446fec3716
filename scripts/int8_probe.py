"""NEGATIVE RESULT (2026-08-18, v5e via axon): int8 training is not worth it.

v5e advertises ~2x int8 MXU throughput over bf16 (394 TOPS vs 197 TFLOPs),
so AQT-style int8 matmuls looked like the last single-chip lever after the
attention kernel was closed at its shape-constrained bound.  Measured on the
MLP's dominant shape instead:

    [38400, 512] x [512, 2048]  (batch-64 video tower c_fc)
    bf16 -> fp32 accum : 0.604 ms   (68% MFU — near the XLA ceiling)
    int8 -> int32 accum: 0.507 ms   (1.19x, NOT ~2x)

Why: the int32 accumulator doubles the OUTPUT bytes (315 MB at this shape
vs 157 MB bf16), so the int8 dot is HBM-bound on its epilogue write —
roughly 0.38 ms of pure output traffic against a 0.20 ms compute ideal.
A fused requantize epilogue would claw some back, but the realistic end-to-
end step win is <10% on the ~50%-of-FLOPs MLP slice, against per-channel
scale bookkeeping, Pallas-kernel surgery for the attention path, and
training-numerics risk on a parity-bound model.  Do not redo without a
Mosaic kernel that keeps the accumulator in VMEM and writes bf16.

Run: python scripts/int8_probe.py   (needs the TPU tunnel)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(dot, a, b, n=50):
    def body(c, _):
        o = dot(a, b)
        return c + o[0, :8].astype(jnp.float32), None

    f = jax.jit(lambda a, b: jax.lax.scan(
        body, jnp.zeros(8, jnp.float32), None, length=n)[0])
    f(a, b).block_until_ready()
    t0 = time.perf_counter()
    f(a, b).block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("dev:", jax.devices()[0])
    N, D, H = 38400, 512, 2048
    x8 = jnp.asarray(np.random.randint(-127, 128, (N, D)), jnp.int8)
    w8 = jnp.asarray(np.random.randint(-127, 128, (D, H)), jnp.int8)
    xb = jnp.asarray(np.random.randn(N, D), jnp.bfloat16)
    wb = jnp.asarray(np.random.randn(D, H), jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    t8 = chain(lambda a, b: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.int32), x8, w8)
    tb = chain(lambda a, b: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32), xb, wb)
    print(f"int8 {t8:.3f} ms  bf16 {tb:.3f} ms  ratio {tb / t8:.2f}x")


if __name__ == "__main__":
    main()

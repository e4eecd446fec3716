"""Capture a jax.profiler trace of the fused attention kernel (and the
encoder forward) on the real chip; list whatever files appear."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "/tmp/jtrace"


def main():
    from neighborretr_tpu.models import layers as L
    rng = np.random.default_rng(0)
    H, hd, N, Lq = 12, 64, 768, 50
    D = H * hd
    p = {"in_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, 3, D)).astype(np.float32)),
                     "b": jnp.zeros((3, D), jnp.float32)},
         "out_proj": {"w": jnp.asarray(rng.normal(0, .02, (D, D)).astype(np.float32)),
                      "b": jnp.zeros((D,), jnp.float32)}}
    x = jnp.asarray(rng.normal(size=(N, Lq, D)).astype(np.float32))

    def f(p, x):
        return jnp.sum(L.mha(p, x, H, None, jnp.bfloat16, fused=True)
                       .astype(jnp.float32))
    fn = jax.jit(jax.value_and_grad(f))
    v, g = fn(p, x)
    _ = float(v)

    jax.profiler.start_trace(OUT)
    for _ in range(3):
        v, g = fn(p, x)
    _ = float(v)
    jax.profiler.stop_trace()

    for root, _, files in os.walk(OUT):
        for name in files:
            path = os.path.join(root, name)
            print(path, os.path.getsize(path), flush=True)


if __name__ == "__main__":
    main()

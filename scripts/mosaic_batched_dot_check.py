"""Does Mosaic lower a batched (3D) dot_general inside a Pallas kernel?
Tiny compile probe — prints OK or the compiler error."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

H, R, K = 4, 256, 64


def kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def main():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(H, R, K)),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(H, R, K)),
                    jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, R, R), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = jnp.einsum("hrk,hsk->hrs", a, b)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"batched dot OK, max err {err:.2e}")


if __name__ == "__main__":
    main()

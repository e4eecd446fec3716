"""Where does the fused attention sublayer's ~2.3-2.6x "gap vs FLOP bound"
come from — and is it closable?

Decisive A/B (this script): run the REAL production kernel
(`fused_ln_attention_residual`) at the bench vision-tower shape
[N=768, L=50, D=768] with different head counts.  H·hd = D is fixed, so the
total attention FLOPs are IDENTICAL across configs — only the MXU shape of
the per-head QK^T / P@V contractions changes (hd is their contraction/lane
width; 64 half-fills the 128-wide MXU, 128 fills it).

MEASURED (v5e, 2026-08-18, 100 fwd / 24 fwd+bwd chained inside one jit):

    H=12 hd= 64 (model): fwd 2.267 ms/layer   fwd+bwd 2.939 ms/layer
    H= 6 hd=128        : fwd 1.951 ms/layer   fwd+bwd 2.647 ms/layer
    H= 4 hd=192        : fwd 1.940 ms/layer   fwd+bwd 2.671 ms/layer

Conclusion: eliminating the hd=64 lane-padding entirely (hd=128 fills the
MXU) buys only 14% fwd / 10% fwd+bwd.  The naive FLOP bound (~0.95 ms fwd:
qkv proj 0.69 + out proj 0.23 + attention dots 0.03) is unreachable for
this shape because it is built from several individually-modest,
structurally-required inefficiencies that multiply:
  * grid cells are rows=FB·L=200 → every matmul M-dim pads 200→256 (×1.28);
  * the attention dots contract over hd=64 (×2 on their small share);
  * fp32 softmax + fp32-island LayerNorm are serial VPU passes between the
    MXU ops (≈0.4-0.6 ms/layer that no matmul formulation removes);
  * the _split_heads/_merge_heads relayouts (the only alternative Mosaic
    can lower — see pallas_attention.py:_split_heads — and the head-major
    formulation measured SLOWER, scripts/headmajor_probe.py).
H=12/hd=64 is the model contract (CLIP ViT-B), so none of this is
actionable: the kernel is at its shape-constrained bound.  Don't re-attack
without a fundamentally different decomposition (e.g. cross-frame batching
of the softmax island), and A/B against the numbers above.

Run on the real chip: python scripts/attn_bound_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from neighborretr_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from neighborretr_tpu.ops.pallas_block_attention import (  # noqa: E402
    fused_ln_attention_residual)

N, L, D = 768, 50, 768     # bench vision-tower shape at batch 64 (B*F frames)
FWD_ITERS = 100
FB_LAYERS = 24


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, L, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ps = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
          jnp.asarray(rng.normal(0, .02, (D, 3 * D)).astype(np.float32)),
          jnp.zeros((3 * D,), jnp.float32),
          jnp.asarray(rng.normal(0, .02, (D, D)).astype(np.float32)),
          jnp.zeros((D,), jnp.float32))

    def bench(H, tag):
        @jax.jit
        def fwd(x, ps):
            def body(i, x):
                return fused_ln_attention_residual(x, *ps, H)
            return jnp.sum(
                jax.lax.fori_loop(0, FWD_ITERS, body, x).astype(jnp.float32))

        float(fwd(x, ps))
        tic = time.perf_counter()
        float(fwd(x, ps))
        dt = (time.perf_counter() - tic) / FWD_ITERS

        @jax.jit
        def fb(x, ps):
            def loss(x, ps):
                def body(x, _):
                    return fused_ln_attention_residual(x, *ps, H), None
                y, _ = jax.lax.scan(body, x, None, length=FB_LAYERS)
                return jnp.sum(y.astype(jnp.float32))
            return jax.value_and_grad(loss)(x, ps)[0]

        float(fb(x, ps))
        tic = time.perf_counter()
        float(fb(x, ps))
        dtfb = (time.perf_counter() - tic) / FB_LAYERS
        print(f"{tag}: fwd {dt * 1e3:.3f} ms/layer   "
              f"fwd+bwd {dtfb * 1e3:.3f} ms/layer")

    bench(12, "H=12 hd= 64 (model)")
    bench(6, "H= 6 hd=128        ")
    bench(4, "H= 4 hd=192        ")


if __name__ == "__main__":
    main()

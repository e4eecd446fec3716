"""Compile + run check of the ViT-L/14 backbone on the real chip (fused
attention at L=257, FB=1) — forward and gradient."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from neighborretr_tpu.core.config import ClipConfig, ModelConfig
from neighborretr_tpu.models import neighborretr as model


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = ModelConfig(clip=ClipConfig.vit_l_14(), max_words=24, max_frames=4)
    params = model.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 4
    video = jnp.asarray(rng.integers(0, 256, (B, 4, 224, 224, 3)).astype(np.uint8))
    vmask = jnp.ones((B, 4), jnp.float32)

    def loss(p):
        return jnp.sum(model.get_video_feat(p, cfg, video, vmask) ** 2)

    v, g = jax.jit(jax.value_and_grad(loss))(params)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
    print(f"ViT-L/14 OK: loss={float(v):.3f} grad-l1={gn:.3f}", flush=True)
    assert np.isfinite(float(v)) and np.isfinite(gn)


if __name__ == "__main__":
    main()

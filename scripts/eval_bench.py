"""Eval-path throughput on the real chip: blocked similarity-matrix build
over an MSR-VTT-1kA-sized cache (1000 texts × 1000 videos) plus the encode
rate, the two phases of train/evaluate.py."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from neighborretr_tpu.core.config import Config, ModelConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train.evaluate import similarity_matrix


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = Config(model=ModelConfig())
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    N, T, V, D = 1000, 24, 12, 512

    t_feat = jnp.asarray(rng.normal(size=(N, T, D)).astype(np.float32))
    t_mask = np.ones((N, T), np.float32)
    v_feat = jnp.asarray(rng.normal(size=(N, V, D)).astype(np.float32))
    v_mask = np.ones((N, V), np.float32)

    # phase 2: blocked similarity (evaluator.py:21-63 equivalent)
    sim = similarity_matrix(params, cfg, t_feat, t_mask, v_feat, v_mask)
    tic = time.perf_counter()
    for _ in range(3):
        sim = similarity_matrix(params, cfg, t_feat, t_mask, v_feat, v_mask)
    dt = (time.perf_counter() - tic) / 3
    print(f"similarity matrix {N}x{N}: {dt*1e3:.1f} ms "
          f"({N*N/dt/1e6:.1f}M pairs/s)", flush=True)

    # phase 1: encode rate (batch 128, eval mode = no grads)
    B, F, R = 128, cfg.model.max_frames, cfg.model.clip.image_resolution
    batch_video = jnp.asarray(
        rng.integers(0, 256, (B, F, R, R, 3)).astype(np.uint8))
    vmask = jnp.ones((B, F), jnp.float32)
    ids = jnp.asarray(rng.integers(1, 1000, (B, cfg.model.max_words)),
                      jnp.int32)
    tmask = jnp.ones((B, cfg.model.max_words), jnp.float32)
    enc = jax.jit(lambda p, a, b, c, d: model.get_text_video_feat(
        p, cfg.model, a, b, c, d))
    out = enc(params, ids, tmask, batch_video, vmask)
    _ = float(out[0].sum())
    tic = time.perf_counter()
    for _ in range(5):
        out = enc(params, ids, tmask, batch_video, vmask)
    _ = float(out[0].sum())
    dt = (time.perf_counter() - tic) / 5
    print(f"eval encode: {dt*1e3:.1f} ms/batch-{B} ({B/dt:.0f} pairs/s)",
          flush=True)


if __name__ == "__main__":
    main()

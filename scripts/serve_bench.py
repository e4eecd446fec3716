"""Serving-path throughput on the real chip: free-text queries scored
against a 10k-video index (the serving.py hot path: index features resident
on device, token-interaction similarity per query block).

Compares the fp16 index with the int8 (--feature_dtype int8) variant —
the int8 path adds a device-side dequantize in front of the identical
similarity program.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from neighborretr_tpu import serving
from neighborretr_tpu.core.config import Config, ModelConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train.evaluate import similarity_matrix_device


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = Config(model=ModelConfig())
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    N, Q, T, V, D = 10_000, 64, cfg.model.max_words, cfg.model.max_frames, 512

    v_full = rng.normal(size=(N, V, D)).astype(np.float32)
    v_mask = np.ones((N, V), np.float32)
    t_feat = jnp.asarray(rng.normal(size=(Q, T, D)).astype(np.float32))
    t_mask = np.ones((Q, T), np.float32)

    fp16 = {"v_feat": v_full.astype(np.float16), "v_mask": v_mask}
    q, s = serving.quantize_features(v_full)
    int8 = {"v_feat": q, "v_scale": s, "v_mask": v_mask}

    for name, index in (("fp16", fp16), ("int8", int8)):
        vf = serving.index_video_features(index)
        vm = jnp.asarray(index["v_mask"], jnp.float32)
        sim = similarity_matrix_device(params, cfg, t_feat, t_mask, vf, vm)
        np.asarray(sim)
        tic = time.perf_counter()
        reps = 5
        for _ in range(reps):
            sim = similarity_matrix_device(params, cfg, t_feat, t_mask,
                                           vf, vm)
        sim = np.asarray(sim)
        dt = (time.perf_counter() - tic) / reps
        bytes_idx = index["v_feat"].nbytes + index.get(
            "v_scale", np.empty(0)).nbytes
        print(f"{name}: {Q} queries x {N} videos in {dt * 1e3:.1f} ms "
              f"({Q / dt:.0f} queries/s, {Q * N / dt / 1e6:.0f}M pairs/s); "
              f"index {bytes_idx / 1e6:.0f} MB", flush=True)


if __name__ == "__main__":
    main()

"""Perf probe: time step variants on the real chip to locate the bottleneck.

Usage: python scripts/perf_probe.py [encode|step_remat|step_noremat|losses]...
Each mode compiles once and times N iterations with a final-value host fetch
as the sync point (tunnel-safe).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import create_train_state, fill_bank_step, train_step

BATCH = 64
N = 6


def make_batch(mcfg, rng):
    W, F, R = mcfg.max_words, mcfg.max_frames, mcfg.clip.image_resolution
    vocab = mcfg.clip.vocab_size
    text_ids = rng.integers(1, vocab - 1, size=(BATCH, W)).astype(np.int32)
    text_ids[:, -1] = vocab - 1
    return {
        "text_ids": jnp.asarray(text_ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.integers(0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }


def timeit(name, fn):
    out = fn()                      # compile
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    tic = time.perf_counter()
    for _ in range(N):
        out = fn()
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - tic) / N
    print(f"{name}: {dt*1000:.1f} ms  ({BATCH/dt:.0f} pairs/s)", flush=True)


def main():
    modes = sys.argv[1:] or ["encode", "step_remat", "step_noremat"]
    rng = np.random.default_rng(0)

    for remat in (True, False):
        tag = "remat" if remat else "noremat"
        if f"step_{tag}" not in modes and "encode" not in modes:
            continue
        mcfg = dataclasses.replace(ModelConfig(), remat=remat)
        cfg = Config(model=mcfg, loss=LossConfig(),
                     train=TrainConfig(batch_size=BATCH, mb_batch=4))
        batch = make_batch(mcfg, rng)
        params = model.init_params(jax.random.PRNGKey(0), mcfg)

        if "encode" in modes and remat:
            enc = jax.jit(lambda p, b: model.get_text_video_feat(
                p, mcfg, b["text_ids"], b["text_mask"], b["video"], b["video_mask"]))
            timeit("encode_fwd(noremat-path)", lambda: enc(params, batch))

        if f"step_{tag}" in modes:
            bank = mb.create(cfg.train.memory_bank_capacity, mcfg.max_words,
                             mcfg.max_frames, mcfg.clip.embed_dim)
            for i in range(cfg.train.mb_batch):
                bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
            state = create_train_state(params, bank)

            def run(state=state):
                s, m = train_step(state, batch, jax.random.PRNGKey(1), cfg, 1000)
                return m["loss"]
            timeit(f"train_step {tag}", run)


if __name__ == "__main__":
    main()

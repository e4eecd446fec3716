"""Capture a jax.profiler trace of the full train step on the real chip."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = "/tmp/jtrace_nr"


def main():
    import dataclasses
    from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                              TrainConfig)
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    BATCH = 64
    mcfg = dataclasses.replace(ModelConfig(), remat=False, unroll_layers=True)
    cfg = Config(model=mcfg, loss=LossConfig(),
                 train=TrainConfig(batch_size=BATCH, mb_batch=4))
    rng = np.random.default_rng(0)
    W, F, R = mcfg.max_words, mcfg.max_frames, mcfg.clip.image_resolution
    text_ids = rng.integers(1, mcfg.clip.vocab_size - 1,
                            size=(BATCH, W)).astype(np.int32)
    text_ids[:, -1] = mcfg.clip.vocab_size - 1
    batch = {
        "text_ids": jnp.asarray(text_ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.integers(0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F, mcfg.clip.embed_dim)
    for i in range(cfg.train.mb_batch):
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    state = create_train_state(params, bank)

    state, m = train_step(state, batch, jax.random.PRNGKey(0), cfg, 1000)
    _ = float(m["loss"])

    jax.profiler.start_trace(OUT)
    for i in range(2):
        state, m = train_step(state, batch, jax.random.PRNGKey(i), cfg, 1000)
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    for root, _, files in os.walk(OUT):
        for name in files:
            print(os.path.join(root, name), flush=True)


if __name__ == "__main__":
    main()

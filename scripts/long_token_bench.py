"""Throughput probe for the long-token (64-word/64-frame) recipes — the
ActivityNet/DiDeMo configs (reference README.md:113-133).

Round-1 state: these shapes bypassed all Pallas work via a sequential
lax.map chunked einsum at 56.7 pairs/s (batch 16).  This probe measures the
full train step with the blocked similarity kernel routed in
(ops/pallas_similarity_blocked.py).

    BENCH_BATCH=32 BENCH_MB=2 python scripts/long_token_bench.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
MB_BATCH = int(os.environ.get("BENCH_MB", "2"))      # bank = MB*BATCH
REMAT = os.environ.get("BENCH_REMAT", "1") == "1"
CHUNK = int(os.environ.get("BENCH_CHUNK", "0"))   # frame-chunked remat
MEASURE_STEPS = int(os.environ.get("BENCH_STEPS", "8"))


def main():
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                              TrainConfig)
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    mcfg = dataclasses.replace(ModelConfig(), max_words=64, max_frames=64,
                               remat=REMAT, unroll_layers=not REMAT,
                               remat_policy=os.environ.get(
                                   "BENCH_REMAT_POLICY", "full"),
                               video_chunk_frames=CHUNK)
    from neighborretr_tpu.core.config import OptimizerConfig
    cfg = Config(model=mcfg, loss=LossConfig(),
                 optim=OptimizerConfig(moments_dtype=os.environ.get(
                     "BENCH_MOMENTS", "float32"),
                     moments_placement=os.environ.get(
                         "BENCH_PLACEMENT", "device")),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB_BATCH,
                                   bank_dtype=os.environ.get(
                                       "BENCH_BANK_DTYPE", "float32"),
                                   bank_placement=os.environ.get(
                                       "BENCH_BANK_PLACEMENT", "device"),
                                   micro_batches=int(os.environ.get(
                                       "BENCH_MICRO", "1"))))
    print(f"# device: {jax.devices()[0]}  batch={BATCH} bank="
          f"{cfg.train.memory_bank_capacity} remat={REMAT}", file=sys.stderr)

    rng = np.random.default_rng(0)
    W, F, R = mcfg.max_words, mcfg.max_frames, mcfg.clip.image_resolution
    vocab = mcfg.clip.vocab_size
    text_ids = rng.integers(1, vocab - 1, size=(BATCH, W)).astype(np.int32)
    text_ids[:, -1] = vocab - 1
    batch = {
        "text_ids": jnp.asarray(text_ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(
            rng.integers(0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }

    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     mcfg.clip.embed_dim, feat_dtype=cfg.train.bank_dtype)
    # carried state must START in its configured home: a device-resident
    # bank entering the host-placement program lowers to an hbm→hbm DMA
    # the AOT compiler rejects
    bank = mb.place_bank(bank, cfg.train.bank_placement)
    for i in range(cfg.train.mb_batch):
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    state = create_train_state(params, bank,
                               moments_dtype=cfg.optim.moments_dtype,
                               moments_placement=cfg.optim.moments_placement)

    # Warm until the step time STABILIZES (two consecutive fetch-synced
    # steps within 20%): the axon tunnel serves a new process from a slow
    # fallback executable until its optimized compile lands minutes in
    # (round-4 finding, PARITY "From-files") — 2 fixed warmup steps
    # under-warm and record the fallback's time, not the chip's.
    prev = None
    for i in range(40):
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i),
                                    cfg, 1000)
        _ = float(metrics["loss"])
        dt = time.perf_counter() - t0
        if prev is not None and i >= 2 and abs(dt - prev) < 0.2 * prev:
            print(f"# warm stable at iter {i}: {dt:.2f}s/step",
                  file=sys.stderr)
            break
        prev = dt

    tic = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(100 + i),
                                    cfg, 1000)
    _ = float(metrics["loss"])
    elapsed = time.perf_counter() - tic

    pairs = BATCH * MEASURE_STEPS / elapsed
    print(f"# {MEASURE_STEPS} steps in {elapsed:.2f}s "
          f"({elapsed / MEASURE_STEPS * 1e3:.0f} ms/step), "
          f"loss={float(metrics['loss']):.4f}", file=sys.stderr)
    print(json.dumps({
        "metric": "train pairs/sec/chip (ViT-B/32, 64w/64f, full losses)",
        "value": round(pairs, 2), "unit": "pairs/s",
        "batch": BATCH, "bank": cfg.train.memory_bank_capacity,
    }))


if __name__ == "__main__":
    main()

"""Steady-state integrated from-files throughput (packed corpus, real chip).

Why this exists (round 4): driving cli/train.py over the axon tunnel on this
1-core host measures two environment artifacts, not the framework —
(a) the tunnel runs a slow fallback executable (~30 s/step) until its
background optimization lands minutes into the process, and (b) the chunked
H2D protocol starves under GIL contention with the loader's producer thread
(173 MB batch uploads collapse 1.2 GB/s → ~30 MB/s when any Python thread is
busy; measured, PARITY "From-files").  Neither exists on a real TPU-VM host
(local PCIe DMA, ≥28 cores/chip).

This bench removes both artifacts without faking the work:
  1. warms until the optimized executable is live (step < 0.6 s),
  2. runs ONE pipeline thread that alternates batch assembly (packed read +
     RandAugment) and the blocking device upload — serial on one thread, so
     neither starves the other on a 1-core host,
  3. chains donated train steps on the main thread, ONE loss fetch per
     epoch (bench.py's measurement convention).

Prints one JSON line.  Usage (after cli/pack_dataset.py on the tree built
by files_throughput_drive.py):

    python scripts/files_steady_bench.py [--augment POLICY|''] [--epochs 2]
"""
import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/nrtpu_files_drive")
    ap.add_argument("--packed", default="/tmp/nrtpu_files_drive/packed")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--augment", default="rand-m7-n4-mstd0.5-inc1")
    ap.add_argument("--epochs", type=int, default=2,
                    help="measured epochs after warm (median of per-epoch "
                         "pairs/s)")
    ap.add_argument("--synthetic_ref", type=float, default=346.2)
    args = ap.parse_args()

    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from neighborretr_tpu.core.config import (Config, LossConfig,
                                              ModelConfig, TrainConfig)
    from neighborretr_tpu.data.loader import BatchLoader
    from neighborretr_tpu.data.registry import build_dataset
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    mcfg = dataclasses.replace(ModelConfig(), remat=False, unroll_layers=True)
    cfg = Config(model=mcfg, loss=LossConfig(),
                 train=TrainConfig(batch_size=args.batch, mb_batch=1))
    ds = build_dataset(
        "msrvtt", "train", os.path.join(args.root, "anns"),
        os.path.join(args.root, "videos"), ClipTokenizer(),
        max_words=24, max_frames=12, resolution=224, video_framerate=1,
        packed_dir=args.packed, is_train=True,
        augment=args.augment or None, augment_backend="auto", seed=42)
    dev0 = jax.devices()[0]
    print(f"# device: {dev0}", file=sys.stderr)

    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(args.batch, 24, 12, mcfg.clip.embed_dim)
    warm_loader = BatchLoader(ds, args.batch, shuffle=True, drop_last=True,
                              workers=1, seed=7, prefetch=0)
    warm_loader.set_epoch(0)
    wb = {k: jax.device_put(jnp.asarray(v), dev0)
          for k, v in next(iter(warm_loader)).items()}
    bank = fill_bank_step(params, bank, wb, cfg, 0)
    state = create_train_state(params, bank)

    # 1. warm out of the tunnel's fallback-executable regime
    tic = time.perf_counter()
    for i in range(120):
        t0 = time.perf_counter()
        state, metrics = train_step(state, wb, jax.random.PRNGKey(i), cfg,
                                    1000)
        _ = float(metrics["loss"])
        if time.perf_counter() - t0 < 0.6:
            break
    warm_s = time.perf_counter() - tic
    print(f"# warm: optimized executable after {warm_s:.0f}s", file=sys.stderr)

    drop = ("valid", "video_hash")
    epoch_rates = []
    host_ms_clip = []
    for epoch in range(1, 1 + args.epochs):
        loader = BatchLoader(ds, args.batch, shuffle=True, drop_last=True,
                             workers=1, seed=42, prefetch=0)
        loader.set_epoch(epoch)

        # 2. one pipeline thread: assemble THEN upload, serially — the
        # 1-core-honest overlap (it runs while the main thread waits on the
        # chip); queue depth 2 = the same double buffering as production
        q: queue.Queue = queue.Queue(maxsize=2)
        t_host = [0.0]

        def produce():
            for host_b in loader:
                h0 = time.perf_counter()
                batch = {k: jax.device_put(jnp.asarray(v), dev0)
                         for k, v in host_b.items() if k not in drop}
                jax.block_until_ready(batch)
                t_host[0] += time.perf_counter() - h0
                q.put(batch)
            q.put(None)

        th = threading.Thread(target=produce, daemon=True)
        n = 0
        tic = time.perf_counter()
        th.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            state, metrics = train_step(state, batch,
                                        jax.random.PRNGKey(1000 * epoch + n),
                                        cfg, 1000)
            n += 1
        loss = float(metrics["loss"])       # ONE sync per epoch
        dt = time.perf_counter() - tic
        th.join()
        assert np.isfinite(loss)
        epoch_rates.append(args.batch * n / dt)
        host_ms_clip.append(t_host[0] / (n * args.batch) * 1000)
        print(f"# epoch {epoch}: {n} steps in {dt:.1f}s = "
              f"{epoch_rates[-1]:.2f} pairs/s "
              f"(host+upload {host_ms_clip[-1]:.1f} ms/clip)", file=sys.stderr)

    rate = float(np.median(epoch_rates))
    print(json.dumps({
        "metric": ("from-files steady pairs/s (packed read + "
                   f"{'augment + ' if args.augment else ''}upload + step, "
                   "1 host core, single final fetch/epoch)"),
        "value": round(rate, 2),
        "unit": "pairs/s",
        "epoch_rates": [round(r, 2) for r in epoch_rates],
        "host_upload_ms_per_clip_per_core": round(float(np.median(host_ms_clip)), 2),
        "warm_s": round(warm_s, 1),
        "vs_synthetic": round(rate / args.synthetic_ref, 3),
        "augment": args.augment or "off",
    }))


if __name__ == "__main__":
    main()

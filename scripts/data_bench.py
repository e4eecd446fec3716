"""Host data-pipeline throughput: BatchLoader items/s, augment cost, H2D.

The training step consumes ~340 clips/s on one v5e chip (bench.py); this
script measures whether the host side can feed that. Synthetic frames skip
cv2 decode, so the numbers isolate (a) batch assembly + threading, (b)
RandAugment cost per clip, (c) the device-prefetch upload path. For decode
throughput on real files, point --video_dir at a directory of mp4s.

NOTE: the round-1 dev box exposes ONE CPU core (nproc=1 container limit), so
its numbers (28 clips/s synthetic, 13 with RandAugment) measure single-core
Python/PIL cost, not the pipeline design — threads cannot help without
cores.  Budget ~0.07 core-seconds/clip for augmentation when sizing real
TPU-VM hosts (100+ cores feed ~1400+ clips/s).

Usage: python scripts/data_bench.py [--workers N] [--video_dir DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_loader(ds, batch, workers, tag, n_batches=8, prefetch=2,
                 worker_mode="thread"):
    from neighborretr_tpu.data.loader import BatchLoader
    loader = BatchLoader(ds, batch, shuffle=True, drop_last=True,
                         workers=workers, prefetch=prefetch,
                         worker_mode=worker_mode)
    it = iter(loader)
    next(it)                                   # warm the pool
    tic = time.perf_counter()
    n = 0
    for b in it:
        n += b["idx"].shape[0]
        if n >= n_batches * batch:
            break
    dt = time.perf_counter() - tic
    print(f"[{tag}] {n / dt:8.1f} clips/s  ({workers} workers, batch {batch})",
          flush=True)
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--worker_mode", choices=["thread", "process"],
                    default="thread")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--video_dir", default=None,
                    help="directory of .mp4 files for a real-decode run")
    args = ap.parse_args()

    from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset

    n = args.batch * 12
    base = SyntheticDataset(n=n, max_words=24, max_frames=12, resolution=224)
    bench_loader(base, args.batch, args.workers, "synthetic, no augment",
                 worker_mode=args.worker_mode)

    class AugSyn(SyntheticDataset):
        def __init__(self, backend="pil", **kw):
            super().__init__(**kw)
            from neighborretr_tpu.data.augment import create_random_augment
            self._aug = create_random_augment(
                "rand-m7-n4-mstd0.5-inc1", rng=np.random.default_rng(0),
                backend=backend)

        def item(self, i):
            out = super().item(i)
            out["video"] = self._aug(out["video"])
            return out

    bench_loader(AugSyn(n=n, max_words=24, max_frames=12, resolution=224),
                 args.batch, args.workers, "synthetic + RandAugment (pil)",
                 worker_mode=args.worker_mode)

    from neighborretr_tpu.data import native
    if native.available():
        bench_loader(
            AugSyn(backend="native", n=n, max_words=24, max_frames=12,
                   resolution=224),
            args.batch, args.workers, "synthetic + RandAugment (native C++)",
            worker_mode=args.worker_mode)
    else:
        print(f"[native backend unavailable: {native.load_error()}]")

    if args.video_dir:
        from neighborretr_tpu.data.datasets.base import RetrievalDataset
        from neighborretr_tpu.data.tokenizer import ClipTokenizer
        vids = sorted(f for f in os.listdir(args.video_dir)
                      if f.endswith(".mp4"))
        pairs = [(v, f"caption {i}", None, None) for i, v in enumerate(vids)]
        paths = {v: os.path.join(args.video_dir, v) for v in vids}
        ds = RetrievalDataset(pairs, paths, ClipTokenizer(), is_train=True)
        bench_loader(ds, min(args.batch, max(1, len(ds) // 2)), args.workers,
                     "real decode + RandAugment", n_batches=4,
                     worker_mode=args.worker_mode)

    # device upload path (needs an accelerator; skipped silently on failure)
    try:
        import jax
        from neighborretr_tpu.data.device_prefetch import prefetch_to_device
        loader = __import__("neighborretr_tpu.data.loader",
                            fromlist=["BatchLoader"]).BatchLoader(
            base, args.batch, shuffle=False, drop_last=True,
            workers=args.workers)
        it = prefetch_to_device(loader, size=2)
        first = next(it)
        jax.block_until_ready(first["video"])
        tic = time.perf_counter()
        n = args.batch
        last = first
        for b in it:
            n += b["idx"].shape[0]
            last = b
        jax.block_until_ready(last["video"])
        dt = time.perf_counter() - tic
        print(f"[H2D prefetch] {n / dt:8.1f} clips/s to "
              f"{jax.devices()[0].platform}", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"[H2D prefetch] skipped: {e}", flush=True)


if __name__ == "__main__":
    main()

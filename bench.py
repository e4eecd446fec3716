"""Benchmark: per-chip video-text pairs/sec on the full training step.

Measures the flagship configuration — CLIP ViT-B/32, 12 frames @ 224, 24-word
captions, all four hubness losses, memory-bank refresh — end-to-end through the
jitted train step (forward + backward + BertAdam), on whatever accelerator JAX
exposes (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against REFERENCE_PAIRS_PER_SEC_PER_GPU — the reference
repo publishes no throughput numbers (BASELINE.md), so this is a documented
engineering estimate for the PyTorch reference on a single modern GPU (global
batch 128 on 4 GPUs, CLIP4Clip-lineage trainers measure ~30-60 pairs/s/GPU);
we use the midpoint.  The north-star target is ≥5× (BASELINE.json).

The estimate is bracketed by a MEASURED same-hardware ratio
(scripts/baseline_cpu_measure.py, 2026-08-17, this machine's CPU, fp32,
identical shapes): reference torch 101.2 s/step vs ours 50.1 s/step at
batch 8 — this framework is 2.02× the reference on identical silicon
before any TPU-kernel advantage; see BASELINE.md.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_PAIRS_PER_SEC_PER_GPU = 45.0
# FLOPs-normalized upper bound for the reference on a modern GPU (BASELINE.md
# "Analytic upper bound"): analytic per-pair step FLOPs (utils/flops.py,
# roofline-validated) ÷ A100 bf16 peak × a generous 40% MFU ceiling for a
# PyTorch DDP fine-tune trainer.  The reference could not exceed this even at
# speed-of-light; vs_flop_bound is therefore the most conservative possible
# reading of the comparison, and vs_estimate (= the 45 pairs/s engineering
# estimate) the headline one.
A100_BF16_PEAK_FLOPS = 312e12
REFERENCE_GENEROUS_MFU = 0.40
# Measured on THIS machine's CPU (scripts/baseline_cpu_measure.py, batch 8,
# fp32, identical shapes): the reference takes 101.2 s/step → 0.079 pairs/s.
# Used as the denominator only in the CPU-fallback path below.
REFERENCE_CPU_PAIRS_PER_SEC_BATCH8 = 8 / 101.2

import os

CPU_FALLBACK = bool(os.environ.get("BENCH_CPU_FALLBACK"))
BATCH = int(os.environ.get("BENCH_BATCH", "96"))  # v5e sweep optimum
MB_BATCH = int(os.environ.get("BENCH_MB", "4"))  # bank = MB*BATCH
# "vit_b_32" (default, the flagship/driver config) or "vit_b_16"
# (BASELINE.json's ViT-B/16 config; 197 tokens/frame — use a smaller batch)
BACKBONE = os.environ.get("BENCH_BACKBONE", "vit_b_32")
WARMUP_STEPS = 1 if CPU_FALLBACK else 2
MEASURE_STEPS = int(os.environ.get(           # noise ~±3%; long stable window
    "BENCH_STEPS", "2" if CPU_FALLBACK else "16"))


def _ensure_usable_backend():
    """Probe the default JAX backend in a bounded child process; if it hangs
    (tunnel down) or dies (e.g. libtpu version mismatch), re-exec this script
    pinned to CPU with an honest fallback config.  The recorded vs_baseline is
    then the measured same-CPU reference ratio (BASELINE.md) — a degraded but
    truthful record instead of a hung or red bench run."""
    if CPU_FALLBACK:
        return
    from neighborretr_tpu.utils.backend import probe_default_backend
    ok, reason = probe_default_backend()
    if ok:
        return
    print(f"# accelerator backend unusable ({reason[:200]}) — "
          "falling back to a CPU measurement; vs_baseline becomes the "
          "measured same-CPU reference ratio (BASELINE.md)", file=sys.stderr)
    env = dict(os.environ)
    # pin the ENTIRE fallback config to the shape of the measured same-CPU
    # baseline (ViT-B/32, batch 8, bank 16 — scripts/baseline_cpu_measure.py)
    # so the reported ratio compares like with like, whatever knobs the
    # original invocation carried
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               BENCH_CPU_FALLBACK="1", BENCH_BATCH="8", BENCH_MB="2",
               BENCH_BACKBONE="vit_b_32", BENCH_MICRO="1",
               BENCH_MOMENTS="float32")
    env.pop("BENCH_REMAT", None)
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def main():
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                              TrainConfig)
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    # tuned flagship config (v5e sweep): NO remat + unrolled layer loop —
    # with the fused attention kernel the full activation set fits HBM (the
    # XLA attention's padded [.,50,50] probs were what OOM'd), and skipping
    # all recompute measures 228 ms/step vs 306 ms full-remat at batch 64.
    # Fused attention + bank-similarity Pallas kernels resolve automatically.
    # BENCH_REMAT=0/1 flips rematerialization for ANY backbone.  Tuned
    # defaults: vit_b_32 and vit_b_16 win without remat on v5e (the fused
    # attention kernel keeps activations within HBM; B/16 A/B: 96.0 vs 79.0
    # pairs/s); vit_l_14 (~18x the B/32 vision FLOPs/frame) needs remat on.
    default_remat = "1" if BACKBONE.startswith("vit_l") else "0"
    remat = os.environ.get("BENCH_REMAT", default_remat) == "1"
    # remat granularity sweep knob (layers.REMAT_POLICIES keys): "full"
    # (save carry only), "dots" (save the three matmul outputs), or "attn"
    # (save the attention sublayer output) — only read when remat on
    remat_policy = os.environ.get("BENCH_REMAT_POLICY", "full")
    remat_skip_last = int(os.environ.get("BENCH_REMAT_SKIP_LAST", "0"))
    mcfg = dataclasses.replace(ModelConfig(), remat=remat, unroll_layers=True,
                               remat_policy=remat_policy,
                               remat_skip_last=remat_skip_last)
    if CPU_FALLBACK:
        # fp32 on CPU, matching scripts/baseline_cpu_measure.py's reference
        # measurement (the torch reference runs fp32 on CPU)
        mcfg = dataclasses.replace(mcfg, compute_dtype="float32")
    if BACKBONE != "vit_b_32":
        from neighborretr_tpu.core.config import ClipConfig
        mcfg = dataclasses.replace(mcfg, clip=getattr(ClipConfig, BACKBONE)())
    from neighborretr_tpu.core.config import DataConfig, OptimizerConfig
    # BENCH_AUGMENT=device adds the on-chip RandAugment stage to the step
    # (ops/device_augment.py) — the A/B knob for its step-time cost; the
    # default keeps the flagship step exactly as in prior rounds
    aug_backend = os.environ.get("BENCH_AUGMENT", "")
    cfg = Config(model=mcfg, loss=LossConfig(),
                 optim=OptimizerConfig(moments_dtype=os.environ.get(
                     "BENCH_MOMENTS", "float32")),
                 data=DataConfig(max_words=mcfg.max_words,
                                 max_frames=mcfg.max_frames,
                                 augment_backend=aug_backend or "auto",
                                 train_augment=bool(aug_backend)),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB_BATCH,
                                   micro_batches=int(
                                       os.environ.get("BENCH_MICRO", "1"))))

    dev = jax.devices()[0]
    print(f"# bench device: {dev}", file=sys.stderr)

    from neighborretr_tpu.data.datasets.synthetic import make_synthetic_batch
    W, F = mcfg.max_words, mcfg.max_frames

    def make_batch(seed):
        # all-ones masks (variable_lengths=False): the bench's stable-shape
        # measurement convention — shared builder with __graft_entry__
        host = make_synthetic_batch(mcfg, BATCH, seed, variable_lengths=False)
        return {k: jnp.asarray(v) for k, v in host.items()}

    # rotate distinct device-resident batches so the measurement can't
    # degenerate to a single cached input (input variation without H2D cost
    # in the loop — scripts/data_bench.py covers the host pipeline itself)
    batches = [make_batch(s) for s in range(4)]
    batch = batches[0]

    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F, mcfg.clip.embed_dim)
    for i in range(cfg.train.mb_batch):
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    state = create_train_state(params, bank,
                               moments_dtype=cfg.optim.moments_dtype)

    t_total = 1000
    # warmup (compile). NOTE: a host-side value fetch (float(...)) is the
    # synchronization point — on tunneled platforms block_until_ready can
    # return before device execution finishes, which would inflate the number.
    for i in range(WARMUP_STEPS):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i),
                                    cfg, t_total)
    _ = float(metrics["loss"])

    tic = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = train_step(state, batches[i % len(batches)],
                                    jax.random.PRNGKey(100 + i),
                                    cfg, t_total)
    # One host fetch of the LAST step's loss: each step consumes the previous
    # step's state, so this value transferring implies the whole chain ran.
    _ = float(metrics["loss"])
    elapsed = time.perf_counter() - tic

    pairs_per_sec = BATCH * MEASURE_STEPS / elapsed
    print(f"# {MEASURE_STEPS} steps x batch {BATCH} in {elapsed:.2f}s, "
          f"loss={float(metrics['loss']):.4f}", file=sys.stderr)
    flops = 0.0
    try:
        if CPU_FALLBACK:
            raise RuntimeError("skip MFU readout (v5e-peak-specific)")
        # informational MFU from XLA's own cost model (v5e bf16 peak ≈ 197e12)
        cost = (train_step.lower(state, batch, jax.random.PRNGKey(0), cfg,
                                 t_total).compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", 0.0))
        if flops > 0:
            mfu = flops * MEASURE_STEPS / elapsed / 197e12
            print(f"# est MFU {100 * mfu:.1f}% (XLA cost model — a FLOOR: "
                  f"Pallas custom-call FLOPs are invisible to it; analytic "
                  f"step MFU is ~56% — scripts/roofline.py, PARITY.md)",
                  file=sys.stderr)
    except Exception:
        pass
    name = (BACKBONE.replace("vit_b_", "ViT-B/").replace("vit_l_", "ViT-L/")
            .replace("14_336", "14@336px"))   # match the zoo/CLI name
    res = mcfg.clip.image_resolution
    if CPU_FALLBACK:
        # vs the reference measured on the SAME CPU.  The self-heal re-exec
        # pins ViT-B/32 @ batch 8 = exactly the measured baseline shape; a
        # manual BENCH_CPU_FALLBACK=1 run with other knobs gets the linear
        # batch extrapolation, flagged as such in the metric name.
        ref_cpu = REFERENCE_CPU_PAIRS_PER_SEC_BATCH8 * (BATCH / 8.0)
        # every knob the self-heal path pins must match the measured baseline
        # shape or the ratio is not like-for-like (BENCH_MB changes the bank,
        # BENCH_MICRO/BENCH_MOMENTS/BENCH_REMAT change the step itself)
        matches_baseline = (
            BATCH == 8 and BACKBONE == "vit_b_32" and MB_BATCH == 2
            and int(os.environ.get("BENCH_MICRO", "1")) == 1
            and os.environ.get("BENCH_MOMENTS", "float32") == "float32"
            and "BENCH_REMAT" not in os.environ)
        caveat = ("" if matches_baseline
                  else "; CONFIG DIFFERS from the measured baseline shape "
                       "(ViT-B/32 @ batch 8, bank 16, monolithic fp32) — "
                       "ratio batch-extrapolated")
        print(json.dumps({
            "metric": (f"train pairs/sec ({name}, 12f@{res}, full hubness "
                       "losses) [CPU FALLBACK — accelerator unavailable; "
                       "vs_baseline = measured same-CPU reference ratio"
                       f"{caveat}]"),
            "value": round(pairs_per_sec, 3),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_sec / ref_cpu, 3),
        }))
        return
    record = {
        "metric": f"train pairs/sec/chip ({name}, 12f@{res}, full hubness losses)",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC_PER_GPU, 3),
        "vs_estimate": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC_PER_GPU, 3),
    }
    # speed-of-light bound for the reference on an A100 at the same math
    # (same per-pair FLOPs — the losses and towers are the reference's):
    # even a 40%-MFU reference could not beat this denominator.  Headline
    # vs_flop_bound uses the ANALYTIC per-pair FLOPs (utils/flops.py,
    # validated by scripts/roofline.py — flagship 319.2 GFLOP/pair); the
    # XLA-cost-model variant is demoted to *_costmodel because the cost
    # model undercounts Pallas custom-call FLOPs ~1.5x, which made the
    # round-2/3 recorded bound too generous to the reference (VERDICT r3 #4).
    from neighborretr_tpu.utils.flops import analytic_pair_flops
    pair_flops = analytic_pair_flops(cfg)
    bound = REFERENCE_GENEROUS_MFU * A100_BF16_PEAK_FLOPS / pair_flops
    record["vs_flop_bound"] = round(pairs_per_sec / bound, 3)
    record["flop_bound_pairs_per_sec"] = round(bound, 1)
    record["flop_bound_note"] = (
        "analytic matmul FLOPs (utils/flops.py, roofline-validated "
        f"{pair_flops / 1e9:.1f} GFLOP/pair) / A100 bf16 peak x 40% MFU "
        "ceiling granted to the reference")
    if flops > 0:
        # the old cost-model-derived figure, kept for cross-round continuity
        bound_cm = (REFERENCE_GENEROUS_MFU * A100_BF16_PEAK_FLOPS
                    / (flops / BATCH))
        record["vs_flop_bound_costmodel"] = round(pairs_per_sec / bound_cm, 3)
        record["flop_bound_costmodel_note"] = (
            "XLA cost-model FLOPs — a known UNDERCOUNT (Pallas custom-call "
            "FLOPs invisible), making this bound over-generous to the "
            "reference; superseded by the analytic vs_flop_bound")
    print(json.dumps(record))


if __name__ == "__main__":
    _ensure_usable_backend()
    main()

"""Per-phase roofline for the FULL ActivityNet recipe (batch 128 /
bank 1920 / 64w/64f) on one v5e — the long-token analogue of
scripts/roofline.py (which covers the flagship shape).

Phases timed as fetch-synced grad probes reducing over EVERY grad leaf
(the round-3 DCE trap), against analytic 2MNK FLOPs from utils/flops.py.
Answers VERDICT r4 #3's "or" branch: where do the 2.8 s/step go, and is
the remaining gap an irreducible HBM-fit tax?

    BENCH_CHUNK=256 BENCH_MOMENTS=bfloat16 python scripts/long_token_roofline.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neighborretr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                          OptimizerConfig, TrainConfig)
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import (compute_losses, create_train_state,
                                         fill_bank_step, train_step)
from neighborretr_tpu.utils.flops import analytic_step_phase_flops

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
MB_BATCH = int(os.environ.get("BENCH_MB", "15"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "256"))
N_ITER = int(os.environ.get("BENCH_STEPS", "4"))
PEAK = 197e12


def timeit(name, jitted, *args, flops=0.0):
    out = jitted(*args)
    _ = float(out) if hasattr(out, "dtype") else None
    # settle: repeat the warm step until stable (tunnel fallback regime)
    prev = None
    for _i in range(20):
        t0 = time.perf_counter()
        out = jitted(*args)
        _ = float(out) if hasattr(out, "dtype") else None
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) < 0.2 * prev:
            break
        prev = dt
    tic = time.perf_counter()
    for _ in range(N_ITER):
        out = jitted(*args)
    _ = float(out) if hasattr(out, "dtype") else None
    ms = (time.perf_counter() - tic) / N_ITER * 1000
    bound = flops / PEAK * 1000
    ratio = f"{ms / bound:5.2f}x" if bound > 0 else "     —"
    print(f"{name:34s} {ms:9.1f} ms  {flops / 1e12:6.2f} TF  "
          f"bound {bound:7.1f} ms  {ratio}", flush=True)
    return ms


def main():
    mcfg = dataclasses.replace(ModelConfig(), max_words=64, max_frames=64,
                               remat=True,
                               remat_policy=os.environ.get(
                                   "BENCH_REMAT_POLICY", "full"),
                               video_chunk_frames=CHUNK)
    cfg = Config(model=mcfg, loss=LossConfig(),
                 optim=OptimizerConfig(moments_dtype=os.environ.get(
                     "BENCH_MOMENTS", "bfloat16")),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB_BATCH,
                                   bank_dtype=os.environ.get(
                                       "BENCH_BANK_DTYPE", "float32")))
    W, F, R = 64, 64, mcfg.clip.image_resolution
    E = mcfg.clip.embed_dim
    M_BANK = cfg.train.memory_bank_capacity
    ph = analytic_step_phase_flops(cfg)
    print(f"device: {jax.devices()[0]}  batch {BATCH} bank {M_BANK} "
          f"chunk {CHUNK} policy {mcfg.remat_policy}", flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, mcfg.clip.vocab_size - 1,
                       size=(BATCH, W)).astype(np.int32)
    ids[:, -1] = mcfg.clip.vocab_size - 1
    batch = {
        "text_ids": jnp.asarray(ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.integers(
            0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(M_BANK, W, F, E, feat_dtype=cfg.train.bank_dtype)
    for i in range(2):                       # 2 fills suffice for timing
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    t_feat, v_feat = jax.jit(lambda p: model.get_text_video_feat(
        p, mcfg, batch["text_ids"], batch["text_mask"], batch["video"],
        batch["video_mask"]))(params)
    t_feat = jax.block_until_ready(t_feat)
    key = jax.random.PRNGKey(1)
    tm, vm = batch["text_mask"], batch["video_mask"]

    # full step (fetch-synced, warm-stabilized)
    state = create_train_state(params, bank,
                               moments_dtype=cfg.optim.moments_dtype)

    @jax.jit
    def full_step(state):
        state, metrics = train_step(state, batch, key, cfg, 1000)
        return state, metrics["loss"]

    state, out = full_step(state)
    _ = float(out)
    prev = None
    for _i in range(20):
        t0 = time.perf_counter()
        state, out = full_step(state)
        _ = float(out)
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) < 0.2 * prev:
            break
        prev = dt
    tic = time.perf_counter()
    for _ in range(N_ITER):
        state, out = full_step(state)
    _ = float(out)
    step_ms = (time.perf_counter() - tic) / N_ITER * 1000
    step_fl = (3 * (ph["vis_attn_fwd"] + ph["vis_mlp_fwd"] + ph["txt_fwd"]
                    + ph["tmp_fwd"] + ph["sim_bb_fwd"] + ph["sim_bank_fwd"]
                    + ph["ctm_fwd"]) + ph["stem_fwd"] + 3 * ph["vis_proj_fwd"])
    print(f"{'FULL train step':34s} {step_ms:9.1f} ms  {step_fl/1e12:6.2f} TF"
          f"  bound {step_fl/PEAK*1000:7.1f} ms  "
          f"{step_ms/(step_fl/PEAK*1000):5.2f}x  "
          f"({BATCH / step_ms * 1000:.1f} pairs/s)", flush=True)

    # video tower f+b (chunked + remat, as in the step)
    def vfb():
        def loss(p):
            return jnp.sum(jnp.square(model.get_video_feat(
                p, mcfg, batch["video"], batch["video_mask"])))
        return jax.jit(lambda p: sum(jnp.sum(jnp.square(g))
                                     for g in jax.tree.leaves(
                                         jax.grad(loss)(p))))

    timeit("video tower f+b (chunked+remat)", vfb(), params,
           flops=3 * (ph["vis_attn_fwd"] + ph["vis_mlp_fwd"]
                      + ph["vis_proj_fwd"]) + ph["stem_fwd"])

    def tfb():
        def loss(p):
            return jnp.sum(jnp.square(model.get_text_feat(
                p, mcfg, batch["text_ids"], batch["text_mask"])))
        return jax.jit(lambda p: sum(jnp.sum(jnp.square(g))
                                     for g in jax.tree.leaves(
                                         jax.grad(loss)(p))))

    timeit("text tower f+b (64 tokens)", tfb(), params,
           flops=3 * ph["txt_fwd"])

    # loss side: everything downstream of the encoders at bank 1920
    def lossfb():
        real = model.get_text_video_feat

        def loss(p, tf_, vf_):
            model.get_text_video_feat = lambda *a, **k: (tf_, vf_)
            try:
                total, _ = compute_losses(p, cfg, batch, bank, key)
            finally:
                model.get_text_video_feat = real
            return total
        return jax.jit(lambda p, tf_, vf_: sum(
            jnp.sum(jnp.square(g)) for g in jax.tree.leaves(
                jax.grad(loss, argnums=(0, 1, 2))(p, tf_, vf_))))

    timeit("loss side f+b (sim+bank+CTM)", lossfb(), params, t_feat, v_feat,
           flops=3 * (ph["sim_bb_fwd"] + ph["sim_bank_fwd"] + ph["ctm_fwd"]))

    def simfb():
        def loss(tf_):
            s = model.local_similarity(params, tf_, v_feat, tm, vm, False)
            return jnp.sum(jnp.square(s))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  local sim BxB f+b", simfb(), t_feat,
           flops=3 * ph["sim_bb_fwd"])

    use_pallas = model.resolve_use_pallas(mcfg)

    def bankfb():
        def loss(tf_):
            if use_pallas and model.bank_fusion_supported(mcfg):
                s = model.bank_centrality(params, tf_, bank.feat_v, tm,
                                          bank.mask_v, axis=1,
                                          sim_dtype=mcfg.sim_dtype)
            else:
                s = model.local_similarity(params, tf_, bank.feat_v, tm,
                                           bank.mask_v, use_pallas,
                                           sim_dtype=mcfg.sim_dtype)
            return jnp.sum(jnp.square(s))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  bank sim f+b (one direction)", bankfb(), t_feat,
           flops=3 * ph["sim_bank_fwd"] / 2)


if __name__ == "__main__":
    main()

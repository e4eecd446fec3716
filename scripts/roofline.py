"""One-table step roofline for the flagship config (VERDICT r2 item 5).

Measures every phase of the batch-96 training step on the real chip —
vision tower (attn/MLP split by ablation), text tower, temporal
transformer, loss side (B×B sim / bank / CTM split), BertAdam — each as a
jitted scalar-reducing probe (tunnel measurement rules: scripts/ablate.py
header), against each phase's ANALYTIC matmul FLOPs at the v5e bf16 peak
(197 TFLOP/s).

Why analytic, not XLA cost_analysis: (a) Pallas custom calls are invisible
to the cost model — any probe containing the fused attention or bank
kernels under-reports (measured: the "video f+b no-mlp" probe shows
0.27 TF for a program whose attention algebra alone is ~10 TF); (b) even
for pure-XLA programs the cost model reports backward below the algebraic
dW+dx = 2×fwd (measured 2.0× fwd for the in-tower MLP f+b vs the
algebraic 3×).  Analytic FLOPs use the standard 2·M·N·K per matmul and
f+b = 3×fwd (dW + dx each 2MNK), which makes the bounds conservative and
self-consistent; elementwise/softmax/LN FLOPs are excluded (they are why
a ratio of 1.0 is unreachable for VPU-heavy phases).

Usage: python scripts/roofline.py  (BENCH_BATCH=96 default)
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
from neighborretr_tpu.models import layers as L
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import bertadam
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import (compute_losses, create_train_state,
                                         fill_bank_step, train_step)

BATCH = int(os.environ.get("BENCH_BATCH", "96"))
MB_BATCH = int(os.environ.get("BENCH_MB", "4"))
N_ITER = 16
PEAK = 197e12

table = []


def timeit(name, jitted, *args, flops=0.0, note=""):
    out = jitted(*args)
    _ = float(out) if hasattr(out, "dtype") else None
    tic = time.perf_counter()
    for _ in range(N_ITER):
        out = jitted(*args)
    _ = float(out) if hasattr(out, "dtype") else None
    ms = (time.perf_counter() - tic) / N_ITER * 1000
    bound = flops / PEAK * 1000
    ratio = f"{ms / bound:5.2f}x" if bound > 0 else "     —"
    table.append((name, ms, flops, bound, note))
    print(f"{name:36s} {ms:8.2f} ms  {flops / 1e12:6.2f} TF  "
          f"bound {bound:7.2f} ms  {ratio}  {note}", flush=True)
    return ms


def main():
    mcfg = dataclasses.replace(ModelConfig(), remat=False, unroll_layers=True)
    cfg = Config(model=mcfg, loss=LossConfig(), optim=OptimizerConfig(),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB_BATCH))
    W, F, R = mcfg.max_words, mcfg.max_frames, mcfg.clip.image_resolution
    E = mcfg.clip.embed_dim
    c = mcfg.clip
    M_BANK = cfg.train.memory_bank_capacity

    # ---- analytic matmul FLOPs (fwd; callers scale by 3 for f+b) ----
    # shared with bench.py's vs_flop_bound: neighborretr_tpu/utils/flops.py
    from neighborretr_tpu.utils.flops import (analytic_step_flops,
                                              analytic_step_phase_flops)
    _ph = analytic_step_phase_flops(cfg)
    vis_attn_fwd, vis_mlp_fwd = _ph["vis_attn_fwd"], _ph["vis_mlp_fwd"]
    stem_fwd, vis_proj_fwd = _ph["stem_fwd"], _ph["vis_proj_fwd"]
    txt_fwd, tmp_fwd = _ph["txt_fwd"], _ph["tmp_fwd"]
    sim_bb_fwd, sim_bank_fwd = _ph["sim_bb_fwd"], _ph["sim_bank_fwd"]
    ctm_fwd = _ph["ctm_fwd"]
    step_analytic = analytic_step_flops(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, c.vocab_size - 1, size=(BATCH, W)).astype(np.int32)
    ids[:, -1] = c.vocab_size - 1
    batch = {
        "text_ids": jnp.asarray(ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.integers(
            0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    bank = mb.create(M_BANK, W, F, E)
    for i in range(MB_BATCH):
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    t_feat, v_feat = jax.jit(lambda p: model.get_text_video_feat(
        p, mcfg, batch["text_ids"], batch["text_mask"], batch["video"],
        batch["video_mask"]))(params)
    t_feat = jax.block_until_ready(t_feat)
    key = jax.random.PRNGKey(1)
    tm, vm = batch["text_mask"], batch["video_mask"]

    print(f"device: {jax.devices()[0]}  batch {BATCH}  bank {M_BANK}",
          flush=True)

    # ---- full step ----
    state = create_train_state(params, bank)

    @jax.jit
    def full_step(state):
        state, metrics = train_step(state, batch, key, cfg, 1000)
        return state, metrics["loss"]

    state, out = full_step(state)
    _ = float(out)
    tic = time.perf_counter()
    for _ in range(N_ITER):
        state, out = full_step(state)
    _ = float(out)
    step_ms = (time.perf_counter() - tic) / N_ITER * 1000
    bound = step_analytic / PEAK * 1000
    print(f"{'FULL train step':36s} {step_ms:8.2f} ms  "
          f"{step_analytic / 1e12:6.2f} TF  bound {bound:7.2f} ms  "
          f"{step_ms / bound:5.2f}x  ({BATCH / step_ms * 1000:.1f} pairs/s)",
          flush=True)

    # ---- towers ----
    def vfb(cc):
        def loss(p):
            return jnp.sum(jnp.square(model.get_video_feat(
                p, cc, batch["video"], batch["video_mask"])))
        # reduce over EVERY grad leaf: returning one leaf lets XLA
        # dead-code-eliminate all other dW matmuls (measured: the probe
        # then runs at 2x fwd instead of the algebraic 3x)
        return jax.jit(lambda p: sum(jnp.sum(jnp.square(g))
                                     for g in jax.tree.leaves(
                                         jax.grad(loss)(p))))

    orig_block = L.block_apply

    def block_no_attn(p, x, n_head, attn_bias=None, dtype=jnp.float32,
                      fused_attention=False):
        h = L.linear(p["mlp"]["c_fc"], L.layer_norm(p["ln_2"], x),
                     dtype=dtype)
        return x + L.linear(p["mlp"]["c_proj"], L.quick_gelu(h), dtype=dtype)

    def block_no_mlp(p, x, n_head, attn_bias=None, dtype=jnp.float32,
                     fused_attention=False):
        if fused_attention == "block":
            from neighborretr_tpu.ops.pallas_block_attention import (
                fused_ln_attention_residual)
            bias = None
            if attn_bias is not None:
                B, Lx = x.shape[0], x.shape[1]
                bias = jnp.broadcast_to(attn_bias.astype(jnp.float32),
                                        (B, 1, Lx, Lx))[:, 0]
            return fused_ln_attention_residual(
                x.astype(dtype), p["ln_1"]["scale"], p["ln_1"]["bias"],
                *L.packed_qkv_weights(p["attn"]["in_proj"]),
                p["attn"]["out_proj"]["w"], p["attn"]["out_proj"]["b"],
                n_head, bias=bias,
                interpret=jax.default_backend() != "tpu")
        h = L.layer_norm(p["ln_1"], x)
        return x + L.mha(p["attn"], h, n_head, attn_bias, dtype,
                         fused=bool(fused_attention))

    full_ms = timeit("video tower f+b", vfb(mcfg), params,
                     flops=3 * (vis_attn_fwd + vis_mlp_fwd + vis_proj_fwd)
                     + stem_fwd)
    L.block_apply = block_no_attn
    noattn_ms = timeit("video f+b no-attn", vfb(mcfg), params,
                       flops=3 * (vis_mlp_fwd + vis_proj_fwd) + stem_fwd)
    L.block_apply = block_no_mlp
    nomlp_ms = timeit("video f+b no-mlp", vfb(mcfg), params,
                      flops=3 * (vis_attn_fwd + vis_proj_fwd) + stem_fwd)
    L.block_apply = orig_block
    attn_ms, attn_fl = full_ms - noattn_ms, 3 * vis_attn_fwd
    mlp_ms, mlp_fl = full_ms - nomlp_ms, 3 * vis_mlp_fwd
    for nm, msv, fl in (("  -> attn sublayers (full-noattn)", attn_ms, attn_fl),
                        ("  -> MLP sublayers (full-nomlp)", mlp_ms, mlp_fl)):
        b = fl / PEAK * 1000
        table.append((nm, msv, fl, b, ""))
        print(f"{nm:36s} {msv:8.2f} ms  {fl / 1e12:6.2f} TF  "
              f"bound {b:7.2f} ms  {msv / b:5.2f}x", flush=True)

    def tfb():
        def loss(p):
            return jnp.sum(jnp.square(model.get_text_feat(
                p, mcfg, batch["text_ids"], batch["text_mask"])))
        return jax.jit(lambda p: sum(jnp.sum(jnp.square(g))
                                     for g in jax.tree.leaves(
                                         jax.grad(loss)(p))))

    timeit("text tower f+b", tfb(), params, flops=3 * txt_fwd)

    # ---- temporal transformer alone ----
    from neighborretr_tpu.models.temporal import aggregate_video_features
    frame_feat = jnp.asarray(rng.normal(0, 0.3, (BATCH, F, E)), jnp.float32)

    def tempfb():
        def loss(pt):
            return jnp.sum(jnp.square(aggregate_video_features(
                pt, mcfg, frame_feat, batch["video_mask"])))
        return jax.jit(lambda pt: sum(jnp.sum(jnp.square(g))
                                      for g in jax.tree.leaves(
                                          jax.grad(loss)(pt))))

    timeit("temporal tfm f+b", tempfb(), params["temporal"],
           flops=3 * tmp_fwd)

    # ---- loss side (everything downstream of the encoders) ----
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

    timeit("loss side f+b (sim+CTM+4 losses)", lossfb(), params, t_feat,
           v_feat, flops=3 * (sim_bb_fwd + sim_bank_fwd + ctm_fwd))

    def simfb():
        def loss(tf_):
            s = model.local_similarity(params, tf_, v_feat, tm, vm, False)
            return jnp.sum(jnp.square(s))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  local sim BxB f+b", simfb(), t_feat, flops=3 * sim_bb_fwd)

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

    timeit("  bank sim/centrality f+b", bankfb(), t_feat,
           flops=3 * sim_bank_fwd / 2)   # one direction of the two

    def ctmfb():
        def loss(tf_):
            g_t, g_v = model.merge_global_features(params, mcfg, tf_, v_feat,
                                                   tm, vm, key)
            return jnp.sum(jnp.square(model.global_level(params, g_t, g_v)))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  CTM merge + global f+b", ctmfb(), t_feat, flops=3 * ctm_fwd)

    # ---- BertAdam (memory-bound: bound column is meaningless) ----
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), params)
    opt = bertadam.bert_adam_init(params)

    @jax.jit
    def adam(p, g, o):
        np_, no = bertadam.bert_adam_update(g, o, p, cfg.optim, 1000)
        return jnp.sum(jax.tree.leaves(np_)[0])

    timeit("BertAdam update", adam, params, grads, opt,
           note="memory-bound (3 HBM passes over params+moments)")

    named = {n: m for n, m, *_ in table}
    acc = (named["video tower f+b"] + named["text tower f+b"]
           + named["temporal tfm f+b"]
           + named["loss side f+b (sim+CTM+4 losses)"]
           + named["BertAdam update"])
    print(f"\nphase sum (video+text+temporal+loss+adam) = {acc:.1f} ms "
          f"vs full step {step_ms:.1f} ms "
          f"(residual {step_ms - acc:+.1f} ms = overlap/scheduling + "
          f"bank FIFO + logit clamp)", flush=True)


if __name__ == "__main__":
    main()

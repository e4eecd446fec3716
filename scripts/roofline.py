"""One-table step roofline for the flagship config (VERDICT r2 item 5).

Measures every phase of the batch-96 training step on the real chip —
vision tower (attn/MLP split), text tower, temporal transformer, loss side
(local similarity vs CTM+global+uniform/KL/neighbor split), BertAdam — each
as a jitted scalar-reducing probe (tunnel measurement rules: see
scripts/ablate.py header), alongside each phase's XLA-cost-model FLOPs and
its FLOP-bound time at the v5e bf16 peak (197 TFLOP/s).  Prints the table
PARITY.md's "Step roofline" section records, plus the phase sum vs the
measured full step (residual = scheduling/fusion overlap the per-phase
probes cannot see).

Usage: python scripts/roofline.py  (BENCH_BATCH=96 default)
"""
import dataclasses
import functools
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

rows = []


def timeit(name, jitted, *args, flops=None):
    out = jitted(*args)
    _ = float(out)
    tic = time.perf_counter()
    for _ in range(N_ITER):
        out = jitted(*args)
    _ = float(out)
    ms = (time.perf_counter() - tic) / N_ITER * 1000
    if flops is None:
        try:
            cost = jitted.lower(*args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops = float((cost or {}).get("flops", 0.0))
        except Exception:
            flops = 0.0
    bound = flops / PEAK * 1000
    rows.append((name, ms, flops, bound))
    ratio = f"{ms / bound:5.2f}x" if bound > 0 else "    —"
    print(f"{name:34s} {ms:8.2f} ms  {flops / 1e12:7.2f} TF "
          f"bound {bound:7.2f} ms  {ratio}", flush=True)
    return ms


def main():
    mcfg = dataclasses.replace(ModelConfig(), remat=False, unroll_layers=True)
    cfg = Config(model=mcfg, loss=LossConfig(), optim=OptimizerConfig(),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB_BATCH))
    W, F, R = mcfg.max_words, mcfg.max_frames, mcfg.clip.image_resolution
    E = mcfg.clip.embed_dim
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
    bank = mb.create(cfg.train.memory_bank_capacity, W, F, E)
    for i in range(MB_BATCH):
        bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
    t_feat, v_feat = jax.jit(
        lambda p: model.get_text_video_feat(
            p, mcfg, batch["text_ids"], batch["text_mask"], batch["video"],
            batch["video_mask"]), static_argnums=())(params)
    t_feat = jax.block_until_ready(t_feat)
    key = jax.random.PRNGKey(1)

    print(f"device: {jax.devices()[0]}  batch {BATCH}  bank "
          f"{cfg.train.memory_bank_capacity}", flush=True)

    # ---- full step (the number everything must sum to) ----
    state = create_train_state(params, bank)

    @jax.jit
    def full_step(state):
        state, metrics = train_step(state, batch, key, cfg, 1000)
        return state, metrics["loss"]

    state, out = full_step(state)          # warm/compile
    _ = float(out)
    tic = time.perf_counter()
    for _ in range(N_ITER):
        state, out = full_step(state)
    _ = float(out)
    step_ms = (time.perf_counter() - tic) / N_ITER * 1000
    cost = full_step.lower(state).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    step_flops = float((cost or {}).get("flops", 0.0))
    print(f"{'FULL train step':34s} {step_ms:8.2f} ms  "
          f"{step_flops / 1e12:7.2f} TF bound {step_flops / PEAK * 1e3:7.2f} "
          f"ms  {step_ms / (step_flops / PEAK * 1e3):5.2f}x", flush=True)
    print(f"pairs/s = {BATCH / step_ms * 1000:.1f}", flush=True)

    # ---- towers ----
    def vfb(c):
        def loss(p):
            return jnp.sum(jnp.square(model.get_video_feat(
                p, c, batch["video"], batch["video_mask"])))
        return jax.jit(lambda p: jnp.sum(jax.grad(loss)(
            p)["clip"]["visual"]["class_embedding"]))

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

    full_ms = timeit("video tower f+b", vfb(mcfg), params)
    L.block_apply = block_no_attn
    noattn_ms = timeit("video f+b no-attn", vfb(mcfg), params)
    L.block_apply = block_no_mlp
    nomlp_ms = timeit("video f+b no-mlp", vfb(mcfg), params)
    L.block_apply = orig_block
    print(f"{'  -> attn sublayers (full-noattn)':34s} "
          f"{full_ms - noattn_ms:8.2f} ms", flush=True)
    print(f"{'  -> MLP sublayers (full-nomlp)':34s} "
          f"{full_ms - nomlp_ms:8.2f} ms", flush=True)

    def tfb():
        def loss(p):
            return jnp.sum(jnp.square(model.get_text_feat(
                p, mcfg, batch["text_ids"], batch["text_mask"])))
        return jax.jit(lambda p: jnp.sum(
            jax.grad(loss)(p)["clip"]["text"]["token_embedding"]))

    timeit("text tower f+b", tfb(), params)

    # ---- temporal transformer alone (frame feats -> aggregated) ----
    from neighborretr_tpu.models.temporal import aggregate_video_features
    frame_feat = jnp.asarray(rng.normal(0, 0.3, (BATCH, F, E)), jnp.float32)

    def tempfb():
        def loss(p):
            return jnp.sum(jnp.square(aggregate_video_features(
                p, mcfg, frame_feat, batch["video_mask"])))
        return jax.jit(lambda p: jnp.sum(jax.tree.leaves(
            jax.grad(loss)(p))[0]))

    timeit("temporal tfm f+b", tempfb(), params)

    # ---- loss side: everything downstream of the encoders ----
    tm = batch["text_mask"]
    vm = batch["video_mask"]

    def loss_side(p, tf_, vf_):
        c2 = dataclasses.replace(cfg)
        total, _ = compute_losses_from_feats(p, c2, tf_, vf_)
        return total

    def compute_losses_from_feats(p, c2, tf_, vf_):
        # compute_losses minus the encoders: patch get_text_video_feat
        real = model.get_text_video_feat
        model.get_text_video_feat = lambda *a, **k: (tf_, vf_)
        try:
            return compute_losses(p, c2, batch, bank, key)
        finally:
            model.get_text_video_feat = real

    def lossfb():
        def loss(p, tf_, vf_):
            return loss_side(p, tf_, vf_)[0] if isinstance(
                loss_side(p, tf_, vf_), tuple) else loss_side(p, tf_, vf_)
        return jax.jit(lambda p, tf_, vf_: jnp.sum(
            jax.grad(loss, argnums=1)(p, tf_, vf_)))

    timeit("loss side f+b (sim+CTM+4 losses)", lossfb(), params, t_feat,
           v_feat)

    # local similarity alone (the in-batch B x B matrix, f+b)
    def simfb():
        def loss(tf_):
            s = model.local_similarity(params, tf_, v_feat, tm, vm, False)
            return jnp.sum(jnp.square(s))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  local sim BxB f+b", simfb(), t_feat)

    # bank matrices / neighbor reduction (fused kernel) f+b
    use_pallas = model.resolve_use_pallas(mcfg)

    def bankfb():
        def loss(tf_):
            if use_pallas and model.bank_fusion_supported(mcfg):
                c = model.bank_centrality(params, tf_, bank.feat_v, tm,
                                          bank.mask_v, axis=1,
                                          sim_dtype=mcfg.sim_dtype)
            else:
                c = model.local_similarity(params, tf_, bank.feat_v, tm,
                                           bank.mask_v, use_pallas,
                                           sim_dtype=mcfg.sim_dtype)
            return jnp.sum(jnp.square(c))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  bank sim/centrality f+b", bankfb(), t_feat)

    # CTM merge + global level f+b
    def ctmfb():
        def loss(tf_):
            g_t, g_v = model.merge_global_features(params, mcfg, tf_, v_feat,
                                                   tm, vm, key)
            return jnp.sum(jnp.square(model.global_level(params, g_t, g_v)))
        return jax.jit(lambda tf_: jnp.sum(jax.grad(loss)(tf_)))

    timeit("  CTM merge + global f+b", ctmfb(), t_feat)

    # ---- BertAdam ----
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), params)
    opt = bertadam.bert_adam_init(params)

    @jax.jit
    def adam(p, g, o):
        np_, no = bertadam.bert_adam_update(g, o, p, cfg.optim, 1000)
        return jnp.sum(jax.tree.leaves(np_)[0])

    timeit("BertAdam update", adam, params, grads, opt)

    print("\nphase sum (towers+temporal+loss+adam) vs full step:", flush=True)
    named = {n: m for n, m, _, _ in rows}
    acc = (named.get("video tower f+b", 0) + named.get("text tower f+b", 0)
           + named.get("temporal tfm f+b", 0)
           + named.get("loss side f+b (sim+CTM+4 losses)", 0)
           + named.get("BertAdam update", 0))
    print(f"  sum {acc:.1f} ms vs step {step_ms:.1f} ms "
          f"(residual {step_ms - acc:+.1f} ms = overlap/scheduling)",
          flush=True)


if __name__ == "__main__":
    main()

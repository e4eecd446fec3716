"""Perf probe: time step variants on the real chip to locate the bottleneck.

Usage: BENCH_BATCH=64 python scripts/perf_probe.py [mode]...
Modes: encode, encode_unroll, step_remat, step_noremat, step_pallas,
       step_unroll.
Each mode compiles once and times N iterations with a final-value host fetch
as the sync point (tunnel-safe: block_until_ready is unreliable over axon).
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neighborretr_tpu.core.config import Config, LossConfig, ModelConfig, TrainConfig
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train.step import create_train_state, fill_bank_step, train_step

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N = 6

# mode -> (encode_only, remat, use_pallas, unroll_layers, attention_impl, remat_policy)
MODES = {
    "encode":        (True,  False, "off", False, "einsum", "full"),
    "encode_unroll": (True,  False, "off", True,  "einsum", "full"),
    "encode_fattn":  (True,  False, "off", False, "fused",  "full"),
    "step_remat":    (False, True,  "off", False, "einsum", "full"),
    "step_noremat":  (False, False, "off", False, "einsum", "full"),
    "step_pallas":   (False, True,  "on",  False, "einsum", "full"),
    "step_unroll":   (False, False, "off", True,  "einsum", "full"),
    "step_dots":     (False, True,  "off", False, "einsum", "dots"),
    "step_fattn":    (False, True,  "off", False, "fused",  "full"),
    "step_best":     (False, True,  "on",  False, "fused",  "dots"),
    "step_fattn_dots": (False, True, "off", False, "fused",  "dots"),
    "step_fattn_attn": (False, True, "off", False, "fused",  "attn"),
    "step_fattn_unroll": (False, True, "off", True,  "fused",  "full"),
    "step_fattn_unroll_attn": (False, True, "off", True, "fused", "attn"),
    "step_fattn_unroll_dots": (False, True, "off", True, "fused", "dots"),
    "step_fattn_noremat": (False, False, "off", False, "fused", "full"),
    "step_fattn_noremat_unroll": (False, False, "off", True, "fused", "full"),
    # forward ablations: replace a sublayer with identity to attribute time
    "encode_noattn": (True,  False, "off", False, "einsum", "full"),
    "encode_nomlp":  (True,  False, "off", False, "einsum", "full"),
}


def apply_ablation(mode):
    from neighborretr_tpu.models import layers as L
    if mode == "encode_noattn":
        L.mha = lambda p, x, n_head, attn_bias=None, dtype=None: x
    elif mode == "encode_nomlp":
        orig = L.block_apply

        def block_no_mlp(p, x, n_head, attn_bias=None, dtype=jnp.float32):
            return x + L.mha(p["attn"], L.layer_norm(p["ln_1"], x), n_head,
                             attn_bias, dtype)
        L.block_apply = block_no_mlp


def make_batch(mcfg, seed=0):
    from neighborretr_tpu.data.datasets.synthetic import make_synthetic_batch
    host = make_synthetic_batch(mcfg, BATCH, seed, variable_lengths=False)
    return {k: jnp.asarray(v) for k, v in host.items()}


def timeit(name, fn):
    out = fn()                      # compile
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    tic = time.perf_counter()
    for _ in range(N):
        out = fn()
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - tic) / N
    print(f"{name} (batch {BATCH}): {dt*1000:.1f} ms  ({BATCH/dt:.0f} pairs/s)",
          flush=True)


def main():
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    modes = sys.argv[1:] or ["encode", "step_remat", "step_noremat"]
    for mode in modes:
        apply_ablation(mode)
        encode_only, remat, pallas, unroll, attn, policy = MODES[mode]
        mcfg = dataclasses.replace(
            ModelConfig(), remat=remat, use_pallas=pallas, unroll_layers=unroll,
            attention_impl=attn, remat_policy=policy)
        cfg = Config(model=mcfg, loss=LossConfig(),
                     train=TrainConfig(
                         batch_size=BATCH,
                         mb_batch=int(os.environ.get("NRTPU_PROBE_MB", "4"))))
        batch = make_batch(mcfg)
        params = model.init_params(jax.random.PRNGKey(0), mcfg)

        if encode_only:
            enc = jax.jit(lambda p, b: model.get_text_video_feat(
                p, mcfg, b["text_ids"], b["text_mask"], b["video"], b["video_mask"]))
            timeit(mode, lambda: enc(params, batch))
            continue

        bank = mb.create(cfg.train.memory_bank_capacity, mcfg.max_words,
                         mcfg.max_frames, mcfg.clip.embed_dim)
        for i in range(cfg.train.mb_batch):
            bank = fill_bank_step(params, bank, batch, cfg, i * BATCH)
        box = {"state": create_train_state(params, bank)}

        def run():
            # rebind: train_step donates its input state
            s, m = train_step(box["state"], batch, jax.random.PRNGKey(1),
                              cfg, 1000)
            box["state"] = s
            return m["loss"]
        timeit(mode, run)


if __name__ == "__main__":
    main()

"""Probe for tests/test_convergence.py tuning: R@1 + loss trajectory on the
fixed 16-pair dataset under different step counts / lrs / loss mixes.

Usage: JAX_PLATFORMS=cpu ... python scripts/convergence_probe.py [steps] [lr]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                          OptimizerConfig, TrainConfig)
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train import metrics as rmetrics
from neighborretr_tpu.train.step import (create_train_state, fill_bank_step,
                                         train_step)

B, W, F, N = 8, 8, 4, 16


def _dataset(cfg):
    rng = np.random.default_rng(0)
    res = cfg.model.clip.image_resolution
    vocab = cfg.model.clip.vocab_size
    text_ids = rng.integers(1, vocab - 1, size=(N, W)).astype(np.int32)
    text_mask = np.zeros((N, W), np.float32)
    for i in range(N):
        n = int(rng.integers(4, W + 1))
        text_mask[i, :n] = 1
        text_ids[i, n - 1] = vocab - 1
        text_ids[i, n:] = 0
    video = rng.normal(size=(N, F, res, res, 3)).astype(np.float32)
    video_mask = np.ones((N, F), np.float32)
    return {k: jnp.asarray(v) for k, v in {
        "text_ids": text_ids, "text_mask": text_mask, "video": video,
        "video_mask": video_mask, "idx": np.arange(N, dtype=np.int32),
    }.items()}


def _r1(params, cfg, data):
    tf, vf = model.get_text_video_feat(
        params, cfg.model, data["text_ids"], data["text_mask"],
        data["video"], data["video_mask"])
    sim, _ = model.get_similarity_logits(
        params, tf, vf, data["text_mask"], data["video_mask"])
    sim = np.asarray(sim)
    return (rmetrics.compute_metrics(sim)["R1"],
            rmetrics.compute_metrics(sim.T)["R1"])


def main():
    import os
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-3
    uw = float(os.environ.get("UW", 1.0))
    nw = float(os.environ.get("NW", 1.0))
    kw = float(os.environ.get("KW", 1.0))
    wd = float(os.environ.get("WD", 0.2))
    mcfg = ModelConfig.tiny(max_words=W, max_frames=F)
    cfg = Config(
        model=mcfg,
        loss=LossConfig(num_neighbors=3, uniform_weight=uw,
                        neighbor_weight=nw, kl_weight=kw),
        optim=OptimizerConfig(lr=lr, coef_lr=1.0, warmup_proportion=0.02,
                              weight_decay=wd),
        train=TrainConfig(batch_size=B, mb_batch=2, epochs=1),
    )
    data = _dataset(cfg)
    batches = [jax.tree.map(lambda a: a[i * B:(i + 1) * B], data)
               for i in range(N // B)]

    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    if "LS0" in os.environ:  # override initial logit_scale (raw, pre-exp)
        params["clip"]["logit_scale"] = jnp.asarray(
            float(os.environ["LS0"]), jnp.float32)
    print("init R@1 (t2v, v2t):", _r1(params, cfg, data))

    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    for i, b in enumerate(batches):
        bank = fill_bank_step(params, bank, b, cfg, i * B)
    state = create_train_state(params, bank)

    for s in range(steps):
        state, metrics = train_step(state, batches[s % len(batches)],
                                    jax.random.PRNGKey(s), cfg,
                                    t_total=steps)
        if (s + 1) % 20 == 0 or s == 0:
            r1 = _r1(state.params, cfg, data)
            ls = float(np.exp(np.asarray(
                state.params["clip"]["logit_scale"])))
            print(f"step {s+1:4d} R@1={r1} "
                  f"loss={float(metrics['loss']):.3f} "
                  f"cen={float(metrics['centrality_loss']):.3f} "
                  f"nb={float(metrics['neighbor_loss']):.3f} "
                  f"uni={float(metrics['uniform_loss']):.3f} "
                  f"kl={float(metrics['kl_loss']):.3f} "
                  f"exp(ls)={ls:.2f}")


if __name__ == "__main__":
    main()

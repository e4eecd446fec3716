"""System-level learning capstone: training must actually LEARN retrieval.

The golden tests (tests/test_reference_parity.py) prove step-level numerical
agreement with the reference; test_model.py proves the loss drops on a
repeated batch.  These tests close the remaining system-level questions:

1. Do the losses + memory bank + BertAdam + eval metrics *interact*
   correctly over many steps — does R@1 on a small fixed dataset climb from
   chance to near-perfect?  (Reference counterpart: its only correctness
   signal is exactly this kind of continuous evaluation, SURVEY.md §4 /
   trainer.py:169.)

2. At the reference's DEFAULT loss weights, random-init training on
   unstructured data does NOT converge — it falls into a degenerate uniform
   plateau whose loss values are analytic (uniform → ln B, neighbor →
   ln(k+1), KL → 0) and IDENTICAL between this framework and the reference's
   own torch stack (scripts/reference_convergence_probe.py measured the
   same plateau to 3 decimals: total 5.006 at B=8, k=3).  The Sinkhorn
   uniform loss acts on the UNNORMALIZED global logits and at random init
   overwhelms the contrastive signal (any weight ≥ 0.1 in probes); KL at
   full weight drags the local path into the same basin.  The loss design
   assumes CLIP-pretrained features — with them, pairs separate from step
   one and the uniform/KL terms act as the intended regularizers.  Probes:
   scripts/convergence_probe.py (ours), scripts/reference_convergence_probe.py
   (reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                          OptimizerConfig, TrainConfig)
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.train import memory_bank as mb
from neighborretr_tpu.train import metrics as rmetrics
from neighborretr_tpu.train.step import (create_train_state, fill_bank_step,
                                         train_step)

B, W, F, N = 8, 8, 4, 16  # batch, words, frames, dataset size


def _dataset(cfg):
    """N fixed caption/video pairs (the whole 'dataset' as device arrays)."""
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
    """t2v / v2t R@1 over the full N×N similarity matrix (eval path)."""
    tf, vf = model.get_text_video_feat(
        params, cfg.model, data["text_ids"], data["text_mask"],
        data["video"], data["video_mask"])
    sim, _ = model.get_similarity_logits(
        params, tf, vf, data["text_mask"], data["video_mask"])
    sim = np.asarray(sim)
    t2v = rmetrics.compute_metrics(sim)
    v2t = rmetrics.compute_metrics(sim.T)
    return t2v["R1"], v2t["R1"]


def _run(cfg, steps):
    data = _dataset(cfg)
    batches = [jax.tree.map(lambda a: a[i * B:(i + 1) * B], data)
               for i in range(N // B)]
    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    r1_0 = _r1(params, cfg, data)
    bank = mb.create(cfg.train.memory_bank_capacity, W, F,
                     cfg.model.clip.embed_dim)
    for i, b in enumerate(batches):
        bank = fill_bank_step(params, bank, b, cfg, i * B)
    state = create_train_state(params, bank)
    metrics = None
    for s in range(steps):
        state, metrics = train_step(state, batches[s % len(batches)],
                                    jax.random.PRNGKey(s), cfg,
                                    t_total=steps)
        assert np.isfinite(float(metrics["loss"])), (s, metrics)
    return state, metrics, r1_0, _r1(state.params, cfg, data)


@pytest.mark.slow
def test_retrieval_converges_on_fixed_dataset():
    """Centrality + neighbor losses (the paper's two hubness-specific
    objectives) at full weight memorize a 16-pair dataset from random init.
    uniform/kl are off: at random init they collapse training identically
    in the reference (see module docstring) — their gradients are covered
    by the golden tests and the collapse test below."""
    cfg = Config(
        model=ModelConfig.tiny(max_words=W, max_frames=F),
        loss=LossConfig(num_neighbors=3, uniform_weight=0.0, kl_weight=0.0),
        optim=OptimizerConfig(lr=5e-3, coef_lr=1.0, warmup_proportion=0.02),
        train=TrainConfig(batch_size=B, mb_batch=2, epochs=1),
    )
    _, _, (r1_t2v_0, r1_v2t_0), (r1_t2v, r1_v2t) = _run(cfg, steps=120)
    # chance R@1 on 16 candidates is 6.25; a correctly-wired system drives
    # both directions far above it on a memorizable 16-pair dataset
    assert r1_t2v >= 75.0, (r1_t2v_0, r1_t2v)
    assert r1_v2t >= 75.0, (r1_v2t_0, r1_v2t)
    assert r1_t2v > r1_t2v_0 and r1_v2t > r1_v2t_0


@pytest.mark.slow
def test_default_weights_random_init_hits_reference_plateau():
    """Default-weight training from random init lands on the SAME analytic
    degenerate plateau as the reference's own torch stack (measured via
    scripts/reference_convergence_probe.py: total 5.006, centrality 1.540,
    uniform ln 8 = 2.079, neighbor ln 4 = 1.386, kl 0): system-level
    dynamics parity at the one operating point reachable without CLIP
    weights."""
    cfg = Config(
        model=ModelConfig.tiny(max_words=W, max_frames=F),
        loss=LossConfig(num_neighbors=3),
        optim=OptimizerConfig(lr=5e-3, coef_lr=1.0, warmup_proportion=0.02),
        train=TrainConfig(batch_size=B, mb_batch=2, epochs=1),
    )
    _, metrics, _, r1 = _run(cfg, steps=40)
    assert abs(float(metrics["uniform_loss"]) - np.log(B)) < 0.05, metrics
    assert abs(float(metrics["neighbor_loss"]) - np.log(4)) < 0.05, metrics
    assert float(metrics["kl_loss"]) < 0.05, metrics
    assert 1.4 < float(metrics["centrality_loss"]) < 1.7, metrics
    assert r1[0] <= 25.0 and r1[1] <= 25.0, r1

"""Probe for tests/test_convergence.py tuning: R@1 + loss trajectory on the
SAME fixed 16-pair dataset/protocol the test asserts (imported from the test
module so the two can never drift), under different step counts / lrs /
loss mixes / init logit scales.

Usage:
    JAX_PLATFORMS=cpu PYTHONPATH=. python scripts/convergence_probe.py \
        [steps] [lr]
Env knobs: UW/NW/KW (loss weights), WD (weight decay), LS0 (raw initial
logit_scale override).

Recorded findings (2026-08-19, also in PARITY.md): default weights at
random init collapse to the analytic uniform plateau (uniform → ln B,
neighbor → ln(k+1), KL → 0) at every lr probed — identically to the
reference (scripts/reference_convergence_probe.py).  Centrality-only or
centrality+neighbor memorizes the 16 pairs to R@1 100 in ≤60 steps.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import test_convergence as tc  # noqa: E402  (shared dataset/eval protocol)
from neighborretr_tpu.core.config import (Config, LossConfig,  # noqa: E402
                                          ModelConfig, OptimizerConfig,
                                          TrainConfig)
from neighborretr_tpu.models import neighborretr as model  # noqa: E402
from neighborretr_tpu.train import memory_bank as mb  # noqa: E402
from neighborretr_tpu.train.step import (create_train_state,  # noqa: E402
                                         fill_bank_step, train_step)

B, W, F, N = tc.B, tc.W, tc.F, tc.N


def main():
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
    data = tc._dataset(cfg)
    batches = [jax.tree.map(lambda a: a[i * B:(i + 1) * B], data)
               for i in range(N // B)]

    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    if "LS0" in os.environ:  # override initial logit_scale (raw, pre-exp)
        params["clip"]["logit_scale"] = jnp.asarray(
            float(os.environ["LS0"]), jnp.float32)
    print("init R@1 (t2v, v2t):", tc._r1(params, cfg, data))

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
            r1 = tc._r1(state.params, cfg, data)
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

"""On-chip proof for --opt_moments_placement host (VERDICT r4 #2 lever).

The CPU test suite cannot exercise pinned_host round trips (the CPU backend
normalizes output memory kinds and aborts the next donated call), so the two
accelerator-gated tests in tests/test_bertadam.py run HERE on the real chip:

  1. trajectory identity — 3 BertAdam steps with host-offloaded moments are
     bitwise equal to the device-resident run (params and m alike), and the
     carried moments actually live in pinned_host;
  2. donated train_step integration — the tiny full step runs under host
     placement and reproduces the device-placement loss exactly.

Prints one JSON line; non-zero exit on any mismatch.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from neighborretr_tpu.train import bertadam as BA

    assert BA.host_offload_supported(), (
        f"backend {jax.devices()[0].platform} cannot host-offload")
    from neighborretr_tpu.core.config import OptimizerConfig

    rng = np.random.default_rng(0)
    cfg_dev = OptimizerConfig()
    cfg_host = dataclasses.replace(cfg_dev, moments_placement="host")
    params = {"clip": {"w": jnp.asarray(rng.normal(size=(256, 256)),
                                        jnp.float32)},
              "head": {"b": jnp.asarray(rng.normal(size=(256,)),
                                        jnp.float32)}}
    s_dev = BA.bert_adam_init(params)
    s_host = BA.place_moments(BA.bert_adam_init(params), "host")
    kinds = {k: v.sharding.memory_kind
             for k, v in {"m": s_host.m["clip"]["w"],
                          "v": s_host.v["clip"]["w"]}.items()}
    assert kinds == {"m": "pinned_host", "v": "pinned_host"}, kinds
    p_dev, p_host = params, params
    for _ in range(3):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
            params)
        p_dev, s_dev = BA.bert_adam_update(grads, s_dev, p_dev, cfg_dev, 10)
        p_host, s_host = BA.bert_adam_update(grads, s_host, p_host,
                                             cfg_host, 10)
    max_dp = max(float(np.abs(jax.device_get(a) - jax.device_get(b)).max())
                 for a, b in zip(jax.tree.leaves(p_dev),
                                 jax.tree.leaves(p_host)))
    max_dm = max(float(np.abs(jax.device_get(a) - jax.device_get(b)).max())
                 for a, b in zip(jax.tree.leaves(s_dev.m),
                                 jax.tree.leaves(s_host.m)))
    carried_kind = s_host.m["clip"]["w"].sharding.memory_kind

    # 2. tiny donated train_step under both placements
    from neighborretr_tpu.core.config import (Config, DataConfig, LossConfig,
                                              ModelConfig, TrainConfig)
    from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import create_train_state, train_step

    def cfg_with(placement):
        return Config(
            model=ModelConfig.tiny(max_words=8, max_frames=4),
            loss=LossConfig(num_neighbors=3),
            optim=OptimizerConfig(moments_placement=placement),
            data=DataConfig(max_words=8, max_frames=4),
            train=TrainConfig(epochs=1, batch_size=8, mb_batch=1, seed=0))

    ds = SyntheticDataset(n=8, max_words=8, max_frames=4, resolution=32,
                          vocab_size=512, seed=3)
    items = [ds.item(i) for i in range(8)]
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0]}
    losses = {}
    for placement in ("device", "host"):
        cfg = cfg_with(placement)
        mparams = model.init_params(jax.random.PRNGKey(1), cfg.model)
        bank = mb.create(cfg.train.memory_bank_capacity, 8, 4,
                         cfg.model.clip.embed_dim)
        state = create_train_state(mparams, bank,
                                   moments_placement=placement)
        for i in range(2):
            state, metrics = train_step(state, batch,
                                        jax.random.PRNGKey(0), cfg, 10)
        losses[placement] = float(metrics["loss"])

    ok = (max_dp == 0.0 and max_dm == 0.0
          and losses["device"] == losses["host"]
          and carried_kind == "pinned_host")
    print(json.dumps({
        "check": "host-offloaded BertAdam moments (pinned_host)",
        "ok": ok,
        "max_param_delta": max_dp, "max_moment_delta": max_dm,
        "carried_memory_kind": carried_kind,
        "train_step_loss": losses,
        "device": str(jax.devices()[0]),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

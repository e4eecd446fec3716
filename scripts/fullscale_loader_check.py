"""Full-SIZE checkpoint loader exercise (VERDICT r4 #7's de-risk branch).

Real ViT-B/32 weights cannot be fetched here (zero egress — DNS failure
recorded in PARITY), so the loader path was only ever driven at tiny scale.
This closes the caveat at the REAL scale: generate checkpoints with the
exact 151M-param ViT-B/32 shapes on disk (random weights), push them
through both torch-migration loaders into the real-config model, and run
one train step + one eval similarity block on the chip.

  1. OpenAI-layout ViT-B/32 .pt (the `--clip_checkpoint` format,
     modeling.py:80-101 shape-sniffing contract) → load_openai_clip_into;
  2. reference best.pth layout (main.py:161-187) →
     load_reference_checkpoint_into.

Prints one JSON line with load times, parity of the two loaded trees, step
latency, and the device-memory watermark.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from neighborretr_tpu.core.config import (Config, LossConfig,
                                              ModelConfig, TrainConfig)
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.models import weights_io as W
    from neighborretr_tpu.train import memory_bank as mb
    from neighborretr_tpu.train.step import (create_train_state,
                                             fill_bank_step, train_step)

    out_dir = os.environ.get("CKPT_DIR", "/tmp/nrtpu_fullscale")
    os.makedirs(out_dir, exist_ok=True)
    mcfg = ModelConfig()                      # REAL ViT-B/32, 24w/12f
    cfg = Config(model=mcfg, loss=LossConfig(),
                 train=TrainConfig(batch_size=32, mb_batch=1))

    # --- generate the two reference-format checkpoints at full size ------
    donor = model.init_params(jax.random.PRNGKey(7), mcfg)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(donor))
    ref_path = os.path.join(out_dir, "best.pth")
    t0 = time.perf_counter()
    W.save_reference_checkpoint(jax.device_get(donor), mcfg, ref_path)
    # OpenAI layout = the clip.* subtree with the prefix stripped
    # (module_clip.py state-dict names; jit-archive loading falls back to
    # torch.load in read_torch_state_dict)
    import torch
    sd = {k[len("clip."):]: v
          for k, v in torch.load(ref_path, map_location="cpu").items()
          if k.startswith("clip.")}
    clip_path = os.path.join(out_dir, "ViT-B-32.pt")
    torch.save(sd, clip_path)
    gen_s = time.perf_counter() - t0
    sizes_mb = {os.path.basename(p): round(os.path.getsize(p) / 2**20, 1)
                for p in (ref_path, clip_path)}

    # --- loader 1: OpenAI .pt → fresh params -----------------------------
    t0 = time.perf_counter()
    p1 = model.init_params(jax.random.PRNGKey(0), mcfg)
    p1 = W.load_openai_clip_into(p1, mcfg, clip_path)
    load_openai_s = time.perf_counter() - t0

    # --- loader 2: reference best.pth (full model migration) -------------
    t0 = time.perf_counter()
    p2 = model.init_params(jax.random.PRNGKey(0), mcfg)
    p2 = W.load_reference_checkpoint_into(p2, mcfg, ref_path)
    load_ref_s = time.perf_counter() - t0

    # the two loads must agree exactly on the CLIP towers (same donor)
    max_clip_delta = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(jax.device_get(p1["clip"])),
                        jax.tree.leaves(jax.device_get(p2["clip"]))))

    # --- one real-scale train step + eval block on the chip --------------
    from neighborretr_tpu.data.datasets.synthetic import make_synthetic_batch
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        mcfg, cfg.train.batch_size, 0, variable_lengths=False).items()}
    bank = mb.create(cfg.train.memory_bank_capacity, mcfg.max_words,
                     mcfg.max_frames, mcfg.clip.embed_dim)
    bank = fill_bank_step(p2, bank, batch, cfg, 0)
    state = create_train_state(p2, bank)
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0), cfg,
                                1000)
    loss = float(metrics["loss"])
    first_step_s = time.perf_counter() - t0

    from neighborretr_tpu.train.evaluate import similarity_matrix_device
    t_feat, v_feat = model.get_text_video_feat(
        state.params, mcfg, batch["text_ids"], batch["text_mask"],
        batch["video"], batch["video_mask"])
    sim = similarity_matrix_device(
        state.params, cfg, t_feat, batch["text_mask"].astype(jnp.float32),
        v_feat, batch["video_mask"].astype(jnp.float32))
    sim_ok = bool(np.isfinite(np.asarray(sim)).all())

    stats = jax.local_devices()[0].memory_stats() or {}
    peak_gb = round((stats.get("peak_bytes_in_use") or 0) / 2**30, 2)

    ok = (np.isfinite(loss) and sim_ok and max_clip_delta == 0.0
          and n_params > 150e6)
    print(json.dumps({
        "check": "full-size (151M-param ViT-B/32) reference-format loader",
        "ok": ok, "n_params": n_params, "ckpt_mb": sizes_mb,
        "generate_s": round(gen_s, 1),
        "load_openai_pt_s": round(load_openai_s, 1),
        "load_reference_pth_s": round(load_ref_s, 1),
        "clip_tree_max_delta": max_clip_delta,
        "train_step_loss": loss, "first_step_s": round(first_step_s, 1),
        "eval_block_finite": sim_ok, "peak_device_gb": peak_gb,
        "device": str(jax.devices()[0]),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

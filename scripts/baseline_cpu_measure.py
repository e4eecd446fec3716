"""Measured same-hardware baseline: reference (torch) vs this framework (JAX),
both on THIS machine's CPU, full ViT-B/32 model, identical shapes.

The reference publishes no throughput numbers (BASELINE.md), and round 1's
vs_baseline ratio rested on a 45 pairs/s engineering estimate.  This script
replaces the estimate with a measurement: the full training loss
forward+backward (all four hubness losses, memory bank matrices) at the same
(batch, bank, words, frames) on the same silicon.  The reference model is
instantiated from a random ViT-B/32-shaped state dict (no checkpoint file
exists in this environment; throughput is weight-independent) via the same
loader monkeypatch as tests/test_reference_parity.py.

    python scripts/baseline_cpu_measure.py          # ~5-10 min on CPU

Writes the measured table to stdout; transcribe into BASELINE.md.
"""

import json
import math
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BASE_BATCH", "8"))
MB = int(os.environ.get("BASE_MB", "2"))         # bank = MB * BATCH
STEPS = int(os.environ.get("BASE_STEPS", "3"))
# the reference crashes when num_neighbors >= batch (create_neighbor_mask index mismatch, until_module.py:118-123)
NEIGHBORS = min(20, BATCH - 1)
W, F, RES = 24, 12, 224

REFERENCE_ROOT = "/root/reference"


def _install_stubs():
    for name in ("timm", "timm.models", "timm.models.layers"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["timm.models.layers"].drop_path = (
        lambda x, drop_prob=0.0, training=False: x)
    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].layers = sys.modules["timm.models.layers"]
    for name in ("ftfy", "boto3"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["ftfy"].fix_text = lambda s: s
    if "botocore" not in sys.modules:
        botocore = types.ModuleType("botocore")
        exceptions = types.ModuleType("botocore.exceptions")
        exceptions.ClientError = type("ClientError", (Exception,), {})
        botocore.exceptions = exceptions
        sys.modules["botocore"] = botocore
        sys.modules["botocore.exceptions"] = exceptions
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def _vitb32_state_dict(torch):
    """Random ViT-B/32-shaped CLIP state dict (OpenAI layout)."""
    g = torch.Generator().manual_seed(0)
    E, WID, VWID, P, R, LT, LV, CTX, VOC = (
        512, 512, 768, 32, 224, 12, 12, 77, 49408)
    grid = R // P
    sd = {
        "visual.conv1.weight": torch.randn(VWID, 3, P, P, generator=g) * 0.02,
        "visual.class_embedding": torch.randn(VWID, generator=g) * 0.02,
        "visual.positional_embedding": torch.randn(grid * grid + 1, VWID, generator=g) * 0.02,
        "visual.ln_pre.weight": torch.ones(VWID),
        "visual.ln_pre.bias": torch.zeros(VWID),
        "visual.ln_post.weight": torch.ones(VWID),
        "visual.ln_post.bias": torch.zeros(VWID),
        "visual.proj": torch.randn(VWID, E, generator=g) * 0.02,
        "token_embedding.weight": torch.randn(VOC, WID, generator=g) * 0.02,
        "positional_embedding": torch.randn(CTX, WID, generator=g) * 0.01,
        "ln_final.weight": torch.ones(WID),
        "ln_final.bias": torch.zeros(WID),
        "text_projection": torch.randn(WID, E, generator=g) * 0.02,
        "logit_scale": torch.tensor(math.log(1 / 0.07)),
    }

    def block(prefix, width):
        return {
            f"{prefix}.ln_1.weight": torch.ones(width),
            f"{prefix}.ln_1.bias": torch.zeros(width),
            f"{prefix}.attn.in_proj_weight": torch.randn(3 * width, width, generator=g) * 0.02,
            f"{prefix}.attn.in_proj_bias": torch.zeros(3 * width),
            f"{prefix}.attn.out_proj.weight": torch.randn(width, width, generator=g) * 0.02,
            f"{prefix}.attn.out_proj.bias": torch.zeros(width),
            f"{prefix}.ln_2.weight": torch.ones(width),
            f"{prefix}.ln_2.bias": torch.zeros(width),
            f"{prefix}.mlp.c_fc.weight": torch.randn(4 * width, width, generator=g) * 0.02,
            f"{prefix}.mlp.c_fc.bias": torch.zeros(4 * width),
            f"{prefix}.mlp.c_proj.weight": torch.randn(width, 4 * width, generator=g) * 0.02,
            f"{prefix}.mlp.c_proj.bias": torch.zeros(width),
        }

    for i in range(LV):
        sd.update(block(f"visual.transformer.resblocks.{i}", VWID))
    for i in range(LT):
        sd.update(block(f"transformer.resblocks.{i}", WID))
    return sd


def measure_reference():
    import torch
    _install_stubs()
    from NeighborRetr.models import modeling as ref_modeling

    sd = _vitb32_state_dict(torch)
    cfg = types.SimpleNamespace(
        base_encoder="ViT-B/32", num_hidden_layers=4,
        centrality_scale=0.3, beta=0.7, num_neighbors=NEIGHBORS, temperature=3.0,
        uniform_weight=1.0, neighbor_weight=1.0, kl_weight=1.0)

    real_exists, real_jit, real_load = (os.path.exists, torch.jit.load,
                                        torch.load)
    try:
        os.path.exists = lambda p: True
        torch.jit.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("not jit"))
        torch.load = lambda *a, **k: sd
        model = ref_modeling.NeighborRetr(cfg)
    finally:
        os.path.exists, torch.jit.load, torch.load = (real_exists, real_jit,
                                                      real_load)
    model = model.float().train()

    g = torch.Generator().manual_seed(1)
    E = 512
    model.mb_ind = torch.arange(MB * BATCH)
    model.mb_feat_t = torch.randn(MB * BATCH, W, E, generator=g)
    model.mb_feat_v = torch.randn(MB * BATCH, F, E, generator=g)
    model.mb_mask_t = torch.ones(MB * BATCH, W)
    model.mb_mask_v = torch.ones(MB * BATCH, F)
    model.mb_batch = MB * BATCH

    text_ids = torch.randint(1, 49407, (BATCH, W), generator=g)
    text_ids[:, -1] = 49407
    text_mask = torch.ones(BATCH, W)
    video = torch.randn(BATCH, F, 3, RES, RES, generator=g)
    video_mask = torch.ones(BATCH, F)
    idx = torch.arange(BATCH)

    def step():
        model.zero_grad(set_to_none=True)
        out = model(text_ids, text_mask, video, video_mask, idx)
        out[0].backward()
        return float(out[0])

    step()                                    # warmup
    tic = time.perf_counter()
    for _ in range(STEPS):
        loss = step()
    elapsed = (time.perf_counter() - tic) / STEPS
    print(f"# reference torch CPU: {elapsed:.2f} s/step (loss {loss:.3f})",
          file=sys.stderr)
    return elapsed


def measure_ours():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from neighborretr_tpu.core.config import (Config, LossConfig, ModelConfig,
                                              TrainConfig)
    from neighborretr_tpu.models import neighborretr as model
    from neighborretr_tpu.train import memory_bank as mbank
    from neighborretr_tpu.train.step import compute_losses

    mcfg = ModelConfig()                       # fp32 islands; bf16 compute
    import dataclasses
    mcfg = dataclasses.replace(mcfg, compute_dtype="float32")  # CPU apples-to-apples
    cfg = Config(model=mcfg, loss=LossConfig(num_neighbors=NEIGHBORS),
                 train=TrainConfig(batch_size=BATCH, mb_batch=MB))

    rng = np.random.default_rng(1)
    E = mcfg.clip.embed_dim
    bank = mbank.MemoryBank(
        ind=jnp.arange(MB * BATCH, dtype=jnp.int32),
        feat_t=jnp.asarray(rng.normal(size=(MB * BATCH, W, E)).astype(np.float32)),
        feat_v=jnp.asarray(rng.normal(size=(MB * BATCH, F, E)).astype(np.float32)),
        mask_t=jnp.ones((MB * BATCH, W), jnp.float32),
        mask_v=jnp.ones((MB * BATCH, F), jnp.float32))
    text_ids = rng.integers(1, 49407, size=(BATCH, W)).astype(np.int32)
    text_ids[:, -1] = 49407
    batch = {
        "text_ids": jnp.asarray(text_ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.normal(
            size=(BATCH, F, RES, RES, 3)).astype(np.float32)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
        "idx": jnp.arange(BATCH, dtype=jnp.int32),
    }
    params = model.init_params(jax.random.PRNGKey(0), mcfg)

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd_bwd(params, batch, bank, cfg):
        grads, aux = jax.grad(compute_losses, has_aux=True)(
            params, cfg, batch, bank, jax.random.PRNGKey(0))
        return aux["loss"], grads

    loss, grads = fwd_bwd(params, batch, bank, cfg)   # compile
    _ = float(loss)
    tic = time.perf_counter()
    for _ in range(STEPS):
        loss, grads = fwd_bwd(params, batch, bank, cfg)
    _ = float(loss)
    elapsed = (time.perf_counter() - tic) / STEPS
    print(f"# ours JAX CPU: {elapsed:.2f} s/step (loss {float(loss):.3f})",
          file=sys.stderr)
    return elapsed


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    result = {"batch": BATCH, "bank": MB * BATCH, "steps": STEPS,
              "shape": f"{W}w/{F}f@{RES}"}
    if which in ("ref", "both"):
        result["reference_s_per_step"] = round(measure_reference(), 3)
        result["reference_pairs_per_s"] = round(
            BATCH / result["reference_s_per_step"], 3)
    if which in ("ours", "both"):
        result["ours_s_per_step"] = round(measure_ours(), 3)
        result["ours_pairs_per_s"] = round(
            BATCH / result["ours_s_per_step"], 3)
    if which == "both":
        result["speedup_same_cpu"] = round(
            result["reference_s_per_step"] / result["ours_s_per_step"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Step-time attribution probes on the real chip.

Usage: python scripts/ablate.py [towers|stem|all]

Measurement rules learned the hard way (see .claude/skills/verify/SKILL.md):
  * every timed program reduces to a SCALAR inside jit — the axon tunnel
    eagerly streams medium-size outputs at ~150-250 MB/s, which otherwise
    dominates the measurement;
  * gradient probes differentiate w.r.t. the EARLIEST parameter in the chain
    (class_embedding) so XLA cannot dead-code-eliminate the backward;
  * ablations monkeypatch layers.mha / layers.block_apply to identity-style
    variants, attributing time to the attention and MLP sublayers.

Reference numbers (v5e, batch 64, 2026-08, block-kernel path):
video fwd 55.7 ms — attention sublayer 25.8, MLP 29.3;
video f+b 153.0 ms — attention sublayer 91.9 (2.15 ms/layer fwd, ~2.6× the
FLOP bound: head relayout + fp32 softmax, see SKILL.md negative A/Bs),
MLP 64.9 (~100% MFU); text fwd 3.7.  Pre-block-kernel history: video fwd
66.9 (attn 33.9, MLP 24.0), f+b 156.8 (attn 88.1); stem 8.0 ms as
transpose+matmul vs 4.2 as strided conv.
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

from neighborretr_tpu.core.config import ModelConfig
from neighborretr_tpu.models import layers as L
from neighborretr_tpu.models import neighborretr as model

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
N_ITER = 16


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(out)
    tic = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    _ = float(out)   # host fetch of a scalar = the sync point
    print(f"{name:38s} {(time.perf_counter() - tic) / N_ITER * 1000:8.2f} ms",
          flush=True)


def make_inputs(cfg):
    rng = np.random.default_rng(0)
    W, F, R = cfg.max_words, cfg.max_frames, cfg.clip.image_resolution
    ids = rng.integers(1, cfg.clip.vocab_size - 1,
                       size=(BATCH, W)).astype(np.int32)
    ids[:, -1] = cfg.clip.vocab_size - 1
    return {
        "text_ids": jnp.asarray(ids),
        "text_mask": jnp.ones((BATCH, W), jnp.float32),
        "video": jnp.asarray(rng.integers(
            0, 256, size=(BATCH, F, R, R, 3)).astype(np.uint8)),
        "video_mask": jnp.ones((BATCH, F), jnp.float32),
    }


def towers():
    cfg = dataclasses.replace(ModelConfig(), unroll_layers=True)
    b = make_inputs(cfg)
    params = model.init_params(jax.random.PRNGKey(0), cfg)

    def vfwd(c):
        return jax.jit(lambda p: jnp.sum(jnp.square(model.get_video_feat(
            p, c, b["video"], b["video_mask"]))))

    def vfb(c):
        def loss(p):
            return jnp.sum(jnp.square(model.get_video_feat(
                p, c, b["video"], b["video_mask"])))
        return jax.jit(lambda p: jnp.sum(jax.grad(loss)(
            p)["clip"]["visual"]["class_embedding"]))

    def tfwd(c):
        return jax.jit(lambda p: jnp.sum(jnp.square(model.get_text_feat(
            p, c, b["text_ids"], b["text_mask"]))))

    orig_block = L.block_apply

    # The production towers route through block_apply's fused_ln_... branch,
    # so BOTH ablations must patch block_apply itself (patching layers.mha
    # alone is a no-op for the block-kernel path — it is never called).
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

    timeit("video fwd  full", vfwd(cfg), params)
    timeit("video f+b  full", vfb(cfg), params)
    timeit("text  fwd  full", tfwd(cfg), params)

    L.block_apply = block_no_attn
    timeit("video fwd  no-attn", vfwd(cfg), params)
    timeit("video f+b  no-attn", vfb(cfg), params)

    L.block_apply = block_no_mlp
    timeit("video fwd  no-mlp", vfwd(cfg), params)
    timeit("video f+b  no-mlp", vfb(cfg), params)
    L.block_apply = orig_block


def stem():
    from neighborretr_tpu.data.video import normalize_frames
    cfg = ModelConfig()
    b = make_inputs(cfg)
    P = cfg.clip.vision_patch_size
    R = cfg.clip.image_resolution
    NF = BATCH * cfg.max_frames
    rng = np.random.default_rng(1)
    pe = jnp.asarray(rng.standard_normal(
        (P * P * 3, cfg.clip.vision_width)).astype(np.float32) * 0.02)

    @jax.jit
    def v_conv(video, pe):
        x = normalize_frames(video, dtype=jnp.bfloat16).reshape(NF, R, R, 3)
        w = pe.reshape(P, P, 3, -1).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.sum(y)

    @jax.jit
    def v_transpose(video, pe):
        G = R // P
        x = normalize_frames(video, dtype=jnp.bfloat16).reshape(NF, R, R, 3)
        x = x.reshape(NF, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(NF, G * G, P * P * 3)
        return jnp.sum((x @ pe.astype(jnp.bfloat16)).astype(jnp.float32))

    timeit("stem conv (production path)", v_conv, b["video"], pe)
    timeit("stem transpose+matmul", v_transpose, b["video"], pe)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("towers", "all"):
        towers()
    if which in ("stem", "all"):
        stem()

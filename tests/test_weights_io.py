"""OpenAI-checkpoint loading: shape sniffing + end-to-end numerical parity.

Builds a tiny CLIP-shaped torch state dict (the exact key/layout contract of
OpenAI's ViT checkpoints), loads it through weights_io, and checks both
towers' outputs against an independent torch oracle implementing the
documented CLIP forward (pre-LN blocks, QuickGELU, causal∧padding text mask,
patch-conv → CLS → ln_post @ proj vision path).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from neighborretr_tpu.core.config import ClipConfig, ModelConfig
from neighborretr_tpu.models import clip as clip_mod
from neighborretr_tpu.models import neighborretr as model
from neighborretr_tpu.models.weights_io import (load_openai_clip_into,
                                                read_torch_state_dict,
                                                sniff_clip_config)

E, WID, VWID, P, RES, L_TXT, L_VIS, CTX, VOCAB = 64, 64, 64, 16, 32, 2, 2, 77, 512


def _torch_block_sd(g, prefix, width):
    return {
        f"{prefix}.ln_1.weight": torch.rand(width, generator=g) + 0.5,
        f"{prefix}.ln_1.bias": torch.randn(width, generator=g) * 0.02,
        f"{prefix}.attn.in_proj_weight": torch.randn(3 * width, width, generator=g) * 0.05,
        f"{prefix}.attn.in_proj_bias": torch.randn(3 * width, generator=g) * 0.02,
        f"{prefix}.attn.out_proj.weight": torch.randn(width, width, generator=g) * 0.05,
        f"{prefix}.attn.out_proj.bias": torch.randn(width, generator=g) * 0.02,
        f"{prefix}.ln_2.weight": torch.rand(width, generator=g) + 0.5,
        f"{prefix}.ln_2.bias": torch.randn(width, generator=g) * 0.02,
        f"{prefix}.mlp.c_fc.weight": torch.randn(4 * width, width, generator=g) * 0.05,
        f"{prefix}.mlp.c_fc.bias": torch.randn(4 * width, generator=g) * 0.02,
        f"{prefix}.mlp.c_proj.weight": torch.randn(width, 4 * width, generator=g) * 0.05,
        f"{prefix}.mlp.c_proj.bias": torch.randn(width, generator=g) * 0.02,
    }


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    g = torch.Generator().manual_seed(0)
    grid = RES // P
    sd = {
        "visual.conv1.weight": torch.randn(VWID, 3, P, P, generator=g) * 0.05,
        "visual.class_embedding": torch.randn(VWID, generator=g) * 0.05,
        "visual.positional_embedding": torch.randn(grid * grid + 1, VWID, generator=g) * 0.05,
        "visual.ln_pre.weight": torch.rand(VWID, generator=g) + 0.5,
        "visual.ln_pre.bias": torch.randn(VWID, generator=g) * 0.02,
        "visual.ln_post.weight": torch.rand(VWID, generator=g) + 0.5,
        "visual.ln_post.bias": torch.randn(VWID, generator=g) * 0.02,
        "visual.proj": torch.randn(VWID, E, generator=g) * 0.05,
        "token_embedding.weight": torch.randn(VOCAB, WID, generator=g) * 0.02,
        "positional_embedding": torch.randn(CTX, WID, generator=g) * 0.01,
        "ln_final.weight": torch.rand(WID, generator=g) + 0.5,
        "ln_final.bias": torch.randn(WID, generator=g) * 0.02,
        "text_projection": torch.randn(WID, E, generator=g) * 0.05,
        "logit_scale": torch.tensor(math.log(1 / 0.07)),
    }
    for i in range(L_VIS):
        sd.update(_torch_block_sd(g, f"visual.transformer.resblocks.{i}", VWID))
    for i in range(L_TXT):
        sd.update(_torch_block_sd(g, f"transformer.resblocks.{i}", WID))
    path = tmp_path_factory.mktemp("ckpt") / "tiny_clip.pt"
    torch.save(sd, str(path))
    return str(path), sd


def _oracle_block(sd, prefix, x, mask=None):
    """Pre-LN residual attention block (fp64 torch), QuickGELU MLP.

    mask: additive [B, L, L] or None.
    """
    w = {k[len(prefix) + 1:]: v.double() for k, v in sd.items()
         if k.startswith(prefix + ".")}
    h = TF.layer_norm(x, x.shape[-1:], w["ln_1.weight"], w["ln_1.bias"])
    qkv = h @ w["attn.in_proj_weight"].T + w["attn.in_proj_bias"]
    q, k, v = qkv.chunk(3, dim=-1)
    d = q.shape[-1]                                   # single head at width 64
    logits = q @ k.transpose(-2, -1) / math.sqrt(d)
    if mask is not None:
        logits = logits + mask
    att = torch.softmax(logits, dim=-1) @ v
    x = x + att @ w["attn.out_proj.weight"].T + w["attn.out_proj.bias"]
    h = TF.layer_norm(x, x.shape[-1:], w["ln_2.weight"], w["ln_2.bias"])
    h = h @ w["mlp.c_fc.weight"].T + w["mlp.c_fc.bias"]
    h = h * torch.sigmoid(1.702 * h)
    return x + h @ w["mlp.c_proj.weight"].T + w["mlp.c_proj.bias"]


def test_sniff_and_roundtrip(tiny_ckpt):
    path, _ = tiny_ckpt
    sd = read_torch_state_dict(path)
    cfg = sniff_clip_config(sd)
    assert cfg == ClipConfig(embed_dim=E, image_resolution=RES,
                             vision_layers=L_VIS, vision_width=VWID,
                             vision_patch_size=P, context_length=CTX,
                             vocab_size=VOCAB, transformer_width=WID,
                             transformer_layers=L_TXT)


def test_text_tower_parity(tiny_ckpt):
    path, sd = tiny_ckpt
    mcfg = ModelConfig(clip=ClipConfig(
        embed_dim=E, image_resolution=RES, vision_layers=L_VIS,
        vision_width=VWID, vision_patch_size=P, context_length=CTX,
        vocab_size=VOCAB, transformer_width=WID, transformer_layers=L_TXT),
        max_words=8, max_frames=4, temporal_layers=2, compute_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    params = load_openai_clip_into(params, mcfg, path)

    B, Lq = 3, 8
    rng = np.random.default_rng(1)
    ids = rng.integers(1, VOCAB - 1, size=(B, Lq)).astype(np.int32)
    lens = [4, 8, 6]
    mask = np.zeros((B, Lq), np.float32)
    for b, n in enumerate(lens):
        mask[b, :n] = 1
        ids[b, n - 1] = VOCAB - 1
        ids[b, n:] = 0

    _, hidden = clip_mod.encode_text(params["clip"]["text"], mcfg.clip,
                                     jnp.asarray(ids), jnp.asarray(mask),
                                     dtype=jnp.float32)

    x = sd["token_embedding.weight"].double()[torch.tensor(ids.astype(np.int64))]
    x = x + sd["positional_embedding"].double()[:Lq]
    causal = torch.full((Lq, Lq), float("-inf"), dtype=torch.float64).triu(1)
    pad = torch.where(torch.tensor(mask) > 0, 0.0, float("-inf")).double()
    m = causal[None] + pad[:, None, :]
    m = torch.clamp(m, min=-1e9)                      # framework uses -1e9
    for i in range(L_TXT):
        x = _oracle_block(sd, f"transformer.resblocks.{i}", x, m)
    x = TF.layer_norm(x, x.shape[-1:], sd["ln_final.weight"].double(),
                      sd["ln_final.bias"].double())
    want = (x @ sd["text_projection"].double()).numpy()

    np.testing.assert_allclose(np.asarray(hidden), want, atol=2e-4)


def test_vision_tower_parity(tiny_ckpt):
    path, sd = tiny_ckpt
    mcfg = ModelConfig(clip=ClipConfig(
        embed_dim=E, image_resolution=RES, vision_layers=L_VIS,
        vision_width=VWID, vision_patch_size=P, context_length=CTX,
        vocab_size=VOCAB, transformer_width=WID, transformer_layers=L_TXT),
        max_words=8, max_frames=4, temporal_layers=2, compute_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    params = load_openai_clip_into(params, mcfg, path)

    N = 2
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((N, RES, RES, 3)).astype(np.float32)

    cls, _ = clip_mod.encode_image(params["clip"]["visual"], mcfg.clip,
                                   jnp.asarray(imgs), dtype=jnp.float32,
                                   project_hidden=False)

    xt = torch.tensor(imgs, dtype=torch.float64).permute(0, 3, 1, 2)  # NCHW
    patches = TF.conv2d(xt, sd["visual.conv1.weight"].double(), stride=P)
    x = patches.flatten(2).transpose(1, 2)                   # [N, G*G, width]
    cls_tok = sd["visual.class_embedding"].double().expand(N, 1, -1)
    x = torch.cat([cls_tok, x], dim=1) + sd["visual.positional_embedding"].double()
    x = TF.layer_norm(x, x.shape[-1:], sd["visual.ln_pre.weight"].double(),
                      sd["visual.ln_pre.bias"].double())
    for i in range(L_VIS):
        x = _oracle_block(sd, f"visual.transformer.resblocks.{i}", x)
    x = TF.layer_norm(x, x.shape[-1:], sd["visual.ln_post.weight"].double(),
                      sd["visual.ln_post.bias"].double())
    want = (x[:, 0] @ sd["visual.proj"].double()).numpy()

    np.testing.assert_allclose(np.asarray(cls), want, atol=2e-4)


def test_temporal_reseeded_from_loaded_text_tower(tiny_ckpt):
    path, sd = tiny_ckpt
    mcfg = ModelConfig(clip=ClipConfig(
        embed_dim=E, image_resolution=RES, vision_layers=L_VIS,
        vision_width=VWID, vision_patch_size=P, context_length=CTX,
        vocab_size=VOCAB, transformer_width=WID, transformer_layers=L_TXT),
        max_words=8, max_frames=4, temporal_layers=2, compute_dtype="float32")
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    params = load_openai_clip_into(params, mcfg, path)
    np.testing.assert_array_equal(
        np.asarray(params["temporal"]["frame_position_embeddings"]),
        sd["positional_embedding"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["temporal"]["transformer"]["ln_1"]["scale"][0]),
        sd["transformer.resblocks.0.ln_1.weight"].numpy())


def test_reference_loader_rejects_bare_clip_checkpoint(tiny_ckpt):
    """Passing an OpenAI CLIP backbone file to the model-checkpoint flag
    (instead of --clip_checkpoint) must fail with an actionable error, not a
    KeyError from deep inside the shape sniffer."""
    from neighborretr_tpu.models.weights_io import \
        load_reference_checkpoint_into
    path, _ = tiny_ckpt
    mcfg = ModelConfig(clip=ClipConfig(
        embed_dim=E, image_resolution=RES, vision_layers=L_VIS,
        vision_width=VWID, vision_patch_size=P, context_length=CTX,
        vocab_size=VOCAB, transformer_width=WID, transformer_layers=L_TXT),
        max_words=8, max_frames=4, temporal_layers=2)
    params = model.init_params(jax.random.PRNGKey(0), mcfg)
    with pytest.raises(ValueError, match="clip_checkpoint"):
        load_reference_checkpoint_into(params, mcfg, path)

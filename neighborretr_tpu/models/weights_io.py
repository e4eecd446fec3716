"""OpenAI CLIP checkpoint loading: torch state dict → parameter pytree.

Replicates the reference's shape-sniffing contract (modeling.py:88-101): model
dimensions are derived from the checkpoint tensors themselves, then weights
map into the functional pytree with the layout transposes this codebase uses
(input-major linear weights, [K, C_in, C_out] convs → flattened patch matmul).

After loading, frame position embeddings and the temporal transformer are
re-seeded from the loaded text tower (modeling.py:199-220).

torch is imported lazily — it is only needed when actually reading a .pt
checkpoint; the rest of the framework never touches it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..core.config import ClipConfig, ModelConfig
from .neighborretr import seed_temporal_from_clip

Params = Dict[str, Any]


def read_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
    return {k: v.float().cpu().numpy() for k, v in sd.items()}


def sniff_clip_config(sd: Dict[str, np.ndarray]) -> ClipConfig:
    """Derive architecture dims from checkpoint shapes (modeling.py:88-101)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd
                         if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    image_resolution = vision_patch_size * grid_size
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len({k.split(".")[2] for k in sd
                              if k.startswith("transformer.resblocks")})
    return ClipConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_layers=transformer_layers,
    )


def _qkv3(in_proj_weight: np.ndarray) -> np.ndarray:
    """torch [3D, D] in_proj_weight → this framework's [D, 3, D] layout."""
    d = in_proj_weight.shape[1]
    return np.ascontiguousarray(in_proj_weight.T).reshape(d, 3, d)


def _block_from_torch(sd, prefix: str) -> Params:
    return {
        "ln_1": {"scale": jnp.asarray(sd[f"{prefix}.ln_1.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.ln_1.bias"])},
        "attn": {
            # torch packed [3D, D] → input-major [D, 3, D] (q/k/v on axis 1)
            "in_proj": {"w": jnp.asarray(_qkv3(sd[f"{prefix}.attn.in_proj_weight"])),
                        "b": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"]
                                         .reshape(3, -1))},
            "out_proj": {"w": jnp.asarray(sd[f"{prefix}.attn.out_proj.weight"].T),
                         "b": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"])},
        },
        "ln_2": {"scale": jnp.asarray(sd[f"{prefix}.ln_2.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.ln_2.bias"])},
        "mlp": {
            "c_fc": {"w": jnp.asarray(sd[f"{prefix}.mlp.c_fc.weight"].T),
                     "b": jnp.asarray(sd[f"{prefix}.mlp.c_fc.bias"])},
            "c_proj": {"w": jnp.asarray(sd[f"{prefix}.mlp.c_proj.weight"].T),
                       "b": jnp.asarray(sd[f"{prefix}.mlp.c_proj.bias"])},
        },
    }


def _stack_blocks(blocks):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def clip_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    cfg = sniff_clip_config(sd)

    conv = sd["visual.conv1.weight"]                     # [width, 3, P, P]
    patch_embed = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])

    visual = {
        "patch_embed": jnp.asarray(patch_embed),
        "class_embedding": jnp.asarray(sd["visual.class_embedding"]),
        "positional_embedding": jnp.asarray(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": jnp.asarray(sd["visual.ln_pre.weight"]),
                   "bias": jnp.asarray(sd["visual.ln_pre.bias"])},
        "transformer": _stack_blocks([
            _block_from_torch(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)]),
        "ln_post": {"scale": jnp.asarray(sd["visual.ln_post.weight"]),
                    "bias": jnp.asarray(sd["visual.ln_post.bias"])},
        "proj": jnp.asarray(sd["visual.proj"]),
    }
    text = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["positional_embedding"]),
        "transformer": _stack_blocks([
            _block_from_torch(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.transformer_layers)]),
        "ln_final": {"scale": jnp.asarray(sd["ln_final.weight"]),
                     "bias": jnp.asarray(sd["ln_final.bias"])},
        "text_projection": jnp.asarray(sd["text_projection"]),
    }
    return {"text": text, "visual": visual,
            "logit_scale": jnp.asarray(sd["logit_scale"]).reshape(())}


def _weight_mlp_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    """nn.Sequential(Linear d→2d, ReLU, Linear 2d→1) → {fc1, fc2} pytree
    (modeling.py:149-153)."""
    return {
        "fc1": {"w": jnp.asarray(sd[f"{prefix}.0.weight"].T),
                "b": jnp.asarray(sd[f"{prefix}.0.bias"])},
        "fc2": {"w": jnp.asarray(sd[f"{prefix}.2.weight"].T),
                "b": jnp.asarray(sd[f"{prefix}.2.bias"])},
    }


def _ctm_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    """CTM: TokenConv (Conv1d [C_out, C_in, K] → [K, C_in, C_out]) + LN +
    score head (cluster.py:686-717)."""
    return {
        "conv": {"w": jnp.asarray(sd[f"{prefix}.conv.conv.weight"]
                                  .transpose(2, 1, 0))},
        "norm": {"scale": jnp.asarray(sd[f"{prefix}.norm.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.norm.bias"])},
        "score": {"w": jnp.asarray(sd[f"{prefix}.score.weight"].T),
                  "b": jnp.asarray(sd[f"{prefix}.score.bias"])},
    }


def _tc_block_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Params:
    """TCBlock: norm1 + TCAttention q/kv/proj linears (cluster.py:892-921)."""
    return {
        "norm1": {"scale": jnp.asarray(sd[f"{prefix}.norm1.weight"]),
                  "bias": jnp.asarray(sd[f"{prefix}.norm1.bias"])},
        "q": {"w": jnp.asarray(sd[f"{prefix}.attn.q.weight"].T),
              "b": jnp.asarray(sd[f"{prefix}.attn.q.bias"])},
        "kv": {"w": jnp.asarray(sd[f"{prefix}.attn.kv.weight"].T),
               "b": jnp.asarray(sd[f"{prefix}.attn.kv.bias"])},
        "proj": {"w": jnp.asarray(sd[f"{prefix}.attn.proj.weight"].T),
                 "b": jnp.asarray(sd[f"{prefix}.attn.proj.bias"])},
    }


def _merge_stack_from_torch(sd: Dict[str, np.ndarray], modality: str) -> Params:
    return {
        "ctm0": _ctm_from_torch(sd, f"{modality}_ctm0"),
        "block0": _tc_block_from_torch(sd, f"{modality}_block0"),
        "ctm1": _ctm_from_torch(sd, f"{modality}_ctm1"),
        "block1": _tc_block_from_torch(sd, f"{modality}_block1"),
    }


def params_from_reference_state_dict(sd: Dict[str, np.ndarray],
                                     cfg: ModelConfig) -> Params:
    """Convert a FULL reference NeighborRetr state dict (modeling.py:46-220's
    module layout, e.g. a trained `best.pth`) into this framework's pytree.

    Migration path for reference-trained checkpoints; also the anchor for the
    golden model-parity tests.  The reference's dead weighting nets
    (*_fc0/*_intra, modeling.py:141-146) are intentionally not mapped."""
    clip_sd = {k[len("clip."):]: v for k, v in sd.items()
               if k.startswith("clip.")}
    return {
        "clip": clip_params_from_state_dict(clip_sd),
        "temporal": {
            "frame_position_embeddings": jnp.asarray(
                sd["frame_position_embeddings.weight"]),
            "transformer": _stack_blocks([
                _block_from_torch(sd, f"transformerClip.resblocks.{i}")
                for i in range(cfg.temporal_layers)]),
        },
        "text_weight_fc": _weight_mlp_from_torch(sd, "text_weight_fc"),
        "video_weight_fc": _weight_mlp_from_torch(sd, "video_weight_fc"),
        "text_weight_fc1": _weight_mlp_from_torch(sd, "text_weight_fc1"),
        "video_weight_fc1": _weight_mlp_from_torch(sd, "video_weight_fc1"),
        "text_merge": _merge_stack_from_torch(sd, "text"),
        "video_merge": _merge_stack_from_torch(sd, "video"),
    }


def load_reference_checkpoint_into(params: Params, cfg: ModelConfig,
                                   ckpt_path: str) -> Params:
    """Warm-start from a reference-trained full-model checkpoint
    (`best.pth` / `pytorch_model.bin.*`, main.py:161-187)."""
    sd = read_torch_state_dict(ckpt_path)
    clip_sd = {k[len("clip."):]: v for k, v in sd.items()
               if k.startswith("clip.")}
    if not clip_sd:
        raise ValueError(
            f"{ckpt_path!r} is not a reference NeighborRetr checkpoint (no "
            f"'clip.'-prefixed keys).  A bare OpenAI CLIP backbone (.pt) "
            f"goes through --clip_checkpoint, not the model-checkpoint flag.")
    sniffed = sniff_clip_config(clip_sd)
    if sniffed != cfg.clip:
        raise ValueError(
            f"reference checkpoint {ckpt_path!r} is a different architecture "
            f"than --base_encoder: checkpoint {sniffed} != configured "
            f"{cfg.clip}")
    converted = params_from_reference_state_dict(sd, cfg)
    params = dict(params)
    params.update(converted)
    return params


def load_model_checkpoint_into(params: Params, cfg: ModelConfig,
                               ckpt_path: str, strict: bool = True,
                               logger=None) -> Params:
    """Single dispatch for model checkpoints across all CLIs: a native .npz
    (params-only best.npz or a full train-state file, whose params subtree
    is extracted) loads via core.checkpoint; anything else is treated as a
    reference-trained torch checkpoint (the migration path).

    strict=False is the reference's `--init_model` warm-start contract
    (main.py:60-66): partial load with the leaf diff logged."""
    if ckpt_path.endswith(".npz"):
        from ..core import checkpoint as ckpt
        if strict:
            params = ckpt.load_params(ckpt_path, params)
        else:
            params, diff = ckpt.load_params(ckpt_path, params, strict=False)
            if logger is not None:
                for kind in ("missing", "mismatched", "reshaped",
                             "unexpected"):
                    if diff[kind]:
                        logger.info(
                            "  warm-start %s leaves (%d): %s", kind,
                            len(diff[kind]), ", ".join(diff[kind][:8])
                            + ("..." if len(diff[kind]) > 8 else ""))
        return params
    return load_reference_checkpoint_into(params, cfg, ckpt_path)


def _block_to_torch(block: Params, prefix: str,
                    out: Dict[str, np.ndarray]) -> None:
    """Inverse of `_block_from_torch` for one (unstacked) residual block."""
    out[f"{prefix}.ln_1.weight"] = np.asarray(block["ln_1"]["scale"])
    out[f"{prefix}.ln_1.bias"] = np.asarray(block["ln_1"]["bias"])
    in_w = np.asarray(block["attn"]["in_proj"]["w"])       # [D, 3, D]
    out[f"{prefix}.attn.in_proj_weight"] = (
        in_w.reshape(in_w.shape[0], -1).T)                 # torch [3D, D]
    out[f"{prefix}.attn.in_proj_bias"] = np.asarray(
        block["attn"]["in_proj"]["b"]).reshape(-1)
    out[f"{prefix}.attn.out_proj.weight"] = np.asarray(
        block["attn"]["out_proj"]["w"]).T
    out[f"{prefix}.attn.out_proj.bias"] = np.asarray(
        block["attn"]["out_proj"]["b"])
    out[f"{prefix}.ln_2.weight"] = np.asarray(block["ln_2"]["scale"])
    out[f"{prefix}.ln_2.bias"] = np.asarray(block["ln_2"]["bias"])
    out[f"{prefix}.mlp.c_fc.weight"] = np.asarray(block["mlp"]["c_fc"]["w"]).T
    out[f"{prefix}.mlp.c_fc.bias"] = np.asarray(block["mlp"]["c_fc"]["b"])
    out[f"{prefix}.mlp.c_proj.weight"] = np.asarray(
        block["mlp"]["c_proj"]["w"]).T
    out[f"{prefix}.mlp.c_proj.bias"] = np.asarray(block["mlp"]["c_proj"]["b"])


def _unstack_blocks_to_torch(stacked: Params, prefix: str,
                             out: Dict[str, np.ndarray]) -> None:
    import jax
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        _block_to_torch(jax.tree.map(lambda a: a[i], stacked),
                        f"{prefix}.{i}", out)


def _weight_mlp_to_torch(p, prefix, out):
    out[f"{prefix}.0.weight"] = np.asarray(p["fc1"]["w"]).T
    out[f"{prefix}.0.bias"] = np.asarray(p["fc1"]["b"])
    out[f"{prefix}.2.weight"] = np.asarray(p["fc2"]["w"]).T
    out[f"{prefix}.2.bias"] = np.asarray(p["fc2"]["b"])


def _merge_stack_to_torch(p, modality, out):
    for i in (0, 1):
        ctm, blk = p[f"ctm{i}"], p[f"block{i}"]
        cp, bp = f"{modality}_ctm{i}", f"{modality}_block{i}"
        out[f"{cp}.conv.conv.weight"] = np.asarray(
            ctm["conv"]["w"]).transpose(2, 1, 0)
        out[f"{cp}.norm.weight"] = np.asarray(ctm["norm"]["scale"])
        out[f"{cp}.norm.bias"] = np.asarray(ctm["norm"]["bias"])
        out[f"{cp}.score.weight"] = np.asarray(ctm["score"]["w"]).T
        out[f"{cp}.score.bias"] = np.asarray(ctm["score"]["b"])
        out[f"{bp}.norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        out[f"{bp}.norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        for lin in ("q", "kv", "proj"):
            out[f"{bp}.attn.{lin}.weight"] = np.asarray(blk[lin]["w"]).T
            out[f"{bp}.attn.{lin}.bias"] = np.asarray(blk[lin]["b"])


def reference_state_dict_from_params(params: Params,
                                     cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of `params_from_reference_state_dict`: export this framework's
    trained pytree as a reference-layout state dict (modeling.py:46-220
    module names), so checkpoints migrate BACK to the reference's torch
    stack (load with strict=False — the reference's dead weighting nets
    *_fc0/*_intra and mb_* buffers are not emitted)."""
    sd: Dict[str, np.ndarray] = {}

    clip, vis, txt = params["clip"], params["clip"]["visual"], params["clip"]["text"]
    P, width = cfg.clip.vision_patch_size, cfg.clip.vision_width
    sd["clip.visual.conv1.weight"] = np.asarray(
        vis["patch_embed"]).reshape(P, P, 3, width).transpose(3, 2, 0, 1)
    sd["clip.visual.class_embedding"] = np.asarray(vis["class_embedding"])
    sd["clip.visual.positional_embedding"] = np.asarray(
        vis["positional_embedding"])
    sd["clip.visual.ln_pre.weight"] = np.asarray(vis["ln_pre"]["scale"])
    sd["clip.visual.ln_pre.bias"] = np.asarray(vis["ln_pre"]["bias"])
    _unstack_blocks_to_torch(vis["transformer"],
                             "clip.visual.transformer.resblocks", sd)
    sd["clip.visual.ln_post.weight"] = np.asarray(vis["ln_post"]["scale"])
    sd["clip.visual.ln_post.bias"] = np.asarray(vis["ln_post"]["bias"])
    sd["clip.visual.proj"] = np.asarray(vis["proj"])

    sd["clip.token_embedding.weight"] = np.asarray(txt["token_embedding"])
    sd["clip.positional_embedding"] = np.asarray(txt["positional_embedding"])
    _unstack_blocks_to_torch(txt["transformer"],
                             "clip.transformer.resblocks", sd)
    sd["clip.ln_final.weight"] = np.asarray(txt["ln_final"]["scale"])
    sd["clip.ln_final.bias"] = np.asarray(txt["ln_final"]["bias"])
    sd["clip.text_projection"] = np.asarray(txt["text_projection"])
    sd["clip.logit_scale"] = np.asarray(clip["logit_scale"]).reshape(())

    sd["frame_position_embeddings.weight"] = np.asarray(
        params["temporal"]["frame_position_embeddings"])
    _unstack_blocks_to_torch(params["temporal"]["transformer"],
                             "transformerClip.resblocks", sd)
    for name in ("text_weight_fc", "video_weight_fc",
                 "text_weight_fc1", "video_weight_fc1"):
        _weight_mlp_to_torch(params[name], name, sd)
    _merge_stack_to_torch(params["text_merge"], "text", sd)
    _merge_stack_to_torch(params["video_merge"], "video", sd)
    return sd


def save_reference_checkpoint(params: Params, cfg: ModelConfig,
                              path: str) -> None:
    """torch.save a reference-layout checkpoint (loadable by the reference's
    --init_model / load_state_dict(strict=False))."""
    import torch
    sd = reference_state_dict_from_params(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def load_openai_clip_into(params: Params, cfg: ModelConfig,
                          ckpt_path: str) -> Params:
    """Replace the clip subtree with checkpoint weights and re-seed the
    temporal transformer from the loaded text tower."""
    sd = read_torch_state_dict(ckpt_path)
    sniffed = sniff_clip_config(sd)
    if sniffed != cfg.clip:
        raise ValueError(
            f"checkpoint architecture {sniffed} != configured {cfg.clip}")
    params = dict(params)
    params["clip"] = clip_params_from_state_dict(sd)
    return seed_temporal_from_clip(params, cfg)

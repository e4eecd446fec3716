"""Shared setup for the eval-style CLIs (cli/eval.py, cli/index.py).

One implementation of the config/tiny-switch/dataset/params plumbing these
entry points previously copy-pasted — fixes land in one place (e.g. the
friendly unknown-datatype error and the checkpoint dispatch below).
"""

from __future__ import annotations


def init_distributed(args) -> None:
    """Multi-host bring-up: jax.distributed.initialize from the CLI flags
    (--coordinator host:port --num_processes N --process_id I), called
    BEFORE any other JAX use — collectives inside resume-auto resolution,
    mesh construction, and the compilation cache all assume the process
    group exists.  The reference counterpart is torch.distributed.launch +
    init_process_group (setup.py:44-69).  Cloud TPU pods auto-discover the
    pod topology, so all three flags may be omitted there; on CPU/GPU
    clusters (and the 2-controller CPU test) they are required together."""
    flags = (args.coordinator, args.num_processes, args.process_id)
    if all(v is None for v in flags):
        return
    if any(v is None for v in flags):
        raise SystemExit("--coordinator, --num_processes and --process_id "
                         "must be given together")
    if not (0 <= args.process_id < args.num_processes):
        raise SystemExit(f"--process_id {args.process_id} out of range for "
                         f"--num_processes {args.num_processes}")
    import jax
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)


def resolve_clip_checkpoint(args, weights_already_supplied: bool) -> None:
    """Shared --clip_checkpoint resolution for every CLI.

    'random' → None (explicit random init).  Omitted → fetch the published
    OpenAI checkpoint for --base_encoder (models/fetch.py), UNLESS another
    checkpoint already supplies the full weight set (a --resume state or a
    trained --checkpoint), the data is synthetic, or the run is --tiny.
    """
    if args.clip_checkpoint == "random":
        # remember the EXPLICIT choice: tiny_requested must not treat this
        # like an omitted flag (a full-size randomly-initialized model must
        # stay reachable from the CLI)
        args._explicit_random_clip = True
        args.clip_checkpoint = None
        return
    if (args.clip_checkpoint is None and not weights_already_supplied
            and getattr(args, "datatype", None) != "synthetic"
            and not getattr(args, "tiny", False)):
        from neighborretr_tpu.models.fetch import ensure_clip_checkpoint
        args.clip_checkpoint = ensure_clip_checkpoint(args.base_encoder)


def tiny_requested(args) -> bool:
    """--tiny, or implied by synthetic data with the checkpoint flag fully
    omitted.  `--clip_checkpoint random` is an explicit request for the
    full-size model with random init, not an implied smoke run."""
    return bool(getattr(args, "tiny", False) or (
        getattr(args, "datatype", None) == "synthetic"
        and args.clip_checkpoint is None
        and not getattr(args, "_explicit_random_clip", False)))


def apply_tiny_model(cfg, args, logger):
    """Shrink cfg.model to the tiny tower GEOMETRY when tiny_requested —
    every user-passed model flag (remat, kernels, chunking) stays applied so
    smoke runs exercise the requested paths.  The ONE implementation behind
    cli/train and the eval-style CLIs."""
    if not tiny_requested(args):
        return cfg
    import dataclasses as dc

    from neighborretr_tpu.core.config import ModelConfig
    tiny = ModelConfig.tiny(
        max_words=args.max_words, max_frames=args.max_frames,
        temporal_layers=getattr(args, "num_hidden_layers", 4))
    clip = tiny.clip
    if getattr(args, "datatype", None) != "synthetic":
        # real datasets tokenize with the full CLIP BPE (ids up to 49407);
        # the tiny 512-entry table would silently clamp them, so keep the
        # real vocab (49408×64 fp32 ≈ 12.6 MB — fine for smoke runs)
        from neighborretr_tpu.core.config import ClipConfig
        clip = dc.replace(clip, vocab_size=ClipConfig().vocab_size)
    cfg = dc.replace(cfg, model=dc.replace(
        cfg.model, clip=clip, temporal_layers=tiny.temporal_layers,
        compute_dtype=tiny.compute_dtype))
    logger.info("Using tiny model architecture (--tiny/smoke run)")
    return cfg


def resolve_eval_config(args, batch_size_val: int, logger):
    """Config for an eval-style CLI run, honoring --tiny / synthetic."""
    from neighborretr_tpu.core.config import (ClipConfig, Config, ModelConfig,
                                              TrainConfig)

    n_temporal = getattr(args, "num_hidden_layers", 4)
    clip_cfg = ClipConfig.from_name(args.base_encoder)
    cfg = Config(model=ModelConfig(clip=clip_cfg, max_words=args.max_words,
                                   max_frames=args.max_frames,
                                   temporal_layers=n_temporal),
                 train=TrainConfig(batch_size_val=batch_size_val))
    return apply_tiny_model(cfg, args, logger)


def build_eval_dataset(args, cfg, batch_size: int):
    """Synthetic smoke data or a real dataset split (friendly errors)."""
    if args.datatype == "synthetic":
        from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
        explicit_n = getattr(args, "synthetic_size", None)
        return SyntheticDataset(
            n=explicit_n if explicit_n else max(32, batch_size),
            seed=2,
            max_words=args.max_words, max_frames=args.max_frames,
            resolution=cfg.model.clip.image_resolution,
            vocab_size=cfg.model.clip.vocab_size)
    from neighborretr_tpu.data.registry import EVAL_SUBSET, build_dataset
    from neighborretr_tpu.data.tokenizer import ClipTokenizer
    if args.subset is None and args.datatype not in EVAL_SUBSET:
        raise SystemExit(
            f"unknown datatype '{args.datatype}'; available: "
            f"{sorted(EVAL_SUBSET)} (or 'synthetic')")
    subset = args.subset or EVAL_SUBSET[args.datatype]
    return build_dataset(args.datatype, subset, args.anno_path,
                         args.video_path, ClipTokenizer(),
                         max_words=args.max_words,
                         max_frames=args.max_frames,
                         resolution=cfg.model.clip.image_resolution,
                         video_framerate=args.video_framerate,
                         packed_dir=getattr(args, "packed_dir", ""))


def load_query_model(args, index, logger):
    """Config + params for the index-driven CLIs (cli/search.py,
    cli/serve.py): model geometry from flags + the index's frame count,
    meta checked BEFORE paying model init + checkpoint load, then
    init → optional CLIP weights → optional trained checkpoint."""
    import jax

    from neighborretr_tpu import serving
    from neighborretr_tpu.core.config import ClipConfig, Config, ModelConfig
    from neighborretr_tpu.models import neighborretr as model

    max_frames = index["v_mask"].shape[1]
    if args.tiny:
        mcfg = ModelConfig.tiny(max_words=args.max_words,
                                max_frames=max_frames,
                                temporal_layers=args.num_hidden_layers)
        # free-text queries tokenize with the REAL BPE (ids up to 49407),
        # so the tiny text table must match the checkpoint that built the
        # index: sniff its vocab (full-vocab tiny for file-based training,
        # 512 for synthetic smoke indexes), else default to the full vocab
        import dataclasses as dc
        vocab = ClipConfig().vocab_size
        if args.checkpoint:
            import numpy as np
            try:
                with np.load(args.checkpoint, allow_pickle=False) as ckpt:
                    # params-only (best.npz) and full-TrainState layouts
                    for key in ("clip//text//token_embedding",
                                "params//clip//text//token_embedding"):
                        if key in ckpt.files:
                            vocab = int(ckpt[key].shape[0])
                            break
            except Exception:
                # torch/reference checkpoints (the migration path) are
                # always full-vocab real models — keep the default
                pass
        mcfg = dc.replace(mcfg, clip=dc.replace(mcfg.clip, vocab_size=vocab))
    else:
        mcfg = ModelConfig(clip=ClipConfig.from_name(args.base_encoder),
                           max_words=args.max_words, max_frames=max_frames,
                           temporal_layers=args.num_hidden_layers)
    cfg = Config(model=mcfg)
    # fail on a config mismatch BEFORE paying model init + checkpoint load;
    # the query path re-checks with the weights fingerprint once params exist
    serving.check_meta(index, cfg)

    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    # no trained checkpoint (e.g. a pure-CLIP index): fetch the published
    # CLIP weights so the query tower matches what built the index
    resolve_clip_checkpoint(args,
                            weights_already_supplied=bool(args.checkpoint))
    if args.clip_checkpoint:
        from neighborretr_tpu.models.weights_io import load_openai_clip_into
        params = load_openai_clip_into(params, cfg.model,
                                       args.clip_checkpoint)
    if args.checkpoint:
        from neighborretr_tpu.models.weights_io import \
            load_model_checkpoint_into
        params = load_model_checkpoint_into(params, cfg.model,
                                            args.checkpoint)
        logger.info("Loaded checkpoint %s", args.checkpoint)
    return cfg, params


def load_eval_params(args, cfg, logger):
    """init → optional OpenAI CLIP weights → optional trained checkpoint
    (native .npz or reference-trained torch, one dispatch)."""
    import jax

    from neighborretr_tpu.models import neighborretr as model

    params = model.init_params(jax.random.PRNGKey(0), cfg.model)
    # a trained --checkpoint supplies every weight; only fetch CLIP when
    # nothing else would populate the towers
    resolve_clip_checkpoint(args,
                            weights_already_supplied=bool(args.checkpoint))
    if args.clip_checkpoint:
        from neighborretr_tpu.models.weights_io import load_openai_clip_into
        params = load_openai_clip_into(params, cfg.model,
                                       args.clip_checkpoint)
        logger.info("Loaded CLIP weights from %s", args.clip_checkpoint)
    if args.checkpoint:
        from neighborretr_tpu.models.weights_io import \
            load_model_checkpoint_into
        params = load_model_checkpoint_into(params, cfg.model,
                                            args.checkpoint)
        logger.info("Loaded checkpoint %s", args.checkpoint)
    return params

"""Training CLI.

    python -m cli.train --datatype msrvtt --anno_path ... --video_path ... \
        --clip_checkpoint ViT-B-32.pt --output_dir outputs/msrvtt

Mirrors the reference's main.py recipes (README.md:92-133) on top of the
typed Config.  --datatype synthetic trains on generated data (smoke runs).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# cheap import (pure dataclasses): single source for the backbone menu
from neighborretr_tpu.core.config import ClipConfig as _ClipConfig
_BACKBONE_CHOICES = _ClipConfig.backbone_names()


def parse_args():
    p = argparse.ArgumentParser(description="NeighborRetr-TPU training")
    p.add_argument("--datatype", default="synthetic")
    p.add_argument("--anno_path", default="")
    p.add_argument("--video_path", default="")
    p.add_argument("--output_dir", default="outputs/run")
    p.add_argument("--base_encoder", default="ViT-B/32",
                   choices=list(_BACKBONE_CHOICES))
    p.add_argument("--clip_checkpoint", default=None,
                   help="OpenAI CLIP .pt to start from; default fetches the "
                        "published checkpoint for --base_encoder into the "
                        "local cache (reference UX); 'random' skips CLIP "
                        "init entirely")
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers for smoke runs (also implied by "
                        "--datatype synthetic without --clip_checkpoint)")
    p.add_argument("--init_checkpoint", default=None)
    p.add_argument("--resume", default=None, dest="resume_checkpoint",
                   help="state_epochN.npz to resume from (full TrainState), "
                        "or 'auto' to pick the newest resumable state in "
                        "--output_dir (fresh start if none) — lets a "
                        "preempted job rescheduled with identical arguments "
                        "continue by itself")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--batch_size_val", type=int, default=128)
    p.add_argument("--max_words", type=int, default=24)
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--video_framerate", type=int, default=1)
    p.add_argument("--num_hidden_layers", type=int, default=4,
                   help="temporal transformer depth, initialized from the "
                        "first N CLIP text resblocks (args_parser.py:137)")
    p.add_argument("--mb_batch", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--coef_lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.2)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--centrality_scale", type=float, default=0.3)
    p.add_argument("--kl_weight", type=float, default=1.0)
    p.add_argument("--uniform_weight", type=float, default=1.0)
    p.add_argument("--neighbor_weight", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=0.7)
    p.add_argument("--num_neighbors", type=int, default=20)
    p.add_argument("--temperature", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--worker_mode", choices=["thread", "process"],
                   default="thread",
                   help="loader workers: threads (default) or forked "
                        "processes (scales Python-level augment cost on "
                        "many-core hosts)")
    p.add_argument("--n_display", type=int, default=50)
    p.add_argument("--mid_epoch_eval", type=int, default=1, choices=[0, 1],
                   help="validate every n_display*3 steps mid-epoch "
                        "(trainer.py:169); 0 = per-epoch eval only")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "dots", "attn"])
    p.add_argument("--attention_impl", default="auto",
                   choices=["auto", "einsum", "fused", "fused_block"])
    p.add_argument("--use_pallas", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused similarity kernel for memory-bank matrices")
    p.add_argument("--unroll_layers", action="store_true",
                   help="unroll encoder stacks instead of lax.scan")
    p.add_argument("--explicit_spmd", action="store_true",
                   help="shard_map row-sharded losses instead of GSPMD "
                        "auto-partitioning (enables Pallas kernels on meshes)")
    p.add_argument("--bank_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="memory-bank feature storage dtype; bfloat16 halves "
                        "the bank HBM + its similarity streaming traffic "
                        "(no_grad state, re-filled each step — quantization "
                        "never accumulates)")
    p.add_argument("--opt_moments_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype for Adam moments (bfloat16 halves "
                        "optimizer HBM; update math stays fp32)")
    p.add_argument("--bank_placement", default="device",
                   choices=["device", "host"],
                   help="where the memory bank lives between steps: 'host' "
                        "parks it in pinned host memory (frees bank-sized "
                        "HBM for activations at a per-step PCIe round "
                        "trip); TPU/GPU backends only")
    p.add_argument("--opt_moments_placement", default="device",
                   choices=["device", "host"],
                   help="where the carried moments live between steps: "
                        "'host' streams them through pinned host memory, "
                        "freeing moments-sized HBM (~1.2 GB fp32 ViT-B) for "
                        "activation headroom at a per-step PCIe round trip")
    p.add_argument("--micro_batches", type=int, default=1,
                   help="encode the global batch in N sequential microbatches "
                        "(jax.checkpoint) while the contrastive losses see "
                        "the full batch — exact gradients, ~N× lower peak "
                        "activation memory (GradCache semantics)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard tower weight matrices (Megatron layout) over "
                        "a `model` mesh axis of this size; remaining devices "
                        "form the data axis (GSPMD path only)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="split transformer towers depth-wise over a `stage` "
                        "mesh axis of this size (GPipe over ICI ppermute); "
                        "remaining devices form the data axis")
    p.add_argument("--pipeline_microbatches", type=int, default=0,
                   help="microbatches streamed through the pipeline per "
                        "step (0 → 4×stages)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/FSDP: shard every parameter and its Adam "
                        "moments over the data axes (GSPMD just-in-time "
                        "weight gathers + gradient reduce-scatter); ~dp× "
                        "lower param+moment memory")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port for "
                        "jax.distributed.initialize (launch this CLI once "
                        "per host with the SAME arguments; Cloud TPU pods "
                        "auto-discover and can omit all three flags)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank")
    p.add_argument("--video_chunk_frames", type=int, default=0,
                   help="encode the vision tower in sequential frame chunks "
                        "of this size, each fully rematerialized (bounds "
                        "activations by one chunk; enables batch-128 64f "
                        "on one chip). 0 = off")
    p.add_argument("--remat_skip_last", type=int, default=0,
                   help="with --remat --unroll_layers: save-all for the last "
                        "N vision layers (~2.6 GB HBM each, ~4.5 ms/step)")
    p.add_argument("--synthetic_size", type=int, default=256)
    p.add_argument("--augment", default="rand-m7-n4-mstd0.5-inc1",
                   help="train-time video RandAugment policy; '' disables")
    p.add_argument("--augment_backend", default="auto",
                   choices=["auto", "native", "pil", "device"],
                   help="augmentation kernels: 'native' = C++ ops "
                        "(data/native, byte-exact vs PIL, ~5x less host "
                        "CPU per clip), 'pil' = the PIL/numpy path, "
                        "'auto' = native when a compiler is available, "
                        "'device' = jitted on-chip ops fused into the train "
                        "step (max|delta|<=1 vs PIL per op; frees the host "
                        "of the entire augment cost)")
    p.add_argument("--frame_order", type=int, default=0, choices=[0, 1, 2],
                   help="0 normal, 1 reverse, 2 random (rawvideo_util.py:331)")
    p.add_argument("--video_cache_size", type=int, default=0,
                   help="per-worker decoded-clip LRU capacity")
    p.add_argument("--packed_dir", default="",
                   help="packed pre-decoded corpus (cli/pack_dataset.py): "
                        "clip reads become page-cached memcpys instead of "
                        "per-epoch cv2 decodes; misses fall back to decode")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of early steps here")
    p.add_argument("--debug_nans", action="store_true",
                   help="raise on NaN/Inf in any jitted computation (the "
                        "reference's --detect_grad / detect_anomaly analogue)")
    return p.parse_args()


def main():
    args = parse_args()

    from cli.common import init_distributed
    init_distributed(args)       # must precede ALL other JAX use

    from neighborretr_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from neighborretr_tpu.core.config import (ClipConfig, Config, DataConfig,
                                              LossConfig, ModelConfig,
                                              OptimizerConfig, TrainConfig,
                                              validate)
    from neighborretr_tpu.parallel import mesh as pmesh
    from neighborretr_tpu.train.loop import run_training
    from neighborretr_tpu.utils.logging import setup_logger

    # reference UX (module_clip.py:22-81): a named backbone resolves to the
    # published OpenAI checkpoint, fetched once into the local cache.  A
    # --resume state restores every weight, so it suppresses the fetch; an
    # --init_checkpoint does NOT (reference semantics: init_model is a
    # strict=False PARTIAL load on top of CLIP-initialized towers,
    # main.py:60-66)
    if args.resume_checkpoint == "auto":
        from neighborretr_tpu.core.checkpoint import resolve_resume_auto
        path = resolve_resume_auto(args.output_dir)
        args.resume_checkpoint = path
        # logged once the logger exists (below); loop.py also logs the
        # resumed step — this records the fresh-start case durably too
        args._resume_auto_note = (
            "--resume auto: " + (f"resuming from {path}" if path else
                                 "no resumable state in output_dir, "
                                 "starting fresh"))

    from cli.common import resolve_clip_checkpoint
    resolve_clip_checkpoint(
        args, weights_already_supplied=bool(args.resume_checkpoint))

    clip_cfg = ClipConfig.from_name(args.base_encoder)
    cfg = Config(
        model=ModelConfig(clip=clip_cfg, max_words=args.max_words,
                          max_frames=args.max_frames,
                          temporal_layers=args.num_hidden_layers,
                          remat=args.remat,
                          remat_policy=args.remat_policy,
                          attention_impl=args.attention_impl,
                          use_pallas=args.use_pallas,
                          unroll_layers=args.unroll_layers,
                          remat_skip_last=args.remat_skip_last,
                          video_chunk_frames=args.video_chunk_frames),
        loss=LossConfig(centrality_scale=args.centrality_scale,
                        kl_weight=args.kl_weight,
                        uniform_weight=args.uniform_weight,
                        neighbor_weight=args.neighbor_weight,
                        beta=args.beta, num_neighbors=args.num_neighbors,
                        temperature=args.temperature),
        optim=OptimizerConfig(lr=args.lr, coef_lr=args.coef_lr,
                              weight_decay=args.weight_decay,
                              warmup_proportion=args.warmup_proportion,
                              moments_dtype=args.opt_moments_dtype,
                              moments_placement=args.opt_moments_placement),
        data=DataConfig(datatype=args.datatype, data_path=args.anno_path,
                        video_path=args.video_path, max_words=args.max_words,
                        max_frames=args.max_frames,
                        video_framerate=args.video_framerate,
                        workers=args.workers,
                        worker_mode=args.worker_mode,
                        augment=args.augment or "",
                        augment_backend=args.augment_backend,
                        packed_dir=args.packed_dir),
        train=TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                          batch_size_val=args.batch_size_val,
                          mb_batch=args.mb_batch, seed=args.seed,
                          bank_dtype=args.bank_dtype,
                          bank_placement=args.bank_placement,
                          n_display=args.n_display,
                          output_dir=args.output_dir,
                          init_checkpoint=args.init_checkpoint,
                          resume_checkpoint=args.resume_checkpoint,
                          clip_checkpoint=args.clip_checkpoint,
                          num_devices=args.num_devices,
                          profile_dir=args.profile_dir,
                          explicit_spmd=args.explicit_spmd,
                          micro_batches=args.micro_batches,
                          pipeline_parallel=args.pipeline_parallel,
                          pipeline_microbatches=args.pipeline_microbatches,
                          mid_epoch_eval=bool(args.mid_epoch_eval),
                          fsdp=args.fsdp),
    )

    import jax
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.fsdp and (args.tensor_parallel > 1 or args.pipeline_parallel > 1):
        raise SystemExit("--fsdp applies to pure data-parallel meshes; drop "
                         "--tensor_parallel/--pipeline_parallel")
    if args.tensor_parallel > 1 and args.pipeline_parallel > 1:
        # 3-D data×stage×model mesh: GPipe over `stage`, Megatron over
        # `model` (auto/GSPMD inside each stage), batch over `data`
        from neighborretr_tpu.parallel.pipeline import make_pp_tp_mesh
        if args.explicit_spmd:
            raise SystemExit("--tensor_parallel/--pipeline_parallel require "
                             "the GSPMD path (drop --explicit_spmd)")
        n = args.num_devices or len(jax.devices())
        chips = args.tensor_parallel * args.pipeline_parallel
        if n % chips:
            raise SystemExit(f"--tensor_parallel×--pipeline_parallel = "
                             f"{chips} must divide the device count {n}")
        mesh = make_pp_tp_mesh((n // chips, args.pipeline_parallel,
                                args.tensor_parallel))
        validate(cfg, mesh.shape["data"])
    elif args.tensor_parallel > 1:
        if args.explicit_spmd:
            raise SystemExit("--tensor_parallel requires the GSPMD path "
                             "(drop --explicit_spmd)")
        n = args.num_devices or len(jax.devices())
        if n % args.tensor_parallel:
            raise SystemExit(f"--tensor_parallel {args.tensor_parallel} must "
                             f"divide the device count {n}")
        mesh = pmesh.make_tp_mesh((n // args.tensor_parallel,
                                   args.tensor_parallel))
        validate(cfg, mesh.shape["data"])
    elif args.pipeline_parallel > 1:
        from neighborretr_tpu.parallel.pipeline import make_pp_mesh
        n = args.num_devices or len(jax.devices())
        if n % args.pipeline_parallel:
            raise SystemExit(f"--pipeline_parallel {args.pipeline_parallel} "
                             f"must divide the device count {n}")
        mesh = make_pp_mesh((n // args.pipeline_parallel,
                             args.pipeline_parallel))
        validate(cfg, mesh.shape["data"])
    else:
        mesh = pmesh.make_mesh(num_devices=args.num_devices)
        validate(cfg, mesh.devices.size)

    logger = setup_logger(output_dir=args.output_dir)
    if getattr(args, "_resume_auto_note", None):
        logger.info(args._resume_auto_note)
    logger.info("Devices: %s", jax.devices())
    logger.info("Config:\n%s", cfg.to_json())
    if args.pipeline_parallel > 1 and (args.unroll_layers
                                       or args.remat_skip_last):
        logger.warning(
            "--unroll_layers/--remat_skip_last shape the plain scan path; "
            "pipelined towers use their own per-microbatch schedule and "
            "ignore them (--remat and --remat_policy do carry over)")

    from cli.common import apply_tiny_model, tiny_requested
    if tiny_requested(args):
        cfg = apply_tiny_model(cfg, args, logger)
        logger.info("Tiny config:\n%s", cfg.to_json())
    if args.datatype == "synthetic":
        from neighborretr_tpu.data.datasets.synthetic import SyntheticDataset
        kw = dict(max_words=args.max_words, max_frames=args.max_frames,
                  resolution=cfg.model.clip.image_resolution,
                  vocab_size=cfg.model.clip.vocab_size)
        train_ds = SyntheticDataset(n=args.synthetic_size, seed=1, **kw)
        test_ds = SyntheticDataset(n=max(32, args.batch_size_val), seed=2, **kw)
    else:
        from neighborretr_tpu.data.registry import EVAL_SUBSET, build_dataset
        from neighborretr_tpu.data.tokenizer import ClipTokenizer
        tokenizer = ClipTokenizer()
        kw = dict(max_words=args.max_words, max_frames=args.max_frames,
                  resolution=cfg.model.clip.image_resolution,
                  video_framerate=args.video_framerate,
                  packed_dir=args.packed_dir)
        train_ds = build_dataset(args.datatype, "train", args.anno_path,
                                 args.video_path, tokenizer,
                                 is_train=True, augment=args.augment or None,
                                 augment_backend=args.augment_backend,
                                 frame_order=args.frame_order,
                                 cache_capacity=args.video_cache_size,
                                 seed=args.seed, **kw)
        test_ds = build_dataset(args.datatype, EVAL_SUBSET[args.datatype],
                                args.anno_path, args.video_path, tokenizer, **kw)

    run_training(cfg, train_ds, test_ds, logger=logger, mesh=mesh)


if __name__ == "__main__":
    main()

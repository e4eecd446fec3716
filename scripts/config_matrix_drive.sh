#!/bin/bash
# Adversarial config-matrix e2e drives on the virtual 8-device CPU mesh.
# Each run is a full cli/train.py (or eval/preempt variant) at tiny shapes;
# per-run rc + tail logged to $OUT. Catches interaction bugs between the
# parallelism modes and the checkpoint/resume/preemption machinery that
# single-feature tests miss.
set -u
OUT=${1:-/tmp/nrtpu_matrix}
mkdir -p "$OUT"
ENV="env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= XLA_FLAGS=--xla_force_host_platform_device_count=8"
BASE="--datatype synthetic --epochs 1 --batch_size 16 --batch_size_val 16 \
 --max_words 8 --max_frames 4 --mb_batch 2 --synthetic_size 32 \
 --n_display 2 --num_neighbors 3 --tiny"

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  $ENV timeout 900 python "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc" | tee -a "$OUT/summary.txt"
  [ $rc -ne 0 ] && tail -15 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
}

# 1. FSDP train + resume from its checkpoint (sharded params through npz)
run fsdp_train     cli/train.py $BASE --fsdp --output_dir "$OUT/fsdp"
run fsdp_resume    cli/train.py $BASE --fsdp --epochs 2 \
                   --resume "$OUT/fsdp/state_epoch0.npz" \
                   --output_dir "$OUT/fsdp_resume"

# 2. FSDP x GradCache microbatching (no validation forbids it)
run fsdp_microb    cli/train.py $BASE --fsdp --micro_batches 2 \
                   --output_dir "$OUT/fsdp_mb"

# 3. FSDP x bf16 moments + resume
run fsdp_bf16      cli/train.py $BASE --fsdp --opt_moments_dtype bfloat16 \
                   --output_dir "$OUT/fsdp_bf16"
run fsdp_bf16_res  cli/train.py $BASE --fsdp --opt_moments_dtype bfloat16 \
                   --epochs 2 \
                   --resume "$OUT/fsdp_bf16/state_epoch0.npz" \
                   --output_dir "$OUT/fsdp_bf16_res"

# 4. pipeline train + resume
run pp_train       cli/train.py $BASE --pipeline_parallel 2 \
                   --pipeline_microbatches 2 --output_dir "$OUT/pp"
run pp_resume      cli/train.py $BASE --pipeline_parallel 2 \
                   --pipeline_microbatches 2 --epochs 2 \
                   --resume "$OUT/pp/state_epoch0.npz" \
                   --output_dir "$OUT/pp_resume"

# 5. explicit-SPMD train + resume
run spmd_train     cli/train.py $BASE --explicit_spmd --output_dir "$OUT/spmd"
run spmd_resume    cli/train.py $BASE --explicit_spmd --epochs 2 \
                   --resume "$OUT/spmd/state_epoch0.npz" \
                   --output_dir "$OUT/spmd_resume"

# 6. warm start ACROSS parallelism modes: fsdp ckpt -> tp run
run cross_warm     cli/train.py $BASE --tensor_parallel 2 \
                   --init_checkpoint "$OUT/fsdp/best.npz" \
                   --output_dir "$OUT/cross_warm"

# 7. eval CLI under tensor parallelism + fsdp flag rejection path
run eval_tp        cli/eval.py --datatype synthetic --batch_size_val 16 \
                   --max_words 8 --max_frames 4 --synthetic_size 32 --tiny \
                   --tensor_parallel 2 --checkpoint "$OUT/fsdp/best.npz"

# 8. process workers across 2 epochs (pool re-forks per epoch)
run proc_workers   cli/train.py $BASE --epochs 2 --worker_mode process \
                   --workers 2 --output_dir "$OUT/procw"

echo DONE | tee -a "$OUT/summary.txt"

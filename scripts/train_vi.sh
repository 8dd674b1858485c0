#!/bin/bash
# View-invariant encoder pretrain (reference train/train_vi.sh flag surface;
# 8x8 V100 SLURM -> one TPU pod slice via scripts/launch_tpu_pod.sh, or run
# directly on a single host).
set -euo pipefail
PREFIX=${1:?usage: $0 <name_prefix> [extra flags...]}; shift || true
exec python -m exoground_tpu.train.main \
    --dataset egoexo4d \
    --batch_size 16 \
    --epochs 100 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model view_invariant \
    --use_distill_nce_loss \
    --minimum_four_exo_takes \
    --same_view_negative \
    --name_prefix "$PREFIX" "$@"

#!/bin/bash
# Joint-model test protocol: per-camera-rank IoU report + test_results json
# (reference train/test_joint_model.sh flag surface).
set -euo pipefail
CKPT=${1:?usage: $0 <checkpoint.pth.tar> [extra flags...]}; shift || true
exec python -m exoground_tpu.train.main \
    --dataset egoexo4d \
    --batch_size 16 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model joint \
    --minimum_four_exo_takes \
    --use_distill_nce_loss \
    --same_view_negative \
    --test "$CKPT" "$@"

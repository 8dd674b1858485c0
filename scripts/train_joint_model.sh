#!/bin/bash
# Joint grounding + distillation train
# (reference train/train_joint_model.sh flag surface, incl. curriculum).
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
    --model joint \
    --minimum_four_exo_takes \
    --use_distill_nce_loss \
    --same_view_negative \
    --curriculum_train \
    --name_prefix "$PREFIX" "$@"

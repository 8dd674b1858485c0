#!/bin/bash
# TAN MIL-NCE alignment train on HowTo100M features
# (reference train/train_tan.sh; --model init then cotrain for stage 2).
set -euo pipefail
MODEL=${1:-init}  # init | cotrain
shift || true
AGREE=0; [ "$MODEL" = cotrain ] && AGREE=1
exec python -m exoground_tpu.train.main \
    --dataset htm-370k \
    --model "$MODEL" \
    --batch_size 16 \
    --epochs 20 \
    --seq_len 64 \
    --learn_agreement "$AGREE" \
    "$@"
